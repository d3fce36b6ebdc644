"""spread() — the scan-parallelism guard for CPU-dense stages.

The planned-partition count LIES for big single-row-group parquet:
Spark bin-packs byte ranges, but a task only reads row groups whose
start falls in its range, so a one-row-group file yields N-1 empty
partitions. spread() must see through that via the parquet footers
(this hid a 10x single-task cliff at 1M docs the moment the test file
crossed ~64 MB — see _effective_file_splits)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from meilisync_spark.sources.parquet import _effective_file_splits, spread


def _write(path, n_rows, row_group_size, text_len=22):
    # incompressible payload (per-row sha256 hex) so the on-disk size
    # crosses Spark's 4 MB openCost split floor when the test needs
    # many planned splits
    import hashlib

    def row(i):
        h = "".join(
            hashlib.sha256(f"{i}:{j}".encode()).hexdigest()
            for j in range(text_len // 64 + 1)
        )
        return h[:text_len]

    t = pa.table({"doc_id": pa.array(range(n_rows), pa.int64()),
                  "text": pa.array([row(i) for i in range(n_rows)])})
    pq.write_table(t, path, row_group_size=row_group_size)


def test_single_row_group_reports_one_split(spark, tmp_path):
    p = str(tmp_path / "one.parquet")
    _write(p, 50_000, row_group_size=1_000_000)
    df = spark.read.parquet(p)
    assert _effective_file_splits(df) == 1


def test_many_row_groups_report_their_count(spark, tmp_path):
    p = str(tmp_path / "many.parquet")
    _write(p, 50_000, row_group_size=5_000)
    df = spark.read.parquet(p)
    assert _effective_file_splits(df) == 10


def test_non_file_source_falls_back(spark):
    # in-memory plans have no input files: unknown, not a crash
    assert _effective_file_splits(spark.range(100)) is None


def test_spread_repartitions_single_row_group(spark, tmp_path):
    """The cliff shape: a file whose PLANNED split count exceeds the
    threshold but whose real split count is 1 must still repartition."""
    p = str(tmp_path / "big.parquet")
    _write(p, 150_000, row_group_size=1_000_000, text_len=300)
    df = spark.read.parquet(p)
    planned = df.rdd.getNumPartitions()
    assert planned >= 4  # the old count-only heuristic would skip
    out = spread(df, parallelism=8)
    assert out.rdd.getNumPartitions() == 8


def test_spread_noop_when_scan_is_parallel(spark, tmp_path):
    p = str(tmp_path / "split.parquet")
    _write(p, 150_000, row_group_size=10_000, text_len=300)  # 15 row groups
    df = spark.read.parquet(p)
    assert df.rdd.getNumPartitions() >= 4
    out = spread(df, parallelism=8)
    # enough real splits: no exchange added
    assert "Exchange" not in out._jdf.queryExecution().optimizedPlan().toString()


def test_spread_pins_unsplittable_file_as_plan_barrier(spark, tmp_path, monkeypatch):
    """Round-8 regression: a repartition alone is DEFEATED for filtered
    consumers — Catalyst pushes deterministic filters through the
    exchange into the single real scan task. The cliff case (a BIG
    unsplittable file) must yield a checkpoint barrier: the consumer's
    filter stays ABOVE a balanced ExistingRDD scan instead of fusing
    into the serial file scan."""
    from pyspark.sql import functions as F

    from meilisync_spark.sources import parquet as P

    monkeypatch.setattr(P, "SPREAD_PIN_MIN_BYTES", 1024 * 1024)
    p = str(tmp_path / "cliff.parquet")
    _write(p, 150_000, row_group_size=1_000_000, text_len=300)
    df = spark.read.parquet(p)
    out = spread(df, parallelism=8)
    filtered = out.where(F.length("text") > 10)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan  # the pin is the scan
    assert "Scan parquet" not in plan  # no second scan of the file
    # the filter executes over the checkpoint's 8 partitions, not the
    # file's single real split
    assert filtered.rdd.getNumPartitions() == 8


def test_spread_pin_cache_shares_across_calls(spark, tmp_path, monkeypatch):
    """Back-to-back queries over the same pathological file must share
    ONE pin (the LRU cache), not accumulate block-manager copies."""
    from meilisync_spark.sources import parquet as P

    monkeypatch.setattr(P, "SPREAD_PIN_MIN_BYTES", 1024 * 1024)
    p = str(tmp_path / "cached.parquet")
    _write(p, 150_000, row_group_size=1_000_000, text_len=300)
    a = spread(spark.read.parquet(p), parallelism=8)
    b = spread(spark.read.parquet(p), parallelism=8)
    assert a is b
    # a different column subset is a different pin (schema differs)
    c = spread(spark.read.parquet(p).select("doc_id"), parallelism=8)
    assert c is not a


def test_spread_small_unsplittable_file_repartitions_without_pin(spark, tmp_path):
    """Below the ~64 MB cliff floor a serial scan is cheap: spread must
    use the plain exchange (no eager checkpoint job, parquet scan kept
    so pruning/pushdown still reach the file)."""
    p = str(tmp_path / "small.parquet")
    _write(p, 50_000, row_group_size=1_000_000)
    out = spread(spark.read.parquet(p), parallelism=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan
    assert out.rdd.getNumPartitions() == 8


def test_spread_pin_cache_distinguishes_filtered_frames(spark, tmp_path, monkeypatch):
    """ADVICE r8 (medium): a filter preserves the column list, so a
    (files, columns) cache key would hand spread(df.where(...)) the
    UNFILTERED pin — silent wrong results. The canonicalized-plan
    digest in the key must keep them apart."""
    from pyspark.sql import functions as F

    from meilisync_spark.sources import parquet as P

    monkeypatch.setattr(P, "SPREAD_PIN_MIN_BYTES", 1024 * 1024)
    p = str(tmp_path / "filtered.parquet")
    _write(p, 150_000, row_group_size=1_000_000, text_len=300)
    full = spread(spark.read.parquet(p), parallelism=8)
    part = spread(
        spark.read.parquet(p).where(F.col("doc_id") < 1000), parallelism=8
    )
    assert part is not full
    assert part.count() == 1000
    assert full.count() == 150_000


def test_spread_pin_cache_invalidates_on_file_overwrite(spark, tmp_path, monkeypatch):
    """ADVICE r8 (medium): overwriting the file in place mid-session
    must not keep serving the stale pin — (mtime_ns, size) is in the
    key."""
    import os as _os

    from meilisync_spark.sources import parquet as P

    monkeypatch.setattr(P, "SPREAD_PIN_MIN_BYTES", 1024 * 1024)
    p = str(tmp_path / "overwrite.parquet")
    _write(p, 150_000, row_group_size=1_000_000, text_len=300)
    a = spread(spark.read.parquet(p), parallelism=8)
    assert a.count() == 150_000
    _write(p, 140_000, row_group_size=1_000_000, text_len=300)
    # bump mtime defensively: same-second rewrites are resolved by
    # st_mtime_ns on this fs, but make the test airtight
    st = _os.stat(p)
    _os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    b = spread(spark.read.parquet(p), parallelism=8)
    assert b is not a
    assert b.count() == 140_000
