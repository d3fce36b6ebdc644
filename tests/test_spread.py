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
