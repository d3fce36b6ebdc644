"""Size-tiered per-directory compaction (operators/maintenance.py):
rows and partition pruning must survive every swap bit-for-bit; file
counts must drop and stay bounded; crash windows must heal."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meilisync_spark.operators import maintenance as M


def _append_batches(spark, path, n_batches, rows_per_batch, partitioned):
    for b in range(n_batches):
        df = spark.range(b * rows_per_batch, (b + 1) * rows_per_batch).select(
            F.col("id"), (F.col("id") % 4).alias("hb"),
            F.concat(F.lit("doc-"), F.col("id")).alias("text"),
        )
        w = df.repartition(F.col("hb")).write.mode("append")
        if partitioned:
            w = w.partitionBy("hb")
        w.parquet(path)


def _rows(spark, path):
    df = spark.read.parquet(path)
    return sorted(tuple(str(v) for v in r) for r in
                  df.select(*sorted(df.columns)).collect())


def test_tier_boundaries():
    f = M.TIER_FLOOR_BYTES
    assert M._tier(0) == 0
    assert M._tier(f) == 0
    assert M._tier(f * M.TIER_FACTOR - 1) == 0
    assert M._tier(f * M.TIER_FACTOR) == 1
    assert M._tier(f * M.TIER_FACTOR**2) == 2


def test_compaction_preserves_rows_and_pruning(spark, tmp_path):
    path = os.path.join(tmp_path, "idx")
    _append_batches(spark, path, n_batches=12, rows_per_batch=40,
                    partitioned=True)
    before = _rows(spark, path)
    n_before = M.table_file_count(path)
    stats = M.compact_small_files(spark, path)
    assert stats["dirs_compacted"] == 4  # every hb= dir had ≥8 tier-0 files
    assert stats["files_removed"] > 0
    n_after = M.table_file_count(path)
    assert n_after < n_before
    assert _rows(spark, path) == before
    # partition dirs are now symlinks; pruning still plans on hb=
    pruned = spark.read.parquet(path).where(F.col("hb") == 2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert {r[0] for r in pruned.select("hb").distinct().collect()} == {2}
    # appends through the symlinked dirs still land and read back
    _append_batches(spark, path, n_batches=1, rows_per_batch=40,
                    partitioned=True)
    assert len(_rows(spark, path)) == len(before) + 40


def test_compaction_converges_and_is_idempotent(spark, tmp_path):
    path = os.path.join(tmp_path, "idx")
    _append_batches(spark, path, n_batches=9, rows_per_batch=20,
                    partitioned=True)
    before = _rows(spark, path)
    M.compact_small_files(spark, path)
    first = M.table_file_count(path)
    # second pass: tier-1 outputs are below TIER_FILES per tier → no-op
    stats = M.compact_small_files(spark, path)
    assert stats["dirs_compacted"] == 0
    assert M.table_file_count(path) == first
    assert _rows(spark, path) == before
    # keep appending + compacting: the SECOND swap of a dir takes the
    # atomic symlink-replace path; rows always intact
    for _ in range(3):
        _append_batches(spark, path, n_batches=8, rows_per_batch=20,
                        partitioned=True)
        M.compact_small_files(spark, path)
    assert M.table_file_count(path) <= first + 4 * 3  # bounded, not linear
    total = 9 * 20 + 3 * 8 * 20
    assert len(_rows(spark, path)) == total


def test_flat_layout_compaction(spark, tmp_path):
    path = os.path.join(tmp_path, "flat")
    _append_batches(spark, path, n_batches=10, rows_per_batch=30,
                    partitioned=False)
    before = _rows(spark, path)
    n_before = M.table_file_count(path)
    M.compact_small_files(spark, path)
    assert M.table_file_count(path) < n_before
    assert _rows(spark, path) == before
    assert os.path.islink(path.rstrip("/")) or os.path.islink(path)


def test_stop_bytes_files_never_touched(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(M, "STOP_BYTES", 1)  # everything is "done"
    path = os.path.join(tmp_path, "idx")
    _append_batches(spark, path, n_batches=10, rows_per_batch=20,
                    partitioned=True)
    stats = M.compact_small_files(spark, path)
    assert stats["dirs_compacted"] == 0
    assert stats["files_removed"] == 0


def test_max_dirs_bounds_one_invocation(spark, tmp_path):
    path = os.path.join(tmp_path, "idx")
    _append_batches(spark, path, n_batches=9, rows_per_batch=40,
                    partitioned=True)
    before = _rows(spark, path)
    stats = M.compact_small_files(spark, path, max_dirs=2)
    assert stats["dirs_compacted"] == 2
    assert _rows(spark, path) == before
    stats = M.compact_small_files(spark, path, max_dirs=None)
    assert stats["dirs_compacted"] == 2  # the remaining two picked up
    assert _rows(spark, path) == before


def test_heal_restores_crash_window(spark, tmp_path):
    path = os.path.join(tmp_path, "idx")
    _append_batches(spark, path, n_batches=9, rows_per_batch=20,
                    partitioned=True)
    before = _rows(spark, path)
    # simulate the first-conversion crash: dir renamed away, symlink
    # never created
    victim = os.path.join(path, "hb=1")
    os.rename(victim, os.path.join(path, ".hb=1.olddeadbeef"))
    assert len(_rows(spark, path)) < len(before)
    assert M.heal_partition_dirs(path) == 1
    assert _rows(spark, path) == before
    # orphaned version/build dirs are swept
    os.makedirs(os.path.join(path, ".hb=2.vdeadbeef"))
    os.makedirs(os.path.join(path, ".hb=2.bdeadbeef-0"))
    M.heal_partition_dirs(path)
    assert not os.path.exists(os.path.join(path, ".hb=2.vdeadbeef"))
    assert not os.path.exists(os.path.join(path, ".hb=2.bdeadbeef-0"))
    assert _rows(spark, path) == before


def test_heal_keeps_live_version_dirs(spark, tmp_path):
    path = os.path.join(tmp_path, "idx")
    _append_batches(spark, path, n_batches=9, rows_per_batch=20,
                    partitioned=True)
    before = _rows(spark, path)
    M.compact_small_files(spark, path)
    assert M.heal_partition_dirs(path) == 0
    assert _rows(spark, path) == before


def test_ingest_with_cadence_matches_without(spark, tmp_path, monkeypatch):
    """End-to-end: the corpus-ingest owner with the cadence on produces
    the SAME corpus as with it off — duplicates included in the feed —
    and a lower file count. The bloom sidecars stay consistent across
    swaps (keys, not files)."""
    from meilisync_spark.streaming.corpus_ingest import run_corpus_ingest

    monkeypatch.setattr(M, "TIER_FILES", 3)  # 6 batches must trigger merges

    feed = os.path.join(tmp_path, "feed")
    for b in range(6):
        lo = b * 50
        body = F.concat(
            F.lit("the quick brown fox variant "),
            F.col("id") % 130,
            F.lit(" jumps over the lazy dog and keeps running onward"),
        )
        docs = spark.range(lo, lo + 50).select(
            F.col("id").alias("doc_id"),
            body.alias("text"),
            F.lit("en").alias("lang"),
            F.lit("src").alias("source"),
            F.length(body).cast("long").alias("n_chars"),
        )
        docs.coalesce(1).write.mode("append").parquet(feed)

    outs = {}
    for label, every in (("on", 2), ("off", 0)):
        idx = os.path.join(tmp_path, f"idx_{label}")
        ck = os.path.join(tmp_path, f"ck_{label}")
        run_corpus_ingest(
            spark, feed, idx, ck,
            near_dedup=True, max_files_per_trigger=1,
            compact_every=every, timeout_sec=300.0,
        )
        df = spark.read.parquet(idx)
        outs[label] = sorted(
            tuple(str(v) for v in r)
            for r in df.select("doc_id", "content_hash").collect()
        )
        outs[label + "_files"] = M.table_file_count(idx) + M.table_file_count(
            idx + "_bands"
        )
    assert outs["on"] == outs["off"]
    assert outs["on_files"] < outs["off_files"]


def test_ann_ingest_cadence_preserves_serving(spark, tmp_path, monkeypatch):
    """The ANN owner's cadence: compacted cluster= dirs still serve —
    stored codes identical, query recall unchanged — and the file
    count drops vs. the appends alone."""
    import glob

    from meilisync_spark.operators import pq as pq_mod
    from meilisync_spark.operators.ivfpq import query_index, save_index
    from meilisync_spark.operators.similarity import (
        _recall_against_brute,
        clustered_embeddings,
    )
    from meilisync_spark.sources.parquet import load_table
    from meilisync_spark.streaming.ann_ingest import run_ann_ingest
    from tests.conftest import SF_SMOKE

    monkeypatch.setattr(M, "TIER_FILES", 2)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    ce = clustered_embeddings(emb).localCheckpoint(False)
    index = str(tmp_path / "ann")
    save_index(ce.where(F.col("vec_id") % 4 != 3), index)

    drop = str(tmp_path / "incoming")
    os.makedirs(drop)
    for i, m in enumerate((3, 7)):
        out = str(tmp_path / f"stage_{i}")
        ce.where(F.col("vec_id") % 8 == m).select(
            "vec_id", "embedding"
        ).coalesce(1).write.parquet(out)
        part = glob.glob(f"{out}/part-*.parquet")[0]
        os.rename(part, f"{drop}/batch_{i}.parquet")
    run_ann_ingest(
        spark, drop, index, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, compact_every=1,
    )
    stored = spark.read.parquet(index)
    rows = sorted(r.vec_id for r in stored.select("vec_id").collect())
    assert len(rows) == len(set(rows))  # dedup survived the swaps
    qs = [
        (r.vec_id, list(r.embedding))
        for r in ce.where(f"vec_id < {pq_mod.N_QUERIES}").collect()
    ]
    topk = query_index(spark, index, qs, k=5, refine=ce)
    rec = _recall_against_brute(ce, topk, 5)
    mean = sum(r.recall for r in rec.collect()) / pq_mod.N_QUERIES
    assert mean >= 0.99, mean
    # compaction actually ran: some cluster dirs are now symlinks
    real = os.path.realpath(index)
    assert any(
        os.path.islink(os.path.join(real, e))
        for e in os.listdir(real)
        if e.startswith("cluster=")
    )


def test_driver_merge_preserves_rich_types(spark, tmp_path):
    """Small merge groups go through the driver-side pyarrow path —
    timestamps, decimals, arrays, binary and NULLs must round-trip
    bit-exactly into Spark's reader."""
    path = os.path.join(tmp_path, "rich")
    for b in range(9):
        df = spark.range(b * 10, (b + 1) * 10).select(
            F.col("id"), (F.col("id") % 2).alias("hb"),
            F.timestamp_seconds(F.col("id") * 1000 + 7).alias("ts"),
            (F.col("id").cast("decimal(12,2)") / 7).alias("dec"),
            F.array(F.col("id"), F.col("id") * 2).alias("arr"),
            F.when(F.col("id") % 3 == 0, F.encode(F.concat(
                F.lit("b"), F.col("id")), "utf-8")).alias("bin"),
            F.when(F.col("id") % 4 == 0, F.col("id").cast("string"))
            .alias("maybe_null"),
        )
        df.repartition(F.col("hb")).write.mode("append").partitionBy(
            "hb"
        ).parquet(path)
    before = _rows(spark, path)
    stats = M.compact_small_files(spark, path)
    assert stats["dirs_compacted"] == 2
    assert _rows(spark, path) == before


def test_spark_merge_path_still_exact(spark, tmp_path, monkeypatch):
    """Forcing every group onto the Spark merge path (driver budget 0)
    produces the same rows as the pyarrow path."""
    monkeypatch.setattr(M, "DRIVER_MERGE_BYTES", 0)
    path = os.path.join(tmp_path, "sparkpath")
    _append_batches(spark, path, n_batches=9, rows_per_batch=20,
                    partitioned=True)
    before = _rows(spark, path)
    stats = M.compact_small_files(spark, path)
    assert stats["dirs_compacted"] == 4
    assert _rows(spark, path) == before
