"""Size-tiered per-directory compaction (operators/maintenance.py):
rows and partition pruning must survive every swap bit-for-bit; file
counts must drop and stay bounded; crash windows must heal."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meilisync_spark.operators import maintenance as M


@pytest.fixture(autouse=True)
def _no_sweep_grace(monkeypatch):
    """Most tests here assert the sweep MECHANISM (what gets removed,
    what survives), so the wall-clock grace window is zeroed; the
    grace itself is pinned by test_sweep_grace_is_wall_clock."""
    monkeypatch.setattr(M, "SWEEP_GRACE_SECONDS", 0.0)


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
    os.rename(victim, os.path.join(path, ".hb=1.olddeadbeefdead"))
    assert len(_rows(spark, path)) < len(before)
    assert M.heal_partition_dirs(path) == 1
    assert _rows(spark, path) == before
    # orphaned version/build dirs are swept
    os.makedirs(os.path.join(path, ".hb=2.vdeadbeefdead"))
    os.makedirs(os.path.join(path, ".hb=2.bdeadbeefdead-0"))
    M.heal_partition_dirs(path)
    assert not os.path.exists(os.path.join(path, ".hb=2.vdeadbeefdead"))
    assert not os.path.exists(os.path.join(path, ".hb=2.bdeadbeefdead-0"))
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

def test_swap_defers_old_dir_deletion(spark, tmp_path):
    """ADVICE r10 (medium): a reader that listed a partition before the
    swap must be able to finish its scan — the superseded directory
    survives the swapping tick and is removed on the NEXT one."""
    path = os.path.join(tmp_path, "idx")
    _append_batches(spark, path, n_batches=9, rows_per_batch=20,
                    partitioned=True)
    M.compact_small_files(spark, path)  # one-time dir→symlink conversion
    _append_batches(spark, path, n_batches=8, rows_per_batch=20,
                    partitioned=True)
    # a concurrent reader's pre-swap listing of one partition dir
    # (resolved through the live version dir, as Spark's file index
    # does)
    pre_swap = [
        os.path.join(os.path.realpath(os.path.join(path, "hb=0")), e)
        for e in os.listdir(os.path.realpath(os.path.join(path, "hb=0")))
        if e.endswith(".parquet")
    ]
    before = _rows(spark, path)
    stats = M.compact_small_files(spark, path)
    assert stats["dirs_compacted"] == 4
    # the old file set is still on disk: the reader's scan completes
    assert all(os.path.exists(p) for p in pre_swap)
    got = sorted(
        tuple(str(v) for v in r)
        for r in spark.read.parquet(*pre_swap).selectExpr(
            "'0' as hb", "id", "text"
        ).collect()
    )
    assert got == [r for r in before if r[0] == "0"]
    # next tick sweeps the superseded version dirs
    M.compact_small_files(spark, path)
    assert not all(os.path.exists(p) for p in pre_swap)
    assert _rows(spark, path) == before


def test_orphan_sweep_spares_foreign_hidden_dirs(spark, tmp_path):
    """ADVICE r10: only the module's own generated shapes are swept —
    a user's '.data.backup' or '.corpus.v2-manual' stash survives both
    heal and the cadence tick."""
    path = os.path.join(tmp_path, "idx")
    _append_batches(spark, path, n_batches=9, rows_per_batch=20,
                    partitioned=True)
    foreign = [
        os.path.join(path, ".data.backup"),
        os.path.join(path, ".corpus.v2-manual"),
        os.path.join(path, ".hb=1.old-notes"),  # not a 12-hex tag
    ]
    for d in foreign:
        os.makedirs(d)
        with open(os.path.join(d, "keep.txt"), "w") as fh:
            fh.write("precious")
    M.heal_partition_dirs(path)
    M.compact_small_files(spark, path)
    M.compact_small_files(spark, path)
    for d in foreign:
        assert os.path.isfile(os.path.join(d, "keep.txt")), d


def test_foreign_all_digit_tags_survive(spark, tmp_path):
    """ADVICE r11: an all-digit suffix is valid 12-hex, so shape alone
    can't prove module ownership. A '.backup.old199912312359' with no
    parquet inside is neither renamed visible by heal nor swept; a
    '.stash.v199912312359' with no visible 'stash' sibling survives
    the sweep."""
    path = os.path.join(tmp_path, "idx")
    _append_batches(spark, path, n_batches=9, rows_per_batch=20,
                    partitioned=True)
    foreign_old = os.path.join(path, ".backup.old199912312359")
    foreign_v = os.path.join(path, ".stash.v199912312359")
    foreign_b = os.path.join(path, ".stash2.b199912312359-0")
    for d in (foreign_old, foreign_v, foreign_b):
        os.makedirs(d)
        with open(os.path.join(d, "keep.txt"), "w") as fh:
            fh.write("precious")
    assert M.heal_partition_dirs(path) == 0
    assert not os.path.exists(os.path.join(path, "backup"))
    M.compact_small_files(spark, path)
    for d in (foreign_old, foreign_v, foreign_b):
        assert os.path.isfile(os.path.join(d, "keep.txt")), d


def test_stale_swap_temp_link_is_unlinked(spark, tmp_path):
    """ADVICE r11: a crashed os.replace leaves '.{name}.l<tag>' behind;
    one pointing at the CURRENTLY-live version dir used to dodge the
    live_targets check forever. It is staging garbage, never a data
    source — unlinked unconditionally."""
    path = os.path.join(tmp_path, "idx")
    _append_batches(spark, path, n_batches=9, rows_per_batch=20,
                    partitioned=True)
    before = _rows(spark, path)
    M.compact_small_files(spark, path)  # hb= dirs now symlinks
    live_target = os.path.realpath(os.path.join(path, "hb=1"))
    stale = os.path.join(path, ".hb=1.lfeedfacecafe")
    os.symlink(live_target, stale)
    M.compact_small_files(spark, path)
    assert not os.path.lexists(stale)
    assert _rows(spark, path) == before  # live dir untouched


def test_sweep_grace_is_wall_clock(spark, tmp_path, monkeypatch):
    """ADVICE r11: with compact_every=1 a tick is ~seconds, so the
    grace is wall-clock, not tick count — a freshly superseded version
    dir survives ANY number of ticks inside the window and is swept
    only once it ages past SWEEP_GRACE_SECONDS."""
    monkeypatch.setattr(M, "SWEEP_GRACE_SECONDS", 3600.0)
    path = os.path.join(tmp_path, "idx")
    _append_batches(spark, path, n_batches=9, rows_per_batch=20,
                    partitioned=True)
    before = _rows(spark, path)
    M.compact_small_files(spark, path)
    superseded = [
        os.path.join(path, e) for e in os.listdir(path)
        if (m := M._VERSION_RE.fullmatch(e)) and m.group(2) == "old"
    ]
    assert superseded  # the pre-compaction .old dirs
    for _ in range(3):
        M.compact_small_files(spark, path)
    assert all(os.path.exists(p) for p in superseded)  # inside grace
    monkeypatch.setattr(M, "SWEEP_GRACE_SECONDS", 0.0)
    M.compact_small_files(spark, path)
    assert not any(os.path.exists(p) for p in superseded)
    assert _rows(spark, path) == before


def test_mixed_layout_counted_not_compacted(spark, tmp_path):
    """ADVICE r10: loose parquet beside partition subdirs (legacy
    flat+partitioned) — counted by the aging metric, excluded from the
    swap (which can't carry subtrees), and never crashes the tick."""
    path = os.path.join(tmp_path, "idx")
    _append_batches(spark, path, n_batches=9, rows_per_batch=20,
                    partitioned=True)
    # drop 9 loose files into the root, beside the hb= dirs
    loose_src = os.path.join(tmp_path, "loose")
    _append_batches(spark, loose_src, n_batches=9, rows_per_batch=5,
                    partitioned=False)
    k = 0
    for e in sorted(os.listdir(loose_src)):
        if e.endswith(".parquet"):
            os.rename(os.path.join(loose_src, e),
                      os.path.join(path, f"legacy-{k}.parquet"))
            k += 1
    n_with_loose = M.table_file_count(path)
    stats = M.compact_small_files(spark, path)
    assert stats["dirs_compacted"] == 4  # the hb= dirs, not the root
    assert M.table_file_count(path) < n_with_loose
    # the loose files and the partition subdirs both survive
    assert sum(
        1 for e in os.listdir(os.path.realpath(path))
        if e.startswith("legacy-")
    ) == k
    assert not os.path.islink(path)
    part_rows = [r for r in _rows(spark, os.path.join(path, "hb=2"))]
    assert len(part_rows) == 9 * 20 / 4


def test_threshold_trigger_is_per_directory(spark, tmp_path):
    """VERDICT r10 #5: the trigger is tier-0 count ≥ TIER_FILES per
    directory — a quiet tick is a pure no-op, and a hot directory
    compacts on the exact batch its tier fills, independent of other
    directories."""
    path = os.path.join(tmp_path, "idx")
    _append_batches(spark, path, n_batches=M.TIER_FILES - 1,
                    rows_per_batch=8, partitioned=True)
    stats = M.compact_small_files(spark, path)
    assert stats["dirs_compacted"] == 0  # below threshold everywhere
    # one more batch into ONE partition only → exactly that dir is due
    extra = spark.range(0, 8).select(
        F.col("id"), F.lit(3).alias("hb"),
        F.concat(F.lit("doc-"), F.col("id")).alias("text"),
    )
    extra.coalesce(1).write.mode("append").partitionBy("hb").parquet(path)
    stats = M.compact_small_files(spark, path)
    assert stats["dirs_compacted"] == 1
