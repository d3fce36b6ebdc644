"""Bloom sidecar × streaming near-dedup: semantics must be IDENTICAL
with the prefilter on or off (one-sided error + exact verify), the
sidecar (main bitmap + delta log) must never miss a stored key (the
false-negative hazard), and the legacy/off/saturated/fold paths must
all recover to that invariant."""
from __future__ import annotations

import glob
import os

import numpy as np

from meilisync_spark.functions import bloom as B
from meilisync_spark.streaming.corpus_ingest import (
    BAND_KEY,
    HASH_KEY,
    run_corpus_ingest,
)

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

A = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green turtles watch from a mossy stone bridge near the river "
    "and a cold wind moves slowly through the tall dry grass today"
)
NEAR_A = A.replace("cold wind", "warm wind")
OTHER = (
    "completely unrelated content about distributed query engines "
    "and shuffle partitioning strategies for very large clusters "
    "with adaptive execution and broadcast join planning decisions"
)


def _ship(spark, src, i, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src + f"/b{i}")
    part = glob.glob(src + f"/b{i}/part-*.parquet")[0]
    os.rename(part, src + f"/batch_{i}.parquet")


def _ingest(spark, tmp, name, **kw):
    src = str(tmp / f"{name}_in")
    idx = str(tmp / f"{name}_idx")
    ck = str(tmp / f"{name}_ck")
    os.makedirs(src, exist_ok=True)
    return src, idx, ck


def test_bloom_sidecar_exists_and_covers_every_stored_key(spark, tmp_path):
    src, idx, ck = _ingest(spark, tmp_path, "cov")
    _ship(spark, src, 0, [(1, A, "en", "s0", len(A))])
    _ship(spark, src, 1, [(3, OTHER, "en", "s1", len(OTHER))])
    run_corpus_ingest(spark, src, idx, ck, near_dedup=True,
                      max_files_per_trigger=1)
    bloom = B.LoggedBloom.load(idx + "_bands")
    assert bloom is not None
    # THE invariant: every key present in the band index tests positive
    marked = bloom.mark(
        spark.read.parquet(idx + "_bands").select(*BAND_KEY), BAND_KEY
    )
    assert marked.count() > 0
    assert marked.where("NOT maybe_seen").count() == 0
    # and the corpus index's own sidecar covers every stored hash
    cbloom = B.LoggedBloom.load(idx)
    assert cbloom is not None
    cmarked = cbloom.mark(
        spark.read.parquet(idx).select(*HASH_KEY), HASH_KEY
    )
    assert cmarked.count() > 0
    assert cmarked.where("NOT maybe_seen").count() == 0


def test_bloom_on_off_retention_identical(spark, tmp_path):
    """The A→B→C chain (B near A dropped, C near B but not A dropped via
    B's stored bands) retains exactly [1] both ways."""
    b = (A.replace("cold wind", "warm wind")
          .replace("mossy stone", "slick stone")
          .replace("dry grass", "wet grass"))
    c = b.replace("lazy dog", "idle dog")
    results = {}
    for flag in (True, False):
        src, idx, ck = _ingest(spark, tmp_path, f"eq_{flag}")
        _ship(spark, src, 0, [(1, A, "en", "s0", len(A))])
        _ship(spark, src, 1, [(2, b, "en", "s0", len(b))])
        _ship(spark, src, 2, [(3, c, "en", "s0", len(c))])
        run_corpus_ingest(spark, src, idx, ck, near_dedup=True,
                          bloom_prefilter=flag, max_files_per_trigger=1)
        results[flag] = sorted(
            r.doc_id for r in spark.read.parquet(idx).collect()
        )
    assert results[True] == results[False] == [1]
    # and only the bloom run leaves a sidecar
    assert B.LoggedBloom.load(str(tmp_path / "eq_True_idx") + "_bands") is not None
    assert B.LoggedBloom.load(str(tmp_path / "eq_False_idx") + "_bands") is None


def test_legacy_index_without_sidecar_rebuilds_and_blocks(spark, tmp_path):
    """An index built before the sidecar existed (bloom off) gains one
    on the next bloom-on batch — rebuilt from the band index, so the
    old batch's near-dups are still caught."""
    src, idx, ck = _ingest(spark, tmp_path, "legacy")
    _ship(spark, src, 0, [(1, A, "en", "s0", len(A))])
    run_corpus_ingest(spark, src, idx, ck, near_dedup=True,
                      bloom_prefilter=False, max_files_per_trigger=1)
    assert B.LoggedBloom.load(idx + "_bands") is None
    _ship(spark, src, 1, [(2, NEAR_A, "en", "s0", len(NEAR_A)),
                          (3, OTHER, "en", "s1", len(OTHER))])
    run_corpus_ingest(spark, src, idx, ck, near_dedup=True,
                      max_files_per_trigger=1)
    got = sorted(r.doc_id for r in spark.read.parquet(idx).collect())
    assert got == [1, 3]  # 2 dropped against batch-0's (pre-bloom) bands
    bloom = B.LoggedBloom.load(idx + "_bands")
    assert bloom is not None
    # the legacy rebuild persisted a main bitmap immediately
    assert os.path.exists(B.LoggedBloom._main_path(idx + "_bands"))
    marked = bloom.mark(
        spark.read.parquet(idx + "_bands").select(*BAND_KEY), BAND_KEY
    )
    assert marked.where("NOT maybe_seen").count() == 0


def test_all_ones_bloom_is_pure_overhead_not_wrong(spark, tmp_path):
    """False positives are the allowed error side: a fully saturated
    main filter (every test positive) must leave results exactly as
    without a filter — the exact probe decides."""
    src, idx, ck = _ingest(spark, tmp_path, "sat")
    _ship(spark, src, 0, [(1, A, "en", "s0", len(A))])
    run_corpus_ingest(spark, src, idx, ck, near_dedup=True,
                      max_files_per_trigger=1)
    lb = B.LoggedBloom.load(idx + "_bands")
    # saturate: every bit of the main bitmap set, counter untouched
    # (so no rebuild fires)
    lb.main.bits = np.full_like(lb.main.bits, 0xFF)
    lb.main.save(B.LoggedBloom._main_path(idx + "_bands"))
    _ship(spark, src, 1, [(2, NEAR_A, "en", "s0", len(NEAR_A)),
                          (3, OTHER, "en", "s1", len(OTHER))])
    run_corpus_ingest(spark, src, idx, ck, near_dedup=True,
                      max_files_per_trigger=1)
    got = sorted(r.doc_id for r in spark.read.parquet(idx).collect())
    assert got == [1, 3]


def test_bloom_off_removes_stale_sidecar_then_on_rebuilds(spark, tmp_path):
    """off-path deletes the sidecar (present ⟹ maintained); a later
    on-path batch rebuilds it covering the bands appended while off."""
    src, idx, ck = _ingest(spark, tmp_path, "toggle")
    _ship(spark, src, 0, [(1, OTHER, "en", "s1", len(OTHER))])
    run_corpus_ingest(spark, src, idx, ck, near_dedup=True,
                      max_files_per_trigger=1)
    assert B.LoggedBloom.load(idx + "_bands") is not None
    # batch 1 lands with the prefilter off: sidecar must go away, or a
    # re-enable would miss doc 4's bands (false negatives)
    _ship(spark, src, 1, [(4, A, "en", "s0", len(A))])
    run_corpus_ingest(spark, src, idx, ck, near_dedup=True,
                      bloom_prefilter=False, max_files_per_trigger=1)
    assert B.LoggedBloom.load(idx + "_bands") is None
    assert B.LoggedBloom.load(idx) is None  # corpus sidecar too
    # re-enable: near-dup of the while-off doc must still be dropped
    _ship(spark, src, 2, [(5, NEAR_A, "en", "s0", len(NEAR_A))])
    run_corpus_ingest(spark, src, idx, ck, near_dedup=True,
                      max_files_per_trigger=1)
    got = sorted(r.doc_id for r in spark.read.parquet(idx).collect())
    assert got == [1, 4]
    assert B.LoggedBloom.load(idx + "_bands") is not None


def test_crash_after_bloom_before_bands_is_false_positive_only(spark, tmp_path):
    """The extended crash order (bloom log → bands → corpus): simulate
    the new window by appending a batch's band keys to the sidecar log
    WITHOUT appending its rows, then replaying. The replayed doc must
    ingest normally — its bloom-positive bands find no index rows."""
    src, idx, ck = _ingest(spark, tmp_path, "crash")
    _ship(spark, src, 0, [(1, OTHER, "en", "s1", len(OTHER))])
    run_corpus_ingest(spark, src, idx, ck, near_dedup=True,
                      max_files_per_trigger=1)
    lb = B.LoggedBloom.load(idx + "_bands")
    from meilisync_spark.operators.dedup import lsh_bands, minhash_signatures

    doc2 = spark.createDataFrame([(2, A)], "doc_id long, text string")
    lb.append_df(lsh_bands(minhash_signatures(doc2)), BAND_KEY)
    # ← the crash point: log bits live, band rows never landed
    _ship(spark, src, 1, [(2, A, "en", "s0", len(A))])
    run_corpus_ingest(spark, src, idx, ck, near_dedup=True,
                      max_files_per_trigger=1)
    got = sorted(r.doc_id for r in spark.read.parquet(idx).collect())
    assert got == [1, 2]


def test_fold_moves_log_into_main_and_keeps_coverage(spark, tmp_path, monkeypatch):
    """Force FOLD_KEYS=1 so every batch folds: the log empties, the
    main bitmap carries the keys, coverage holds, and a near-dup of a
    pre-fold doc is still dropped."""
    monkeypatch.setattr(B, "FOLD_KEYS", 1)
    src, idx, ck = _ingest(spark, tmp_path, "fold")
    _ship(spark, src, 0, [(1, A, "en", "s0", len(A))])
    _ship(spark, src, 1, [(2, NEAR_A, "en", "s0", len(NEAR_A)),
                          (3, OTHER, "en", "s1", len(OTHER))])
    run_corpus_ingest(spark, src, idx, ck, near_dedup=True,
                      max_files_per_trigger=1)
    got = sorted(r.doc_id for r in spark.read.parquet(idx).collect())
    assert got == [1, 3]
    lb = B.LoggedBloom.load(idx + "_bands")
    assert lb is not None
    assert len(lb.pairs) == 0  # every batch folded
    assert lb.main.n_added > 0
    assert os.path.exists(B.LoggedBloom._main_path(idx + "_bands"))
    marked = lb.mark(
        spark.read.parquet(idx + "_bands").select(*BAND_KEY), BAND_KEY
    )
    assert marked.where("NOT maybe_seen").count() == 0
