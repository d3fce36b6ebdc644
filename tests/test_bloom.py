"""Bloom sidecar: the one-sided-error contract, persistence, the
distributed build == driver build equivalence, and sizing math."""
from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from meilisync_spark.functions import bloom as B


def _rand_hashes(n, seed):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64),
        rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64),
    )


def test_no_false_negatives_ever():
    bl = B.BloomSidecar(n_bits=1 << 16)
    h1, h2 = _rand_hashes(5000, 1)
    bl.add_hashes(h1, h2)
    assert bl.contains_hashes(h1, h2).all()


def test_fpp_sane_on_non_members():
    # 1000 keys in a 2^16-bit filter: m/n = 65 ⇒ fpp well under 1%
    bl = B.BloomSidecar(n_bits=1 << 16)
    h1, h2 = _rand_hashes(1000, 2)
    bl.add_hashes(h1, h2)
    q1, q2 = _rand_hashes(20000, 3)
    rate = bl.contains_hashes(q1, q2).mean()
    assert rate < 0.01, f"fpp {rate} too high for m/n=65"


def test_empty_filter_rejects_everything():
    bl = B.BloomSidecar(n_bits=1 << 12)
    q1, q2 = _rand_hashes(1000, 4)
    assert not bl.contains_hashes(q1, q2).any()
    assert bl.contains_hashes(np.array([], np.int64), np.array([], np.int64)).shape == (0,)


def test_save_load_roundtrip(tmp_path):
    bl = B.BloomSidecar(n_bits=1 << 14)
    h1, h2 = _rand_hashes(300, 5)
    bl.add_hashes(h1, h2)
    p = os.path.join(tmp_path, "idx_bloom.bin")
    bl.save(p)
    back = B.BloomSidecar.load(p)
    assert back is not None
    assert back.n_bits == bl.n_bits and back.k == bl.k
    assert back.n_added == 300
    assert (back.bits == bl.bits).all()
    assert back.contains_hashes(h1, h2).all()


def test_load_absent_is_none(tmp_path):
    assert B.BloomSidecar.load(os.path.join(tmp_path, "nope.bin")) is None


def test_load_corrupt_is_loud(tmp_path):
    p = os.path.join(tmp_path, "bad.bin")
    with open(p, "wb") as fh:
        fh.write(b'{"magic": "MLSBLOOM", "version": 1, "n_bits": 4096, "k": 7, "n_added": 1}\n')
        fh.write(b"short")
    with pytest.raises(ValueError, match="bitmap"):
        B.BloomSidecar.load(p)


def test_non_power_of_two_rejected():
    with pytest.raises(ValueError, match="power of two"):
        B.BloomSidecar(n_bits=1000)


def test_size_for_targets_one_percent():
    # 14M keys at 1%: the 2^27 default floor is exactly the design point
    assert B.size_for(1_000) == B.DEFAULT_BITS  # floor wins for small n
    big = B.size_for(100_000_000)
    assert big > B.DEFAULT_BITS and big & (big - 1) == 0
    assert B.size_for(10**12) == 1 << 33  # cap


def test_projected_fpp_monotone():
    bl = B.BloomSidecar(n_bits=1 << 16)
    f0 = bl.projected_fpp()
    h1, h2 = _rand_hashes(2000, 6)
    bl.add_hashes(h1, h2)
    assert bl.projected_fpp() > f0
    assert bl.projected_fpp(extra_keys=10_000) > bl.projected_fpp()


def test_distributed_build_equals_driver_build(spark):
    df = spark.range(0, 4000, 1, 8).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 101).alias("b")
    )
    dist = B.build_from_df(df, ["a", "b"], n_bits=1 << 16)
    drv = B.BloomSidecar(n_bits=1 << 16)
    B.add_df(drv, df, ["a", "b"])
    assert dist.n_added == drv.n_added == 4000
    assert (dist.bits == drv.bits).all()


def test_logged_bloom_append_load_mark_roundtrip(spark, tmp_path):
    prefix = os.path.join(tmp_path, "idx_bands")
    lb = B.LoggedBloom.fresh(prefix)
    keys = spark.range(0, 400, 1, 4).select(
        F.col("id").alias("a"), (F.col("id") * 3).alias("b")
    )
    lb.append_df(keys, ["a", "b"])
    # the log survives a reload (no main bitmap was ever written)
    back = B.LoggedBloom.load(prefix)
    assert back is not None and len(back.pairs) == 400
    assert back.mark(keys, ["a", "b"]).where("NOT maybe_seen").count() == 0
    fresh = spark.range(50_000, 50_400).select(
        F.col("id").alias("a"), (F.col("id") * 3).alias("b")
    )
    assert back.mark(fresh, ["a", "b"]).where("maybe_seen").count() <= 4


def test_logged_bloom_fold_grows_saturated_main(spark, tmp_path):
    prefix = os.path.join(tmp_path, "idx")
    # a deliberately tiny main so the log saturates it instantly
    lb = B.LoggedBloom(prefix, B.BloomSidecar(n_bits=1 << 12),
                       np.empty((0, 2), dtype=np.int64))
    keys = spark.range(0, 3000, 1, 4).select(
        F.col("id").alias("a"), (F.col("id") + 7).alias("b")
    )
    lb.append_df(keys, ["a", "b"])
    lb.fold_if_due(None, ["a", "b"], target_fpp=5e-4, rebuild_bar=0.002,
                   force=True)
    assert lb.main.n_bits > 1 << 12  # grew
    assert len(lb.pairs) == 0  # log folded away
    back = B.LoggedBloom.load(prefix)
    assert back.main.n_bits == lb.main.n_bits
    assert back.mark(keys, ["a", "b"]).where("NOT maybe_seen").count() == 0


def test_logged_bloom_bulk_batch_merges_distributed(spark, tmp_path, monkeypatch):
    """A batch at/over FOLD_KEYS takes the distributed path: delta
    bitmap built executor-side, OR-ed into main, log untouched-empty —
    and membership still covers every key."""
    monkeypatch.setattr(B, "FOLD_KEYS", 1000)
    prefix = os.path.join(tmp_path, "bulk")
    lb = B.LoggedBloom.fresh(prefix)
    keys = spark.range(0, 5000, 1, 8).select(
        F.col("id").alias("a"), (F.col("id") * 11).alias("b")
    )
    lb.record_batch(keys, ["a", "b"], None, target_fpp=5e-4,
                    rebuild_bar=0.002)
    assert len(lb.pairs) == 0
    assert lb.main.n_added == 5000
    assert os.path.exists(B.LoggedBloom._main_path(prefix))
    back = B.LoggedBloom.load(prefix)
    assert back.mark(keys, ["a", "b"]).where("NOT maybe_seen").count() == 0


def test_logged_bloom_remove_deletes_both_parts(spark, tmp_path):
    prefix = os.path.join(tmp_path, "idx")
    lb = B.LoggedBloom.fresh(prefix)
    keys = spark.range(0, 10).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    lb.append_df(keys, ["a", "b"])
    lb.main.save(B.LoggedBloom._main_path(prefix))
    assert B.LoggedBloom.load(prefix) is not None
    B.LoggedBloom.remove(prefix)
    assert B.LoggedBloom.load(prefix) is None


def test_maybe_contains_marks_members_and_rejects_fresh(spark):
    keys = spark.range(0, 500, 1, 4).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    bl = B.build_from_df(keys, ["a", "b"], n_bits=1 << 16)
    members = B.maybe_contains(keys, bl, ["a", "b"])
    assert members.where(~F.col("maybe_seen")).count() == 0
    fresh = spark.range(10_000, 10_500).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    marked = B.maybe_contains(fresh, bl, ["a", "b"])
    # one-sided: the occasional false positive is allowed, most must be
    # cleanly rejected at m/n = 131
    assert marked.where(F.col("maybe_seen")).count() <= 5
    # the original columns survive the map
    assert set(marked.columns) == {"a", "b", "maybe_seen"}


def test_bulk_batch_without_growth_keeps_trickled_keys(spark, tmp_path,
                                                       monkeypatch):
    """Regression (ADVICE r9, high): a bulk batch below the rebuild bar
    (grow=False) still must fold the PRE-EXISTING delta-log pairs into
    main before _save_main_and_clear_log deletes the log — otherwise
    keys trickled by earlier batches lose coverage (false negatives)."""
    monkeypatch.setattr(B, "FOLD_KEYS", 1000)
    prefix = os.path.join(tmp_path, "bulkng")
    lb = B.LoggedBloom.fresh(prefix)
    trickled = spark.range(0, 200, 1, 2).select(
        F.col("id").alias("a"), (F.col("id") * 5).alias("b")
    )
    lb.record_batch(trickled, ["a", "b"], None, target_fpp=5e-4,
                    rebuild_bar=0.002)
    assert len(lb.pairs) == 200  # trickle path: logged, main untouched
    # bulk batch, default 2^27-bit main → projected fpp ≪ bar → no grow
    bulk = spark.range(10_000, 12_000, 1, 4).select(
        F.col("id").alias("a"), (F.col("id") * 5).alias("b")
    )
    lb.record_batch(bulk, ["a", "b"], None, target_fpp=5e-4,
                    rebuild_bar=0.002)
    assert lb.main.n_bits == B.DEFAULT_BITS  # the no-growth branch ran
    assert len(lb.pairs) == 0  # log cleared
    # the trickled keys must still be covered, in-memory AND from disk
    assert lb.mark(trickled, ["a", "b"]).where("NOT maybe_seen").count() == 0
    back = B.LoggedBloom.load(prefix)
    assert back.mark(trickled, ["a", "b"]).where("NOT maybe_seen").count() == 0
    assert back.mark(bulk, ["a", "b"]).where("NOT maybe_seen").count() == 0


def test_load_cached_is_stat_cheap_and_invalidates(spark, tmp_path):
    """Steady-state reloads return the SAME instance (no bitmap file
    re-read); the writer's own mutations keep the cache current; an
    out-of-band file change forces a real reload."""
    prefix = os.path.join(tmp_path, "cached")
    keys = spark.range(0, 100, 1, 2).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    lb = B.LoggedBloom.fresh(prefix)
    lb.append_df(keys, ["a", "b"])  # refreshes the cache
    again = B.LoggedBloom.load_cached(prefix)
    assert again is lb  # identity: no reload happened
    # the writer's fold updates disk AND the cache token
    lb.fold_if_due(None, ["a", "b"], target_fpp=5e-4, rebuild_bar=0.002,
                   force=True)
    assert B.LoggedBloom.load_cached(prefix) is lb
    # out-of-band change (another writer / doctor rewrite): reload
    other = B.BloomSidecar(n_bits=1 << 14)
    other.save(B.LoggedBloom._main_path(prefix))
    reloaded = B.LoggedBloom.load_cached(prefix)
    assert reloaded is not lb
    assert reloaded.main.n_bits == 1 << 14
    B.LoggedBloom.remove(prefix)
    assert B.LoggedBloom.load_cached(prefix) is None


def test_fold_retokens_main_for_broadcast_reuse(spark, tmp_path):
    """After a fold the instance carries the NEW file's token (not
    None) so the next mark() caches its broadcast instead of
    re-shipping the bitmap every micro-batch."""
    prefix = os.path.join(tmp_path, "retoken")
    lb = B.LoggedBloom.fresh(prefix)
    keys = spark.range(0, 50).select(
        F.col("id").alias("a"), (F.col("id") + 2).alias("b")
    )
    lb.append_df(keys, ["a", "b"])
    lb.fold_if_due(None, ["a", "b"], target_fpp=5e-4, rebuild_bar=0.002,
                   force=True)
    assert lb._main_token is not None
    mp = B.LoggedBloom._main_path(prefix)
    st = os.stat(mp)
    assert lb._main_token == (mp, st.st_mtime_ns, st.st_size)
    assert lb.mark(keys, ["a", "b"]).where("NOT maybe_seen").count() == 0


def test_build_from_df_bounded_parallelism_is_exact(spark, monkeypatch):
    """With the per-task bitmap budget forcing a coalesce, the rebuild
    still produces the exact same bits as the driver-side build."""
    monkeypatch.setattr(B, "REBUILD_TASK_BYTES", (1 << 16) // 8 * 2)
    df = spark.range(0, 4000, 1, 16).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 101).alias("b")
    )
    dist = B.build_from_df(df, ["a", "b"], n_bits=1 << 16)
    drv = B.BloomSidecar(n_bits=1 << 16)
    B.add_df(drv, df, ["a", "b"])
    assert dist.n_added == 4000
    assert (dist.bits == drv.bits).all()
