"""Sharded Bloom sidecar: one-sided error across shards, the
cap-crossing conversion, growth with fpp held under target, the
shared-log crash-ordering lessons, and JVM/numpy shard agreement."""
from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from meilisync_spark.functions import bloom as B
from meilisync_spark.functions import bloom_sharded as BS


def _keys(spark, lo, hi, parts=4):
    return spark.range(lo, hi, 1, parts).select(
        F.col("id").alias("a"), (F.col("id") * 13 + 5).alias("b")
    )


def _fresh_sharded(spark, prefix, n_shards=4, nbits=1 << 14):
    metas = BS._rebuild_shards(
        None, ["a", "b"], n_shards, nbits, prefix,
        np.empty((0, 2), dtype=np.int64),
    )
    sb = BS.ShardedBloom(prefix, metas, np.empty((0, 2), dtype=np.int64))
    sb._write_manifest_and_clear_log()
    return sb


def test_shard_col_agrees_with_numpy(spark):
    df = _keys(spark, 0, 2000)
    n = 8
    rows = df.select(
        BS.shard_col(["a", "b"], n).alias("s"),
        *B.bloom_hash_cols(F.col("a"), F.col("b")),
    ).collect()
    h1 = np.array([r["_bh1"] for r in rows], dtype=np.int64)
    jvm = np.array([r["s"] for r in rows], dtype=np.int64)
    assert (BS._shard_of_np(h1, n) == jvm).all()


def test_power_of_two_required():
    with pytest.raises(ValueError, match="power of two"):
        BS.ShardedBloom("x", [None] * 3, np.empty((0, 2), dtype=np.int64))


def test_mark_no_false_negatives_and_rejects_fresh(spark, tmp_path):
    prefix = os.path.join(tmp_path, "idx")
    sb = _fresh_sharded(spark, prefix, n_shards=4, nbits=1 << 16)
    keys = _keys(spark, 0, 3000)
    sb.record_batch(keys, ["a", "b"], None, target_fpp=5e-4,
                    rebuild_bar=0.002)
    # trickle path: logged, mark covers via the delta bitmap
    assert sb.mark(keys, ["a", "b"]).where("NOT maybe_seen").count() == 0
    sb.fold_if_due(None, ["a", "b"], 5e-4, 0.002, force=True)
    assert len(sb.pairs) == 0
    # after the fold: covered via the per-shard memmap probes
    assert sb.mark(keys, ["a", "b"]).where("NOT maybe_seen").count() == 0
    back = BS.ShardedBloom.load(prefix)
    assert back.n_keys() == 3000
    assert back.mark(keys, ["a", "b"]).where("NOT maybe_seen").count() == 0
    fresh = _keys(spark, 100_000, 101_000)
    assert back.mark(fresh, ["a", "b"]).where("maybe_seen").count() <= 10


def test_growth_holds_fpp_under_target(spark, tmp_path):
    """The verdict's done-criterion: keys pushing past the rebuild bar
    trigger a (uniform) rebuild that lands projected_fpp back under
    the target, with every key still covered."""
    prefix = os.path.join(tmp_path, "grow")
    sb = _fresh_sharded(spark, prefix, n_shards=4, nbits=1 << 12)
    keys = _keys(spark, 0, 4000)
    # build the index the rebuild will read (rows land before growth)
    idx_path = os.path.join(tmp_path, "index")
    keys.write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    sb.append_df(keys, ["a", "b"])
    assert sb.projected_fpp() > 0.002  # 4k keys saturate 4x4096 bits
    sb.fold_if_due(index, ["a", "b"], target_fpp=5e-4, rebuild_bar=0.002,
                   force=True)
    assert sb.shards[0].n_bits > 1 << 12
    assert sb.projected_fpp() <= 5e-4 * 4  # pow-2 rounding headroom
    assert sb.mark(keys, ["a", "b"]).where("NOT maybe_seen").count() == 0


def test_bulk_batch_keeps_trickled_keys(spark, tmp_path, monkeypatch):
    """The r9 LoggedBloom lesson, sharded edition: a bulk batch with
    no growth still folds pre-existing log pairs before clearing."""
    monkeypatch.setattr(BS, "FOLD_KEYS", 1000)
    prefix = os.path.join(tmp_path, "bulk")
    sb = _fresh_sharded(spark, prefix, n_shards=4, nbits=1 << 18)
    trickled = _keys(spark, 0, 200)
    sb.record_batch(trickled, ["a", "b"], None, 5e-4, 0.002)
    assert len(sb.pairs) == 200
    bulk = _keys(spark, 10_000, 12_000)
    sb.record_batch(bulk, ["a", "b"], None, 5e-4, 0.002)
    assert len(sb.pairs) == 0
    back = BS.ShardedBloom.load(prefix)
    assert back.mark(trickled, ["a", "b"]).where("NOT maybe_seen").count() == 0
    assert back.mark(bulk, ["a", "b"]).where("NOT maybe_seen").count() == 0


def test_convert_from_logged_covers_main_and_log(spark, tmp_path,
                                                 monkeypatch):
    """Cap-crossing conversion: index keys (in the logged main) AND
    trickled log keys stay covered; the logged main file is retired;
    the load cache serves the sharded form afterward."""
    prefix = os.path.join(tmp_path, "conv")
    idx_keys = _keys(spark, 0, 2000)
    idx_path = os.path.join(tmp_path, "index")
    idx_keys.write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    main = B.build_from_df(index, ["a", "b"], n_bits=1 << 14)
    lb = B.LoggedBloom.from_main(prefix, main)
    logged_keys = _keys(spark, 5000, 5200)
    lb.append_df(logged_keys, ["a", "b"])

    sb = BS.ShardedBloom.convert_from_logged(
        lb, index, ["a", "b"], target_fpp=5e-4
    )
    assert not os.path.exists(B.LoggedBloom._main_path(prefix))
    assert BS.ShardedBloom.exists(prefix)
    # NOTE: the log keys' rows are NOT in the index — conversion must
    # still cover them (they came through logged.pairs)
    for keys in (idx_keys, logged_keys):
        assert sb.mark(keys, ["a", "b"]).where("NOT maybe_seen").count() == 0
    again = BS.ShardedBloom.load_cached(prefix)
    assert again is sb


def test_load_bloom_converts_at_cap(spark, tmp_path, monkeypatch):
    """The owner's integration: a LoggedBloom saturated AT the bitmap
    cap converts to sharded on load (the pre-r10 behavior was to run
    saturated forever)."""
    from meilisync_spark.streaming import corpus_ingest as CI

    orig = B.size_for

    def capped(n_keys, fpp=0.01, floor_bits=1 << 12, cap_bits=1 << 14):
        return orig(n_keys, fpp, floor_bits=min(floor_bits, 1 << 12),
                    cap_bits=1 << 14)

    monkeypatch.setattr(B, "size_for", capped)
    monkeypatch.setattr(BS, "size_for", capped)

    prefix = os.path.join(tmp_path, "atcap")
    keys = _keys(spark, 0, 4000)
    idx_path = os.path.join(tmp_path, "index")
    keys.write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    # main at the (patched) cap and saturated: 4000 keys in 2^14 bits
    main = B.build_from_df(index, ["a", "b"], n_bits=1 << 14)
    B.LoggedBloom.from_main(prefix, main)
    assert main.projected_fpp() > CI.BLOOM_REBUILD_FPP

    got = CI._load_bloom(prefix, index, ["a", "b"], True)
    assert isinstance(got, BS.ShardedBloom)
    assert got.mark(keys, ["a", "b"]).where("NOT maybe_seen").count() == 0
    # subsequent loads serve the sharded form from the cache
    again = CI._load_bloom(prefix, index, ["a", "b"], True)
    assert isinstance(again, BS.ShardedBloom)
    # disabled path removes the sharded parts too
    assert CI._load_bloom(prefix, index, ["a", "b"], False) is None
    assert not BS.ShardedBloom.exists(prefix)


def test_ingest_with_sharded_sidecars_matches_logged(spark, tmp_path):
    """End-to-end owner run with the sidecars pre-converted to the
    sharded form: identical corpus (duplicates dropped identically)
    vs. the logged-form run."""
    from meilisync_spark.streaming.corpus_ingest import run_corpus_ingest

    feed = os.path.join(tmp_path, "feed")
    for b in range(4):
        lo = b * 60
        body = F.concat(
            F.lit("sharded sidecar exercise variant "),
            F.col("id") % 90,
            F.lit(" with enough running words to form shingles"),
        )
        docs = spark.range(lo, lo + 60).select(
            F.col("id").alias("doc_id"), body.alias("text"),
            F.lit("en").alias("lang"), F.lit("src").alias("source"),
            F.length(body).cast("long").alias("n_chars"),
        )
        docs.coalesce(1).write.mode("append").parquet(feed)

    outs = {}
    for label in ("logged", "sharded"):
        idx = os.path.join(tmp_path, f"idx_{label}")
        ck = os.path.join(tmp_path, f"ck_{label}")
        if label == "sharded":
            # pre-seed empty sharded sidecars so _load_bloom picks the
            # sharded branch from the first batch
            for suffix in ("", "_bands"):
                _fresh_sharded(spark, idx + suffix, n_shards=4,
                               nbits=1 << 16)
        run_corpus_ingest(
            spark, feed, idx, ck, near_dedup=True,
            max_files_per_trigger=1, compact_every=0, timeout_sec=300.0,
        )
        df = spark.read.parquet(idx)
        outs[label] = sorted(
            tuple(str(v) for v in r)
            for r in df.select("doc_id", "content_hash").collect()
        )
        if label == "sharded":
            assert BS.ShardedBloom.exists(idx)  # still the active form
    assert outs["sharded"] == outs["logged"]

def test_load_bloom_manifest_vanished_falls_back(spark, tmp_path,
                                                 monkeypatch):
    """ADVICE r10: ShardedBloom.load_cached can return None when the
    manifest vanishes between exists() and load (out-of-band removal);
    _load_bloom must fall through to the LoggedBloom path, not raise
    AttributeError."""
    from meilisync_spark.streaming import corpus_ingest as CI

    prefix = os.path.join(tmp_path, "idx")
    monkeypatch.setattr(BS.ShardedBloom, "exists",
                        classmethod(lambda cls, p: True))
    monkeypatch.setattr(BS.ShardedBloom, "load_cached",
                        classmethod(lambda cls, p: None))
    out = CI._load_bloom(prefix, None, ["a"], True)
    assert isinstance(out, B.LoggedBloom)


def test_rebuild_task_memory_bound_by_shard_groups(spark, tmp_path,
                                                   monkeypatch):
    """ADVICE r10: near the per-shard cap a single task would allocate
    n_shards × nbits/8 — rebuilds must process shards in sub-groups so
    one task's bitmaps stay within REBUILD_TASK_BYTES. Forcing a tiny
    budget exercises the multi-pass path; the result must stay
    one-sided (no false negatives) and byte-identical to the
    single-pass build."""
    nbits = 1 << 14
    n_shards = 8
    # budget fits exactly 2 shard bitmaps per task → 4 passes
    monkeypatch.setattr(B, "REBUILD_TASK_BYTES", 2 * (nbits // 8))
    keys = _keys(spark, 0, 5000)
    multi = BS._collect_shard_parts(keys, ["a", "b"], n_shards, nbits)
    monkeypatch.setattr(B, "REBUILD_TASK_BYTES", 8 << 30)
    single = BS._collect_shard_parts(keys, ["a", "b"], n_shards, nbits)

    def _finalize(parts):
        out = {}
        for s, ps in parts.items():
            sc = B.BloomSidecar(n_bits=nbits)
            BS._or_parts_into(sc, ps)
            out[s] = (sc.bits.tobytes(), sc.n_added)
        return out

    assert _finalize(multi) == _finalize(single)
    # end-to-end through the public rebuild under the tiny budget
    monkeypatch.setattr(B, "REBUILD_TASK_BYTES", 2 * (nbits // 8))
    prefix = os.path.join(tmp_path, "grp")
    metas = BS._rebuild_shards(keys, ["a", "b"], n_shards, nbits, prefix,
                               np.empty((0, 2), dtype=np.int64))
    sb = BS.ShardedBloom(prefix, metas, np.empty((0, 2), dtype=np.int64))
    sb._write_manifest_and_clear_log()
    assert sb.mark(keys, ["a", "b"]).where("NOT maybe_seen").count() == 0


def test_load_bloom_converts_at_size_threshold(spark, tmp_path, monkeypatch):
    """VERDICT r11 #3: the conversion fires when the filter's
    RIGHT-size for its key count reaches SHARD_CONVERT_BITS — healthy
    fpp included — not only at cap saturation, so steady-state ingest
    never pays the in-memory probe tax. Keys-based on purpose: an
    oversized-but-sparse bitmap (LoggedBloom.fresh allocates
    DEFAULT_BITS regardless of keys) must NOT convert."""
    from meilisync_spark.functions.bloom import size_for
    from meilisync_spark.streaming import corpus_ingest as CI

    n = 300
    wanted = size_for(int(1.25 * n), fpp=CI.BLOOM_TARGET_FPP,
                      floor_bits=1 << 12)  # the trigger's floorless form
    monkeypatch.setattr(CI, "SHARD_CONVERT_BITS", wanted)
    prefix = os.path.join(tmp_path, "threshold")
    keys = _keys(spark, 0, n)
    idx_path = os.path.join(tmp_path, "index")
    keys.write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    # 300 keys in 2^14 bits: fpp is HEALTHY — only the size triggers
    main = B.build_from_df(index, ["a", "b"], n_bits=1 << 14)
    B.LoggedBloom.from_main(prefix, main)
    assert main.projected_fpp() < CI.BLOOM_REBUILD_FPP

    got = CI._load_bloom(prefix, index, ["a", "b"], True)
    assert isinstance(got, BS.ShardedBloom)
    # no false negatives across the conversion
    assert got.mark(keys, ["a", "b"]).where("NOT maybe_seen").count() == 0
    # the logged main file is retired
    assert not os.path.exists(B.LoggedBloom._main_path(prefix))

    # the non-trigger side: an EMPTY fresh sidecar (oversized default
    # bitmap, zero keys) stays logged under the production threshold
    prefix2 = os.path.join(tmp_path, "fresh")
    monkeypatch.setattr(CI, "SHARD_CONVERT_BITS", 1 << 26)
    fresh = B.LoggedBloom.fresh(prefix2)
    assert fresh.main.n_bits >= (1 << 26)  # oversized by default...
    got2 = CI._load_bloom(prefix2, None, ["a", "b"], True)
    assert isinstance(got2, B.LoggedBloom)  # ...but keys say no


def test_load_bloom_fresh_build_goes_sharded_past_threshold(
        spark, tmp_path, monkeypatch):
    """Bootstrapping a legacy index big enough that its right-sized
    bitmap would land past the threshold builds the sharded form
    directly (no throwaway giant single bitmap)."""
    from meilisync_spark.streaming import corpus_ingest as CI

    monkeypatch.setattr(CI, "SHARD_CONVERT_BITS", 1 << 13)
    prefix = os.path.join(tmp_path, "boot")
    keys = _keys(spark, 0, 3000)
    idx_path = os.path.join(tmp_path, "index")
    keys.write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    # no sidecar on disk; 3000 keys want far more than 2^13 bits
    got = CI._load_bloom(prefix, index, ["a", "b"], True)
    assert isinstance(got, BS.ShardedBloom)
    assert got.mark(keys, ["a", "b"]).where("NOT maybe_seen").count() == 0
    # below the threshold the fresh build stays logged
    prefix2 = os.path.join(tmp_path, "boot2")
    monkeypatch.setattr(CI, "SHARD_CONVERT_BITS", 1 << 30)
    got2 = CI._load_bloom(prefix2, index, ["a", "b"], True)
    assert isinstance(got2, B.LoggedBloom)
