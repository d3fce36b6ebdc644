"""Continuous corpus ingestion: streaming text intake with a quality
gate and cross-batch exact dedup against the corpus index.

The LLM-data twin of the CDC pipeline (streaming/pipeline.py): where
CDC folds *changes* into an index keyed by pk, corpus ingest folds
*documents* into an index keyed by content hash — first sighting wins,
later duplicates are dropped forever.

Per micro-batch (all O(batch), never O(corpus) work beyond one
hash-key probe):

1. content hash = sha256 of whitespace/case-normalized text (the same
   canonicalization as operators/dedup.exact_dedup, so the streaming
   result is comparable to the batch operator);
2. optional quality gate — operators/text.quality_filter's keep rule;
3. in-batch dedup: min doc_id per hash (deterministic, matches
   exact_dedup's canonical-id rule);
4. anti-join against the index's existing hashes. The index is
   hive-partitioned by ``hb = crc32(content_hash) % N`` and the probe
   reads ONLY the hash buckets present in the batch (partition pruning
   on the ``hb=`` directory key): a steady-state trickle batch touches
   a handful of buckets, so the seen-hash scan is bounded by touched
   buckets, not corpus size; a giant backfill batch touches all of
   them and degrades gracefully to the full (column-pruned) probe.
   Pre-bucketing flat indexes keep their layout (no mixed dirs).
   With ``near_dedup`` the band-index probe additionally keeps a Bloom
   sidecar over the stored band keys (functions/bloom.py): bands the
   filter rejects are definitely new and skip the index probe
   entirely, so the steady-state near-dup check costs O(batch) instead
   of a bucket scan. Sidecar files live on the driver-visible
   filesystem beside the index, like the layout's ``_meta.json``.
5. APPEND the survivors. The index is append-only — no rewrite, so a
   batch costs its own size in writes.

At-least-once file replay is safe: a replayed batch's docs either
carry hashes already in the index (dropped by the anti-join) or are
re-appended identically (same deterministic projection). Exactly-once
within one run comes from the checkpoint, like every other stream
here.

Reference analogue: none (the reference has no text surface); this is
a north-star extension composing its CDC streaming shell with the
dedup operators.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meilisync_spark.functions import bloom as _bloom
from meilisync_spark.functions import bloom_sharded as _sharded
from meilisync_spark.operators.dedup import (
    NEAR_DUP_TAU,
    NUM_PERM,
    lsh_bands,
    minhash_signatures,
    normalize_text,
)
from meilisync_spark.operators.text import quality_keep
from meilisync_spark.streaming.pipeline import _start_and_await
from meilisync_spark.pin import SER as _SER

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]

# the index is hive-partitioned by hb = crc32(content_hash) % N so the
# dedup probe reads only the hash buckets the batch touches (same
# pruning pattern as operators/bucketed.py). Steady-state trickle
# batches touch a handful of buckets; a giant backfill batch touches
# all of them and degrades gracefully to the full probe.
HASH_BUCKET_COL = "hb"
N_HASH_BUCKETS = 64

# the MinHash band index is likewise partitioned, by bb = band_hash %
# N, and the near-dup probe prunes to the batch's band buckets. The
# math differs from hb=: every doc carries BANDS (8) band hashes, so a
# batch of B docs touches up to 8·B of the N directories — pruning
# pays off for the steady-state trickle (B≈1-10 → 3-25% of the corpus
# band rows scanned at N=256) and degrades to the full probe for bulk
# backfills, where the batch amortizes the scan anyway. N is larger
# than the hb= layout's because of that 8× touch factor; at extreme
# scale the honest production answer for point-probing 8·B keys is a
# KV store / table-format index, not a filesystem scan (SCALE.md).
BAND_BUCKET_COL = "bb"
N_BAND_BUCKETS = 256

# Bloom sidecars over the band index's (band_idx, band_hash) keys and
# the corpus index's content hashes: the probes' "definitely new" fast
# path. Keys the filter rejects cannot exist in the index (no-false-
# negative contract, maintained by the bloom-BEFORE-rows write order
# below), so the index probes — directory opens, bucket scans, joins —
# run only over bloom-positive keys. Each sidecar is a LoggedBloom
# (functions/bloom.py): a main bitmap file plus an append-only delta
# log, both SIBLINGS of the parquet dir (never inside it — a foreign
# file would break the empty-dir recovery probe in
# _read_parquet_if_exists), summarizing KEYS, not files, so
# compaction/rebucketing never invalidates them. An absent sidecar
# (legacy index, deleted file) is rebuilt with one distributed scan;
# past BLOOM_REBUILD_FPP projected false-positive rate the main bitmap
# is rebuilt larger at a fold (correctness never depends on fpp).
BAND_KEY = ["band_idx", "band_hash"]
HASH_KEY = ["content_hash"]
# The prefilter's value is BUCKET pruning, and buckets degenerate long
# before per-key fpp looks bad: a 5k-doc batch carries ~40k band keys,
# so even 1% fpp yields ~400 false-positive bands landing in ~200 of
# the 256 bb= directories — a near-full probe PLUS bloom overhead
# (measured at 2M state docs: 18.3 s vs 13.7 s without the filter).
# Keeping expected false positives per batch in the single digits
# needs fpp ≈ 10/40k: rebuild past 0.2% projected, size rebuilds for
# 0.05% (m ≈ 21n bits at k=7; the pow-2 rounding gives headroom).
BLOOM_REBUILD_FPP = 0.002
BLOOM_TARGET_FPP = 5e-4
# Threshold-driven conversion to the SHARDED sidecar BELOW the 1 GiB
# cap (VERDICT r11 #3): the in-memory LoggedBloom probe's per-batch
# cost grows with bitmap size (broadcast ship + k=7 random bit reads
# missing cache — INGEST_STAGE_PROBE_2M measured warm touched_hb
# 0.59 s at the 2 MiB/500k-doc state vs 1.52 s at 8 MiB/2M), while the
# sharded/memmap form's line is flat (BLOOM_CAPCROSS_PROBE). Convert
# once the filter's RIGHT size for its key count reaches 2^26 bits
# (8 MiB ≈ 2M hash keys at target fpp) — the exact size where the tax
# was measured — instead of only at cap saturation, so steady-state
# ingest never pays it. The conversion is the same one-scan rebuild
# the cap crossing certified.
SHARD_CONVERT_BITS = 1 << 26


def _keys_want_bits(n_keys: int) -> int:
    """The bitmap size ``n_keys`` alone asks for at the target fpp —
    size_for WITHOUT its DEFAULT_BITS floor, which sits above
    SHARD_CONVERT_BITS and would make every sidecar (even an empty
    one) read as conversion-due."""
    return _bloom.size_for(int(1.25 * n_keys), fpp=BLOOM_TARGET_FPP,
                           floor_bits=1 << 12)


def _hb(content_hash):
    # NULL text hashes to NULL: pin it to bucket 0 so the layout has no
    # default-partition directory
    return (F.coalesce(F.crc32(content_hash), F.lit(0)) % N_HASH_BUCKETS).cast("int")


def _bb(band_hash):
    # band_hash is a signed 64-bit hash: pmod keeps buckets non-negative
    return F.pmod(F.coalesce(band_hash, F.lit(0)), F.lit(N_BAND_BUCKETS)).cast("int")


def _with_hash(docs: DataFrame) -> DataFrame:
    return docs.withColumn(
        "content_hash", F.sha2(normalize_text(F.col("text")), 256)
    )


def _read_parquet_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    """Filesystem-agnostic existence probe (os.path.isdir would read
    "absent" for every s3://). ONLY "no index yet" conditions map to
    None — any other read failure (corrupt footer, transient IO) must
    fail the batch so the checkpoint retries: treating it as absent
    would skip the seen-hash anti-join and re-append already-ingested
    docs, silently breaking hash uniqueness. Conditions matched by
    Spark error CLASS (stable across versions), with a message-substring
    fallback for exceptions that don't carry one:

    - PATH_NOT_FOUND — the path does not exist;
    - UNABLE_TO_INFER_SCHEMA over a local directory with no VISIBLE
      entries — a pre-created empty index dir is "no index yet", and
      so is one holding only Spark markers (``_SUCCESS``/``.crc``: a
      partitioned append of ZERO rows — e.g. a first batch whose
      texts were all too short to shingle — leaves exactly that). The
      same error over a dir with visible entries (corrupt/foreign
      files) or a remote path we cannot inspect stays fatal."""
    try:
        return spark.read.parquet(path)
    except Exception as e:  # AnalysisException, but import-stable
        get_cls = getattr(e, "getErrorClass", None)
        cls = (get_cls() if callable(get_cls) else None) or ""
        msg = str(e)
        if "PATH_NOT_FOUND" in cls or "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        if "UNABLE_TO_INFER_SCHEMA" in cls or "UNABLE_TO_INFER_SCHEMA" in msg:
            real = os.path.realpath(path)
            if os.path.isdir(real) and not [
                x for x in os.listdir(real) if not x.startswith((".", "_"))
            ]:
                return None
        raise


def _load_bloom(prefix: str, index: DataFrame | None, key: list[str],
                enabled: bool):
    """Load an index's Bloom sidecar (main bitmap + delta log, or the
    sharded form past the cap), restoring the safe-superset invariant
    on every path: absent-with-index → distributed rebuild from the
    index itself (persisted immediately); saturated (projected fpp
    past the rebuild bar) → forced fold with a right-sized rebuild
    from index ∪ log; main bitmap at/past SHARD_CONVERT_BITS (or a
    growth rebuild that would land there, or saturation at the cap) →
    one-time conversion to the SHARDED sidecar
    (functions/bloom_sharded.py: per-shard caps, memmap probes, no
    filter-sized broadcast), which then grows per-shard; DISABLED →
    remove every part — rows appended
    while the prefilter is off would make a kept sidecar silently
    stale, i.e. false negatives on re-enable. Present ⟹ maintained."""
    if not enabled:
        _bloom.LoggedBloom.remove(prefix)
        _sharded.ShardedBloom.remove(prefix)
        return None
    # load_cached everywhere: O(stat) on the steady-state path —
    # re-reading the full main bitmap (up to 1 GiB at cap) or the log
    # chunks every micro-batch would make trickle cost scale with
    # FILTER size (ADVICE r9).
    if _sharded.ShardedBloom.exists(prefix):
        sb = _sharded.ShardedBloom.load_cached(prefix)
        # load_cached can return None if the manifest vanished between
        # the exists() check and the load (out-of-band removal): fall
        # through to the LoggedBloom/rebuild path instead of crashing.
        if sb is not None:
            if (
                sb.projected_fpp() > BLOOM_REBUILD_FPP
                and sb.shards[0].n_bits < _bloom.size_for(10**12)
            ):
                sb.fold_if_due(index, key, BLOOM_TARGET_FPP,
                               BLOOM_REBUILD_FPP, force=True)
            return sb
    lb = _bloom.LoggedBloom.load_cached(prefix)
    if lb is None:
        if index is None:
            return _bloom.LoggedBloom.fresh(prefix)
        n = index.count()
        if _keys_want_bits(n) >= SHARD_CONVERT_BITS:
            # bootstrapping a big legacy index: build the sharded form
            # directly rather than a large single bitmap that the next
            # load would immediately convert.
            return _sharded.ShardedBloom.convert_from_logged(
                _bloom.LoggedBloom.fresh(prefix), index, key,
                BLOOM_TARGET_FPP,
            )
        main = _bloom.build_from_df(
            index, key, _bloom.size_for(int(1.25 * n), fpp=BLOOM_TARGET_FPP)
        )
        return _bloom.LoggedBloom.from_main(prefix, main)
    # threshold conversion below the cap (see SHARD_CONVERT_BITS): the
    # trigger is the size the KEY COUNT alone asks for — NOT the
    # current bitmap size, and NOT floor-clamped size_for: the fresh
    # default (DEFAULT_BITS = 2^27) and size_for's matching floor both
    # exceed the threshold regardless of keys, so either proxy would
    # convert an empty sidecar. The rebuild re-sizes per-shard mains
    # from index ∪ log, so a past-the-bar fpp is restored by the same
    # scan.
    if _keys_want_bits(lb.n_keys()) >= SHARD_CONVERT_BITS:
        return _sharded.ShardedBloom.convert_from_logged(
            lb, index, key, BLOOM_TARGET_FPP
        )
    if lb.projected_fpp() > BLOOM_REBUILD_FPP:
        if lb.main.n_bits >= _bloom.size_for(10**12):
            # saturated AT the cap: the logged form can't grow, so the
            # old behavior (run saturated, fast path quietly dead) is
            # exactly VERDICT r9's what's-wrong #1 — convert once.
            # (Reachable only when size_for's cap is patched below the
            # threshold — probes and tests exercise it there.)
            return _sharded.ShardedBloom.convert_from_logged(
                lb, index, key, BLOOM_TARGET_FPP
            )
        # growth is possible: force-fold now so the rebuild happens
        # before this batch probes.
        lb.fold_if_due(index, key, BLOOM_TARGET_FPP, BLOOM_REBUILD_FPP,
                       force=True)
    return lb


def _prune_by_bloom(index: DataFrame, bloom, batch_keys: DataFrame,
                    key: list[str], bucketed: bool, bucket_col: str,
                    bucket_of) -> DataFrame | None:
    """The definitely-new fast path: only bloom-positive batch keys can
    exist in the index (no-false-negative contract), so the probe read
    prunes to THEIR buckets — or disappears entirely (None) when the
    whole batch is new. Flat legacy layouts get the all-or-nothing
    shortcut."""
    cand = bloom.mark(batch_keys.select(*key), key).where(
        F.col("maybe_seen")
    )
    if bucketed:
        touched = [r[0] for r in cand.select(bucket_of()).distinct().collect()]
        if not touched:
            return None
        return index.where(F.col(bucket_col).isin(touched))
    if not cand.limit(1).collect():
        return None
    return index


def ingest_batch(
    batch: DataFrame, index: DataFrame | None, apply_quality: bool,
    *, prehashed: bool = False,
) -> DataFrame:
    """The pure batch step: returns the NEW rows to append (hash +
    doc columns), deduped in-batch and against the existing index.
    ``prehashed`` skips the content-hash projection when the caller
    already computed (and pinned) it."""
    b = batch if prehashed else _with_hash(batch)
    if apply_quality:
        # single-pass: the keep rule filters the batch scan directly
        # (text.quality_keep, same composition as corpus_pipeline_full)
        # instead of a second quality pass joined back
        b = b.where(quality_keep(F.col("text")))
    # in-batch: canonical copy = min doc_id per hash (exact_dedup rule)
    b = (
        b.groupBy("content_hash")
        .agg(F.min_by(F.struct(*DOC_COLS), F.col("doc_id")).alias("d"))
        .select("content_hash", "d.*")
    )
    if index is not None:
        # null-safe key: docs with NULL text hash to NULL, and a plain
        # anti-join would never match NULL=NULL — re-appending the null
        # doc every batch and breaking hash uniqueness
        seen = index.select(F.col("content_hash").alias("seen_hash"))
        b = b.join(
            seen, F.col("content_hash").eqNullSafe(F.col("seen_hash")), "left_anti"
        )
    return b


def _est_jaccard(sig_a: str, sig_b: str):
    matched = F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda m: m)
    )
    return matched / F.lit(NUM_PERM)


def drop_near_dups(fresh: DataFrame, load_band_index):
    """Filter ``fresh`` (post exact-dedup) against the stored MinHash
    band index AND against itself: a doc is dropped when a band
    collision verifies at est_jaccard >= NEAR_DUP_TAU against anything
    previously SEEN (the incremental_neardup probe, O(|batch|·bucket),
    never O(corpus²)) or against a smaller-id doc of the same batch.
    Docs too short to carry a signature (< one shingle) skip the probe
    but are KEPT — near-dedup must not silently drop short documents.

    Returns ``(survivors, batch_bands)``. ``batch_bands`` covers EVERY
    post-exact-dedup doc of the batch — dropped ones included — and the
    caller appends all of it to the band index. Storing only survivors'
    bands would make the result depend on micro-batch boundaries: with
    A in the corpus, B dropped against A, and C a near-dup of B but not
    of A, C is dropped when it shares B's batch (the in-batch self-
    probe sees B's bands) yet KEPT when it arrives later (B's bands
    were never stored). The batch twin (dedup near_drop) drops against
    any smaller-id collision regardless of whether that doc itself
    survived — this matches it: the band index is the memory of
    everything seen, the corpus index the set of docs retained.

    ``load_band_index`` is called with the batch's own band table and
    returns the stored corpus band index to probe (or None when none
    exists yet) — the callback shape lets the caller prune the index
    read to the batch's band buckets before the join."""
    # pin the signatures: they feed the survivor join, both sides of
    # the in-batch self-probe, the corpus probe AND the touched-bucket
    # collect — without the checkpoint the sha256-per-shingle pipeline
    # re-runs for each
    sigs = minhash_signatures(fresh.select("doc_id", "text")).localCheckpoint(True, storageLevel=_SER)
    withsig = fresh.join(sigs, "doc_id", "left")
    bands = lsh_bands(sigs)
    # MEGA-BUCKET GUARD, exactness-preserving form. Both probes only ask
    # an EXISTENCE question per batch doc ("is there some other doc in
    # my bucket whose signature verifies?"), and est_jaccard depends on
    # the signature alone — so candidate rows sharing (bucket, sig) are
    # interchangeable and can collapse to representatives BEFORE the
    # join. A template flood (10^5 identical docs ⇒ identical sigs ⇒
    # one bucket) collapses to O(1) candidates per bucket instead of
    # fanning every colliding doc out to the whole bucket; corpora with
    # genuinely distinct sigs are untouched. Unlike the batch operator's
    # LSH_BUCKET_CAP star (operators/dedup.py), this changes NOTHING
    # about which docs get dropped — it is a pure join-size reduction.
    #
    # in-batch self-probe: higher id loses against a verified lower id.
    # The drop condition is (doc_b < doc_id AND verify(sig, sig_b)) —
    # within a (bucket, sig_b) group the MIN doc_b decides for every
    # batch doc, so one representative per group is exact.
    rhs = (
        bands.select(
            "band_idx", "band_hash", F.col("sig").alias("sig_b"), "doc_id"
        )
        .groupBy("band_idx", "band_hash", "sig_b")
        .agg(F.min("doc_id").alias("doc_b"))
    )
    self_pairs = bands.select("doc_id", "sig", "band_idx", "band_hash").join(
        rhs, ["band_idx", "band_hash"]
    ).where(F.col("doc_b") < F.col("doc_id"))
    near_in_batch = (
        self_pairs.where(_est_jaccard("sig", "sig_b") >= NEAR_DUP_TAU)
        .select("doc_id")
        .distinct()
    )
    dropped = near_in_batch
    band_index = load_band_index(bands)
    if band_index is not None:
        # corpus probe: the drop condition is (doc_c != doc_id AND
        # verify). Two representatives per (bucket, sig_c) group — MIN
        # and MAX doc_c — are exact: a singleton group {X} offers no
        # witness against X itself (replayed own bands, see below),
        # while any ≥2-member group always contains a rep != X.
        grouped = (
            band_index.select(
                "band_idx", "band_hash", F.col("sig").alias("sig_c"), "doc_id"
            )
            .groupBy("band_idx", "band_hash", "sig_c")
            .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        )
        reps = grouped.select(
            "band_idx", "band_hash", "sig_c",
            F.explode(
                F.array_distinct(F.array("_mn", "_mx"))
            ).alias("doc_c"),
        )
        probe = bands.join(
            reps,
            ["band_idx", "band_hash"],
            # a doc's own band rows can already be stored: bands append
            # BEFORE documents (crash consistency — see run_corpus_ingest),
            # so an at-least-once replay of the crash window probes
            # against its own first-attempt bands. Never drop a doc as a
            # near-duplicate of itself.
        ).where(F.col("doc_c") != F.col("doc_id"))
        near_corpus = (
            probe.where(_est_jaccard("sig", "sig_c") >= NEAR_DUP_TAU)
            .select("doc_id")
            .distinct()
        )
        dropped = dropped.union(near_corpus)
    return withsig.join(dropped, "doc_id", "left_anti"), bands


def run_corpus_ingest(
    spark: SparkSession,
    docs_path: str,
    index_path: str,
    checkpoint_dir: str,
    *,
    apply_quality: bool = False,
    near_dedup: bool = False,
    bloom_prefilter: bool = True,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    processing_interval: str | None = None,
    timeout_sec: float | None = 180.0,
    compact_every: int = 1,
    compact_max_dirs: int | None = None,
) -> None:
    """``near_dedup=True`` additionally maintains a MinHash band index
    beside the corpus (``<index_path>_bands``) and drops batch docs
    that verify as near-duplicates of the stored corpus — the full
    continuous-dedup pipeline (exact + near, both O(batch) probes).

    ``bloom_prefilter`` (default on) keeps Bloom sidecars beside both
    indexes — ``<index_path>_bloom.bin`` over the corpus's content
    hashes and ``<index_path>_bands_bloom.bin`` over the band keys —
    so a batch of definitely-new text skips BOTH index probes
    entirely; semantics are IDENTICAL either way (one-sided error +
    exact verify/anti-join on the maybes), only the probe cost
    changes. Switching it off removes the sidecars (kept ones would go
    stale = false negatives on re-enable); turning it on for a legacy
    index triggers one distributed rebuild scan per sidecar.

    ``compact_every`` (batches; 0 disables; default 1) is the
    small-file AUDIT cadence — the trigger itself is per-directory and
    THRESHOLD-based (a size tier compacts only when it holds ≥
    TIER_FILES files, VERDICT r10 #5), so auditing every batch costs a
    directory listing when nothing is due: quiet directories pay
    nothing, hot ones never queue multiple batches of debris. Every
    batch appends ~one file per touched partition directory, so a long
    run ages linearly without this (VERDICT r9 #1). Each due tick runs
    the size-tiered per-directory compactor
    (operators/maintenance.py) over the corpus index and, when
    ``near_dedup``, the band index — O(small files merged), never
    O(table), single-writer-safe because it runs inside the
    foreachBatch callback between batches. The Bloom sidecars survive
    untouched: they summarize KEYS, not files. heal_partition_dirs
    runs once at stream start to repair a first-conversion crash
    window before any probe."""
    from meilisync_spark.operators.maintenance import (
        compact_small_files,
        heal_partition_dirs,
    )

    schema = spark.read.parquet(docs_path).schema
    if os.path.isfile(docs_path):
        # file source needs a directory basePath — stage a one-symlink
        # dir (absolute target: a relative one would resolve against
        # the staging dir and dangle)
        import tempfile

        staging = tempfile.mkdtemp(prefix="mls_ingest_src_")
        target = os.path.abspath(docs_path)
        os.symlink(target, os.path.join(staging, os.path.basename(target)))
        docs_path = staging
    stream = spark.readStream.schema(schema).option("latestFirst", "false")
    if max_files_per_trigger:
        stream = stream.option("maxFilesPerTrigger", max_files_per_trigger)
    src = stream.parquet(docs_path)

    bands_path = index_path.rstrip("/") + "_bands"
    # LoggedBloom sidecar prefixes: <prefix>_bloom.bin + <prefix>_bloom_log/
    bands_bloom_prefix = bands_path
    corpus_bloom_prefix = index_path.rstrip("/")
    heal_partition_dirs(index_path)
    heal_partition_dirs(bands_path)
    batches_since_compact = {"n": 0}

    def _read_if_exists(path: str) -> DataFrame | None:
        return _read_parquet_if_exists(spark, path)

    def _is_bucketed(path: str, col: str, index: DataFrame | None) -> bool:
        # the layout is a property of the DIRECTORY TREE, not of the
        # dataframe schema: a rewrite that flattened the partition dirs
        # into data files (a mis-run compaction) would still show the
        # column in .columns, and appending col= dirs beside flat files
        # silently hides the flat rows from basePath readers. Trust the
        # directories when the path is locally inspectable; fall back
        # to column presence for remote filesystems.
        real = os.path.realpath(path)
        if os.path.isdir(real):
            entries = os.listdir(real)
            if any(e.startswith(f"{col}=") for e in entries):
                return True
            if any(e.endswith(".parquet") for e in entries):
                return False
        return index is None or col in index.columns

    def handle(batch: DataFrame, _bid: int) -> None:
        # hash the batch ONCE and pin it: the touched-bucket collect,
        # the in-batch dedup and the anti-join all consume this frame —
        # unpinned, the sha256 scan re-runs per consumer
        hashed = _with_hash(batch).localCheckpoint(True, storageLevel=_SER)
        index = _read_if_exists(index_path)
        bucketed = _is_bucketed(index_path, HASH_BUCKET_COL, index)
        # the corpus index's own sidecar: a batch of all-new text skips
        # the exact-dedup anti-join's index read entirely (same
        # contract as the band sidecar below — loaded/rebuilt/removed
        # by _load_bloom, written BEFORE the corpus append)
        corpus_bloom = _load_bloom(
            corpus_bloom_prefix, index, HASH_KEY, bloom_prefilter
        )
        index_full = index  # unpruned: sidecar rebuilds must scan it all
        if index is not None:
            if corpus_bloom is not None:
                index = _prune_by_bloom(
                    index, corpus_bloom, hashed, HASH_KEY, bucketed,
                    HASH_BUCKET_COL, lambda: _hb(F.col("content_hash")),
                )
            elif bucketed:
                # no bloom: prune the probe to the hash buckets this
                # batch touches — partition pruning on the hb= directory
                # key bounds the seen-hash scan by |touched buckets|,
                # not |corpus|
                touched = [
                    r[0]
                    for r in hashed.select(_hb(F.col("content_hash")))
                    .distinct()
                    .collect()
                ]
                index = index.where(F.col(HASH_BUCKET_COL).isin(touched))
        fresh = ingest_batch(hashed, index, apply_quality, prehashed=True)
        if near_dedup:
            band_index = _read_if_exists(bands_path)
            bands_bucketed = _is_bucketed(bands_path, BAND_BUCKET_COL, band_index)
            bloom = _load_bloom(
                bands_bloom_prefix, band_index, BAND_KEY, bloom_prefilter
            )

            def load_band_index(batch_bands: DataFrame) -> DataFrame | None:
                if band_index is None:
                    return None
                if bloom is not None:
                    return _prune_by_bloom(
                        band_index, bloom, batch_bands, BAND_KEY,
                        bands_bucketed, BAND_BUCKET_COL,
                        lambda: _bb(F.col("band_hash")),
                    )
                if not bands_bucketed:
                    return band_index  # pre-bucketing flat layout
                # prune to the batch's band buckets: ≤ BANDS·|batch|
                # tiny ints, the same directory-pruning contract as hb=
                touched_bb = [
                    r[0]
                    for r in batch_bands.select(_bb(F.col("band_hash")))
                    .distinct()
                    .collect()
                ]
                return band_index.where(
                    F.col(BAND_BUCKET_COL).isin(touched_bb)
                )

            # pin the batch result BEFORE the first append: both writes
            # must see the same survivors, and the lineage reads the
            # index/band dirs — re-evaluating it after the first append
            # would see the batch's own rows as "already present".
            # new_bands covers the WHOLE post-exact-dedup batch (dropped
            # docs included — see drop_near_dups for why), so it comes
            # from the probe's own pinned band table, not the survivors
            survivors, new_bands = drop_near_dups(
                fresh.localCheckpoint(True, storageLevel=_SER), load_band_index
            )
            survivors = survivors.localCheckpoint(True, storageLevel=_SER)
            # CRASH ORDER, extended: bloom BEFORE bands BEFORE corpus.
            # The sidecar must never miss a key whose band row exists
            # (a false negative would skip the exact probe and re-admit
            # a near-duplicate), so its bits land first: a crash after
            # the bloom save leaves extra bits — false positives the
            # exact probe resolves — never missing ones. The add is
            # Trickle batches log two hash longs per band row (one
            # atomic file, O(batch) bytes); bulk backfills merge a
            # distributed delta bitmap instead. Main rewrites only at
            # folds/growth.
            if bloom is not None:
                bloom.record_batch(new_bands, BAND_KEY, band_index,
                                   BLOOM_TARGET_FPP, BLOOM_REBUILD_FPP)
            # bands append BEFORE the corpus append. A
            # crash between the two leaves dangling band rows, which are
            # harmless — the replayed doc is excluded from matching its
            # own rows (drop_near_dups) and re-appends normally; a stray
            # band row for a doc that never returns is one spurious
            # probe candidate. The REVERSE order would leave corpus
            # documents with no band rows: replay drops the doc at the
            # exact-hash anti-join, its bands are never written, and
            # every future near-duplicate of it is permanently invisible
            # to the probe.
            if bands_bucketed:
                # repartition on the bucket key BEFORE the partitioned
                # write: without it every write task holds rows for
                # nearly every bb= directory (a 5k-doc batch carries
                # 40k band hashes ≈ all 256 buckets), so a 32-task
                # write opens ~32x256 ≈ 8k tiny files — measured 24 s
                # of the 40 s batch constant (INGEST_STAGE_PROBE.json)
                # and a file-count explosion that compounds per batch.
                # Hash-clustering by bb makes it one file per touched
                # directory; the extra exchange is O(batch) band rows.
                (
                    new_bands.withColumn(BAND_BUCKET_COL, _bb(F.col("band_hash")))
                    .repartition(F.col(BAND_BUCKET_COL))
                    .write.mode("append")
                    .partitionBy(BAND_BUCKET_COL)
                    .parquet(bands_path)
                )
            else:
                new_bands.write.mode("append").parquet(bands_path)
            _append(
                survivors.select("content_hash", *DOC_COLS),
                bucketed, corpus_bloom, index_full,
            )
        else:
            if corpus_bloom is not None:
                # pin before the bloom add collects its hashes, or the
                # anti-join pipeline runs once for the add and again
                # for the write
                fresh = fresh.localCheckpoint(True, storageLevel=_SER)
            _append(fresh, bucketed, corpus_bloom, index_full)
        # small-file compaction cadence — after the appends, inside
        # the single-writer callback (maintenance.py's contract). Keys
        # don't change, so the bloom sidecars stay valid; the streaming
        # checkpoint is untouched (compaction is idempotent
        # maintenance, not batch state).
        batches_since_compact["n"] += 1
        if compact_every and batches_since_compact["n"] >= compact_every:
            batches_since_compact["n"] = 0
            compact_small_files(spark, index_path, compact_max_dirs)
            if near_dedup:
                compact_small_files(spark, bands_path, compact_max_dirs)

    def _append(rows: DataFrame, bucketed: bool, corpus_bloom=None,
                index_full: DataFrame | None = None) -> None:
        if corpus_bloom is not None:
            # bloom BEFORE the corpus append — the same one-sided crash
            # window as the band sidecar: extra bits on replay, never
            # missing ones
            corpus_bloom.record_batch(rows, HASH_KEY, index_full,
                                      BLOOM_TARGET_FPP, BLOOM_REBUILD_FPP)
        if bucketed:
            # same task-per-bucket clustering as the bands append: one
            # file per touched hb= directory instead of one per
            # (task, directory)
            (
                rows.withColumn(HASH_BUCKET_COL, _hb(F.col("content_hash")))
                .repartition(F.col(HASH_BUCKET_COL))
                .write.mode("append")
                .partitionBy(HASH_BUCKET_COL)
                .parquet(index_path)
            )
        else:
            rows.write.mode("append").parquet(index_path)

    writer = src.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    _start_and_await(writer, available_now, processing_interval, timeout_sec)
