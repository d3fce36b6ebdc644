"""Decompose the streaming corpus-ingest per-batch constant (VERDICT
r8 item 2): SCALING.json proved the 5k-doc batch cost is O(batch) in
index size (exponent ~0.00) but ~44 s ABSOLUTE — this probe breaks one
availableNow batch into its stages to find where those seconds live.

Method: build the pre-existing state (base corpus ingested, near-dedup
on), copy it, then (a) time `run_corpus_ingest` end-to-end on the copy
— the number SCALING.json records — and (b) replay the SAME batch
through a stage-instrumented replica of `run_corpus_ingest.handle`'s
body on the original. The replica's stage boundaries are the eager
pins/actions the real batch fn performs (construction INSIDE each
timed span — the round-8 lesson: localCheckpoint/AQE execute upstream
exchanges at call time), so the staged sum approximates the handled
batch minus streaming-harness overhead (schema read, checkpoint
commit, source listing), which is reported as the difference.

Writes INGEST_STAGE_PROBE.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scaling_exponents import gen_corpus  # noqa: E402


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--state-docs", type=int, default=500_000)
    ap.add_argument("--batch-docs", type=int, default=5_000)
    ap.add_argument(
        "--skip-e2e", action="store_true",
        help="skip the end-to-end bloom/nobloom A/B (4 state copies) "
        "and record only the stage replica — for big-state runs where "
        "the warm lines are the question",
    )
    ap.add_argument(
        "--out", default=os.path.join(REPO, "INGEST_STAGE_PROBE.json")
    )
    args = ap.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq_
    from pyspark.sql import functions as F

    from meilisync_spark.functions import bloom as _bloom
    from meilisync_spark.operators.dedup import (
        NEAR_DUP_TAU,
        lsh_bands,
        minhash_signatures,
    )
    from meilisync_spark.session import get_spark
    from meilisync_spark.streaming import corpus_ingest as CI
    from meilisync_spark.streaming.corpus_ingest import (
        BAND_BUCKET_COL,
        DOC_COLS,
        HASH_BUCKET_COL,
        _bb,
        _est_jaccard,
        _hb,
        _read_parquet_if_exists,
        _with_hash,
        ingest_batch,
        run_corpus_ingest,
    )

    spark = get_spark(app_name="ingest-stage-probe")
    work = tempfile.mkdtemp(prefix="mls_ingest_probe_")
    stages: dict[str, float] = {}
    try:
        d = os.path.join(work, "state")
        os.makedirs(d)
        gen_corpus(args.state_docs, 10, d)
        bdir = os.path.join(work, "batchsrc")
        os.makedirs(bdir)
        gen_corpus(args.batch_docs, 10, bdir, seed=7)

        drop = os.path.join(work, "incoming")
        os.makedirs(drop)
        os.link(
            os.path.join(d, "documents.parquet"),
            os.path.join(drop, "base.parquet"),
        )
        idx = os.path.join(work, "corpus_idx")
        ck = os.path.join(work, "ck")
        run_corpus_ingest(
            spark, drop, idx, ck, near_dedup=True,
            available_now=True, timeout_sec=1200.0,
        )
        # disjoint batch: offset ids past the base corpus
        t = pq_.read_table(os.path.join(bdir, "documents.parquet"))
        t = t.set_column(
            0, "doc_id",
            pa.array(
                (t.column("doc_id").to_numpy() + 10_000_000).tolist(),
                pa.int64(),
            ),
        )
        batch_file = os.path.join(drop, "batch.parquet")
        pq_.write_table(t, batch_file)

        # ---- (a) end-to-end on copies of the state, bloom ON and OFF
        # (same session, same batch — the honest A/B for the sidecar;
        # separate captures on this host drift ±30-50%) ----
        def _copy_state(tag: str) -> tuple[str, str, str]:
            w = os.path.join(work, tag)
            os.makedirs(w)
            i2 = os.path.join(w, "corpus_idx")
            shutil.copytree(idx, i2)
            shutil.copytree(idx + "_bands", i2 + "_bands")
            for part in ("_bloom.bin", "_bands_bloom.bin"):
                if os.path.exists(idx + part):
                    shutil.copy2(idx + part, i2 + part)
            for part in ("_bloom_log", "_bands_bloom_log"):
                if os.path.isdir(idx + part):
                    shutil.copytree(idx + part, i2 + part)
            # fresh checkpoint + a drop dir holding only the batch file:
            # the copied run must process exactly one batch, not replay
            # the base corpus
            dr = os.path.join(w, "incoming")
            os.makedirs(dr)
            os.link(batch_file, os.path.join(dr, "batch.parquet"))
            return i2, os.path.join(w, "ck"), dr

        # alternate and take min-of-2 per variant: the FIRST batch in a
        # session pays python-worker/codegen warmup that a sequential
        # A/B would book entirely to one side (measured: same variant
        # 26.9 s cold-first vs ~10 s warm)
        ends: dict[str, float] = {}
        if not args.skip_e2e:
            for rep in range(2):
                for tag, flag in (("bloom", True), ("nobloom", False)):
                    i2, c2, dr2 = _copy_state(f"{tag}{rep}")
                    t0 = time.perf_counter()
                    run_corpus_ingest(
                        spark, dr2, i2, c2, near_dedup=True,
                        bloom_prefilter=flag,
                        available_now=True, timeout_sec=1200.0,
                    )
                    el = round(time.perf_counter() - t0, 3)
                    ends[tag] = min(ends.get(tag, el), el)
        end_to_end = ends.get("bloom")

        # ---- (b) stage-instrumented replica on the original ----
        def span(name):
            class _S:
                def __enter__(self):
                    self.t0 = time.perf_counter()

                def __exit__(self, *a):
                    stages[name] = round(time.perf_counter() - self.t0, 3)

            return _S()

        batch = spark.read.parquet(batch_file)
        with span("hash_pin"):
            hashed = _with_hash(batch).localCheckpoint(True)
        with span("index_open"):
            index = _read_parquet_if_exists(spark, idx)
        index_full = index
        with span("corpus_bloom_load"):
            cbloom = _bloom.LoggedBloom.load(idx)
        with span("touched_hb_collect"):
            if cbloom is not None:
                index = CI._prune_by_bloom(
                    index, cbloom, hashed, CI.HASH_KEY, True,
                    HASH_BUCKET_COL, lambda: _hb(F.col("content_hash")),
                )
            else:
                touched = [
                    r[0]
                    for r in hashed.select(_hb(F.col("content_hash")))
                    .distinct()
                    .collect()
                ]
                index = index.where(F.col(HASH_BUCKET_COL).isin(touched))
        # warm repeat (VERDICT r9 #5): the cold span above pays the
        # ONE-TIME broadcast ship of the main bitmap inside
        # bloom.mark — a cost that grows with FILTER size but is
        # token-cached across batches in the real stream (and, since
        # round 10, the LoggedBloom.load itself is too). The warm
        # number is the true steady-state per-batch cost.
        if cbloom is not None:
            with span("touched_hb_collect_warm"):
                CI._prune_by_bloom(
                    index_full, cbloom, hashed, CI.HASH_KEY, True,
                    HASH_BUCKET_COL, lambda: _hb(F.col("content_hash")),
                )
        with span("exact_fresh_pin"):
            fresh = ingest_batch(
                hashed, index, False, prehashed=True
            ).localCheckpoint(True)
        with span("sigs_pin"):
            sigs = minhash_signatures(
                fresh.select("doc_id", "text")
            ).localCheckpoint(True)
        withsig = fresh.join(sigs, "doc_id", "left")
        bands = lsh_bands(sigs)
        with span("bloom_load"):
            bloom = _bloom.LoggedBloom.load(idx + "_bands")
        with span("band_index_open_prune"):
            band_index = band_index_full = _read_parquet_if_exists(
                spark, idx + "_bands"
            )
            if bloom is not None:
                # the production path: only bloom-positive bands can
                # exist in the index — prune to THEIR buckets
                cand = bloom.mark(
                    bands.select(*CI.BAND_KEY), CI.BAND_KEY
                ).where(F.col("maybe_seen"))
                touched_bb = [
                    r[0]
                    for r in cand.select(_bb(F.col("band_hash")))
                    .distinct()
                    .collect()
                ]
            else:
                touched_bb = [
                    r[0]
                    for r in bands.select(_bb(F.col("band_hash")))
                    .distinct()
                    .collect()
                ]
            band_index = (
                band_index.where(F.col(BAND_BUCKET_COL).isin(touched_bb))
                if touched_bb
                else band_index.limit(0)
            )
        # warm repeat (VERDICT r10 #3): the cold span pays the one-time
        # band-bloom broadcast ship (token-cached across batches in the
        # real stream); the warm number — re-listing the index and
        # re-marking the SAME batch — is the steady-state per-batch
        # cost, whose state-dependent term should be the (compaction-
        # bounded) file listing only.
        if bloom is not None:
            with span("band_index_open_prune_warm"):
                bi2 = _read_parquet_if_exists(spark, idx + "_bands")
                cand2 = bloom.mark(
                    bands.select(*CI.BAND_KEY), CI.BAND_KEY
                ).where(F.col("maybe_seen"))
                touched_bb2 = [
                    r[0]
                    for r in cand2.select(_bb(F.col("band_hash")))
                    .distinct()
                    .collect()
                ]
                if touched_bb2:
                    bi2.where(F.col(BAND_BUCKET_COL).isin(touched_bb2))
        with span("probe_survivors_pin"):
            rhs = (
                bands.select(
                    "band_idx", "band_hash", F.col("sig").alias("sig_b"),
                    "doc_id",
                )
                .groupBy("band_idx", "band_hash", "sig_b")
                .agg(F.min("doc_id").alias("doc_b"))
            )
            self_pairs = bands.select(
                "doc_id", "sig", "band_idx", "band_hash"
            ).join(rhs, ["band_idx", "band_hash"]).where(
                F.col("doc_b") < F.col("doc_id")
            )
            near_in_batch = (
                self_pairs.where(
                    _est_jaccard("sig", "sig_b") >= NEAR_DUP_TAU
                )
                .select("doc_id")
                .distinct()
            )
            grouped = (
                band_index.select(
                    "band_idx", "band_hash", F.col("sig").alias("sig_c"),
                    "doc_id",
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
                reps, ["band_idx", "band_hash"]
            ).where(F.col("doc_c") != F.col("doc_id"))
            near_corpus = (
                probe.where(_est_jaccard("sig", "sig_c") >= NEAR_DUP_TAU)
                .select("doc_id")
                .distinct()
            )
            dropped = near_in_batch.union(near_corpus)
            survivors = withsig.join(
                dropped, "doc_id", "left_anti"
            ).localCheckpoint(True)
        with span("bloom_update_save"):
            if bloom is not None:
                bloom.record_batch(bands, CI.BAND_KEY, band_index_full,
                                   CI.BLOOM_TARGET_FPP, CI.BLOOM_REBUILD_FPP)
        with span("bands_append"):
            (
                bands.withColumn(BAND_BUCKET_COL, _bb(F.col("band_hash")))
                .repartition(F.col(BAND_BUCKET_COL))
                .write.mode("append")
                .partitionBy(BAND_BUCKET_COL)
                .parquet(idx + "_bands")
            )
        with span("corpus_bloom_update_save"):
            if cbloom is not None:
                cbloom.record_batch(
                    survivors.select("content_hash"), CI.HASH_KEY,
                    index_full, CI.BLOOM_TARGET_FPP, CI.BLOOM_REBUILD_FPP,
                )
        with span("corpus_append"):
            (
                survivors.select("content_hash", *DOC_COLS)
                .withColumn(HASH_BUCKET_COL, _hb(F.col("content_hash")))
                .repartition(F.col(HASH_BUCKET_COL))
                .write.mode("append")
                .partitionBy(HASH_BUCKET_COL)
                .parquet(idx)
            )

        out = {
            "state_docs": args.state_docs,
            "batch_docs": args.batch_docs,
            "end_to_end_sec": end_to_end,
            "end_to_end_nobloom_sec": ends.get("nobloom"),
            "stages": stages,
            "staged_sum_sec": round(sum(stages.values()), 3),
            "harness_overhead_sec": round(
                end_to_end - sum(stages.values()), 3
            ) if end_to_end is not None else None,
        }
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
