"""Is the shingle-STRING build worth moving below the explode too?

FOLD_MICROBENCH (r11) split the signature stage's cost: tokenize 6%,
shingle-string build 41%, sha256 13%, permutation fold 41%. Round 12's
landed rebuild moved the HASH and the fold below the explode (per-row
sha256 + 16 min() aggregates under whole-stage codegen) but still
builds the shingle strings with the interpreted higher-order
``transform(sequence, i -> concat_ws(' ', slice(w, i, n)))`` BEFORE
the Generate. This probe asks two follow-up questions, interleaved
min-of-K over one generated corpus in one session:

  mh_cur     — the landed minhash shape: explode(shingles_col) →
               per-row hash → 16 min() aggs
  mh_idx     — index-explode: posexplode(sequence(1, size-n+1)) over a
               projected words column, concat_ws(' ', slice(w, i, n))
               per GENERATED row inside codegen, then hash + 16 mins
  decon_cur  — the decontaminate corpus-side shape: per-row
               array_distinct(transform(shingles, hash)) (interpreted
               sha per ELEMENT) → explode
  decon_expl — explode(shingles_col) → per-row codegen hash (distinct
               deferred to the post-join aggregate, as the rebuilt
               operator would)
  decon_idx  — decon_expl with the index-explode string build

Every variant ends in the same cheap aggregate (sum of hashes /
count) so Catalyst cannot prune the work; fresh Dataset per rep
(AQE same-object shuffle reuse); corpus pinned with the SER level.

Writes SHINGLE_CODEGEN_MICROBENCH.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scaling_exponents import gen_corpus  # noqa: E402


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "SHINGLE_CODEGEN_MICROBENCH.json")
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from meilisync_spark.functions.hashing import portable_hash64
    from meilisync_spark.operators.dedup import (
        DECON_SHINGLE,
        MH_BASE_MOD,
        MH_PERMS,
        MH_PRIME,
        MH_SHINGLE,
        NUM_PERM,
        shingles_col,
    )
    from meilisync_spark.operators.text import words_col
    from meilisync_spark.pin import SER
    from meilisync_spark.session import get_spark

    work = tempfile.mkdtemp(prefix="mls_shcg_")
    gen_corpus(args.docs, 0, work)
    spark = get_spark(app_name="shingle-codegen-microbench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(os.path.join(work, "documents.parquet"))
        .select("doc_id", "text")
        .localCheckpoint(True, storageLevel=SER)
    )

    w = words_col(F.col("text"))

    def _mins(frame):
        h = F.col("_h")
        return frame.groupBy("doc_id").agg(
            *[
                F.min(
                    (F.lit(a).cast("long") * h + F.lit(b).cast("long"))
                    % F.lit(MH_PRIME)
                ).alias(f"_m{i}")
                for i, (a, b) in enumerate(MH_PERMS)
            ]
        ).select(F.sum(sum(F.col(f"_m{i}") for i in range(NUM_PERM))))

    def _idx_shingles(n: int):
        """doc_id + per-generated-row shingle string, built under
        codegen from a projected words column."""
        base = (
            docs.select("doc_id", w.alias("_w"))
            .where(F.size("_w") >= n)
            .select(
                "doc_id",
                "_w",
                F.explode(
                    F.sequence(F.lit(1), F.size("_w") - (n - 1))
                ).alias("_i"),
            )
            .select(
                "doc_id",
                F.concat_ws(" ", F.slice(F.col("_w"), F.col("_i"), n)).alias(
                    "_sh"
                ),
            )
        )
        return base

    def mh_cur():
        sh = shingles_col(w, MH_SHINGLE)
        return _mins(
            docs.where(F.size(w) >= MH_SHINGLE)
            .select("doc_id", F.explode(sh).alias("_sh"))
            .select(
                "doc_id",
                (portable_hash64(F.col("_sh")) % F.lit(MH_BASE_MOD)).alias("_h"),
            )
        )

    def mh_idx():
        return _mins(
            _idx_shingles(MH_SHINGLE).select(
                "doc_id",
                (portable_hash64(F.col("_sh")) % F.lit(MH_BASE_MOD)).alias("_h"),
            )
        )

    def decon_cur():
        sh = F.array_distinct(
            F.transform(
                shingles_col(w, DECON_SHINGLE), lambda s: portable_hash64(s)
            )
        )
        return (
            docs.select("doc_id", F.explode(sh).alias("sh"))
            .select(F.sum("sh"))
        )

    def decon_expl():
        sh = shingles_col(w, DECON_SHINGLE)
        return (
            docs.select("doc_id", F.explode(sh).alias("_sh"))
            .select(portable_hash64(F.col("_sh")).alias("sh"))
            .select(F.sum("sh"))
        )

    def decon_idx():
        return (
            _idx_shingles(DECON_SHINGLE)
            .select(portable_hash64(F.col("_sh")).alias("sh"))
            .select(F.sum("sh"))
        )

    variants = {
        "mh_cur": mh_cur,
        "mh_idx": mh_idx,
        "decon_cur": decon_cur,
        "decon_expl": decon_expl,
        "decon_idx": decon_idx,
    }

    # one untimed warmup (codegen compile) then interleaved reps
    for name, build in variants.items():
        build().collect()

    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(args.reps):
        for name, build in variants.items():
            spark.sparkContext._jvm.System.gc()
            q = build()  # fresh Dataset per rep
            t0 = time.perf_counter()
            q.collect()
            times[name].append(round(time.perf_counter() - t0, 3))

    out = {
        "docs": args.docs,
        "reps": args.reps,
        "min_sec": {k: min(v) for k, v in times.items()},
        "all_sec": times,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["min_sec"]))
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
