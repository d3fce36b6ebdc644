"""Decompose the per-doc CPU of the curation pipeline's arithmetic
fold (VERDICT r10 item 6): where do the seconds go inside the
signature/shingle stages — tokenizer regex, shingle-string build,
portable hash (sha256+conv today), or the 16-perm minhash fold — and
would an engine-portable md5 swap (verified bit-equal on both engines)
buy anything?

Each variant runs over the same generated corpus in one session,
interleaved min-of-K (the host drifts ±30-50% between separate
captures). Variants build on each other so differences isolate one
term:

  tokenize   — size(words) sum only
  shingle    — + 8-gram string build (concat), sum of sizes
  hash_sha   — + portable_hash64 (sha2-256 + conv) per shingle
  hash_md5   — same with md5 + conv
  hash_xx    — same with xxhash64 (NOT engine-portable; the floor)
  mh_sha     — full minhash_signatures fold (sha base, 16 perms)
  mh_md5     — same fold with the md5 base hash

Writes FOLD_MICROBENCH.json.
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
    ap.add_argument("--docs", type=int, default=100_000)
    # Reps REBUILD each query: re-collecting the same DataFrame object
    # under AQE reuses its materialized shuffle stages and measures
    # only the final stage (~60× fast; diagnosed 2026-08-16 —
    # 4.3 s cold / 0.06 s same-object rep / 1.6 s fresh-object rep).
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(REPO, "FOLD_MICROBENCH.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from meilisync_spark.functions.hashing import portable_hash64
    from meilisync_spark.operators import dedup as D
    from meilisync_spark.operators.dedup import (
        DECON_SHINGLE,
        MH_BASE_MOD,
        MH_PERMS,
        MH_PRIME,
        NUM_PERM,
        shingles_col,
        words_col,
    )
    from meilisync_spark.session import get_spark

    work = tempfile.mkdtemp(prefix="mls_fold_")
    gen_corpus(args.docs, 0, work)
    spark = get_spark(app_name="fold-microbench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(work, "documents.parquet"))
    docs = docs.localCheckpoint(True)  # pin: no parquet scan in the timings

    def md5_hash64(col):
        return F.conv(
            F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
        ).cast("long")

    def xx_hash64(col):
        return F.xxhash64(col.cast("string"))

    w = words_col(F.col("text"))
    sh = shingles_col(w, DECON_SHINGLE)

    def _sig(base_hash):
        base = F.transform(sh, lambda s: base_hash(s) % F.lit(MH_BASE_MOD))
        init = F.array_repeat(F.lit(MH_PRIME).cast("long"), NUM_PERM)
        ab = F.array(*[
            F.struct(F.lit(a).cast("long").alias("a"),
                     F.lit(b).cast("long").alias("b"))
            for a, b in MH_PERMS
        ])
        return F.aggregate(
            base, init,
            lambda acc, h: F.zip_with(
                acc, ab,
                lambda m, p: F.least(m, (p["a"] * h + p["b"]) % F.lit(MH_PRIME)),
            ),
        )

    variants = {
        # NOTE: size(sh) is simplified by Catalyst to size(words)-n+1
        # (transform preserves length), so "shingle" with F.size would
        # not build the strings — sum the string LENGTHS instead.
        "tokenize": lambda: docs.select(F.sum(F.size(w))),
        "shingle": lambda: docs.select(F.sum(
            F.aggregate(sh, F.lit(0).cast("long"),
                        lambda a, x: a + F.length(x)))),
        "hash_sha": lambda: docs.select(F.sum(
            F.aggregate(F.transform(sh, lambda s: portable_hash64(s)),
                        F.lit(0).cast("long"), lambda a, x: a + x))),
        "hash_md5": lambda: docs.select(F.sum(
            F.aggregate(F.transform(sh, lambda s: md5_hash64(s)),
                        F.lit(0).cast("long"), lambda a, x: a + x))),
        "hash_xx": lambda: docs.select(F.sum(
            F.aggregate(F.transform(sh, lambda s: xx_hash64(s)),
                        F.lit(0).cast("long"), lambda a, x: a + x))),
        "mh_sha": lambda: docs.select(
            F.sum(F.element_at(_sig(portable_hash64), 1))),
        "mh_md5": lambda: docs.select(
            F.sum(F.element_at(_sig(md5_hash64), 1))),
    }

    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, build in variants.items():
            q = build()  # fresh Dataset per rep (see --reps note)
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
    _ = D


if __name__ == "__main__":
    main()
