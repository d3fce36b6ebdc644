#!/usr/bin/env python
"""Measure time-vs-rows scaling exponents for the flagship dedup/ANN
operators (VERDICT r4 item 5): SCALE.md argues O(batch)/O(candidates)
shapes analytically; this measures how the implementations actually
scale on this machine.

Method: three homogeneous synthetic corpora (same generator, same
duplicate/near-duplicate density, different sizes — mixing the driver
fixture with a different generator would corrupt the series), each
query timed min-of-2 per size in one Spark session, exponent = slope
of log(time) vs log(rows) per adjacent size pair. Near-linear (≤ ~1.2)
means the operator's shuffle/candidate structure holds as data grows;
the small→mid pair underestimates (fixed per-query driver/JIT overhead
dominates sub-second runs), so the mid→large pair is the headline.

The corpora mirror the driver fixture's shape: documents(doc_id, text,
lang, source, n_chars) with ~1% planted exact duplicates and ~1%
one-word-edit near duplicates (constant DENSITY, so dup work scales
with rows, not rows²); embeddings(vec_id, embedding float[64], label).

Usage: python tools/scaling_exponents.py [--sizes 5000,15000,50000]
                                         [--queries a,b,c]
Writes one JSON line and MERGES into SCALING.json (per-query,
per-size union with exponents recomputed over each query's full
sorted series) — so a later large-size run extends the recorded
series instead of clobbering the other queries. Copy the numbers into
SCALE.md's scaling-exponents section.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "corpus_pipeline_full",
    "ivfpq_persisted_recall",
    # vocab-bounded claim measured: training cost is one corpus scan +
    # N jobs over the (sublinearly growing) word vocab, so the exponent
    # should sit well below 1
    "bpe_merges",
]

VOCAB = (
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query big key window row table stream merge data join "
    "shuffle plan stage task node disk memory cache index scanline probe build "
    "left right outer inner"
).split()
LANGS = ["en", "de", "fr", "zh", "es"]


def gen_corpus(n_docs: int, n_vecs: int, outdir: str, seed: int = 42) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    texts: list[str] = []
    rows = []
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < 0.01:
            text = texts[int(rng.integers(0, i))]  # exact duplicate
        elif i > 10 and r < 0.02:
            words = texts[int(rng.integers(0, i))].split()
            words[int(rng.integers(0, len(words)))] = VOCAB[
                int(rng.integers(0, len(VOCAB)))
            ]
            text = " ".join(words)  # one-word-edit near duplicate
        else:
            # words = base vocab x 676 letter suffixes (~27k effective
            # words; suffixes are LETTERS because the tokenizer is
            # [a-z]+). A bare 40-word vocab has only 64k possible
            # 3-shingles: at 1M docs the minhash band space saturates
            # and INCIDENTAL collisions grow ~n^2/64k — the harness
            # then measures generator pathology, not operator scaling.
            # Real corpora have effectively unbounded shingle entropy;
            # ~10^13 here keeps candidate pairs O(planted dups).
            k = int(rng.integers(40, 60))
            base_ids = rng.integers(0, len(VOCAB), size=k)
            sufs = rng.integers(0, 676, size=k)
            text = " ".join(
                f"{VOCAB[int(w)]}{chr(97 + int(s) // 26)}{chr(97 + int(s) % 26)}"
                for w, s in zip(base_ids, sufs)
            )
        texts.append(text)
        rows.append(
            (
                i,
                text,
                LANGS[int(rng.integers(0, len(LANGS)))],
                f"src{int(rng.integers(0, 20))}",
                len(text),
            )
        )
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(outdir, "documents.parquet"))

    V = rng.standard_normal((n_vecs, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    emb = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in V], pa.list_(pa.float32())
            ),
            "label": pa.array(
                [i % 10 for i in range(n_vecs)], pa.int32()
            ),
        }
    )
    pq.write_table(emb, os.path.join(outdir, "embeddings.parquet"))


def main() -> None:
    sizes = [5000, 15000, 50000]
    if "--sizes" in sys.argv:
        sizes = [int(x) for x in sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    queries = list(QUERIES)
    if "--queries" in sys.argv:
        queries = sys.argv[sys.argv.index("--queries") + 1].split(",")

    from meilisync_spark import queries as Q
    from meilisync_spark.session import get_spark

    spark = get_spark(app_name="meilisync-spark-scaling")
    work = tempfile.mkdtemp(prefix="mls_scaling_")
    timings: dict[str, dict[int, float]] = {q: {} for q in queries}
    try:
        for n in sizes:
            d = os.path.join(work, f"n{n}")
            os.makedirs(d)
            gen_corpus(n, max(n // 5, 2000), d)
            for name in queries:
                fn = Q.REGISTRY[name].fn
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, d).write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                    spark.catalog.clearCache()
                timings[name][n] = round(best, 3)
                print(f"# {name} @ {n} docs: {timings[name][n]}s", file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALING.json")
    out = {"sizes": sizes, "timings": {}, "exponents": {}}
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
        out["timings"] = prev.get("timings", {})
        out["sizes"] = sorted(
            set(prev.get("sizes", [])) | set(sizes)
        )
    for name in queries:
        merged = dict(out["timings"].get(name, {}))
        merged.update({str(n): timings[name][n] for n in sizes})
        out["timings"][name] = merged
    # exponents over each query's FULL sorted series (merged runs)
    for name, ts in out["timings"].items():
        series = sorted((int(k), v) for k, v in ts.items())
        exps = {}
        for (a, ta), (b, tb) in zip(series, series[1:]):
            exps[f"{a}->{b}"] = round(math.log(tb / ta) / math.log(b / a), 3)
        out["exponents"][name] = exps
    payload = json.dumps(out)
    print(payload)
    with open(path, "w") as fh:
        fh.write(payload + "\n")


if __name__ == "__main__":
    main()
