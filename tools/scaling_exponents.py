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
    # realistic row groups (64k rows): pyarrow's default is ONE ~1M-row
    # group, which no real 100-TB writer produces and which makes the
    # file unsplittable — the harness would then measure spread()'s
    # pathological-file pin path instead of operator structure (the
    # round-8 diagnosis of the phantom 500k->1M superlinearity)
    pq.write_table(
        t, os.path.join(outdir, "documents.parquet"), row_group_size=65536
    )

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


def streaming_main(sizes: list[int]) -> None:
    """The O(batch) claims measured (VERDICT r7 item 5): per-batch cost
    of the two streaming maintenance loops as the PRE-EXISTING state
    grows, batch size held constant. A healthy curve is flat — the
    exponent in INDEX size should sit near 0, not near 1:

    - ``streaming_corpus_ingest_batch``: ingest a fixed 5k-doc batch
      (near-dedup on) into a corpus index already holding ``n`` docs.
      The exact-dedup anti-join and the near-dup band probe both read
      the stored index, but hash-join work is bounded by the batch's
      own keys.
    - ``ann_add_batch``: ``run_ann_ingest`` a fixed 2k-vector batch
      into a served IVF+PQ index already holding ``n`` vectors (the
      dedup anti-join is pruned to the batch's own cells).

    Each size runs in the shared session (state setup is untimed; the
    timed span is exactly one availableNow micro-batch drive). Results
    merge into SCALING.json like the batch series, keyed by the
    PRE-EXISTING size.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from meilisync_spark.operators.ivfpq import save_index, seed_index_vectors
    from meilisync_spark.session import get_spark
    from meilisync_spark.streaming.ann_ingest import run_ann_ingest
    from meilisync_spark.streaming.corpus_ingest import run_corpus_ingest

    BATCH_DOCS = 5_000
    BATCH_VECS = 2_000
    spark = get_spark(app_name="meilisync-spark-scaling-streaming")
    work = tempfile.mkdtemp(prefix="mls_scaling_stream_")
    timings: dict[str, dict[int, float]] = {
        "streaming_corpus_ingest_batch": {},
        "ann_add_batch": {},
    }
    try:
        for n in sizes:
            d = os.path.join(work, f"n{n}")
            os.makedirs(d)
            # base corpus (seed 42) + a DISJOINT fixed-size batch
            # (different seed, doc_ids offset past the base) — the
            # batch must not shrink with near-dedup against itself
            gen_corpus(n, max(n // 5, BATCH_VECS + 1000), d)
            bdir = os.path.join(d, "batchsrc")
            os.makedirs(bdir)
            gen_corpus(BATCH_DOCS, 10, bdir, seed=7)

            # --- corpus ingest: build state with the base corpus ---
            drop = os.path.join(d, "incoming")
            os.makedirs(drop)
            os.link(os.path.join(d, "documents.parquet"),
                    os.path.join(drop, "base.parquet"))
            idx = os.path.join(d, "corpus_idx")
            ck = os.path.join(d, "ck_ingest")
            run_corpus_ingest(spark, drop, idx, ck, near_dedup=True,
                              available_now=True, timeout_sec=600.0)
            # offset the batch doc_ids past the base corpus
            t = pq_.read_table(os.path.join(bdir, "documents.parquet"))
            t = t.set_column(0, "doc_id",
                             pa.array((t.column("doc_id").to_numpy() + 10_000_000)
                                      .tolist(), pa.int64()))
            pq_.write_table(t, os.path.join(drop, "batch.parquet"))
            t0 = time.perf_counter()
            run_corpus_ingest(spark, drop, idx, ck, near_dedup=True,
                              available_now=True, timeout_sec=600.0)
            timings["streaming_corpus_ingest_batch"][n] = round(
                time.perf_counter() - t0, 3)
            print(f"# streaming_corpus_ingest_batch @ {n}: "
                  f"{timings['streaming_corpus_ingest_batch'][n]}s",
                  file=sys.stderr)

            # --- ann add: index with n vectors, add a fixed 2k batch ---
            rng = np.random.default_rng(123)
            V = rng.standard_normal((n, 64)).astype(np.float64)
            V /= np.linalg.norm(V, axis=1, keepdims=True)
            base = spark.createDataFrame(
                [(int(i), v.tolist()) for i, v in enumerate(V)],
                "vec_id long, embedding array<double>")
            ann = os.path.join(d, "ann_idx")
            save_index(base, ann)
            seed_index_vectors(base, ann)
            W = rng.standard_normal((BATCH_VECS, 64)).astype(np.float64)
            W /= np.linalg.norm(W, axis=1, keepdims=True)
            vdrop = os.path.join(d, "vec_incoming")
            os.makedirs(vdrop)
            vt = pa.table({
                "vec_id": pa.array(range(10_000_000, 10_000_000 + BATCH_VECS),
                                   pa.int64()),
                "embedding": pa.array([w.tolist() for w in W],
                                      pa.list_(pa.float64())),
            })
            pq_.write_table(vt, os.path.join(vdrop, "b0.parquet"))
            t0 = time.perf_counter()
            run_ann_ingest(spark, vdrop, ann, os.path.join(d, "ck_ann"),
                           timeout_sec=600.0)
            timings["ann_add_batch"][n] = round(time.perf_counter() - t0, 3)
            print(f"# ann_add_batch @ {n}: {timings['ann_add_batch'][n]}s",
                  file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    _merge_and_write(sizes, timings)


def _merge_and_write(sizes: list[int], timings: dict[str, dict[int, float]]) -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALING.json")
    out = {"sizes": sizes, "timings": {}, "exponents": {}}
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
        out["timings"] = prev.get("timings", {})
        out["sizes"] = sorted(set(prev.get("sizes", [])) | set(sizes))
    for name, ts in timings.items():
        merged = dict(out["timings"].get(name, {}))
        merged.update({str(n): v for n, v in ts.items()})
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


_CELL_CHILD = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from meilisync_spark.session import get_spark
from meilisync_spark.queries import REGISTRY

spark = get_spark(app_name="mls-scaling-cell")
fn = REGISTRY[{name!r}].fn
best = float("inf")
for _ in range({loops}):
    t0 = time.perf_counter()
    fn(spark, {d!r}).write.format("noop").mode("overwrite").save()
    best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
    # release the finished run's checkpoint pins deterministically:
    # the ContextCleaner only collects them after a JVM GC notices the
    # dead weak refs, and an unpressured heap may not GC between runs
    # (measured: the SAME cell at 44 s or 8+ min of eviction thrash
    # depending on GC timing) — a forced collection between timed runs
    # measures the operator, not the cleaner's schedule
    spark._jvm.System.gc()
    time.sleep(1.0)
print("RESULT " + json.dumps(round(best, 3)))
"""


def main() -> None:
    sizes = [5000, 15000, 50000]
    if "--sizes" in sys.argv:
        sizes = [int(x) for x in sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    if "--streaming" in sys.argv:
        streaming_main(sizes)
        return
    queries = list(QUERIES)
    if "--queries" in sys.argv:
        queries = sys.argv[sys.argv.index("--queries") + 1].split(",")

    # Protocol (round 8): ONE FRESH JVM PER (query, size) CELL.
    # A shared session contaminates later cells two ways, both caught
    # by the stage-decomposition probes: localCheckpoint pins from
    # earlier queries age into the old gen / block manager (the 1M
    # pipeline cell varied 209-382 s purely by what ran before it),
    # and JIT warmup from earlier cells speeds SMALL cells more than
    # large ones, bending the exponent both directions. Cold-per-cell
    # makes warmup a size-independent constant; construction time
    # (where AQE executes pinned subtrees eagerly) stays inside the
    # timed span. min-of-{2} within the cell's own JVM; the second run
    # benefits from its own pins exactly like a production re-query.
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if "--workdir" in sys.argv:
        work = sys.argv[sys.argv.index("--workdir") + 1]
        os.makedirs(work, exist_ok=True)
        clean = False
    else:
        work = tempfile.mkdtemp(prefix="mls_scaling_")
        clean = True
    timings: dict[str, dict[int, float]] = {q: {} for q in queries}
    try:
        for n in sizes:
            d = os.path.join(work, f"n{n}")
            if not os.path.isdir(d):
                os.makedirs(d)
                gen_corpus(n, max(n // 5, 2000), d)
            for name in queries:
                # min-of-2 at EVERY size: the first run in a fresh JVM
                # pays whole-stage-codegen compilation (~10-15 s flat),
                # so a min-of-1 tier at large sizes would compare warm
                # small cells against cold large ones — a protocol
                # discontinuity that once printed exact_dedup exp 2.0
                loops = 2
                code = _CELL_CHILD.format(root=root, name=name, d=d, loops=loops)
                p = subprocess.run(
                    [sys.executable, "-c", code], capture_output=True, text=True
                )
                line = [
                    l for l in p.stdout.splitlines() if l.startswith("RESULT ")
                ]
                if not line:
                    raise RuntimeError(
                        f"cell {name}@{n} failed:\n{p.stderr[-3000:]}"
                    )
                timings[name][n] = json.loads(line[-1][len("RESULT "):])
                print(f"# {name} @ {n} docs: {timings[name][n]}s", file=sys.stderr)
    finally:
        if clean:
            shutil.rmtree(work, ignore_errors=True)

    _merge_and_write(sizes, timings)


if __name__ == "__main__":
    main()
