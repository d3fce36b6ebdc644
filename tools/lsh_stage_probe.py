#!/usr/bin/env python
"""Stage-level decomposition of minhash_lsh_pairs at two corpus sizes
(VERDICT r7 item 1: the 500k→1M doubling measured exp 1.66 while every
smaller doubling is near-linear — find WHERE the superlinearity lives).

For each size (fresh subprocess = fresh JVM, the SCALING.json
protocol) the pipeline is split at its natural barriers and timed
separately, with JVM GC time (GarbageCollectorMXBeans) and heap
deltas sampled around each stage:

  sig    — minhash_signatures(docs) → noop write (tokenize + fold)
  pin    — lsh_bands(sigs).localCheckpoint(False) materialized via
           count() (the band-table pin both join sides scan)
  stats  — the _cap_left_side over-cap bucket aggregation (reads pin)
  join   — capped self-join + est_jaccard + distinct (reads pin)
  full   — the unsplit minhash_lsh_pairs, for reference

Per-stage exponents over the size doubling tell which stage breaks;
gc_ms tells whether the break is collection pressure (the pinned band
table aging into the old gen) rather than algorithmic volume.

Usage: python tools/lsh_stage_probe.py [--sizes 500000,1000000]
Writes LSH_PROBE.json at the repo root (evidence for SCALE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from tools.scaling_exponents import gen_corpus
from meilisync_spark.session import get_spark
from meilisync_spark.sources.parquet import load_table
from meilisync_spark.operators import dedup as D
from pyspark.sql import functions as F

n = {n}
work = {work!r}
d = os.path.join(work, f"n{{n}}")
if not os.path.isdir(d):
    os.makedirs(d)
    gen_corpus(n, 2000, d)

spark = get_spark(app_name=f"lsh-probe-{{n}}")
jvm = spark._jvm


def gc_ms():
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(b.getCollectionTime() for b in beans)


def heap_mb():
    rt = jvm.java.lang.Runtime.getRuntime()
    return (rt.totalMemory() - rt.freeMemory()) / 1e6


def stage(name, thunk, out):
    g0, t0 = gc_ms(), time.perf_counter()
    thunk()
    out[name] = {{"sec": round(time.perf_counter() - t0, 3),
                 "gc_ms": gc_ms() - g0,
                 "heap_mb": round(heap_mb())}}
    print(f"# {{n}}: {{name}} {{out[name]}}", file=sys.stderr)


res = {{}}
docs = load_table(spark, d, "documents")

# CONSTRUCTION inside each stage thunk: localCheckpoint (even lazy)
# and AQE plan access execute upstream exchanges at CALL time — a
# frame built outside the timer silently exports its cost out of the
# measurement (the round-8 probe bug).
state = {{}}


def s_sig():
    D.minhash_signatures(docs).write.format("noop").mode("overwrite").save()


def s_pin():
    # mirror the CURRENT minhash_lsh_pairs shape (round 8): sig table
    # pinned, slim (doc_id, band_idx, band_hash) band table pinned
    state["sigs"] = D.minhash_signatures(docs).localCheckpoint(False)
    state["bands"] = D.lsh_bands_slim(state["sigs"]).localCheckpoint(False)
    state["bands"].count()


def s_stats():
    big = (
        state["bands"].groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("_n"), F.min("doc_id").alias("_rep"))
        .where(F.col("_n") > D.LSH_BUCKET_CAP)
    )
    big.write.format("noop").mode("overwrite").save()


def s_join():
    bands, sigs = state["bands"], state["sigs"]
    a = D._cap_left_side(bands).select(
        F.col("doc_id").alias("doc_a"), "band_idx", "band_hash")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_hash")
    pairs = (a.join(b, ["band_idx", "band_hash"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b")
             .distinct())
    matched = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                              lambda m: m))
    out = (
        pairs.join(sigs.select(F.col("doc_id").alias("doc_a"),
                               F.col("sig").alias("sig_a")), "doc_a")
        .join(sigs.select(F.col("doc_id").alias("doc_b"),
                          F.col("sig").alias("sig_b")), "doc_b")
        .select("doc_a", "doc_b",
                (matched / F.lit(D.NUM_PERM)).alias("est_jaccard"))
    )
    out.write.format("noop").mode("overwrite").save()


def s_full():
    D.minhash_lsh_pairs(docs).write.format("noop").mode("overwrite").save()


stage("sig", s_sig, res)
stage("pin", s_pin, res)
stage("stats", s_stats, res)
stage("join", s_join, res)
stage("full", s_full, res)

print("RESULT " + json.dumps({{"n": n, "stages": res}}))
"""


def main() -> None:
    sizes = [500_000, 1_000_000]
    if "--sizes" in sys.argv:
        sizes = [int(x) for x in sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    if "--workdir" in sys.argv:
        work = sys.argv[sys.argv.index("--workdir") + 1]
        os.makedirs(work, exist_ok=True)
        clean = False
    else:
        work = tempfile.mkdtemp(prefix="mls_lsh_probe_")
        clean = True
    out = []
    try:
        for n in sizes:
            code = CHILD.format(root=ROOT, n=n, work=work)
            p = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True
            )
            sys.stderr.write(p.stderr[-4000:])
            line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
            if not line:
                raise RuntimeError(f"probe at n={n} failed:\n{p.stdout[-2000:]}")
            out.append(json.loads(line[-1][len("RESULT "):]))
    finally:
        if clean:
            import shutil

            shutil.rmtree(work, ignore_errors=True)
    payload = {"runs": out}
    if len(out) == 2:
        import math

        a, b = out
        ratio = math.log(b["n"] / a["n"])
        payload["exponents"] = {
            s: round(
                math.log(b["stages"][s]["sec"] / a["stages"][s]["sec"]) / ratio, 3
            )
            for s in a["stages"]
        }
    print(json.dumps(payload, indent=1))
    with open(os.path.join(ROOT, "LSH_PROBE.json"), "w") as fh:
        json.dump(payload, fh)


if __name__ == "__main__":
    main()
