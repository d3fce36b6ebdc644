#!/usr/bin/env python
"""Stage-level decomposition of corpus_pipeline_full at two corpus
sizes (round 8: LSH_REMEASURE.json shows minhash_lsh_pairs fixed at
exp ~0.80 on 500k→1M after the slim band join, but the composed
pipeline still measures ~1.4 with wild 1M variance (209–382 s over 3
fresh-JVM reps) — the superlinear step is OUTSIDE the minhash stage).

Each size runs in a fresh subprocess (fresh JVM). The pipeline is cut
at its own barriers — each stage consumes the PREVIOUS stage's pinned
output exactly like the production composition, so a stage's time is
its own work, not replayed lineage:

  exact — quality gate + content-hash canonical window, pinned
          (localCheckpoint) and counted
  lsh   — minhash_lsh_pairs over the pinned survivors → near-dup
          drop set, pinned and counted
  decon — decontaminate(docs) contaminated-id set (the independent
          subtree), pinned and counted
  pack  — the two anti-joins + pack_sequences → noop write
  full  — the unsplit corpus_pipeline_full, for reference (what
          SCALING.json times)

GC time (GarbageCollectorMXBeans) and heap deltas are sampled around
each stage: a stage whose exponent is fine but whose gc_ms explodes
at 1M points at collection pressure from the pinned stage tables, not
algorithmic volume.

Usage: python tools/pipeline_stage_probe.py [--sizes 500000,1000000]
                                            [--workdir DIR] [--skip-full]
Writes PIPELINE_PROBE.json at the repo root (evidence for SCALE.md).
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
from meilisync_spark.operators.text import pack_sequences, quality_keep
from meilisync_spark.pin import SER
from pyspark.sql import Window, functions as F

n = {n}
skip_full = {skip_full}
work = {work!r}
d = os.path.join(work, f"n{{n}}")
if not os.path.isdir(d):
    os.makedirs(d)
    gen_corpus(n, 2000, d)

spark = get_spark(app_name=f"pipeline-probe-{{n}}")
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
docs = D.spread(load_table(spark, d, "documents"))

# CONSTRUCTION happens INSIDE each stage thunk: localCheckpoint (even
# eager=False) and any AQE plan execute their upstream exchanges AT
# CALL TIME, so building a frame outside the timer silently moves its
# cost out of the measurement (the round-8 probe bug — the first
# decomposition printed 0.2 s for a 600-CPU-second LSH stage).
state = {{}}


def s_exact():
    kept = docs.where(quality_keep(F.col("text"))).select(
        "doc_id", "lang", "text",
        F.sha2(D.normalize_text(F.col("text")), 256).alias("content_hash"),
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    state["exact_sur"] = (
        kept.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", "lang", "text")
        # SERIALIZED pin (pin.py SER) like the production composition:
        # a deserialized text pin inflates 3-5x and its GC/eviction
        # bleeds into every later stage (the round-10 lesson; measured
        # here too — 1M lsh read 86 s off a deserialized pin vs 31 s
        # off a clean scan)
        .localCheckpoint(False, storageLevel=SER)
    )
    state["exact_sur"].count()


def s_lsh():
    state["near_drop"] = (
        D.minhash_lsh_pairs(state["exact_sur"].select("doc_id", "text"))
        .where(F.col("est_jaccard") >= D.NEAR_DUP_TAU)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .localCheckpoint(False, storageLevel=SER)
    )
    state["near_drop"].count()


def s_decon():
    state["contaminated"] = (
        D.decontaminate(docs)
        .select(F.col("corpus_doc").alias("doc_id"))
        .distinct()
        .localCheckpoint(False, storageLevel=SER)
    )
    state["contaminated"].count()


def s_pack():
    near_sur = state["exact_sur"].join(state["near_drop"], "doc_id", "left_anti")
    final = (
        near_sur.where(~D._eval_flag(F.col("doc_id")))
        .join(state["contaminated"], "doc_id", "left_anti")
    )
    packed = pack_sequences(final.select("doc_id", "lang", "text"))
    packed.write.format("noop").mode("overwrite").save()


stage("exact", s_exact, res)
stage("lsh", s_lsh, res)
stage("decon", s_decon, res)
stage("pack", s_pack, res)

# -- reference: the unsplit composition (fresh lineage, own pins) —
#    construction inside the thunk, like the scaling harness times it
if not skip_full:
    def s_full():
        full = D.corpus_pipeline_full(load_table(spark, d, "documents"))
        full.write.format("noop").mode("overwrite").save()

    stage("full", s_full, res)

print("RESULT " + json.dumps({{"n": n, "stages": res}}))
"""


def main() -> None:
    sizes = [500_000, 1_000_000]
    if "--sizes" in sys.argv:
        sizes = [int(x) for x in sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    skip_full = "--skip-full" in sys.argv
    if "--workdir" in sys.argv:
        work = sys.argv[sys.argv.index("--workdir") + 1]
        os.makedirs(work, exist_ok=True)
        clean = False
    else:
        work = tempfile.mkdtemp(prefix="mls_pipe_probe_")
        clean = True
    out = []
    try:
        for n in sizes:
            code = CHILD.format(root=ROOT, n=n, work=work,
                                skip_full=repr(skip_full))
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
    with open(os.path.join(ROOT, "PIPELINE_PROBE.json"), "w") as fh:
        json.dump(payload, fh)


if __name__ == "__main__":
    main()
