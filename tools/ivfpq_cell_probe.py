"""Diagnose the ivfpq_persisted_recall scaling-cell variance (VERDICT
r8 item 5): the 150k cell measured 12.9 s and 51.2 s in two fresh
JVMs. SCALE.md round-8 attributed it to "k-means iteration count", but
both trainers run FIXED iteration budgets (kmeans ITERS_DEFAULT=3,
pq PQ_ITERS=2) and exact integer math — the compute is deterministic,
so the swing must live in a specific phase. This probe runs the cell
N times, each in a FRESH JVM (the scaling protocol), with the
operator's phase boundaries timed inside the child:

  clustered_twin_pin   clustered_embeddings + localCheckpoint
  train_and_encode     ivfpq_index (k-means + PQ training + codes)
  index_write          partitionBy(cluster) parquet write
  probe_topk           pruned read-back + ADC + shortlist + re-rank
  recall_vs_brute      brute-force denominator + recall join

Writes IVFPQ_CELL_PROBE.json: per-rep phase tables + per-phase
min/max/spread, so SCALE.md can name the true variance source (or
demote the row's noise note to host-level variance with evidence).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scaling_exponents import gen_corpus  # noqa: E402

_CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {root!r})
from meilisync_spark.session import get_spark
from meilisync_spark.sources.parquet import load_path

spark = get_spark(app_name="ivfpq-cell-probe")
emb = load_path(spark, {emb_path!r}).select("vec_id", "embedding")

from meilisync_spark.operators.ivfpq import (
    ivfpq_persist_index, ivfpq_persisted_topk,
)
from meilisync_spark.operators.similarity import (
    _recall_against_brute, clustered_embeddings,
)

phases = {{}}
def span(name, fn):
    t0 = time.perf_counter()
    out = fn()
    phases[name] = round(time.perf_counter() - t0, 3)
    return out

ce = span("clustered_twin_pin",
          lambda: clustered_embeddings(emb).localCheckpoint(True))
work = tempfile.mkdtemp(prefix="mls_ivfpq_probe_")
try:
    # ivfpq_persisted_topk = persist + probe; split its halves the way
    # the operator composes them
    books = span("train_encode_write",
                 lambda: ivfpq_persist_index(ce, work + "/index"))
    topk = span("probe_topk_action",
                lambda: ivfpq_persisted_topk(
                    spark, ce, work + "/index2", 5))
    # NOTE: persisted_topk re-trains (its own persist call) — time the
    # recall the same way the registry row does, end to end
    out = span("recall_vs_brute",
               lambda: _recall_against_brute(ce, topk, 5).collect())
finally:
    shutil.rmtree(work, ignore_errors=True)
print("RESULT " + json.dumps(phases))
"""


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=150_000)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(REPO, "IVFPQ_CELL_PROBE.json"))
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="mls_ivfpq_cell_")
    try:
        gen_corpus(args.n_docs, max(args.n_docs // 5, 2000), work)
        emb_path = os.path.join(work, "embeddings.parquet")
        reps = []
        for i in range(args.reps):
            code = _CHILD.format(root=REPO, emb_path=emb_path)
            p = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True
            )
            lines = [
                l for l in p.stdout.splitlines() if l.startswith("RESULT ")
            ]
            if not lines:
                raise RuntimeError(f"rep {i} failed:\n{p.stderr[-3000:]}")
            phases = json.loads(lines[-1][len("RESULT "):])
            phases["total"] = round(sum(phases.values()), 3)
            reps.append(phases)
            print(f"# rep {i}: {phases}", file=sys.stderr)
        keys = sorted(reps[0])
        summary = {
            k: {
                "min": min(r[k] for r in reps),
                "max": max(r[k] for r in reps),
                "spread": round(
                    max(r[k] for r in reps) / max(min(r[k] for r in reps), 1e-9),
                    2,
                ),
            }
            for k in keys
        }
        out = {"n_docs": args.n_docs, "reps": reps, "summary": summary}
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
