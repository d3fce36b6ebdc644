#!/usr/bin/env python
"""Retrain-loop cost curve (VERDICT r7 item 8): ``rebuild_index``
retrains both quantizers on the FULL raw-vector sidecar every trip —
measure its wall-time at growing sidecar sizes to record when full
retrain stops being the right answer and incremental-train or a
reservoir-sampled retrain becomes necessary.

Protocol: fresh subprocess per size (the SCALING.json discipline).
Each child seeds a sidecar of ``n`` unit vectors (dim 64, the bench
embedding shape), builds the initial index, then times ONE
``rebuild_index`` over ``read_index_vectors`` — exactly the call the
drift loop (streaming/ann_ingest.py) and ``cli.py pipeline
--retrain-growth`` make.

Usage: python tools/retrain_cost_probe.py [--sizes 250000,500000,1000000]
Writes RETRAIN_COST.json at the repo root (evidence for SCALE.md).
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CHILD = r"""
import json, os, sys, time
import numpy as np
sys.path.insert(0, {root!r})
from meilisync_spark.session import get_spark
from meilisync_spark.operators.ivfpq import (
    read_index_vectors, rebuild_index, save_index, seed_index_vectors,
)

n = {n}
work = {work!r}
spark = get_spark(app_name=f"retrain-probe-{{n}}")

rng = np.random.default_rng(99)
dim = 64
# chunked generation keeps the driver-side arrow batch bounded
parts = []
CH = 250_000
for off in range(0, n, CH):
    m = min(CH, n - off)
    V = rng.standard_normal((m, dim))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    parts.append(spark.createDataFrame(
        [(int(off + i), v.tolist()) for i, v in enumerate(V)],
        "vec_id long, embedding array<double>"))
emb = parts[0]
for p in parts[1:]:
    emb = emb.unionByName(p)

idx = os.path.join(work, f"idx_{{n}}")
save_index(emb, idx)
seed_index_vectors(emb, idx)

t0 = time.perf_counter()
rebuild_index(read_index_vectors(spark, idx), idx)
sec = round(time.perf_counter() - t0, 3)
print("RESULT " + json.dumps({{"n": n, "rebuild_sec": sec}}))
"""


def main() -> None:
    sizes = [250_000, 500_000, 1_000_000]
    if "--sizes" in sys.argv:
        sizes = [int(x) for x in sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    work = tempfile.mkdtemp(prefix="mls_retrain_probe_")
    out = []
    try:
        for n in sizes:
            p = subprocess.run(
                [sys.executable, "-c", CHILD.format(root=ROOT, n=n, work=work)],
                capture_output=True, text=True,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
            if not line:
                raise RuntimeError(f"probe at n={n} failed:\n{p.stderr[-3000:]}")
            out.append(json.loads(line[-1][len("RESULT "):]))
            print(f"# {out[-1]}", file=sys.stderr)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
    payload = {"runs": out, "exponents": {}}
    for a, b in zip(out, out[1:]):
        payload["exponents"][f"{a['n']}->{b['n']}"] = round(
            math.log(b["rebuild_sec"] / a["rebuild_sec"])
            / math.log(b["n"] / a["n"]), 3)
    print(json.dumps(payload, indent=1))
    with open(os.path.join(ROOT, "RETRAIN_COST.json"), "w") as fh:
        json.dump(payload, fh)


if __name__ == "__main__":
    main()
