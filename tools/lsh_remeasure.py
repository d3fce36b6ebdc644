#!/usr/bin/env python
"""Isolated re-measures of the two LSH-joined scaling rows at the top
doubling (VERDICT r7 item 1 'done' criterion: exponent ≤ ~1.1 on
500k→1M, or a proven host-noise explanation from ≥3 isolated
re-measures).

Protocol: corpora generated ONCE per size (the SCALING.json
generator, same seeds), then REPS independent measurements per size,
each in a fresh subprocess (fresh JVM), ALTERNATING sizes so host
drift hits both sizes equally. minhash_lsh_pairs is timed min-of-2
(the SCALING.json protocol); corpus_pipeline_full min-of-1 (too
expensive to double). Exponent per rep-pair plus the min-over-reps
exponent are reported.

Usage: python tools/lsh_remeasure.py [--sizes 500000,1000000] [--reps 3]
Writes LSH_REMEASURE.json at the repo root (evidence for SCALE.md).
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
sys.path.insert(0, {root!r})
from meilisync_spark.session import get_spark
from meilisync_spark.queries import REGISTRY

d = {d!r}
spark = get_spark(app_name="lsh-remeasure")
res = {{}}
for name, loops in [("minhash_lsh_pairs", 2), ("corpus_pipeline_full", 1)]:
    fn = REGISTRY[name].fn
    best = float("inf")
    for _ in range(loops):
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    res[name] = round(best, 3)
print("RESULT " + json.dumps(res))
"""


def main() -> None:
    sizes = [500_000, 1_000_000]
    reps = 3
    if "--sizes" in sys.argv:
        sizes = [int(x) for x in sys.argv[sys.argv.index("--sizes") + 1].split(",")]
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    from tools.scaling_exponents import gen_corpus

    work = tempfile.mkdtemp(prefix="mls_lsh_rem_")
    runs: dict[int, list[dict]] = {n: [] for n in sizes}
    try:
        for n in sizes:
            d = os.path.join(work, f"n{n}")
            os.makedirs(d)
            print(f"# generating {n}", file=sys.stderr)
            gen_corpus(n, 2000, d)
        for r in range(reps):
            for n in sizes:  # alternate sizes within each rep
                d = os.path.join(work, f"n{n}")
                p = subprocess.run(
                    [sys.executable, "-c", CHILD.format(root=ROOT, d=d)],
                    capture_output=True, text=True,
                )
                line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
                if not line:
                    raise RuntimeError(
                        f"rep {r} n={n} failed:\n{p.stderr[-3000:]}"
                    )
                res = json.loads(line[-1][len("RESULT "):])
                runs[n].append(res)
                print(f"# rep {r} n={n}: {res}", file=sys.stderr)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)

    payload: dict = {"sizes": sizes, "reps": reps,
                     "runs": {str(n): v for n, v in runs.items()}}
    if len(sizes) == 2:
        a, b = sizes
        lr = math.log(b / a)
        exps = {}
        for q in ("minhash_lsh_pairs", "corpus_pipeline_full"):
            per_rep = [
                round(math.log(runs[b][i][q] / runs[a][i][q]) / lr, 3)
                for i in range(reps)
            ]
            tmin_a = min(x[q] for x in runs[a])
            tmin_b = min(x[q] for x in runs[b])
            exps[q] = {
                "per_rep": per_rep,
                "min_over_reps": round(math.log(tmin_b / tmin_a) / lr, 3),
                "times_a": [x[q] for x in runs[a]],
                "times_b": [x[q] for x in runs[b]],
            }
        payload["exponents"] = exps
    print(json.dumps(payload, indent=1))
    with open(os.path.join(ROOT, "LSH_REMEASURE.json"), "w") as fh:
        json.dump(payload, fh)


if __name__ == "__main__":
    main()
