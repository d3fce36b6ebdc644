#!/usr/bin/env python
"""Value-identity check between the working tree and a git ref for
named registry queries: collects both sides in one session (the
bench.py --ab activation trick) and compares the sorted string render
of every row — the same canon the round driver hashes.

Usage: python tools/ab_value_check.py <ref> <sf_dir> q1 q2 ...
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from meilisync_spark.session import get_spark


def _activate(root: str, other: str):
    import importlib

    for mod in [m for m in sys.modules
                if m == "meilisync_spark" or m.startswith("meilisync_spark.")]:
        del sys.modules[mod]
    sys.path[:] = [p for p in sys.path if p not in (root, other)]
    sys.path.insert(0, root)
    return importlib.import_module("meilisync_spark.queries")


def canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def main() -> None:
    ref, sf_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    base_root = tempfile.mkdtemp(prefix=f"abval_{ref}_")
    tar = subprocess.run(["git", "-C", REPO_ROOT, "archive", ref],
                         check=True, stdout=subprocess.PIPE)
    subprocess.run(["tar", "-x", "-C", base_root], input=tar.stdout, check=True)
    spark = get_spark(app_name="ab-value-check")
    bad = []
    for name in names:
        cur_q = _activate(REPO_ROOT, base_root)
        cur = canon(cur_q.REGISTRY[name].fn(spark, sf_dir))
        base_q = _activate(base_root, REPO_ROOT)
        base = canon(base_q.REGISTRY[name].fn(spark, sf_dir))
        ok = cur == base
        if not ok:
            bad.append(name)
            diff = [(a, b) for a, b in zip(cur, base) if a != b][:3]
            print(f"DIFF {name}: rows {len(cur)} vs {len(base)}; first diffs: {diff}")
        else:
            print(f"OK   {name}: {len(cur)} rows identical")
        spark.catalog.clearCache()
    _activate(REPO_ROOT, base_root)
    print("FAILING:", bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
