#!/usr/bin/env python
"""Capture `.explain("formatted")` output for named queries into
plans/r12/<query>_<suffix>.txt (the optimization-round deliverable).

Usage: python tools/capture_plans.py before q1 q2 ...
       python tools/capture_plans.py after q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meilisync_spark import queries as Q
from meilisync_spark.session import get_spark

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(ROOT, "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    for name in names:
        df = Q.REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
