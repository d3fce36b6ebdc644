#!/usr/bin/env python
"""Per-query action/job decomposition probe (round 12).

For each named registry query: run it twice (untimed JIT/codegen warmup
+ timed), and report wall seconds plus HOW MANY Spark jobs the
invocation launched and where the time went between them. At sf0.1 the
fixture tables are tiny (2k-600k rows), so multi-second rows are
dominated by the COUNT of sequential actions (driver loops, collects,
eager checkpoints) times per-job scheduling overhead — this probe makes
that structure visible, which `.explain` (final frame only) cannot.

Methodology per the verify-skill notes: fresh DataFrame per rep, min
not mean is NOT used here (single timed rep — the probe is for
structure, not headline numbers), System.gc() between queries so dead
checkpoint pins from the previous query don't tax this one.

Usage: python tools/query_job_probe.py q1 q2 ... [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meilisync_spark import queries as Q
from meilisync_spark.session import get_spark


def probe(spark, name: str, sf_dir: str) -> dict:
    sc = spark.sparkContext
    fn = Q.REGISTRY[name].fn
    # warmup (codegen/JIT) — separate rep, fresh frame
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    sc._jvm.System.gc()

    tracker = sc.statusTracker()
    group = f"probe_{name}"
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    job_ids = sorted(tracker.getJobIdsForGroup(group))
    jobs = []
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        sids = list(info.stageIds)
        ns, ntasks, desc = len(sids), 0, ""
        for s in sids:
            si = tracker.getStageInfo(s)
            if si is not None:
                ntasks += si.numTasks
                if not desc:
                    desc = si.name
        jobs.append({"job": jid, "stages": ns, "tasks": ntasks, "first_stage": desc[:60]})
    spark.catalog.clearCache()
    return {
        "query": name,
        "wall_s": round(wall, 3),
        "n_jobs": len(job_ids),
        "n_stages": sum(j["stages"] for j in jobs),
        "n_tasks": sum(j["tasks"] for j in jobs),
        "jobs": jobs,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark(app_name="query-job-probe")
    for name in args:
        r = probe(spark, name, sf_dir)
        compact = {k: r[k] for k in ("query", "wall_s", "n_jobs", "n_stages", "n_tasks")}
        print(json.dumps(compact))
        for j in r["jobs"]:
            print(f"   job {j['job']}: {j['stages']} stages {j['tasks']} tasks  {j['first_stage']}")


if __name__ == "__main__":
    main()
