#!/usr/bin/env python
"""Per-Spark-job time attribution for one suite query (guide §1/§7).

Runs the named query once (warm: after a throwaway warm-up execution of the
same query, matching bench.py's median-of-3 'engine time' framing), then
dumps every Spark job the timed execution ran — duration, description,
stage shuffle volumes — from the live UI REST API. This is how we find
where the seconds inside an iterative operator (per-round joins,
checkpoints, probes) actually go.

Usage: python tools/job_profile.py <query_name> [--cold]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phageclouds_graphdatabase_spark.plans.suite import SUITE  # noqa: E402
from phageclouds_graphdatabase_spark.session import get_spark  # noqa: E402


def api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> None:
    name = sys.argv[1]
    cold = "--cold" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("phageclouds-job-profile")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    fn = SUITE[name].fn
    if not cold:
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    jobs_before = {j["jobId"] for j in api(base, "/jobs")}
    spark.sparkContext.setJobDescription(f"timed: {name}")
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    jobs = [j for j in api(base, "/jobs") if j["jobId"] not in jobs_before]
    jobs.sort(key=lambda j: j["jobId"])
    total_job = 0.0
    print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs ===")
    for j in jobs:
        t_sub = time.mktime(
            time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        ) + float(j["submissionTime"][20:23]) / 1000
        t_end = time.mktime(
            time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        ) + float(j["completionTime"][20:23]) / 1000
        dur = t_end - t_sub
        total_job += dur
        desc = (j.get("description") or j["name"])[:110]
        print(f"  job {j['jobId']:>4}  {dur:6.2f}s  tasks={j['numTasks']:<5} {desc}")
    print(f"  sum of job durations: {total_job:.2f}s (gaps = driver time)")

    # stage-level shuffle volumes for the 10 longest stages of the timed run
    stages = api(base, "/stages?status=complete")
    recent = [
        s for s in stages
        if any(s["stageId"] in j["stageIds"] for j in jobs)
    ]
    recent.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print("\n  top stages by executorRunTime:")
    for s in recent[:12]:
        print(
            f"    stage {s['stageId']:>4} run={s['executorRunTime']/1000:6.2f}s "
            f"tasks={s['numCompleteTasks']:<4} "
            f"shufW={s.get('shuffleWriteBytes',0)/1e6:8.1f}MB "
            f"shufR={s.get('shuffleReadBytes',0)/1e6:8.1f}MB  "
            f"{s['name'][:60]}"
        )


if __name__ == "__main__":
    main()
