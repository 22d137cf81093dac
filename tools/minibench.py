#!/usr/bin/env python
"""Focused warm timing for selected suite entries (guide §1): one warm-up
execution, then N timed noop-sink runs, per query. Same clearCache/GC
discipline as bench.py so numbers are comparable to BENCH_DETAIL medians.

Usage: python tools/minibench.py q1,q2,... [--repeat 3]
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phageclouds_graphdatabase_spark.plans.suite import SUITE  # noqa: E402
from phageclouds_graphdatabase_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    repeat = int(sys.argv[sys.argv.index("--repeat") + 1]) if "--repeat" in sys.argv else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("phageclouds-minibench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {}
    for name in names:
        fn = SUITE[name].fn
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        xs = []
        for i in range(repeat):
            spark.sparkContext.setJobDescription(f"timed {i}: {name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            xs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        s = sorted(xs)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        out[name] = {"median": round(med, 3), "min": s[0], "samples": xs}
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
