#!/usr/bin/env python
"""Capture .explain('formatted') for bench headline queries into plans/$SPARK_GRAFT_PLANS_ROUND (default r10).

Usage:
    python tools/capture_plans.py before            # all headline queries
    python tools/capture_plans.py after q1,q2,...   # subset, _after suffix

Planning only (no execution): each query fn is built against
$SPARK_GRAFT_SF_DIR (default sf0.1) and its formatted physical plan written
to plans/<round>/<name>_<tag>.txt. With AQE on, this is the initial plan
(isFinalPlan=false) — join strategies and Exchange placement are still
visible, which is what the plan-diff claims in OPTIMIZATION_r09.md cite.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from phageclouds_graphdatabase_spark.plans.suite import SUITE  # noqa: E402
from phageclouds_graphdatabase_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("phageclouds-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        try:
            df = SUITE[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # iterative ops may run probe jobs
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
