"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` -- flagship query (phage-cloud extraction semantics on the
sf0.001 testdata graph). ``queries()`` -- one entry per implemented operator
row of SURVEY.md §2, from phageclouds_graphdatabase_spark.plans.suite.
``oracle_sql()`` -- the DuckDB-equivalent SQL for each (None entries are
omitted: non-SQL-expressible iterative ops get the rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# At import time, before any SparkSession this importer may create: the
# transformWithStateInPandas Python worker needs google.protobuf, and the
# protomini fallback's PYTHONPATH edit only reaches JVM-spawned workers if it
# happens before the JVM launches. (Sessions created even earlier are handled
# post-hoc by vendor.ensure_protobuf_on_workers inside the TWS queries.)
from phageclouds_graphdatabase_spark.vendor import ensure_protobuf  # noqa: E402

ensure_protobuf()

from phageclouds_graphdatabase_spark.plans.suite import SUITE  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: induced-subgraph cloud extraction (seed-filter -> 1-hop
    expand -> induced edges), the reference's canonical query shape
    (/root/reference/phageclouds_gdb.py:56-67), on the sf0.001 graph."""
    return SUITE["graph_induced_edges"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: e.fn for name, e in SUITE.items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in SUITE.items() if e.oracle is not None}
