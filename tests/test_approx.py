"""Approximate aggregations (A6): since round 2 the suite entry is
self-verifying (it computes approx AND exact and emits tolerance-verdict
booleans, so the DuckDB oracle hash-checks it). This test asserts the
verdict booleans really hold and the exact columns match an independently
written exact aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.plans.suite_pipeline import approx_stats_lineitem
from phageclouds_graphdatabase_spark.sources.readers import read_table


def test_approx_stats_within_tolerance(spark, sf_dir):
    row = approx_stats_lineitem(spark, sf_dir).collect()[0]
    assert row.orders_ok and row.parts_ok
    assert row.q50_ok and row.q90_ok and row.q99_ok
    li = read_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("orders"),
        F.countDistinct("l_partkey").alias("parts"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert row.exact_orders == exact.orders
    assert row.exact_parts == exact.parts
    assert row.n_rows == exact.n
