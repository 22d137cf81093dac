"""Approximate aggregations (A6) have no cross-engine value oracle (sketch
algorithms differ); correctness is pinned here as relative error against the
exact answers instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.plans.suite_pipeline import approx_stats_lineitem
from phageclouds_graphdatabase_spark.sources.readers import read_table


def test_approx_stats_within_tolerance(spark, sf_dir):
    row = approx_stats_lineitem(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("orders"),
        F.countDistinct("l_partkey").alias("parts"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("q"),
    ).collect()[0]
    # HLL++ default rsd is 5%; allow 10% slack.
    assert abs(row.approx_orders - exact.orders) <= 0.10 * exact.orders
    assert abs(row.approx_parts - exact.parts) <= 0.10 * exact.parts
    for approx_q, exact_q in zip(row.price_quantiles, exact.q):
        assert abs(approx_q - exact_q) <= 0.05 * abs(exact_q)
