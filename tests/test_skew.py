"""Skew-mitigation operators must be result-identical to their naive
equivalents on skewed input (one dominant key + a uniform tail)."""

from __future__ import annotations

from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.operators import skew


def _skewed_df(spark):
    hot = spark.range(5000).select(F.lit("HOT").alias("k"), F.col("id").alias("v"))
    tail = spark.range(500).select(
        F.concat(F.lit("t"), (F.col("id") % 50)).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


def test_two_phase_count_equals_plain_groupby(spark):
    df = _skewed_df(spark)
    got = {r.k: r["count"] for r in skew.two_phase_count(df, "k", n_salts=8).collect()}
    want = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert got == want
    assert got["HOT"] == 5000


def test_salted_join_equals_plain_join_inner(spark):
    left = _skewed_df(spark)
    right = spark.createDataFrame(
        [("HOT", 1), ("t0", 2), ("t7", 3), ("missing", 9)], "k string, tag int"
    )
    got = sorted(
        (r.k, r.v, r.tag)
        for r in skew.salted_join(left, right, "k", n_salts=4).collect()
    )
    want = sorted((r.k, r.v, r.tag) for r in left.join(right, "k").collect())
    assert got == want


def test_salted_join_left_keeps_unmatched(spark):
    left = _skewed_df(spark)
    right = spark.createDataFrame([("HOT", 1)], "k string, tag int")
    got = skew.salted_join(left, right, "k", n_salts=4, how="left")
    assert got.count() == left.count()
    assert got.filter(F.col("tag").isNull()).count() == 500


def test_salt_from_is_bounded_and_deterministic(spark):
    df = spark.range(1000).select(skew.salt_from(F.col("id"), 8).alias("s"))
    vals = {r.s for r in df.collect()}
    assert vals <= set(range(8))
    again = {r.s for r in df.collect()}
    assert vals == again
