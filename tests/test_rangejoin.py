"""Binned range joins (operators/rangejoin.py): exactness vs the naive
theta join on adversarial inputs, and the physical-plan guarantee the
operator exists for -- a shuffle equi-join, never BNLJ/cartesian."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.operators.rangejoin import (
    interval_overlap_join,
    point_in_interval_join,
)


def _points(spark, rows):
    return spark.createDataFrame(rows, "grp string, p long, pid long")


def _intervals(spark, rows):
    return spark.createDataFrame(rows, "grp string, lo long, hi long, iid long")


def _naive_pi(points, intervals, keys=("grp",)):
    renamed = intervals
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"{k}_r")
    cond = (points["p"] >= renamed["lo"]) & (points["p"] < renamed["hi"])
    for k in keys:
        cond = cond & (points[k] == renamed[f"{k}_r"])
    return points.join(renamed, cond).select(
        *points.columns, "lo", "hi", "iid"
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


# Edge-adversarial fixture: points on bin edges, on interval edges (lo
# inclusive / hi exclusive), intervals spanning 1 and many bins, empty
# intervals, negative axis values, duplicate points, cross-group decoys.
POINTS = [
    ("a", 0, 1),
    ("a", 9, 2),
    ("a", 10, 3),
    ("a", 19, 4),
    ("a", 20, 5),
    ("a", -1, 6),
    ("a", -10, 7),
    ("a", 35, 8),
    ("a", 35, 9),
    ("b", 9, 10),
]
INTERVALS = [
    ("a", 0, 10, 100),     # one full bin: matches p in [0, 10)
    ("a", 5, 25, 101),     # spans 3 bins
    ("a", -10, 1, 102),    # negative lo
    ("a", 20, 20, 103),    # empty interval: matches nothing
    ("a", 30, 40, 104),
    ("b", 0, 100, 105),    # other group
]


def test_point_in_interval_matches_naive(spark):
    pts = _points(spark, POINTS)
    ivs = _intervals(spark, INTERVALS)
    for width in (1, 3, 10, 1000):
        got = point_in_interval_join(
            pts, ivs, point_col="p", lo_col="lo", hi_col="hi",
            bin_width=width, partition_keys=["grp"],
        ).select("grp", "p", "pid", "lo", "hi", "iid")
        assert _canon(got) == _canon(_naive_pi(pts, ivs)), f"width={width}"


def test_point_in_interval_no_partition_keys(spark):
    pts = _points(spark, POINTS).drop("grp")
    ivs = _intervals(spark, INTERVALS).drop("grp")
    got = point_in_interval_join(
        pts, ivs, point_col="p", lo_col="lo", hi_col="hi", bin_width=7
    ).select("p", "pid", "lo", "hi", "iid")
    naive = (
        pts.alias("P")
        .join(ivs.alias("I"), (pts["p"] >= ivs["lo"]) & (pts["p"] < ivs["hi"]))
        .select("P.p", "P.pid", "I.lo", "I.hi", "I.iid")
    )
    assert _canon(got) == _canon(naive)


def test_interval_overlap_matches_naive_and_exactly_once(spark):
    ivs = _intervals(spark, INTERVALS)
    l = ivs.select("grp", F.col("lo").alias("lo1"), F.col("hi").alias("hi1"),
                   F.col("iid").alias("i1"))
    r = ivs.select("grp", F.col("lo").alias("lo2"), F.col("hi").alias("hi2"),
                   F.col("iid").alias("i2"))
    for width in (1, 4, 10, 1000):
        got = interval_overlap_join(
            l, r, left_lo="lo1", left_hi="hi1", right_lo="lo2", right_hi="hi2",
            bin_width=width, partition_keys=["grp"],
        ).select("grp", "i1", "i2")
        rr = r.withColumnRenamed("grp", "grp_r")
        # Non-empty-intersection semantics: greatest(lo) < least(hi) -- for
        # non-empty intervals identical to lo1 < hi2 AND lo2 < hi1, and the
        # empty interval in the fixture matches nothing.
        naive = l.join(
            rr,
            (l["grp"] == rr["grp_r"])
            & (F.greatest(l["lo1"], rr["lo2"]) < F.least(l["hi1"], rr["hi2"])),
        ).select("grp", "i1", "i2")
        # exactly-once: multiset equality, not set equality -- a pair seen in
        # several shared bins must still appear exactly once
        assert _canon(got) == _canon(naive), f"width={width}"


def test_bin_width_validation(spark):
    pts = _points(spark, POINTS)
    ivs = _intervals(spark, INTERVALS)
    with pytest.raises(ValueError):
        point_in_interval_join(
            pts, ivs, point_col="p", lo_col="lo", hi_col="hi", bin_width=0
        )
    with pytest.raises(ValueError):
        interval_overlap_join(
            pts, pts, left_lo="lo", left_hi="hi", right_lo="lo", right_hi="hi",
            bin_width=-5,
        )


def test_runaway_interval_fails_fast(spark):
    pts = _points(spark, [("a", 5, 1)])
    ivs = _intervals(spark, [("a", 0, 10_000_000, 1)])
    joined = point_in_interval_join(
        pts, ivs, point_col="p", lo_col="lo", hi_col="hi",
        bin_width=1, partition_keys=["grp"], max_bins_per_interval=100,
    )
    with pytest.raises(Exception, match="explodes into more than"):
        joined.collect()


def test_plan_is_shuffle_equijoin_not_bnlj(spark):
    """The reason this operator exists: with broadcast disabled (the
    both-sides-large regime), the binned join compiles to a shuffle
    equi-join; the same logical theta join compiles to a cartesian/BNLJ."""
    pts = _points(spark, POINTS)
    ivs = _intervals(spark, INTERVALS)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        binned = point_in_interval_join(
            pts, ivs, point_col="p", lo_col="lo", hi_col="hi",
            bin_width=10, partition_keys=["grp"],
        )
        plan = binned._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)

        # Keyless naive theta join: the pure-range case Spark can only plan
        # as BNLJ/cartesian. (With an equi key it plans a per-key-cartesian
        # SortMergeJoin instead -- better, but still quadratic per key.)
        p0, i0 = pts.drop("grp"), ivs.drop("grp")
        naive = p0.join(i0, (p0["p"] >= i0["lo"]) & (p0["p"] < i0["hi"]))
        naive_plan = naive._jdf.queryExecution().executedPlan().toString()
        assert (
            "BroadcastNestedLoopJoin" in naive_plan
            or "CartesianProduct" in naive_plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
