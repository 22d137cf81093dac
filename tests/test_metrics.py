"""Observation-API profile metrics (functions/metrics.py): exact counts in
the same pass as the action — no second scan, no extra job."""

from __future__ import annotations

from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.functions.metrics import (
    assert_expectations,
    observe_profile,
)
from phageclouds_graphdatabase_spark.sources.readers import read_table


def test_observe_profile_matches_direct_aggregates(spark, sf_dir, tmp_path):
    part = read_table(spark, sf_dir, "part")
    observed, obs = observe_profile(part, ["p_size", "p_brand"])
    # ONE action (a real write, as in production) materializes the metrics
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    m = obs.get
    assert m["n_rows"] == part.count()
    assert m["nulls_p_size"] == part.filter(F.col("p_size").isNull()).count()
    r = part.agg(
        F.min("p_size").alias("lo"), F.max("p_size").alias("hi")
    ).collect()[0]
    assert m["min_p_size"] == r.lo and m["max_p_size"] == r.hi
    assert m["min_p_brand"] is not None


def test_assert_expectations_bounds():
    m = {"n_rows": 100, "nulls_x": 3}
    assert assert_expectations(m, {"n_rows": (1, None)}) == []
    probs = assert_expectations(
        m, {"n_rows": (200, None), "nulls_x": (None, 2), "gone": (0, 1)}
    )
    assert len(probs) == 3
    assert any("below" in p for p in probs)
    assert any("above" in p for p in probs)
    assert any("absent" in p for p in probs)


def test_observe_skips_unorderable_columns(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "id long, vec array<double>"
    )
    observed, obs = observe_profile(df)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["n_rows"] == 1 and m["nulls_vec"] == 0
    assert "min_vec" not in m
