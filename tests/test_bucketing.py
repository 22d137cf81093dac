"""SCALE.md claims bucketing by src co-locates the expand/induced joins.
Prove it: two tables bucketed on the join key produce a SortMergeJoin with
ZERO Exchange operators (no shuffle), and the join result is correct."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_has_no_shuffle(spark, tmp_path, no_broadcast):
    tag = uuid.uuid4().hex[:8]
    edges = spark.range(2000).select(
        F.concat(F.lit("P"), (F.col("id") % 300)).alias("src"),
        F.concat(F.lit("S"), F.col("id")).alias("dst"),
        (F.col("id") % 100 / 100.0).alias("distance"),
    )
    nodes = spark.range(300).select(
        F.concat(F.lit("P"), F.col("id")).alias("id"),
        (F.col("id") % 5).alias("grp"),
    )
    e_tbl, n_tbl = f"edges_b_{tag}", f"nodes_b_{tag}"
    (
        edges.write.bucketBy(8, "src").sortBy("src")
        .option("path", str(tmp_path / e_tbl)).saveAsTable(e_tbl)
    )
    (
        nodes.write.bucketBy(8, "id").sortBy("id")
        .option("path", str(tmp_path / n_tbl)).saveAsTable(n_tbl)
    )
    try:
        eb, nb = spark.table(e_tbl), spark.table(n_tbl)
        joined = eb.join(nb, eb["src"] == nb["id"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the shuffle-free plan still computes the right answer
        assert joined.count() == 2000

        # contrast: the same join on plain parquet DOES shuffle
        edges.write.mode("overwrite").parquet(str(tmp_path / "plain_e"))
        nodes.write.mode("overwrite").parquet(str(tmp_path / "plain_n"))
        pe = spark.read.parquet(str(tmp_path / "plain_e"))
        pn = spark.read.parquet(str(tmp_path / "plain_n"))
        plain = pe.join(pn, pe["src"] == pn["id"])
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {e_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {n_tbl}")
