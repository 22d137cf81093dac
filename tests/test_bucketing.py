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


def test_graph_catalog_roundtrip_and_pipeline_parity(
    spark, tmp_path, phage_nodes, shares_dna, no_broadcast
):
    """write_graph_bucketed -> read_graph_bucketed: the edges-nodes join is
    shuffle-free on the edge side, and clouds_by_taxon over the bucketed
    frames returns exactly what it returns over the in-memory frames."""
    from phageclouds_graphdatabase_spark.plans import clouds
    from phageclouds_graphdatabase_spark.sources import readers

    tag = "t" + uuid.uuid4().hex[:8]
    try:
        readers.write_graph_bucketed(
            {"phage_nodes": phage_nodes, "shares_dna": shares_dna},
            str(tmp_path),
            n_buckets=4,
            prefix=tag,
        )
        got = readers.read_graph_bucketed(spark, prefix=tag)
        assert set(got) == {"phage_nodes", "shares_dna"}
        nb, eb = got["phage_nodes"], got["shares_dna"]

        joined = eb.join(nb, eb["src"] == nb["accession"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # nodes are bucketed on accession, edges on src: both sides arrive
        # pre-partitioned, so no Exchange anywhere in the join.
        assert "Exchange" not in plan, plan

        want = clouds.clouds_by_taxon(phage_nodes, shares_dna, "Tequatrovirus", 0.25)
        have = clouds.clouds_by_taxon(nb, eb, "Tequatrovirus", 0.25)
        assert sorted(map(tuple, have.nodes.collect())) == sorted(
            map(tuple, want.nodes.collect())
        )
        assert sorted(map(tuple, have.edges.collect())) == sorted(
            map(tuple, want.edges.collect())
        )
    finally:
        for name in readers.GRAPH_BUCKET_KEYS:
            spark.sql(f"DROP TABLE IF EXISTS {tag}_{name}")


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
