"""GraphFrames-compatible motif API (phageclouds_graphdatabase_spark/
graphframe.py): find() join/anti-join compilation, accessors, and the
algorithm wrappers, on a small hand-checked digraph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.graphframe import GraphFrame, MotifError


@pytest.fixture(scope="module")
def g(spark):
    # a->b, b->c, a->c, c->d, d->d (self-loop), e isolated
    v = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 5)], "id string, val int"
    )
    e = spark.createDataFrame(
        [("a", "b", 0.1), ("b", "c", 0.2), ("a", "c", 0.3),
         ("c", "d", 0.4), ("d", "d", 0.5)],
        "src string, dst string, distance double",
    )
    return GraphFrame(v.cache(), e.cache())


def trips(df, *names):
    return sorted(tuple(row[n]["id"] for n in names) for row in df.collect())


class TestFind:
    def test_single_edge(self, g):
        assert trips(g.find("(a)-[e]->(b)"), "a", "b") == sorted(
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "d")]
        )

    def test_wedge_shared_name_joins(self, g):
        assert trips(g.find("(a)-[e]->(b); (b)-[e2]->(c)"), "a", "b", "c") == sorted(
            [("a", "b", "c"), ("b", "c", "d"), ("a", "c", "d"),
             ("c", "d", "d"), ("d", "d", "d")]
        )

    def test_negation(self, g):
        got = trips(
            g.find("(a)-[e]->(b); (b)-[e2]->(c); !(a)-[]->(c)"), "a", "b", "c"
        )
        # (a,b,c) removed: a->c exists. (c,d,d) removed: c->d exists.
        # (d,d,d) removed: d->d exists.
        assert got == sorted([("b", "c", "d"), ("a", "c", "d")])

    def test_self_loop_motif(self, g):
        assert trips(g.find("(a)-[e]->(a)"), "a") == [("d",)]

    def test_anonymous_vertex_and_edge(self, g):
        r = g.find("()-[e]->(b)")
        assert sorted((x.e.src, x.b.id) for x in r.collect()) == sorted(
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "d")]
        )
        assert set(r.columns) == {"e", "b"}

    def test_shared_dst(self, g):
        r = g.find("(a)-[e1]->(b); (c)-[e2]->(b)").filter(
            F.col("a")["id"] < F.col("c")["id"]
        )
        # (a,b) share dst c; (c,d) share dst d via the d->d self-loop
        assert trips(r, "a", "c", "b") == sorted(
            [("a", "b", "c"), ("c", "d", "d")]
        )

    def test_edge_attrs_exposed(self, g):
        r = g.find("(a)-[e]->(b)").filter(F.col("b")["id"] == "b")
        assert r.collect()[0]["e"]["distance"] == 0.1

    def test_vertex_attrs_exposed(self, g):
        r = g.find("(a)-[e]->(b)").filter(F.col("a")["val"] == 1)
        assert trips(r, "a", "b") == sorted([("a", "b"), ("a", "c")])

    def test_bad_term_rejected(self, g):
        with pytest.raises(MotifError, match="bad motif term"):
            g.find("(a)->(b)")

    def test_named_negated_edge_rejected(self, g):
        with pytest.raises(MotifError, match="cannot name"):
            g.find("(a)-[e]->(b); !(a)-[x]->(b)")

    def test_duplicate_edge_name_rejected(self, g):
        with pytest.raises(MotifError, match="used twice"):
            g.find("(a)-[e]->(b); (b)-[e]->(c)")


class TestAccessorsAndAlgorithms:
    def test_degrees(self, g):
        got = {r.id: r.degree for r in g.degrees.collect()}
        assert got == {"a": 2, "b": 2, "c": 3, "d": 3}

    def test_in_out_degrees(self, g):
        assert {r.id: r.inDegree for r in g.inDegrees.collect()}["c"] == 2
        assert {r.id: r.outDegree for r in g.outDegrees.collect()}["a"] == 2

    def test_filter_vertices_prunes_edges(self, g):
        sub = g.filterVertices(F.col("val") <= 3)
        assert sorted(r.id for r in sub.vertices.collect()) == ["a", "b", "c"]
        assert sorted((r.src, r.dst) for r in sub.edges.collect()) == sorted(
            [("a", "b"), ("b", "c"), ("a", "c")]
        )

    def test_drop_isolated(self, g):
        sub = g.dropIsolatedVertices()
        assert sorted(r.id for r in sub.vertices.collect()) == ["a", "b", "c", "d"]

    def test_connected_components(self, g):
        comp = g.connectedComponents()
        labels = {r.id: r.component for r in comp.collect()}
        assert labels["a"] == labels["d"]  # all connected nodes share a label
        assert labels["e"] != labels["a"]  # isolated vertex is its own cloud

    def test_shortest_paths_distance_to_landmark(self, g, spark):
        """ADVICE r1: shortestPaths must give vertex-TO-landmark distances
        on directed graphs (GraphFrames semantics). Landmark d: a reaches
        d via a->c->d (2 hops, NOT via the nonexistent d->...->a); d's own
        out-edges must not produce reverse answers."""
        lm = spark.createDataFrame([("d",)], "id string")
        got = {
            (r.src, r.dst): (r.path, r.hops)
            for r in g.shortestPaths(lm, max_hops=4).collect()
        }
        assert got[("c", "d")] == (["c", "d"], 1)
        assert got[("a", "d")] == (["a", "c", "d"], 2)
        assert got[("b", "d")] == (["b", "c", "d"], 2)
        # no vertex is reachable FROM d except itself (self-loop excluded):
        # nothing may claim a d->x answer
        assert all(dst == "d" for (_, dst) in got)


class TestPregelAndCommunities:
    def test_aggregate_messages_both_directions(self, g, spark):
        from phageclouds_graphdatabase_spark.graphframe import (
            AggregateMessages as AM,
        )
        r = g.aggregateMessages(
            F.sum(AM.msg).alias("s"),
            sendToSrc=AM.dst["val"],
            sendToDst=AM.src["val"],
        )
        got = {x.id: x.s for x in r.collect()}
        # a: as src of a->b, a->c receives 2+3 = 5
        # b: as src of b->c receives 3; as dst of a->b receives 1 -> 4
        # c: as src of c->d receives 4; as dst of a->c, b->c receives 1+2 -> 7
        # d: as dst of c->d receives 3; the d->d self-loop delivers 4 to d
        #    on BOTH sends -> 3+4+4 = 11
        assert got["a"] == 5 and got["b"] == 4
        assert got["c"] == 7
        assert got["d"] == 11

    def test_aggregate_messages_one_direction(self, g):
        from phageclouds_graphdatabase_spark.graphframe import (
            AggregateMessages as AM,
        )
        r = g.aggregateMessages(
            F.count(AM.msg).alias("n"), sendToDst=F.lit(1)
        )
        got = {x.id: x.n for x in r.collect()}
        assert got == {"b": 1, "c": 2, "d": 2}  # in-degrees

    def test_aggregate_messages_requires_a_direction(self, g):
        with pytest.raises(MotifError, match="sendToSrc"):
            g.aggregateMessages(F.count(F.lit(1)).alias("n"))

    def test_bfs_paths_engine_shape(self, g):
        r = g.bfs_paths(F.col("val") == 1, F.col("val") == 4, 5)
        assert sorted(tuple(x.path) for x in r.collect()) == [("a", "c", "d")]

    def test_bfs_graphframes_exploded_shape(self, g):
        # a -> c -> d is the single shortest a-to-d path (2 hops):
        # GraphFrames columns from, e0, v1, e1, to with vertex/edge structs
        r = g.bfs(F.col("val") == 1, F.col("val") == 4, 5)
        assert r.columns == ["from", "e0", "v1", "e1", "to"]
        rows = r.collect()
        assert len(rows) == 1
        x = rows[0]
        assert (x["from"]["id"], x.v1["id"], x.to["id"]) == ("a", "c", "d")
        assert (x.e0.src, x.e0.dst, x.e1.src, x.e1.dst) == (
            "a", "c", "c", "d"
        )
        assert x.e0.distance == 0.3 and x.e1.distance == 0.4

    def test_bfs_only_shortest_level_returned(self, g):
        # from {a} to {b, c}: distance-1 hits (a->b, a->c) suppress any
        # longer paths (a->b->c never appears)
        r = g.bfs(F.col("id") == "a", F.col("val").isin(2, 3), 5)
        assert r.columns == ["from", "e0", "to"]
        got = sorted((x["from"]["id"], x.to["id"]) for x in r.collect())
        assert got == [("a", "b"), ("a", "c")]

    def test_bfs_zero_length_path(self, g):
        r = g.bfs(F.col("val") <= 2, F.col("val") == 1, 5)
        assert r.columns == ["from", "to"]
        rows = r.collect()
        assert len(rows) == 1
        assert rows[0]["from"]["id"] == "a" and rows[0].to["id"] == "a"

    def test_bfs_no_path_empty(self, g):
        r = g.bfs(F.col("id") == "e", F.col("id") == "a", 5)
        assert r.columns == ["from", "to"] and r.count() == 0

    def test_label_propagation_two_triangles(self, spark):
        v = spark.createDataFrame([(x,) for x in "abcxyz"], "id string")
        e = spark.createDataFrame(
            [("a", "b", 0.0), ("b", "c", 0.0), ("a", "c", 0.0),
             ("x", "y", 0.0), ("y", "z", 0.0), ("x", "z", 0.0)],
            "src string, dst string, distance double",
        )
        lp = GraphFrame(v, e).labelPropagation(5)
        got = {r.id: r.label for r in lp.collect()}
        assert got == {"a": "a", "b": "a", "c": "a",
                       "x": "x", "y": "x", "z": "x"}

    def test_label_propagation_isolated_keeps_label(self, g):
        lp = g.labelPropagation(2)
        assert {r.id: r.label for r in lp.collect()}["e"] == "e"


class TestPregel:
    def test_pregel_matches_operator_pagerank(self, spark):
        """Differential: the Pregel vertex-program PageRank must equal
        operators/graph.py pagerank_scaled on the same graph."""
        from phageclouds_graphdatabase_spark.operators.graph import (
            pagerank_scaled,
        )
        from phageclouds_graphdatabase_spark.pregel import Pregel

        e = spark.createDataFrame(
            [("a", "b", 0.1), ("b", "c", 0.1), ("a", "c", 0.1),
             ("c", "a", 0.1), ("d", "a", 0.1)],
            "src string, dst string, distance double",
        )
        want = {
            r.id: r.pr_scaled
            for r in pagerank_scaled(e, iterations=2).collect()
        }
        v = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
            .join(
                e.groupBy(F.col("src").alias("id")).agg(
                    F.count(F.lit(1)).alias("od")
                ),
                "id",
                "left_outer",
            )
            .select("id", F.coalesce("od", F.lit(0)).alias("od"))
        )
        ranks = (
            Pregel(GraphFrame(v, e.select("src", "dst")))
            .setMaxIter(2)
            .withVertexColumn(
                "pr",
                F.lit(1_000_000).cast("long"),
                (
                    F.lit(150_000)
                    + F.floor(
                        F.lit(85) * F.coalesce(Pregel.msg(), F.lit(0))
                        / F.lit(100)
                    )
                ).cast("long"),
            )
            .sendMsgToDst(
                F.floor(F.try_divide(Pregel.src("pr"), Pregel.src("od")))
                .cast("long")
            )
            .aggMsgs(F.sum(Pregel.msg()))
            .run()
        )
        got = {r.id: r.pr for r in ranks.collect()}
        assert got == want

    def test_pregel_requires_setup(self, g):
        from phageclouds_graphdatabase_spark.pregel import Pregel

        with pytest.raises(ValueError, match="withVertexColumn"):
            Pregel(g).sendMsgToDst(F.lit(1)).aggMsgs(
                F.sum(Pregel.msg())
            ).run()

    def test_pregel_edge_anchor_and_both_directions(self, g):
        """Sum of incident edge distances per vertex (messages both ways,
        edge attribute referenced through the Pregel.edge anchor)."""
        from phageclouds_graphdatabase_spark.pregel import Pregel

        r = (
            Pregel(g)
            .setMaxIter(1)
            .withVertexColumn(
                "wsum",
                F.lit(0.0),
                F.coalesce(Pregel.msg(), F.lit(0.0)),
            )
            .sendMsgToDst(Pregel.edge("distance"))
            .sendMsgToSrc(Pregel.edge("distance"))
            .aggMsgs(F.sum(Pregel.msg()))
            .run()
        )
        got = {x.id: round(x.wsum, 3) for x in r.collect()}
        # a: .1+.3 | b: .1+.2 | c: .2+.3+.4 | d: .4+.5+.5 | e isolated: 0
        assert got == {"a": 0.4, "b": 0.3, "c": 0.9, "d": 1.4, "e": 0.0}
