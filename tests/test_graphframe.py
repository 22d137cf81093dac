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
