"""Property-based tests (SURVEY.md §5.4): random thresholded graphs, checked
against the graph-operator invariants. Hypothesis drives the graph shape; a
pure-Python model is the oracle."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.operators import graph as G

N_NODES = 14


@st.composite
def graphs(draw):
    """Random edge list over a small id space: directed, stored once per
    pair (the reference's storage quirk), distances in [0, 0.4]."""
    n_edges = draw(st.integers(0, 25))
    pairs = draw(
        st.lists(
            st.tuples(
                st.integers(0, N_NODES - 1), st.integers(0, N_NODES - 1)
            ).filter(lambda p: p[0] != p[1]),
            min_size=n_edges,
            max_size=n_edges,
        )
    )
    seen, edges = set(), []
    for a, b in pairs:
        key = frozenset((a, b))
        if key in seen:
            continue
        seen.add(key)
        d = draw(st.floats(0, 0.4))
        edges.append((f"N{a:02d}", f"N{b:02d}", float(d)))
    seed_ids = draw(st.sets(st.integers(0, N_NODES - 1), min_size=1, max_size=5))
    return edges, sorted(f"N{i:02d}" for i in seed_ids)


SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

THRESHOLD = 0.25


def _dfs(spark, edges, seeds):
    e = spark.createDataFrame(edges or [("X", "Y", 1.0)], "src string, dst string, distance double")
    if not edges:
        e = e.filter(F.lit(False))
    s = spark.createDataFrame([(x,) for x in seeds], "id string")
    return e, s


@given(graphs())
@SETTINGS
def test_expand_invariant(spark, g):
    edges, seeds = g
    e, s = _dfs(spark, edges, seeds)
    got = {r.id for r in G.expand(s, e, THRESHOLD).collect()}
    # node set = seeds UNION heads of qualifying out-edges from seeds
    want = set(seeds) | {
        d for (a, d, w) in edges if a in set(seeds) and w <= THRESHOLD
    }
    assert got == want


@given(graphs())
@SETTINGS
def test_induced_subset_of_thresholded(spark, g):
    edges, seeds = g
    e, s = _dfs(spark, edges, seeds)
    ns = G.expand(s, e, THRESHOLD)
    got = {(r.src, r.dst) for r in G.induced_subgraph(ns, e, THRESHOLD).collect()}
    node_set = {r.id for r in ns.collect()}
    thresholded = {(a, b) for (a, b, w) in edges if w <= THRESHOLD}
    assert got <= thresholded
    assert all(a in node_set and b in node_set for a, b in got)
    # completeness: every thresholded edge with both endpoints inside is kept
    assert got == {(a, b) for (a, b) in thresholded if a in node_set and b in node_set}


@pytest.mark.parametrize("method", ["hashmin", "contract"])
@given(g=graphs())
@SETTINGS
def test_components_match_model_and_idempotent(spark, g, method):
    edges, seeds = g
    e, _ = _dfs(spark, edges, seeds)
    qual = [(a, b) for (a, b, w) in edges if w <= THRESHOLD]
    nodes = sorted({x for ab in qual for x in ab})
    if not nodes:
        return
    labels = {
        r.id: r.component
        for r in G.connected_components(
            e.filter(F.col("distance") <= THRESHOLD), method=method,
            local_threshold=0,  # property-check the DISTRIBUTED loop
        ).collect()
    }
    # union-find model
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in qual:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in nodes}
    assert labels == want
    # idempotent: recomputation yields identical labels
    again = {
        r.id: r.component
        for r in G.connected_components(
            e.filter(F.col("distance") <= THRESHOLD), method=method,
            local_threshold=0,  # property-check the DISTRIBUTED loop
        ).collect()
    }
    assert again == labels
