"""Strongly connected components: differential tests of the two execution
paths (driver-local iterative Tarjan vs distributed trim + forward-backward
coloring) against a brute-force transitive-closure reference, over graph
shapes that exercise every branch — pure cycles, rho tails, one-way bridges
between cycles, random digraphs, self-loops, isolated nodes."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.operators.graph import (
    strongly_connected_components,
)


def _brute_scc(rows, extra_nodes=()):
    """Reference labels: Floyd-Warshall-style reachability closure, SCC
    label = min id of the mutually-reachable set."""
    nodes = sorted({v for e in rows for v in e} | set(extra_nodes))
    reach = {v: {v} for v in nodes}
    adj = {v: set() for v in nodes}
    for s, d in rows:
        adj[s].add(d)
    changed = True
    while changed:
        changed = False
        for v in nodes:
            new = set()
            for w in reach[v]:
                new |= adj[w]
            if not new <= reach[v]:
                reach[v] |= new
                changed = True
    out = {}
    for v in nodes:
        mutual = {w for w in reach[v] if v in reach[w]}
        out[v] = min(mutual | {v})
    return sorted(out.items())


def _run(spark, rows, extra_nodes=(), **kw):
    e = spark.createDataFrame(sorted(set(rows)), "src long, dst long")
    n = (
        spark.createDataFrame([(v,) for v in extra_nodes], "id long")
        if extra_nodes
        else None
    )
    if extra_nodes:
        n = n.unionByName(
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    got = strongly_connected_components(e, n, **kw)
    return sorted(map(tuple, got.collect()))


CASES = {
    "two_cycles_bridge_tail": [
        (0, 1), (1, 2), (2, 0), (2, 10),
        (10, 11), (11, 12), (12, 10), (12, 20),
    ],
    "pure_cycle": [(i, (i + 1) % 6) for i in range(6)],
    "dag_all_singletons": [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)],
    "functional_rho": [(i, (i * i + 1) % 30) for i in range(30)],
    "self_loops_and_cycle": [(5, 5), (1, 2), (2, 1), (7, 7), (7, 1)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_scc_local_matches_brute(spark, name):
    rows = CASES[name]
    assert _run(spark, rows) == _brute_scc(rows)


@pytest.mark.parametrize("name", sorted(CASES))
def test_scc_distributed_matches_brute(spark, name):
    rows = CASES[name]
    assert _run(spark, rows, local_threshold=0) == _brute_scc(rows)


def test_scc_random_differential(spark):
    rnd = random.Random(20260814)
    for _ in range(3):
        n = 40
        rows = [
            (rnd.randrange(n), rnd.randrange(n)) for _ in range(55)
        ]
        want = _brute_scc(rows)
        assert _run(spark, rows) == want
        assert _run(spark, rows, local_threshold=0) == want


def test_scc_isolated_nodes_via_nodes_frame(spark):
    rows = [(1, 2), (2, 1)]
    want = _brute_scc(rows, extra_nodes=(99, 100))
    assert _run(spark, rows, extra_nodes=(99, 100)) == want
    assert (
        _run(spark, rows, extra_nodes=(99, 100), local_threshold=0) == want
    )


def test_scc_empty_graph_returns_empty(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert strongly_connected_components(e).collect() == []
    assert (
        strongly_connected_components(e, local_threshold=0).collect() == []
    )


def test_scc_all_self_loops_distributed(spark):
    # self-loops are dropped as edges but their nodes remain singleton SCCs
    e = spark.createDataFrame([(3, 3), (4, 4)], "src long, dst long")
    got = sorted(
        map(tuple, strongly_connected_components(e, local_threshold=0).collect())
    )
    assert got == [(3, 3), (4, 4)]
