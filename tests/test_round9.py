"""Round-9 batch 1: ADVICE r8 fixes — Bellman-Ford empty-projection
fixpoint, core_decomposition pack_ids validation, Cypher ktruss
delta='auto' parity with the operator default.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.cypher.compiler import CypherCompileError
from phageclouds_graphdatabase_spark.operators import graph as G


def _wedges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w long")


# ---------------------------------------------------------------------------
# ADVICE r8 (medium): bellman_ford_costs fixpoint on an empty edge list
# ---------------------------------------------------------------------------

def test_bellman_ford_empty_edges_fixpoint_returns_empty(spark):
    # an edge-free projection (threshold filters out every edge) used to
    # raise a spurious NegativeCycleError in fixpoint mode: n_nodes=0,
    # prev=None never matched round 1's probe. Now the probe is seeded
    # from the initial state, so the no-op round breaks cleanly.
    e = _wedges(spark, []).limit(0)
    seeds = spark.createDataFrame([("a",), ("b",)], "id string")
    assert G.bellman_ford_costs(seeds, e).collect() == []


def test_bellman_ford_seeds_without_out_edges_fixpoint(spark):
    # seeds disjoint from every edge source: round 1 is a no-op too
    e = _wedges(spark, [("x", "y", 3)])
    seeds = spark.createDataFrame([("a",)], "id string")
    assert G.bellman_ford_costs(seeds, e).collect() == []


def test_dag_longest_paths_empty_edges_returns_empty(spark):
    # dag_longest_paths re-surfaced the spurious raise as
    # GraphContainsCycleError; an empty projection now yields no rows
    e = _wedges(spark, []).limit(0)
    assert G.dag_longest_paths(e).collect() == []


def test_bellman_ford_fixpoint_still_finds_negative_routes(spark):
    # regression guard: seeding prev from the initial state must NOT
    # cause an early break when round 1 does improve costs
    e = _wedges(spark, [("a", "b", 5), ("b", "c", -3), ("a", "c", 4)])
    seeds = spark.createDataFrame([("a",)], "id string")
    got = {(r.src, r.dst): r.cost
           for r in G.bellman_ford_costs(seeds, e).collect()}
    assert got == {("a", "b"): 5, ("a", "c"): 2}


# ---------------------------------------------------------------------------
# ADVICE r8 (low): core_decomposition pack_ids validation
# ---------------------------------------------------------------------------

def test_core_decomposition_pack_ids_rejects_non_canonical(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="pack_ids"):
        G.core_decomposition(e, pack_ids=1)
    with pytest.raises(ValueError, match="pack_ids"):
        G.core_decomposition(e, pack_ids="yes")


# ---------------------------------------------------------------------------
# ADVICE r8 (low): Cypher gds.ktruss.stream accepts delta: 'auto'
# ---------------------------------------------------------------------------

def _ktruss_cypher(spark, delta_literal):
    from phageclouds_graphdatabase_spark.cypher import CypherEngine, phage_catalog

    nodes = spark.createDataFrame(
        [(x, "NCBI", 1) for x in "abcd"],
        "accession string, source string, genome_size long",
    )
    k4 = [(x, y, 0.01) for i, x in enumerate("abcd") for y in "abcd"[i + 1:]]
    edges = spark.createDataFrame(k4, "src string, dst string, distance double")
    eng = CypherEngine(phage_catalog(nodes, edges), spark)
    cfg = "" if delta_literal is None else f", delta: {delta_literal}"
    return eng.run(
        "CALL gds.ktruss.stream('sharesDNA', {k: 3" + cfg + "}) "
        "YIELD sourceNodeId, targetNodeId, support "
        "RETURN sourceNodeId, targetNodeId, support"
    )


def test_cypher_ktruss_delta_auto_accepted_and_default(spark):
    base = sorted(map(tuple, _ktruss_cypher(spark, None).collect()))
    assert base == sorted(map(tuple, _ktruss_cypher(spark, "'auto'").collect()))
    assert base == sorted(map(tuple, _ktruss_cypher(spark, "true").collect()))
    assert base == sorted(map(tuple, _ktruss_cypher(spark, "false").collect()))
    assert len(base) == 6  # K4: every edge has support 2 at k=3


def test_cypher_ktruss_delta_bad_value_rejected(spark):
    with pytest.raises(CypherCompileError, match="delta"):
        _ktruss_cypher(spark, "1")
