"""Named paths and per-path var-length semantics (exact Neo4j cardinality
for ``MATCH p = (a)-[:T*lo..hi]-(b) RETURN p``), on the FIXTURES.md §A graph.

Neo4j ground truth (relationship-uniqueness / RELATIONSHIP_ISOMORPHISM,
openCypher 9 §8.5): a relationship appears at most once per path; node
revisits via different relationships are allowed — so ``A1>A2>A1`` is
forbidden (same rel twice) but a triangle return ``A1>A2>A3>A1`` is a valid
3-hop path. Expected path sets below are hand-derived from EDGE_ROWS."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.cypher import CypherEngine, phage_catalog
from phageclouds_graphdatabase_spark.cypher.compiler import CypherCompileError
from phageclouds_graphdatabase_spark.operators.graph import var_length_paths


@pytest.fixture(scope="module")
def eng(phage_nodes, shares_dna, infects):
    return CypherEngine(phage_catalog(phage_nodes, shares_dna, infects))


def paths_of(df):
    return sorted(">".join(r.path) for r in df.collect())


class TestOperator:
    def test_undirected_1_2(self, spark, shares_dna):
        seeds = spark.createDataFrame([("A1",)], "id string")
        got = paths_of(
            var_length_paths(seeds, shares_dna, 1, 2, directed=False)
            .select(F.col("path"))
        )
        assert got == sorted(
            ["A1>A2", "A1>A3", "A1>C1",
             "A1>A2>A3", "A1>A3>A2", "A1>A3>B1"]
        )

    def test_triangle_return_allowed_bounceback_not(self, spark, shares_dna):
        seeds = spark.createDataFrame([("A1",)], "id string")
        got = paths_of(
            var_length_paths(seeds, shares_dna, 3, 3, directed=False)
            .select("path")
        )
        # A1>A2>A1 (bounce-back, same rel) must NOT appear at any length;
        # the triangle return A1>A2>A3>A1 MUST (three distinct rels).
        assert got == sorted(
            ["A1>A2>A3>A1", "A1>A2>A3>B1", "A1>A3>A2>A1", "A1>A3>B1>B2"]
        )

    def test_directed(self, spark, shares_dna):
        seeds = spark.createDataFrame([("A1",)], "id string")
        got = paths_of(
            var_length_paths(seeds, shares_dna, 1, 2, directed=True)
            .select("path")
        )
        assert got == sorted(["A1>A2", "A1>A3", "A1>A2>A3", "A1>A3>B1"])

    def test_threshold(self, spark, shares_dna):
        seeds = spark.createDataFrame([("A3",)], "id string")
        got = paths_of(
            var_length_paths(
                seeds, shares_dna, 1, 1, threshold=0.2, directed=False
            ).select("path")
        )
        # A3-B1 (0.40) excluded; A3-A1 (0.20) exactly at threshold kept
        assert got == sorted(["A3>A1", "A3>A2"])

    def test_columns(self, spark, shares_dna):
        seeds = spark.createDataFrame([("A1",)], "id string")
        r = (
            var_length_paths(seeds, shares_dna, 2, 2, directed=False)
            .filter(F.col("dst") == "B1")
            .collect()
        )
        assert len(r) == 1
        assert r[0].src == "A1" and r[0].path == ["A1", "A3", "B1"]
        assert r[0].hops == 2


class TestCypherNamedPaths:
    def test_per_path_rows(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*1..2]-(b:PhageGenome) "
             "RETURN nodes(p) AS path, length(p) AS hops, "
             "b.accession AS dst")
        rows = eng.run(q).collect()
        got = sorted(">".join(r.path) for r in rows)
        assert got == sorted(
            ["A1>A2", "A1>A3", "A1>C1",
             "A1>A2>A3", "A1>A3>A2", "A1>A3>B1"]
        )
        by_path = {">".join(r.path): r for r in rows}
        assert by_path["A1>A3>B1"].hops == 2
        assert by_path["A1>A3>B1"].dst == "B1"

    def test_count_star_counts_paths(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*2..2]-(b:PhageGenome) RETURN count(*) AS n")
        assert eng.run(q).collect()[0].n == 3

    def test_exact_hops_directed(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*1..2]->(b:PhageGenome) "
             "RETURN nodes(p) AS path")
        assert paths_of(eng.run(q)) == sorted(
            ["A1>A2", "A1>A3", "A1>A2>A3", "A1>A3>B1"]
        )

    def test_relationships_accessor(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*2..2]-(b:PhageGenome {accession:'B1'}) "
             "RETURN relationships(p) AS rels")
        assert eng.run(q).collect()[0].rels == ["A1|A3", "A3|B1"]

    def test_far_node_filter(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*1..3]-(b:PhageGenome {source:'GPD_Isolate'}) "
             "RETURN nodes(p) AS path")
        assert paths_of(eng.run(q)) == ["A1>A3>B1>B2"]

    def test_fixed_named_path(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA]->(b:PhageGenome) "
             "RETURN nodes(p) AS ns, relationships(p) AS rs, "
             "length(p) AS h, b.accession AS dst")
        rows = {r.dst: r for r in eng.run(q).collect()}
        assert set(rows) == {"A2", "A3"}
        assert rows["A2"].ns == ["A1", "A2"]
        assert rows["A2"].rs == ["A1|A2"]
        assert rows["A2"].h == 1

    def test_fixed_two_hop_named_path(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})-[:sharesDNA]->"
             "(m:PhageGenome)-[:sharesDNA]->(b:PhageGenome) "
             "RETURN nodes(p) AS ns, length(p) AS h")
        rows = eng.run(q).collect()
        assert sorted(">".join(r.ns) for r in rows) == sorted(
            ["A1>A2>A3", "A1>A3>B1"]
        )
        assert all(r.h == 2 for r in rows)

    def test_path_carries_through_with(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*1..2]-(b:PhageGenome) "
             "WITH p, b WHERE length(p) = 2 "
             "RETURN nodes(p) AS path, b.accession AS dst")
        assert paths_of(eng.run(q)) == sorted(
            ["A1>A2>A3", "A1>A3>A2", "A1>A3>B1"]
        )

    def test_bare_path_var_returns_struct(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*2..2]-(b:PhageGenome {accession:'B1'}) "
             "RETURN p")
        r = eng.run(q).collect()[0][0]
        assert r.nodes == ["A1", "A3", "B1"]
        assert r.rels == ["A1|A3", "A3|B1"]
        assert r.hops == 2


class TestShortestPaths:
    """shortest_paths ground truth on FIXTURES.md §A (undirected):
    from A1 — level 1: A2, A3, C1; level 2: B1 (only via A1>A3>B1).
    The 2-hop A1>A2>A3 walk is NOT a shortest path (A3 is level-1)."""

    def test_operator_all(self, spark, shares_dna):
        from phageclouds_graphdatabase_spark.operators.graph import (
            shortest_paths,
        )
        seeds = spark.createDataFrame([("A1",)], "id string")
        got = paths_of(
            shortest_paths(seeds, shares_dna, 3, directed=False, mode="all")
            .select("path")
        )
        assert got == sorted(
            ["A1>A2", "A1>A3", "A1>C1", "A1>A3>B1", "A1>A3>B1>B2"]
        )

    def test_operator_one_deterministic(self, spark, shares_dna):
        from phageclouds_graphdatabase_spark.operators.graph import (
            shortest_paths,
        )
        # B2 is 2 hops from B1-side but from A1 it is 3 hops with a single
        # path; A2 at level 1 has exactly one path. Add a diamond seed case:
        # from B2 — level 1: B1, B3; level 2: A3 (via B1).
        seeds = spark.createDataFrame([("B2",)], "id string")
        r = shortest_paths(seeds, shares_dna, 2, directed=False, mode="one")
        got = {x.dst: x.path for x in r.collect()}
        assert got == {
            "B1": ["B2", "B1"],
            "B3": ["B2", "B3"],
            "A3": ["B2", "B1", "A3"],
        }

    def test_cypher_all_shortest(self, eng):
        q = ("MATCH p = allShortestPaths((a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*..3]-(b:PhageGenome)) "
             "RETURN nodes(p) AS path, length(p) AS hops")
        assert paths_of(eng.run(q)) == sorted(
            ["A1>A2", "A1>A3", "A1>C1", "A1>A3>B1", "A1>A3>B1>B2"]
        )

    def test_cypher_shortest_to_bound_endpoint(self, eng):
        q = ("MATCH p = shortestPath((a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*..4]-(b:PhageGenome {accession:'B2'})) "
             "RETURN nodes(p) AS path, relationships(p) AS rels, "
             "length(p) AS hops")
        r = eng.run(q).collect()
        assert len(r) == 1
        assert r[0].path == ["A1", "A3", "B1", "B2"]
        assert r[0].rels == ["A1|A3", "A3|B1", "B1|B2"]
        assert r[0].hops == 3

    def test_cypher_unnamed_counts_pairs(self, eng):
        q = ("MATCH shortestPath((a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*..3]-(b:PhageGenome)) RETURN count(*) AS n")
        # one row per reachable pair: A2, A3, C1, B1, B2
        assert eng.run(q).collect()[0].n == 5

    def test_shortest_requires_var_length(self, eng):
        q = ("MATCH p = shortestPath((a:PhageGenome)-[:sharesDNA]->"
             "(b:PhageGenome)) RETURN count(*) AS n")
        with pytest.raises(CypherCompileError, match="var-length"):
            eng.run(q)


class TestCheapestPathCosts:
    """Weighted (integer-scaled) hop-bounded shortest-path costs on
    FIXTURES.md §A. From A1 (undirected, ≤3 hops, scale 100):
    A2 = 10, A3 = min(20, 10+15) = 20, C1 = 10, B1 = 20+40 = 60,
    B2 = 20+40+5 = 65 -- note A2 also reachable via A3 for 35, min keeps 10."""

    def test_costs_from_a1(self, spark, shares_dna):
        from phageclouds_graphdatabase_spark.operators.graph import (
            cheapest_path_costs,
        )
        seeds = spark.createDataFrame([("A1",)], "id string")
        r = cheapest_path_costs(
            seeds, shares_dna, max_hops=3, scale=100.0, directed=False
        )
        got = {x.dst: x.cost for x in r.collect()}
        assert got == {"A2": 10, "A3": 20, "C1": 10, "B1": 60, "B2": 65}

    def test_relaxation_beats_direct_edge(self, spark, shares_dna):
        from phageclouds_graphdatabase_spark.operators.graph import (
            cheapest_path_costs,
        )
        # A2 -> A3 direct is 15; via A1 it is 10+20=30 -- direct wins.
        # A3 -> B2: only route is B1 (40+5=45).
        seeds = spark.createDataFrame([("A2",)], "id string")
        r = cheapest_path_costs(
            seeds, shares_dna, max_hops=3, scale=100.0, directed=False
        )
        got = {x.dst: x.cost for x in r.collect()}
        assert got["A3"] == 15
        assert got["B2"] == 15 + 40 + 5

    def test_hop_bound_limits_reach(self, spark, shares_dna):
        from phageclouds_graphdatabase_spark.operators.graph import (
            cheapest_path_costs,
        )
        seeds = spark.createDataFrame([("C1",)], "id string")
        r = cheapest_path_costs(
            seeds, shares_dna, max_hops=2, scale=100.0, directed=False
        )
        got = {x.dst: x.cost for x in r.collect()}
        # C1 -> A1 (10) -> {A2 20, A3 30}; B1 is 3 hops away -> absent
        assert got == {"A1": 10, "A2": 20, "A3": 30}


class TestReduceAndDists:
    def test_reduce_over_literal_list(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'}) "
             "RETURN reduce(s = 0, x IN [1, 2, 3, 4] | s + x) AS s")
        assert eng.run(q).collect()[0].s == 10

    def test_reduce_path_cost(self, eng):
        # A1-A3 (0.20) then A3-B1 (0.40): left fold 0.0 + 0.2 + 0.4
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*2..2]-(b:PhageGenome {accession:'B1'}) "
             "RETURN reduce(acc = 0.0, d IN p.dists | acc + d) AS cost")
        assert eng.run(q).collect()[0].cost == pytest.approx(0.6)

    def test_dists_align_with_rels(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*2..2]-(b:PhageGenome {accession:'B1'}) "
             "RETURN relationships(p) AS rels, p.dists AS dists")
        r = eng.run(q).collect()[0]
        assert r.rels == ["A1|A3", "A3|B1"]
        assert r.dists == [0.20, 0.40]

    def test_shortest_path_dists(self, eng):
        q = ("MATCH p = shortestPath((a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*..4]-(b:PhageGenome {accession:'B2'})) "
             "RETURN p.dists AS dists")
        assert eng.run(q).collect()[0].dists == [0.20, 0.40, 0.05]

    def test_reduce_nested_arith(self, eng):
        # left fold with a non-commutative body: ((10*2+1)*2+2)*2+3 = 91
        q = ("MATCH (a:PhageGenome {accession:'A1'}) "
             "RETURN reduce(s = 10, x IN [1, 2, 3] | s * 2 + x) AS s")
        assert eng.run(q).collect()[0].s == 91

    def test_reduce_string_concat_in_lambda(self, eng):
        """BACKLOG r1 gap: `+` as string concat inside lambda bodies —
        the acc's init type ('') and the element type of nodes(p)
        (string) now drive the concat overload."""
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*2..2]-(b:PhageGenome {accession:'B1'}) "
             "RETURN reduce(acc = '', x IN nodes(p) | acc + '>' + x) AS s")
        assert eng.run(q).collect()[0].s == ">A1>A3>B1"

    def test_reduce_string_concat_vars_only(self, eng):
        # no string literal in the body: types come purely from the
        # recorded lambda element types + the probed init
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*2..2]-(b:PhageGenome {accession:'B1'}) "
             "RETURN reduce(acc = '', x IN nodes(p) | acc + x) AS s")
        assert eng.run(q).collect()[0].s == "A1A3B1"

    def test_string_plus_number_coerces(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'}) "
             "RETURN 'size=' + a.genome_size AS s, a.genome_size + 1 AS n")
        r = eng.run(q).collect()[0]
        assert r.s == "size=168000" and r.n == 168001


class TestQuantifiers:
    def test_all_filters_paths(self, eng):
        # A1 2-hop paths: A1>A2>A3 (.10,.15), A1>A3>A2 (.20,.15),
        # A1>A3>B1 (.20,.40); all(d <= 0.15) keeps only A1>A2>A3
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*2..2]-(b:PhageGenome) "
             "WHERE all(d IN p.dists WHERE d <= 0.15) "
             "RETURN nodes(p) AS path")
        assert paths_of(eng.run(q)) == ["A1>A2>A3"]

    def test_any_none_single_projections(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*2..2]-(b:PhageGenome {accession:'B1'}) "
             "RETURN any(d IN p.dists WHERE d > 0.3) AS has_big, "
             "none(d IN p.dists WHERE d > 0.5) AS none_huge, "
             "single(d IN p.dists WHERE d = 0.4) AS one_forty")
        r = eng.run(q).collect()[0]
        assert (r.has_big, r.none_huge, r.one_forty) == (True, True, True)

    def test_quantifier_over_literal_list(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'}) "
             "RETURN all(x IN [1, 2, 3] WHERE x > 0) AS t, "
             "any(x IN [1, 2, 3] WHERE x > 2) AS u, "
             "none(x IN [1, 2, 3] WHERE x > 3) AS v, "
             "single(x IN [1, 2, 3] WHERE x = 2) AS w")
        r = eng.run(q).collect()[0]
        assert (r.t, r.u, r.v, r.w) == (True, True, True, True)


class TestOptionalPaths:
    def test_optional_fixed_named_path(self, eng):
        # E1 has no edges: its path/b stay NULL; A1 matches twice
        q = ("MATCH (a:PhageGenome) WHERE a.accession IN ['A1', 'E1'] "
             "OPTIONAL MATCH p = (a)-[:sharesDNA]->(b:PhageGenome) "
             "RETURN a.accession AS src, nodes(p) AS path")
        rows = eng.run(q).collect()
        got = sorted((r.src, tuple(r.path) if r.path else None) for r in rows)
        assert got == [("A1", ("A1", "A2")), ("A1", ("A1", "A3")),
                       ("E1", None)]

    def test_optional_var_length_named_path(self, eng):
        q = ("MATCH (a:PhageGenome) WHERE a.accession IN ['A1', 'E1'] "
             "OPTIONAL MATCH p = (a)-[:sharesDNA*1..2]-(b:PhageGenome) "
             "RETURN a.accession AS src, nodes(p) AS path")
        rows = eng.run(q).collect()
        a1 = sorted(">".join(r.path) for r in rows if r.src == "A1")
        assert a1 == sorted(
            ["A1>A2", "A1>A3", "A1>C1",
             "A1>A2>A3", "A1>A3>A2", "A1>A3>B1"]
        )
        e1 = [r for r in rows if r.src == "E1"]
        assert len(e1) == 1 and e1[0].path is None

    def test_optional_shortest_path(self, eng):
        # A1 reaches B2 in 3 hops; D1 cannot reach B2 at all -> NULL
        q = ("MATCH (a:PhageGenome) WHERE a.accession IN ['A1', 'D1'] "
             "OPTIONAL MATCH p = shortestPath("
             "(a)-[:sharesDNA*..4]-(b:PhageGenome {accession:'B2'})) "
             "RETURN a.accession AS src, nodes(p) AS path")
        got = {r.src: (tuple(r.path) if r.path else None)
               for r in eng.run(q).collect()}
        assert got == {"A1": ("A1", "A3", "B1", "B2"), "D1": None}


class TestBoundEndpoints:
    """ADVICE r1 (compiler.py:734): var-length / shortestPath with the far
    endpoint ALREADY bound by an earlier MATCH — the canonical Neo4j
    degrees-of-separation form — used to crash with AMBIGUOUS_REFERENCE
    (a fresh node struct re-joined under the bound name). The joiners now
    close onto the existing binding, mirroring _join_step's cycle-close."""

    def test_shortest_to_prebound_endpoint(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'}), "
             "(b:PhageGenome {accession:'B2'}) "
             "MATCH p = shortestPath((a)-[:sharesDNA*..4]-(b)) "
             "RETURN nodes(p) AS path, length(p) AS hops")
        r = eng.run(q).collect()
        assert len(r) == 1
        assert r[0].path == ["A1", "A3", "B1", "B2"] and r[0].hops == 3

    def test_all_shortest_to_prebound_endpoint(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'}), "
             "(b:PhageGenome {accession:'B2'}) "
             "MATCH p = allShortestPaths((a)-[:sharesDNA*..4]-(b)) "
             "RETURN nodes(p) AS path")
        assert paths_of(eng.run(q)) == ["A1>A3>B1>B2"]

    def test_var_length_to_prebound_endpoint(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'}), "
             "(b:PhageGenome {accession:'B1'}) "
             "MATCH p = (a)-[:sharesDNA*2..3]-(b) RETURN nodes(p) AS path")
        assert paths_of(eng.run(q)) == sorted(["A1>A3>B1", "A1>A2>A3>B1"])

    def test_optional_shortest_prebound_unreachable(self, eng):
        # D1 is disconnected from A1: the bound pair keeps its row, NULL path
        q = ("MATCH (a:PhageGenome {accession:'A1'}), "
             "(b:PhageGenome {accession:'D1'}) "
             "OPTIONAL MATCH p = shortestPath((a)-[:sharesDNA*..2]-(b)) "
             "RETURN a.accession AS src, b.accession AS tgt, "
             "nodes(p) AS path")
        r = eng.run(q).collect()
        assert len(r) == 1
        assert (r[0].src, r[0].tgt, r[0].path) == ("A1", "D1", None)

    def test_optional_shortest_prebound_reachable(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'}), "
             "(b:PhageGenome {accession:'B1'}) "
             "OPTIONAL MATCH p = shortestPath((a)-[:sharesDNA*..2]-(b)) "
             "RETURN a.accession AS src, b.accession AS tgt, "
             "nodes(p) AS path")
        r = eng.run(q).collect()
        assert len(r) == 1
        assert r[0].path == ["A1", "A3", "B1"]

    def test_prebound_label_mismatch_rejected(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'}), (h:Host) "
             "MATCH p = shortestPath((a)-[:sharesDNA*..2]-(h:PhageGenome)) "
             "RETURN count(*) AS n")
        with pytest.raises(CypherCompileError, match="bound to"):
            eng.run(q)


class TestMultiEdgeChains:
    """Named var-length CHAINS (p = (a)-[*..]-(m)-[:T]->(b)) — VERDICT r1
    next #5, previously fail-fast. Relationship-uniqueness must span the
    WHOLE chain (a rel used in the var-length segment cannot be reused by
    the fixed hop), per openCypher 9 §8.5. Expected sets hand-derived from
    EDGE_ROWS."""

    def test_varlen_then_fixed_directed(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*1..2]-(m:PhageGenome)-[:sharesDNA]->"
             "(b:PhageGenome) RETURN nodes(p) AS path")
        # A1>C1 then C1->A1 reuses rel A1|C1 -> excluded;
        # A1>A3>A2 then A2->A3 reuses A2|A3 -> excluded.
        assert paths_of(eng.run(q)) == sorted(
            ["A1>A2>A3", "A1>A3>B1", "A1>A2>A3>B1", "A1>A3>B1>B2"]
        )

    def test_chain_to_prebound_endpoint(self, eng):
        q = ("MATCH (b:PhageGenome {accession:'B2'}) "
             "MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*1..2]-(m:PhageGenome)-[:sharesDNA]->(b) "
             "RETURN nodes(p) AS path, length(p) AS hops")
        r = eng.run(q).collect()
        assert len(r) == 1
        assert r[0].path == ["A1", "A3", "B1", "B2"] and r[0].hops == 3

    def test_two_varlen_segments_uniqueness_spans_chain(self, eng):
        # (a)-[*1..1]-(m)-[*1..1]-(b) == 2-hop var-length; the bounce-back
        # A1>A2>A1 must be excluded even though the reuse crosses segments
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*1..1]-(m:PhageGenome)"
             "-[:sharesDNA*1..1]-(b:PhageGenome) RETURN nodes(p) AS path")
        assert paths_of(eng.run(q)) == sorted(
            ["A1>A2>A3", "A1>A3>A2", "A1>A3>B1"]
        )

    def test_intermediate_node_binds(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*1..2]-(m:PhageGenome)-[:sharesDNA]->"
             "(b:PhageGenome) "
             "RETURN m.accession AS mid, b.accession AS dst, "
             "length(p) AS hops")
        got = sorted((r.mid, r.dst, r.hops) for r in eng.run(q).collect())
        assert got == sorted(
            [("A2", "A3", 2), ("A3", "B1", 2), ("A3", "B1", 3),
             ("B1", "B2", 3)]
        )

    def test_inline_props_prune_midpoint(self, eng):
        # m constrained to Tara (only A3 qualifies among midpoints)
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*1..2]-(m:PhageGenome {source:'Tara'})"
             "-[:sharesDNA]->(b:PhageGenome) RETURN nodes(p) AS path")
        assert paths_of(eng.run(q)) == sorted(
            ["A1>A3>B1", "A1>A2>A3>B1"]
        )

    def test_fixed_then_varlen(self, eng):
        # fixed directed hop first, then a var-length tail
        q = ("MATCH p = (a:PhageGenome {accession:'C1'})-[:sharesDNA]->"
             "(m:PhageGenome)-[:sharesDNA*1..1]-(b:PhageGenome) "
             "RETURN nodes(p) AS path")
        # C1->A1 then 1 undirected hop (not back over A1|C1): A2, A3
        assert paths_of(eng.run(q)) == sorted(["C1>A1>A2", "C1>A1>A3"])

    def test_cycle_back_to_anchor(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*1..2]-(m:PhageGenome)-[:sharesDNA]->(a) "
             "RETURN nodes(p) AS path")
        # chains ending back at A1 without rel reuse: A1>A3>A2 + A2... no
        # A2->A1 edge (only A1->A2); C1->A1 exists: A1>A2/A3 can't reach C1
        # in <=2 hops without... A1>C1 uses A1|C1, C1->A1 reuses it. So the
        # ONLY return is via a var-length path ending at some m with an
        # m->A1 out-edge and unused rel: m=C1 unreachable otherwise -> none
        assert eng.run(q).count() == 0

    def test_weighted_chain_dists(self, eng):
        q = ("MATCH p = (a:PhageGenome {accession:'A1'})"
             "-[:sharesDNA*1..1]-(m:PhageGenome)-[:sharesDNA]->"
             "(b:PhageGenome) "
             "RETURN nodes(p) AS path, "
             "reduce(acc = 0.0, d IN p.dists | acc + d) AS cost")
        got = {">".join(r.path): round(r.cost, 6) for r in eng.run(q).collect()}
        assert got == {"A1>A2>A3": 0.25, "A1>A3>B1": 0.60}


class TestErrors:

    def test_shortest_in_multi_edge_chain_rejected(self, eng):
        from phageclouds_graphdatabase_spark.cypher.parser import (
            CypherSyntaxError,
        )

        q = ("MATCH p = shortestPath((a:PhageGenome)-[:sharesDNA*1..2]-"
             "(m:PhageGenome)-[:sharesDNA]->(b:PhageGenome)) "
             "RETURN count(*) AS n")
        with pytest.raises(CypherSyntaxError, match="single"):
            eng.run(q)

    def test_nodes_on_non_path_rejected(self, eng):
        q = "MATCH (a:PhageGenome) RETURN nodes(a) AS ns"
        with pytest.raises(CypherCompileError, match="named-path"):
            eng.run(q)

    def test_rebind_rejected(self, eng):
        q = ("MATCH p = (a:PhageGenome)-[:sharesDNA]->(b:PhageGenome), "
             "p = (b)-[:sharesDNA]->(c:PhageGenome) RETURN count(*) AS n")
        with pytest.raises(CypherCompileError, match="already bound"):
            eng.run(q)
