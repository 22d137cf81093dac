"""Cypher-subset frontend tests.

Three layers:
1. parser unit tests (AST shapes, case-insensitivity, errors);
2. the reference's nine query templates executed VERBATIM (same `.format`
   interpolation the scripts do, /root/reference/phageclouds_gdb.py:56-73,
   phageclouds_gdb_family.py:94-99, phageclouds_gdb_host.py:57-65) against
   the FIXTURES.md synthetic graph, with hand-computed expected results that
   pin Neo4j semantics (duplicate-preserving collect(), optional-match NULLs,
   existential semi-joins, directed-only expand);
3. end-to-end golden parity: the taxon script's 3-query flow re-run through
   the engine on inputs reconstructed from a committed golden HTML.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.cypher import (
    CypherEngine,
    CypherSyntaxError,
    parse,
    phage_catalog,
)
from phageclouds_graphdatabase_spark.cypher import ast_nodes as A
from phageclouds_graphdatabase_spark.cypher.compiler import CypherCompileError
from phageclouds_graphdatabase_spark.sources import golden

REF = "/root/reference"


# --------------------------------------------------------------------------
# 1. Parser
# --------------------------------------------------------------------------


class TestParser:
    def test_match_node_props_and_edge(self):
        q = parse(
            "MATCH (a:PhageGenome {source:'NCBI'})-[r:sharesDNA]->(b:PhageGenome) "
            "RETURN a.accession AS x"
        )
        m = q.clauses[0]
        (pat,) = m.patterns
        assert pat.nodes[0] == A.NodePat("a", "PhageGenome", (("source", A.Literal("NCBI")),))
        assert pat.edges[0].reltype == "sharesDNA"
        assert pat.edges[0].direction == "out"
        assert pat.nodes[1].var == "b"

    def test_keywords_case_insensitive_and_aliases(self):
        q = parse("match (a:L) return a.x as Foo, a.y AS Bar;")
        items = q.clauses[-1].items
        assert [i.alias for i in items] == ["Foo", "Bar"]

    def test_in_list_of_python_repr(self):
        q = parse("MATCH (a:L) WHERE a.k in ['A1', 'B2'] RETURN a.k")
        w = q.clauses[0].where
        assert isinstance(w, A.InList)
        assert w.source == A.ListLit((A.Literal("A1"), A.Literal("B2")))

    def test_existential_pattern_predicate(self):
        q = parse(
            'MATCH (a:L) WHERE (a)-[:infects]->(:Host {genus:"X"}) RETURN a.k'
        )
        w = q.clauses[0].where
        assert isinstance(w, A.PatternPred)
        assert w.pattern.nodes[1].label == "Host"

    def test_parenthesized_expr_not_pattern(self):
        q = parse("MATCH (a:L) WHERE (a.x = 1 OR a.y = 2) AND a.z = 3 RETURN a.k")
        assert isinstance(q.clauses[0].where, A.And)

    def test_list_comprehension(self):
        q = parse("MATCH (a:L) WITH collect(a.k) AS ks "
                  "RETURN [x IN ks WHERE NOT x IN ks] AS out")
        item = q.clauses[-1].items[0]
        assert isinstance(item.expr, A.ListComp)
        assert item.expr.var == "x"

    def test_directions(self):
        out = parse("MATCH (a:L)-[r:T]->(b:L) RETURN a.k").clauses[0]
        inn = parse("MATCH (a:L)<-[r:T]-(b:L) RETURN a.k").clauses[0]
        both = parse("MATCH (a:L)-[r:T]-(b:L) RETURN a.k").clauses[0]
        assert out.patterns[0].edges[0].direction == "out"
        assert inn.patterns[0].edges[0].direction == "in"
        assert both.patterns[0].edges[0].direction == "both"

    def test_unaliased_item_keeps_source_text(self):
        q = parse("MATCH (a:L) RETURN a.accession;")
        assert q.clauses[-1].items[0].text == "a.accession"

    @pytest.mark.parametrize("bad", [
        "MATCH (a:L RETURN a.k",
        "RETURN",
        "MATCH (a:L) RETURN a.k extra",
        "MATCH (a:L) WHERE RETURN a.k",
    ])
    def test_syntax_errors(self, bad):
        with pytest.raises(CypherSyntaxError):
            parse(bad)


# --------------------------------------------------------------------------
# 2. Reference templates on the synthetic fixture graph
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def eng(phage_nodes, shares_dna, infects):
    return CypherEngine(phage_catalog(phage_nodes, shares_dna, infects))


def rows(df):
    return sorted(map(tuple, df.collect()))


class TestReferenceTemplates:
    def test_taxon_seed_expand(self, eng):
        # phageclouds_gdb.py:56-58 — NCBI seeds, CONTAINS, distance <= t
        q = """MATCH (a:PhageGenome {{source:'NCBI'}})-[r:sharesDNA]->(b:PhageGenome)
                WHERE a.taxonomy CONTAINS '{}' AND r.distance <= {}
                RETURN a.accession AS {}_phage, b.accession AS target_phage;""".format(
            "Tequatrovirus", 0.25, "Tequatrovirus"
        )
        df = eng.run(q)
        assert df.columns == ["Tequatrovirus_phage", "target_phage"]
        # A1,A2 are the NCBI Tequatrovirus seeds; C1->A1 is NOT followed
        # (directed-only expand, SURVEY.md §1.1)
        assert rows(df) == [("A1", "A2"), ("A1", "A3"), ("A2", "A3")]

    def test_induced_edges_interpolated_in_list(self, eng):
        # phageclouds_gdb.py:64-67 — the node set re-enters as a list literal
        ns = ["A1", "A2", "A3"]
        q = """MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome)
                WHERE a.accession in {} AND b.accession in {} AND r.distance <= {}
                RETURN a.accession AS Source, b.accession AS Target,
                r.distance as Distance;""".format(ns, ns, 0.25)
        assert rows(eng.run(q)) == [
            ("A1", "A2", 0.10), ("A1", "A3", 0.20), ("A2", "A3", 0.15)
        ]

    def test_node_attrs_computed_boolean(self, eng):
        # phageclouds_gdb.py:71-73 — dynamic computed boolean column name
        q = """MATCH (a:PhageGenome) WHERE a.accession in {}
                RETURN a.accession as Phage, a.source as Source, a.genome_size as Genome_size,
                a.taxonomy CONTAINS '{}' as Phage_is_{};""".format(
            ["A1", "A2", "A3"], "Tequatrovirus", "Tequatrovirus"
        )
        df = eng.run(q)
        assert df.columns == ["Phage", "Source", "Genome_size", "Phage_is_Tequatrovirus"]
        assert rows(df) == [
            ("A1", "NCBI", 168000, True),
            ("A2", "NCBI", 171000, True),
            ("A3", "Tara", 45000, False),
        ]

    def test_family_collect_and_list_comprehension(self, eng):
        # phageclouds_gdb_family.py:94 — OPTIONAL MATCH + WITH collect + A2
        # list-union. collect() keeps duplicates (one p per matched q); the
        # reference set()s the list client-side (family.py:95).
        q = (
            'MATCH (p:PhageGenome {{source:"NCBI"}}) WHERE p.taxonomy CONTAINS "{}" '
            "OPTIONAL MATCH (p)-[r:sharesDNA]->(q:PhageGenome) WHERE r.distance <= {} "
            "WITH collect(p.accession) AS target_phages, collect(q.accession) AS connected_phages "
            "RETURN target_phages + [x IN connected_phages WHERE NOT x IN target_phages] "
            "AS phage_nodes;"
        ).format("Myoviridae", 0.25)
        [row] = eng.run(q).collect()
        assert sorted(row.phage_nodes) == ["A1", "A1", "A2", "A3", "A3"]

    def test_family_optional_match_keeps_edgeless_seeds(self, eng):
        # the OPTIONAL MATCH's WHERE constrains the match, not the seeds:
        # Herelleviridae D1->D2 (0.25) doesn't qualify at t=0.15, yet all of
        # D1, D2, E1 must stay (E1 has no edges at all)
        q = (
            'MATCH (p:PhageGenome {source:"NCBI"}) WHERE p.taxonomy CONTAINS "Herelleviridae" '
            "OPTIONAL MATCH (p)-[r:sharesDNA]->(q:PhageGenome) WHERE r.distance <= 0.15 "
            "WITH collect(p.accession) AS target_phages, collect(q.accession) AS connected_phages "
            "RETURN target_phages + [x IN connected_phages WHERE NOT x IN target_phages] "
            "AS phage_nodes;"
        )
        [row] = eng.run(q).collect()
        assert sorted(row.phage_nodes) == ["D1", "D2", "E1"]

    def test_host_existential_harsh(self, eng):
        # phageclouds_gdb_host.py:57 — existential infects predicate, harsh
        # source filter on endpoint a ONLY (the golden-parity quirk)
        q = (
            'MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome) '
            'WHERE (a)-[:infects]->(:Host {{genus:"{}"}}) AND r.distance <= {} '
            'AND a.source <> "GTDB_predicted_prophages" '
            "WITH collect(a.accession) as a_list, collect(b.accession) as b_list "
            "RETURN a_list + [x IN b_list WHERE NOT x IN a_list] AS node_list;"
        ).format("Escherichia", 0.25)
        [row] = eng.run(q).collect()
        assert sorted(row.node_list) == ["A1", "A1", "A2", "A3", "A3", "B1", "B2"]

    def test_host_optional_attribute_join_multiplies_rows(self, eng):
        # phageclouds_gdb_host.py:61-62 — J5: two hosts for B2 -> two rows;
        # hostless E1 -> NULL Host
        q = """MATCH (a:PhageGenome) WHERE a.accession IN {} OPTIONAL MATCH (a)-[:infects]->(h:Host)
                RETURN a.accession AS Phage, a.source AS Source, a.genome_size AS Genome_size, a.genus AS Phage_genus, h.genus AS Host;""".format(
            ["A1", "B2", "E1"]
        )
        assert rows(eng.run(q)) == [
            ("A1", "NCBI", 168000, "Tequatrovirus", "Escherichia"),
            ("B2", "GPD_Isolate", 51000, None, "Cellulophaga"),
            ("B2", "GPD_Isolate", 51000, None, "Salmonella"),
            ("E1", "NCBI", 127000, "Okubovirus", None),
        ]

    def test_family_node_attrs(self, eng):
        # phageclouds_gdb_family.py:96 (note the reference's multi-space
        # `AS       Lineage` — whitespace-insensitive parse)
        q = """MATCH (p:PhageGenome) WHERE p.accession IN {} RETURN p.accession AS Phage, p.source AS Source, p.genome_size AS Genome_size, p.taxonomy AS       Lineage;""".format(
            ["D1", "E1"]
        )
        df = eng.run(q)
        assert df.columns == ["Phage", "Source", "Genome_size", "Lineage"]
        assert len(df.collect()) == 2


class TestBeyondReference:
    def test_incoming_direction(self, eng):
        q = "MATCH (a:PhageGenome)<-[r:sharesDNA]-(b:PhageGenome) " \
            "WHERE a.accession = 'A1' RETURN b.accession AS src"
        assert rows(eng.run(q)) == [("C1",)]

    def test_undirected_match(self, eng):
        # both-directions mode: A1's neighborhood includes inbound C1
        q = "MATCH (a:PhageGenome)-[r:sharesDNA]-(b:PhageGenome) " \
            "WHERE a.accession = 'A1' RETURN b.accession AS nbr"
        assert rows(eng.run(q)) == [("A2",), ("A3",), ("C1",)]

    def test_dataframe_param_semi_join(self, eng, spark):
        ids = spark.createDataFrame([("A1",), ("A2,",)], "id string")
        q = "MATCH (a:PhageGenome) WHERE a.accession IN $ids " \
            "RETURN a.accession AS acc"
        assert rows(eng.run(q, params={"ids": ids})) == [("A1",)]

    def test_list_param(self, eng):
        q = "MATCH (a:PhageGenome) WHERE a.accession IN $ids RETURN a.accession AS acc"
        assert rows(eng.run(q, params={"ids": ["A1", "D2"]})) == [("A1",), ("D2",)]

    def test_scalar_param_in_props(self, eng):
        q = "MATCH (a:PhageGenome {source: $src}) RETURN count(a.accession) AS n"
        assert eng.run(q, params={"src": "Tara"}).collect()[0].n == 3

    def test_grouped_aggregation(self, eng):
        # Cypher implicit grouping: non-aggregate items are the keys
        q = "MATCH (a:PhageGenome) RETURN a.source AS src, " \
            "count(a.accession) AS n, max(a.genome_size) AS biggest"
        got = {r.src: (r.n, r.biggest) for r in eng.run(q).collect()}
        assert got["NCBI"] == (6, 171000)
        assert got["Tara"] == (3, 45000)

    def test_count_star_and_distinct(self, eng):
        q = "MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome) " \
            "RETURN count(*) AS edges"
        assert eng.run(q).collect()[0].edges == 9
        # B2 (GPD_Isolate) has no outgoing edges -> 4 distinct sources
        q = "MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome) " \
            "RETURN DISTINCT a.source AS s"
        assert len(eng.run(q).collect()) == 4

    def test_not_existential_anti_join(self, eng):
        q = 'MATCH (a:PhageGenome {source:"NCBI"}) ' \
            "WHERE NOT (a)-[:infects]->(h:Host) RETURN a.accession AS acc"
        assert rows(eng.run(q)) == [("D2",), ("E1",)]

    def test_cycle_close_on_bound_var(self, eng):
        # triangle A1->A2->A3 plus closing A1->A3
        q = "MATCH (a:PhageGenome)-[r1:sharesDNA]->(b:PhageGenome)" \
            "-[r2:sharesDNA]->(c:PhageGenome), (a)-[r3:sharesDNA]->(c) " \
            "RETURN a.accession AS a, b.accession AS b, c.accession AS c"
        assert rows(eng.run(q)) == [("A1", "A2", "A3")]

    def test_with_where_post_aggregation(self, eng):
        q = "MATCH (a:PhageGenome) WITH a.source AS src, count(a.accession) AS n " \
            "WHERE n >= 3 RETURN src, n"
        got = {r.src for r in eng.run(q).collect()}
        assert got == {"NCBI", "Tara"}

    def test_is_null_and_boolean_ops(self, eng):
        q = "MATCH (a:PhageGenome) WHERE a.genus IS NULL AND " \
            "(a.source = 'Tara' OR a.source = 'GPD_Isolate') " \
            "RETURN a.accession AS acc"
        assert rows(eng.run(q)) == [("A3",), ("B2",), ("F1",), ("F2",)]


class TestErrors:
    def test_unknown_label(self, eng):
        with pytest.raises(CypherCompileError, match="unknown node label"):
            eng.run("MATCH (a:Nope) RETURN a.x AS x")

    def test_unknown_reltype(self, eng):
        with pytest.raises(CypherCompileError, match="unknown relationship"):
            eng.run("MATCH (a:PhageGenome)-[r:nope]->(b:PhageGenome) RETURN a.accession AS x")

    def test_unbound_variable(self, eng):
        with pytest.raises(CypherCompileError, match="unbound variable"):
            eng.run("MATCH (a:PhageGenome) RETURN z.accession AS x")

    def test_unlabeled_match_binds_union(self, eng):
        # was an error before round 3; MATCH (a) now binds every label —
        # PhageGenome rows carry accession, Host rows read NULL
        got = eng.run(
            "MATCH (a) RETURN count(a.accession) AS c"
        ).collect()
        assert got[0].c == 12


# --------------------------------------------------------------------------
# 3. Golden parity: the taxon script's exact 3-query flow through the engine
# --------------------------------------------------------------------------


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "Tequatrovirus_025_clouds.html")),
    reason="reference goldens absent",
)
def test_golden_taxon_three_query_flow(spark):
    """Drive the engine exactly as phageclouds_gdb.py drives Neo4j
    (/root/reference/phageclouds_gdb.py:56-75): Q1 seed+expand, client-side
    set union, Q2/Q3 with the node set interpolated as a Python list literal.
    The result graph must match the committed golden."""
    path = os.path.join(REF, "Tequatrovirus_025_clouds.html")
    g_nodes, g_edges = golden.golden_frames(spark, path)
    in_nodes, in_edges = golden.reconstruct_taxon_input(spark, path, "Tequatrovirus")
    eng = CypherEngine(phage_catalog(in_nodes, in_edges))

    q1 = """MATCH (a:PhageGenome {{source:'NCBI'}})-[r:sharesDNA]->(b:PhageGenome)
            WHERE a.taxonomy CONTAINS '{}' AND r.distance <= {}
            RETURN a.accession AS {}_phage, b.accession AS target_phage;""".format(
        "Tequatrovirus", 0.25, "Tequatrovirus"
    )
    df1 = eng.run(q1).toPandas()
    node_set = set(df1["Tequatrovirus_phage"]).union(set(df1["target_phage"]))

    q2 = """MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome)
            WHERE a.accession in {} AND b.accession in {} AND r.distance <= {}
            RETURN a.accession AS Source, b.accession AS Target,
            r.distance as Distance;""".format(list(node_set), list(node_set), 0.25)
    edges_out = eng.run(q2)

    q3 = """MATCH (a:PhageGenome) WHERE a.accession in {}
            RETURN a.accession as Phage, a.source as Source, a.genome_size as Genome_size,
            a.taxonomy CONTAINS '{}' as Phage_is_{};""".format(
        list(node_set), "Tequatrovirus", "Tequatrovirus"
    )
    nodes_out = eng.run(q3)

    golden_ids = {r.id for r in g_nodes.collect()}
    assert {r.Phage for r in nodes_out.collect()} == golden_ids
    golden_edge_set = {(r.src, r.dst) for r in g_edges.collect()}
    got_edges = {(r.Source, r.Target) for r in edges_out.collect()}
    assert got_edges == golden_edge_set
    assert nodes_out.count() == 264
    assert edges_out.count() == 23247


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "Cellulophaga_025_clouds_v2.html")),
    reason="reference goldens absent",
)
@pytest.mark.parametrize("fname,genus,thres,harsh,n_nodes,n_edges", [
    ("Cellulophaga_025_clouds_v2.html", "Cellulophaga", 0.25, False, 60, 111),
    ("Cellulophaga_025_clouds_v2_harsh.html", "Cellulophaga", 0.25, True, 33, 72),
])
def test_golden_host_three_query_flow(spark, fname, genus, thres, harsh, n_nodes, n_edges):
    """The host script's exact query flow
    (/root/reference/phageclouds_gdb_host.py:56-65) through the engine:
    Q1 existential seed+expand (+harsh source filter on endpoint a only),
    Q2 attrs + optional host, Q3 induced edges with interpolated IN-lists."""
    path = os.path.join(REF, fname)
    g_nodes, g_edges = golden.golden_frames(spark, path)
    in_nodes, in_edges, in_infects = golden.reconstruct_host_input(spark, path, genus)
    eng = CypherEngine(phage_catalog(in_nodes, in_edges, in_infects))

    harsh_pred = ' AND a.source <> "GTDB_predicted_prophages"' if harsh else ""
    q1 = (
        'MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome) '
        'WHERE (a)-[:infects]->(:Host {{genus:"{}"}}) AND r.distance <= {}{} '
        "WITH collect(a.accession) as a_list, collect(b.accession) as b_list "
        "RETURN a_list + [x IN b_list WHERE NOT x IN a_list] AS node_list;"
    ).format(genus, thres, harsh_pred)
    [row] = eng.run(q1).collect()
    node_set = set(row.node_list)

    q2 = """MATCH (a:PhageGenome) WHERE a.accession IN {} OPTIONAL MATCH (a)-[:infects]->(h:Host)
            RETURN a.accession AS Phage, a.source AS Source, a.genome_size AS Genome_size, a.genus AS Phage_genus, h.genus AS Host;""".format(
        list(node_set)
    )
    nodes_out = eng.run(q2)

    q3 = """MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome) WHERE a.accession IN {} AND b.accession IN {} AND r.distance <= {} RETURN a.accession as Start, b.accession as End, r.distance as Distance;""".format(
        list(node_set), list(node_set), thres
    )
    edges_out = eng.run(q3)

    assert {r.Phage for r in nodes_out.collect()} == {r.id for r in g_nodes.collect()}
    assert {(r.Start, r.End) for r in edges_out.collect()} == {
        (r.src, r.dst) for r in g_edges.collect()
    }
    assert len(node_set) == n_nodes
    assert edges_out.count() == n_edges


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "Ackermannviridae_015_genus_clouds.html")),
    reason="reference goldens absent",
)
def test_golden_family_three_query_flow(spark):
    """The family script's flow (/root/reference/phageclouds_gdb_family.py:94-99):
    Q1 OPTIONAL-MATCH collect + comprehension union, then Q2/Q3 with the
    node list interpolated (the reference set()s the Q1 list first)."""
    path = os.path.join(REF, "Ackermannviridae_015_genus_clouds.html")
    family, thres = "Ackermannviridae", 0.15
    g_nodes, g_edges = golden.golden_frames(spark, path)
    in_nodes, in_edges, _ = golden.reconstruct_family_input(spark, path, family, "genus")
    eng = CypherEngine(phage_catalog(in_nodes, in_edges))

    q1 = """MATCH (p:PhageGenome {{source:"NCBI"}}) WHERE p.taxonomy CONTAINS "{}" OPTIONAL MATCH (p)-[r:sharesDNA]->(q:PhageGenome) WHERE r.distance <= {} WITH collect(p.accession) AS target_phages, collect(q.accession) AS connected_phages RETURN target_phages + [x IN connected_phages WHERE NOT x IN target_phages] AS phage_nodes;""".format(
        family, thres
    )
    [row] = eng.run(q1).collect()
    target_phages = set(row.phage_nodes)  # family.py:95

    q2 = """MATCH (p:PhageGenome) WHERE p.accession IN {} RETURN p.accession AS Phage, p.source AS Source, p.genome_size AS Genome_size, p.taxonomy AS       Lineage;""".format(
        list(target_phages)
    )
    nodes_out = eng.run(q2)

    q3 = """MATCH (p:PhageGenome)-[r:sharesDNA]->(q:PhageGenome) WHERE p.accession IN {} AND q.accession IN {} AND r.distance <= {} RETURN p.accession AS Source, q.accession AS Target, r.distance AS Distance;""".format(
        list(target_phages), list(target_phages), thres
    )
    edges_out = eng.run(q3)

    assert {r.Phage for r in nodes_out.collect()} == {r.id for r in g_nodes.collect()}
    assert {(r.Source, r.Target) for r in edges_out.collect()} == {
        (r.src, r.dst) for r in g_edges.collect()
    }
    assert nodes_out.count() == 137
    assert edges_out.count() == 2349


class TestVarLength:
    def test_var_length_out(self, eng):
        # hop 1 from A1: A2, A3; hop 2 adds B1 (A3 -> B1 cross edge, no
        # distance filter here); exactly-2: A3 (via A2) and B1 (via A3)
        q = "MATCH (a:PhageGenome)-[:sharesDNA*1..2]->(b:PhageGenome) " \
            "WHERE a.accession = 'A1' RETURN b.accession AS b"
        assert rows(eng.run(q)) == [("A2",), ("A3",), ("B1",)]
        q2 = "MATCH (a:PhageGenome)-[:sharesDNA*2]->(b:PhageGenome) " \
             "WHERE a.accession = 'A1' RETURN b.accession AS b"
        assert rows(eng.run(q2)) == [("A3",), ("B1",)]

    def test_var_length_undirected_reaches_whole_cloud(self, eng):
        # undirected 3 hops from B3: B3-B2-B1-A3 (cross edge 0.40 counts:
        # no distance filter here)
        q = "MATCH (a:PhageGenome)-[:sharesDNA*1..3]-(b:PhageGenome) " \
            "WHERE a.accession = 'B3' RETURN b.accession AS b"
        assert rows(eng.run(q)) == [("A3",), ("B1",), ("B2",)]

    def test_var_length_distinct_pairs_not_paths(self, eng):
        # two paths A1->A2->A3 and A1->A3 collapse to ONE row (documented
        # deviation from Neo4j's per-path rows)
        q = "MATCH (a:PhageGenome)-[:sharesDNA*1..2]->(b:PhageGenome) " \
            "WHERE a.accession = 'A1' AND b.accession = 'A3' " \
            "RETURN a.accession AS a, b.accession AS b"
        assert rows(eng.run(q)) == [("A1", "A3")]

    def test_var_length_rejects_edge_var(self, eng):
        with pytest.raises(CypherCompileError, match="relationship variables"):
            eng.run("MATCH (a:PhageGenome)-[r:sharesDNA*1..2]->(b:PhageGenome) "
                    "RETURN a.accession AS a")

    def test_var_length_parse(self):
        e = parse("MATCH (a:L)-[:T*]->(b:L) RETURN a.k").clauses[0].patterns[0].edges[0]
        assert e.var_length == (1, 8)
        e = parse("MATCH (a:L)-[:T*3]->(b:L) RETURN a.k").clauses[0].patterns[0].edges[0]
        assert e.var_length == (3, 3)
        e = parse("MATCH (a:L)-[:T*2..5]->(b:L) RETURN a.k").clauses[0].patterns[0].edges[0]
        assert e.var_length == (2, 5)


class TestOrderLimit:
    def test_order_by_desc_limit(self, eng):
        q = "MATCH (a:PhageGenome) RETURN a.accession AS acc, a.genome_size AS gs " \
            "ORDER BY gs DESC LIMIT 3"
        got = [r.acc for r in eng.run(q).collect()]
        assert got == ["A2", "A1", "D2"]  # 171000, 168000, 158000

    def test_order_by_non_returned_expr_and_skip(self, eng):
        q = "MATCH (a:PhageGenome) RETURN a.accession AS acc " \
            "ORDER BY a.genome_size DESC SKIP 2 LIMIT 2"
        df = eng.run(q)
        assert df.columns == ["acc"]
        assert [r.acc for r in df.collect()] == ["D2", "D1"]

    def test_order_by_with_aggregation_alias(self, eng):
        q = "MATCH (a:PhageGenome) RETURN a.source AS src, count(a.accession) AS n " \
            "ORDER BY n DESC, src ASC LIMIT 2"
        got = [(r.src, r.n) for r in eng.run(q).collect()]
        assert got == [("NCBI", 6), ("Tara", 3)]

    def test_order_by_hidden_under_aggregation_rejected(self, eng):
        with pytest.raises(CypherCompileError, match="ORDER BY"):
            eng.run("MATCH (a:PhageGenome) RETURN a.source AS s, count(a.accession) AS n "
                    "ORDER BY a.genome_size")


class TestUnwindCase:
    def test_unwind_collected_list(self, eng):
        q = 'MATCH (p:PhageGenome {source:"NCBI"}) WHERE p.taxonomy CONTAINS "Myoviridae" ' \
            "OPTIONAL MATCH (p)-[r:sharesDNA]->(q:PhageGenome) WHERE r.distance <= 0.25 " \
            "WITH collect(p.accession) AS tp, collect(q.accession) AS cp " \
            "UNWIND tp + [x IN cp WHERE NOT x IN tp] AS node " \
            "RETURN node"
        [*got] = sorted(r.node for r in eng.run(q).collect())
        assert got == ["A1", "A1", "A2", "A3", "A3"]

    def test_unwind_literal_first_clause(self, phage_nodes, shares_dna, infects, spark):
        e = CypherEngine(phage_catalog(phage_nodes, shares_dna, infects), spark=spark)
        q = "UNWIND [1, 2, 3] AS n RETURN n"
        assert sorted(r.n for r in e.run(q).collect()) == [1, 2, 3]

    def test_generic_case(self, eng):
        q = ("MATCH (a:PhageGenome) RETURN a.accession AS acc, "
             "CASE WHEN a.source = 'NCBI' AND a.taxonomy CONTAINS 'Tequatrovirus' THEN 'green' "
             "WHEN a.source = 'NCBI' THEN 'red' ELSE 'yellow' END AS color")
        got = {r.acc: r.color for r in eng.run(q).collect()}
        assert got["A1"] == "green" and got["B1"] == "red" and got["A3"] == "yellow"

    def test_simple_case_with_operand(self, eng):
        q = ("MATCH (a:PhageGenome) RETURN a.accession AS acc, "
             "CASE a.source WHEN 'NCBI' THEN 1 WHEN 'Tara' THEN 2 ELSE 0 END AS k")
        got = {r.acc: r.k for r in eng.run(q).collect()}
        assert got["A1"] == 1 and got["A3"] == 2 and got["B2"] == 0

    def test_case_no_else_is_null(self, eng):
        q = ("MATCH (a:PhageGenome) RETURN a.accession AS acc, "
             "CASE WHEN a.source = 'NCBI' THEN 'x' END AS v")
        got = {r.acc: r.v for r in eng.run(q).collect()}
        assert got["A1"] == "x" and got["A3"] is None


class TestWithOrderLimit:
    def test_with_top_k_then_expand(self, eng):
        # mid-pipeline top-k: the 2 largest genomes, then their out-edges
        q = ("MATCH (a:PhageGenome) WITH a ORDER BY a.genome_size DESC LIMIT 2 "
             "MATCH (a)-[r:sharesDNA]->(b:PhageGenome) "
             "RETURN a.accession AS src, b.accession AS dst")
        # top-2: A2 (171000), A1 (168000); A2->A3 and A1's three edges
        assert rows(eng.run(q)) == [("A1", "A2"), ("A1", "A3"), ("A2", "A3")]

    def test_with_order_by_alias_limit(self, eng):
        q = ("MATCH (a:PhageGenome) WITH a.source AS src, count(a.accession) AS n "
             "ORDER BY n DESC, src ASC LIMIT 1 RETURN src, n")
        assert rows(eng.run(q)) == [("NCBI", 6)]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=80))
def test_parser_never_crashes_with_internal_error(text):
    # arbitrary input either parses or raises the typed syntax error --
    # never an internal exception
    try:
        parse(text)
    except CypherSyntaxError:
        pass


@settings(max_examples=50, deadline=None)
@given(
    tax=st.text(alphabet=st.characters(whitelist_categories=("Lu", "Ll")), min_size=1, max_size=12),
    d=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_reference_template_parses_for_any_args(tax, d):
    # the taxon template parses for ANY interpolated argument values the
    # reference's argparse would accept
    q = """MATCH (a:PhageGenome {{source:'NCBI'}})-[r:sharesDNA]->(b:PhageGenome)
            WHERE a.taxonomy CONTAINS '{}' AND r.distance <= {}
            RETURN a.accession AS {}_phage, b.accession AS target_phage;""".format(tax, d, tax)
    parse(q)


class TestAggregateVariants:
    def test_collect_distinct(self, eng):
        q = "MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome) " \
            "WITH collect(DISTINCT a.source) AS srcs RETURN size(srcs) AS n"
        assert eng.run(q).collect()[0].n == 4

    def test_count_distinct(self, eng):
        q = "MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome) " \
            "RETURN count(DISTINCT a.accession) AS n"
        assert eng.run(q).collect()[0].n == 8

    def test_sum_avg_min_max(self, eng):
        q = ("MATCH (a:PhageGenome {source:'Tara'}) "
             "RETURN sum(a.genome_size) AS s, min(a.genome_size) AS mn, "
             "max(a.genome_size) AS mx")
        r = eng.run(q).collect()[0]
        assert (r.s, r.mn, r.mx) == (45000 + 12000 + 12500, 12000, 45000)

    def test_percentile_cont_disc(self, eng):
        # Tara genome sizes: 12000, 12500, 45000 (n=3).
        # cont(0.5) = middle value; disc(0.5) = element ceil(0.5*3)=2nd;
        # disc(0.9) = element ceil(2.7)=3rd; cont(0) / disc with p=0 -> min
        q = ("MATCH (a:PhageGenome {source:'Tara'}) "
             "RETURN percentileCont(a.genome_size, 0.5) AS pc, "
             "percentileDisc(a.genome_size, 0.5) AS pd, "
             "percentileDisc(a.genome_size, 0.9) AS pd9, "
             "percentileDisc(a.genome_size, 0.0) AS pd0")
        r = eng.run(q).collect()[0]
        assert (r.pc, r.pd, r.pd9, r.pd0) == (12500.0, 12500, 45000, 12000)

    def test_percentile_grouped(self, eng):
        q = ("MATCH (a:PhageGenome) RETURN a.source AS src, "
             "percentileDisc(a.genome_size, 0.5) AS p50 ORDER BY src")
        got = {r.src: r.p50 for r in eng.run(q).collect()}
        assert got["Tara"] == 12500

    def test_stdev_sample_and_population(self, eng):
        import math

        q = ("MATCH (a:PhageGenome {source:'Tara'}) "
             "RETURN stDev(a.genome_size) AS sd, stDevP(a.genome_size) AS sdp")
        r = eng.run(q).collect()[0]
        vals = [12000, 12500, 45000]
        m = sum(vals) / 3
        var_p = sum((v - m) ** 2 for v in vals) / 3
        var_s = sum((v - m) ** 2 for v in vals) / 2
        assert math.isclose(r.sd, math.sqrt(var_s), rel_tol=1e-9)
        assert math.isclose(r.sdp, math.sqrt(var_p), rel_tol=1e-9)

    def test_percentile_wrong_arity_rejected(self, eng):
        q = ("MATCH (a:PhageGenome) "
             "RETURN percentileCont(a.genome_size) AS p")
        with pytest.raises(CypherCompileError, match="percentile"):
            eng.run(q)


class TestBlockSubqueries:
    """Neo4j 5 EXISTS { } / COUNT { } blocks (new in round 2)."""

    def test_exists_block_with_inner_where(self, eng):
        q = ("MATCH (a:PhageGenome) WHERE EXISTS { "
             "MATCH (a)-[r:sharesDNA]->(b:PhageGenome) "
             "WHERE r.distance <= 0.1 } "
             "RETURN a.accession AS id ORDER BY id")
        # out-edges with d <= 0.1: A1 (.10), B1 (.05), B3 (.05), C1 (.10),
        # F1 (-0.0)
        assert [r.id for r in eng.run(q).collect()] == [
            "A1", "B1", "B3", "C1", "F1"
        ]

    def test_not_exists_block_is_anti_join(self, eng):
        q = ("MATCH (a:PhageGenome) WHERE NOT EXISTS { "
             "(a)-[:sharesDNA]->(b:PhageGenome) } "
             "RETURN a.accession AS id ORDER BY id")
        assert [r.id for r in eng.run(q).collect()] == [
            "B2", "D2", "E1", "F2"
        ]

    def test_count_block_as_degree(self, eng):
        q = ("MATCH (a:PhageGenome) RETURN a.accession AS id, "
             "COUNT { (a)-[:sharesDNA]-(b:PhageGenome) } AS deg "
             "ORDER BY id LIMIT 4")
        assert [(r.id, r.deg) for r in eng.run(q).collect()] == [
            ("A1", 3), ("A2", 2), ("A3", 3), ("B1", 2)
        ]

    def test_count_block_in_where(self, eng):
        q = ("MATCH (a:PhageGenome) "
             "WHERE COUNT { (a)-[:sharesDNA]->(b:PhageGenome) } >= 2 "
             "RETURN a.accession AS id")
        assert [r.id for r in eng.run(q).collect()] == ["A1"]

    def test_count_block_zero_for_isolated(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'E1'}) RETURN "
             "COUNT { (a)-[:sharesDNA]-(b:PhageGenome) } AS deg")
        assert eng.run(q).collect()[0].deg == 0

    def test_exists_block_unbound_anchor_rejected(self, eng):
        q = ("MATCH (a:PhageGenome) WHERE EXISTS { "
             "(z:PhageGenome)-[:sharesDNA]->(b:PhageGenome) } "
             "RETURN count(*) AS n")
        with pytest.raises(CypherCompileError, match="bound"):
            eng.run(q)


class TestPatternComprehension:
    """[(a)-[:T]->(b) WHERE pred | proj] — inline correlated collect
    (round 3). Elements are sorted ascending (documented deviation from
    Neo4j's nondeterministic match order)."""

    def test_out_neighbor_lists(self, eng):
        q = ("MATCH (a:PhageGenome) RETURN a.accession AS id, "
             "[(a)-[:sharesDNA]->(b:PhageGenome) | b.accession] AS nbrs "
             "ORDER BY id LIMIT 4")
        assert [(r.id, r.nbrs) for r in eng.run(q).collect()] == [
            ("A1", ["A2", "A3"]), ("A2", ["A3"]),
            ("A3", ["B1"]), ("B1", ["B2"]),
        ]

    def test_empty_list_when_no_match(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'E1'}) RETURN "
             "[(a)-[:sharesDNA]-(b:PhageGenome) | b.accession] AS nbrs")
        assert eng.run(q).collect()[0].nbrs == []

    def test_inner_where_filters_elements(self, eng):
        # undirected neighbors of A1 with d <= 0.1: A2 (.10) and C1 (.10);
        # A3 (.20) is filtered out
        q = ("MATCH (a:PhageGenome {accession:'A1'}) RETURN "
             "[(a)-[r:sharesDNA]-(b:PhageGenome) WHERE r.distance <= 0.1 "
             "| b.accession] AS nbrs")
        assert eng.run(q).collect()[0].nbrs == ["A2", "C1"]

    def test_projection_uses_edge_property(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'}) RETURN "
             "[(a)-[r:sharesDNA]->(b:PhageGenome) | r.distance] AS ds")
        assert eng.run(q).collect()[0].ds == [0.10, 0.20]

    def test_size_of_pattern_comp_in_where(self, eng):
        q = ("MATCH (a:PhageGenome) WHERE size([(a)-[:sharesDNA]->"
             "(b:PhageGenome) | 1]) >= 2 RETURN a.accession AS id")
        assert [r.id for r in eng.run(q).collect()] == ["A1"]

    def test_through_with_clause(self, eng):
        q = ("MATCH (a:PhageGenome) "
             "WITH a, [(a)-[:sharesDNA]->(b:PhageGenome) | b.accession] "
             "AS nbrs WHERE size(nbrs) = 1 "
             "RETURN a.accession AS id ORDER BY id")
        assert [r.id for r in eng.run(q).collect()] == [
            "A2", "A3", "B1", "B3", "C1", "D1", "F1"
        ]

    def test_list_literal_backtracking_unharmed(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'}) "
             "RETURN [(1+2), 3] AS lst")
        assert eng.run(q).collect()[0].lst == [3, 3]

    def test_unbound_anchor_rejected(self, eng):
        q = ("MATCH (a:PhageGenome) RETURN "
             "[(z:PhageGenome)-[:sharesDNA]->(b:PhageGenome) "
             "| b.accession] AS nbrs")
        with pytest.raises(CypherCompileError, match="bound"):
            eng.run(q)

    def test_parser_requires_relationship(self):
        # [(a)] can never be a pattern comprehension — it falls back to a
        # parse error as a list literal (a bare `(a)` IS a valid
        # parenthesized variable, so it parses as [a] — a 1-list)
        q = parse("MATCH (a:L) RETURN [(a)] AS xs")
        item = q.clauses[-1].items[0]
        assert isinstance(item.expr, A.ListLit)


class TestCallSubqueries:
    """CALL { WITH a ... RETURN ... } scoped subqueries (Neo4j 4+)."""

    def test_per_row_top1_neighbor(self, eng):
        q = ("MATCH (a:PhageGenome) "
             "CALL { WITH a MATCH (a)-[r:sharesDNA]-(b:PhageGenome) "
             "RETURN b.accession AS nbr, r.distance AS d "
             "ORDER BY r.distance ASC, b.accession ASC LIMIT 1 } "
             "RETURN a.accession AS id, nbr ORDER BY id")
        got = [(r.id, r.nbr) for r in eng.run(q).collect()]
        # E1 is isolated: the empty CALL eliminates its row (Neo4j rule)
        assert got == [
            ("A1", "A2"), ("A2", "A1"), ("A3", "A2"), ("B1", "B2"),
            ("B2", "B1"), ("B3", "B2"), ("C1", "A1"), ("D1", "D2"),
            ("D2", "D1"), ("F1", "F2"), ("F2", "F1"),
        ]

    def test_per_row_aggregate(self, eng):
        q = ("MATCH (a:PhageGenome) "
             "CALL { WITH a MATCH (a)-[r:sharesDNA]-(b:PhageGenome) "
             "RETURN count(b.accession) AS deg, min(r.distance) AS closest } "
             "RETURN a.accession AS id, deg, closest ORDER BY id LIMIT 3")
        got = [(r.id, r.deg, r.closest) for r in eng.run(q).collect()]
        assert got == [("A1", 3, 0.1), ("A2", 2, 0.1), ("A3", 3, 0.15)]

    def test_limit_two_with_skip_semantics(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'}) "
             "CALL { WITH a MATCH (a)-[r:sharesDNA]-(b:PhageGenome) "
             "RETURN b.accession AS nbr "
             "ORDER BY r.distance ASC, b.accession ASC SKIP 1 LIMIT 2 } "
             "RETURN nbr ORDER BY nbr")
        # A1's neighbors by distance: A2 (.10), C1 (.10), A3 (.20);
        # skip 1 -> C1, A3
        assert [r.nbr for r in eng.run(q).collect()] == ["A3", "C1"]

    def test_limit_without_order_rejected(self, eng):
        q = ("MATCH (a:PhageGenome) "
             "CALL { WITH a MATCH (a)-[:sharesDNA]->(b:PhageGenome) "
             "RETURN b.accession AS nbr LIMIT 1 } "
             "RETURN nbr")
        with pytest.raises(CypherCompileError, match="ORDER BY"):
            eng.run(q)

    def test_missing_import_with_rejected(self, eng):
        q = ("MATCH (a:PhageGenome) "
             "CALL { MATCH (z:PhageGenome) RETURN z.accession AS x } "
             "RETURN x")
        with pytest.raises(CypherCompileError, match="importing WITH"):
            eng.run(q)

    def test_name_collision_rejected(self, eng):
        q = ("MATCH (a:PhageGenome) "
             "CALL { WITH a MATCH (a)-[:sharesDNA]->(b:PhageGenome) "
             "RETURN b.accession AS a } RETURN a")
        with pytest.raises(CypherCompileError, match="already bound"):
            eng.run(q)

    def test_mid_with_per_invocation_having(self, eng):
        # WITH count(..) WHERE inside the CALL groups PER INVOCATION (the
        # import keys are implicit grouping keys), i.e. per-row HAVING
        q = ("MATCH (a:PhageGenome) "
             "CALL { WITH a MATCH (a)-[r:sharesDNA]-(b:PhageGenome) "
             "WITH count(b.accession) AS deg WHERE deg >= 2 "
             "RETURN deg } "
             "RETURN a.accession AS id, deg ORDER BY id")
        got = [(r.id, r.deg) for r in eng.run(q).collect()]
        assert got == [
            ("A1", 3), ("A2", 2), ("A3", 3), ("B1", 2), ("B2", 2)
        ]

    def test_optional_call_keeps_empty_rows(self, eng):
        # Neo4j 5.24 OPTIONAL CALL: E1 (isolated) keeps its row, NULL nbr
        q = ("MATCH (a:PhageGenome) WHERE a.accession IN ['A1', 'E1'] "
             "OPTIONAL CALL { WITH a "
             "MATCH (a)-[r:sharesDNA]-(b:PhageGenome) "
             "RETURN b.accession AS nbr "
             "ORDER BY r.distance ASC, b.accession ASC LIMIT 1 } "
             "RETURN a.accession AS id, nbr ORDER BY id")
        got = [(r.id, r.nbr) for r in eng.run(q).collect()]
        assert got == [("A1", "A2"), ("E1", None)]

    def test_mid_with_order_by_rejected(self, eng):
        q = ("MATCH (a:PhageGenome) "
             "CALL { WITH a MATCH (a)-[r:sharesDNA]-(b:PhageGenome) "
             "WITH b.accession AS x ORDER BY x LIMIT 1 RETURN x } "
             "RETURN x")
        with pytest.raises(CypherCompileError, match="final RETURN"):
            eng.run(q)


class TestUnionQueries:
    def test_union_distinct(self, eng):
        q = ("MATCH (a:PhageGenome {source:'NCBI'}) RETURN a.accession AS id "
             "UNION "
             "MATCH (b:PhageGenome {accession:'A1'}) RETURN b.accession AS id")
        got = sorted(r.id for r in eng.run(q).collect())
        # A1 appears in both branches exactly once (UNION dedups)
        assert got == ["A1", "A2", "B1", "D1", "D2", "E1"]

    def test_union_all_keeps_duplicates(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'}) RETURN a.accession AS id "
             "UNION ALL "
             "MATCH (b:PhageGenome {accession:'A1'}) RETURN b.accession AS id")
        assert [r.id for r in eng.run(q).collect()] == ["A1", "A1"]

    def test_union_three_parts(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'}) RETURN a.accession AS id "
             "UNION MATCH (b:PhageGenome {accession:'B1'}) RETURN b.accession AS id "
             "UNION MATCH (c:PhageGenome {accession:'A1'}) RETURN c.accession AS id")
        assert sorted(r.id for r in eng.run(q).collect()) == ["A1", "B1"]

    def test_union_column_mismatch_rejected(self, eng):
        q = ("MATCH (a:PhageGenome) RETURN a.accession AS id "
             "UNION MATCH (b:PhageGenome) RETURN b.accession AS other")
        with pytest.raises(CypherCompileError, match="same"):
            eng.run(q)

    def test_mixed_union_rejected(self):
        with pytest.raises(CypherSyntaxError, match="mix"):
            parse("MATCH (a:X) RETURN a.k AS k "
                  "UNION MATCH (b:X) RETURN b.k AS k "
                  "UNION ALL MATCH (c:X) RETURN c.k AS k")


class TestEntityAndStringFunctions:
    def test_entity_metadata(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'})-[r:infects]->(h:Host) "
             "RETURN labels(a) AS la, type(r) AS tr, id(a) AS ia, "
             "labels(h) AS lh")
        r = eng.run(q).collect()[0]
        assert r.la == ["PhageGenome"]
        assert r.tr == "infects"
        assert r.ia == "A1"
        assert r.lh == ["Host"]

    def test_properties_and_keys(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'}) "
             "RETURN properties(a) AS pr, keys(a) AS ks")
        r = eng.run(q).collect()[0]
        assert r.pr.accession == "A1"
        assert "accession" in r.ks and "source" in r.ks

    def test_string_functions(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'B1'}) "
             "RETURN substring(a.taxonomy, 0, 7) AS s7, "
             "substring(a.taxonomy, 8) AS rest, "
             "left(a.accession, 1) AS l, right(a.accession, 1) AS r, "
             "replace(a.accession, '1', 'X') AS rep, "
             "reverse(a.accession) AS rev, ltrim('  x') AS lt")
        row = eng.run(q).collect()[0]
        assert row.s7 == "Viruses"
        assert row.rest.startswith("Siphoviridae")
        assert (row.l, row.r, row.rep, row.rev, row.lt) == ("B", "1", "BX", "1B", "x")

    def test_type_on_node_rejected(self, eng):
        with pytest.raises(CypherCompileError, match="relationship"):
            eng.run("MATCH (a:PhageGenome) RETURN type(a) AS t")


@settings(max_examples=60, deadline=None)
@given(
    pv=st.text(alphabet="pqxyz", min_size=1, max_size=6),
    lo=st.integers(min_value=1, max_value=5),
    span=st.integers(min_value=0, max_value=5),
    fn=st.sampled_from(["shortestPath", "allShortestPaths"]),
    quant=st.sampled_from(["all", "any", "none", "single"]),
)
def test_new_constructs_parse_for_any_args(pv, lo, span, fn, quant):
    """Named paths, shortestPath, reduce, quantifiers, UNION parse for any
    generated identifiers/bounds (or raise the typed syntax error)."""
    hi = lo + span
    queries = [
        f"MATCH {pv} = (a:L)-[:T*{lo}..{hi}]-(b:L) "
        f"RETURN nodes({pv}) AS n, length({pv}) AS h",
        f"MATCH {pv} = {fn}((a:L)-[:T*..{hi}]-(b:L)) RETURN {pv}",
        f"MATCH (a:L) RETURN reduce(acc = 0, x IN [1, 2] | acc + x) AS s",
        f"MATCH {pv} = (a:L)-[:T*{lo}..{hi}]-(b:L) "
        f"WHERE {quant}(d IN {pv}.dists WHERE d <= 0.5) RETURN count(*) AS n",
        "MATCH (a:L) RETURN a.k AS k UNION MATCH (b:M) RETURN b.k AS k",
    ]
    for q in queries:
        try:
            parse(q)
        except CypherSyntaxError:
            pass


class TestStarProjection:
    """RETURN * / WITH * (round 3): carry every bound variable."""

    def test_return_star_columns(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'})-[r:sharesDNA]->"
             "(b:PhageGenome) RETURN * ORDER BY b.accession")
        df = eng.run(q)
        assert df.columns == ["a", "r", "b"]
        rows = df.collect()
        assert [x.b.accession for x in rows] == ["A2", "A3"]

    def test_with_star_then_more(self, eng):
        q = ("MATCH (a:PhageGenome {accession:'A1'})-[r:sharesDNA]->"
             "(b:PhageGenome) "
             "WITH *, r.distance AS d WHERE d <= 0.1 "
             "RETURN a.accession AS src, b.accession AS dst, d")
        rows = eng.run(q).collect()
        assert [(x.src, x.dst, x.d) for x in rows] == [("A1", "A2", 0.10)]

    def test_with_star_keeps_entities_expandable(self, eng):
        # after WITH *, b is still an entity — a later MATCH expands from it
        q = ("MATCH (a:PhageGenome {accession:'A1'})-[:sharesDNA]->"
             "(b:PhageGenome) WITH * "
             "MATCH (b)-[:sharesDNA]->(c:PhageGenome) "
             "RETURN b.accession AS mid, c.accession AS far ORDER BY mid, far")
        rows = eng.run(q).collect()
        assert [(x.mid, x.far) for x in rows] == [("A2", "A3"), ("A3", "B1")]

    def test_star_covers_flat_with_bindings(self, eng):
        # after `WITH count(*) AS n`, the only variable in scope is the flat
        # n — RETURN * expands to exactly it (Neo4j semantics)
        df = eng.run("MATCH (a:PhageGenome) WITH count(*) AS n RETURN *, 1 AS x")
        assert df.columns == ["n", "x"]
        assert df.collect()[0].n == 12


class TestSubscriptSlice:
    """list[i] / list[lo..hi] (round 3): Neo4j 0-based element access with
    negative-from-the-end indices and NULL out of range; half-open slices
    with either bound omitted, clamped to the list."""

    def test_literal_subscript_and_slice(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN [1,2,3][0] AS a, [1,2,3][-1] AS b, [1,2,3][1..3] AS c, "
            "[1,2,3][..2] AS d, [1,2,3][1..] AS e, [1,2,3][5] AS f, "
            "[1,2,3][-5..99] AS g, [1,2,3][2..1] AS h, [1,2,3][-2..] AS i"
        ).collect()
        assert (r.a, r.b, r.c, r.d, r.e) == (1, 3, [2, 3], [1, 2], [2, 3])
        assert r.f is None          # out of range -> NULL, not error
        assert r.g == [1, 2, 3]     # bounds clamp to the list
        assert r.h == []            # hi < lo -> empty, not negative-length
        assert r.i == [2, 3]        # negative lo counts from the end

    def test_variable_index(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "WITH [9,8,7] AS xs, 1 AS i RETURN xs[i] AS v, xs[i..] AS t"
        ).collect()
        assert r.v == 8 and r.t == [8, 7]

    def test_pattern_comprehension_subscript(self, eng):
        # pattern-comprehension lists are sorted ascending (documented
        # deviation) so element access is deterministic
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "WITH [(a)-[:sharesDNA]->(b:PhageGenome) | b.accession] AS xs "
            "RETURN xs[0] AS first, xs[-1] AS last, size(xs[1..]) AS rest"
        ).collect()
        assert r.first == "A2" and r.last == "A3" and r.rest == 1

    def test_chained_postfix(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN [[1,2],[3,4]][1][0] AS v, [1,2,3,4][1..][..2] AS w"
        ).collect()
        assert r.v == 3 and r.w == [2, 3]

    def test_empty_subscript_is_syntax_error(self):
        with pytest.raises(CypherSyntaxError):
            parse("MATCH (a:L) RETURN a.xs[] AS v")


class TestMapsAndOperators:
    """Map literals {k: v}, map projections n {.prop, .*, k: e, var},
    and the %, ^, =~ operators (round 3)."""

    def test_map_literal(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN {a: 1, b: 'x', c: a.accession} AS m"
        ).collect()
        assert r.m.a == 1 and r.m.b == "x" and r.m.c == "A1"

    def test_map_projection_props_and_computed(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN a {.accession, kb: a.genome_size / 1000} AS m"
        ).collect()
        assert r.m.accession == "A1" and r.m.kb == 168.0

    def test_map_projection_star_and_last_wins(self, eng):
        # .* expands every property; duplicate keys collapse last-wins
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "WITH a {.*, source: 'OVERRIDE'} AS m "
            "RETURN m.accession AS acc, m.source AS src"
        ).collect()
        assert r.acc == "A1" and r.src == "OVERRIDE"

    def test_map_projection_var_shorthand(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "WITH a, 42 AS answer RETURN a {.accession, answer} AS m"
        ).collect()
        assert r.m.answer == 42

    def test_projected_map_field_access(self, eng):
        # m.key and m['key'] both read a projected struct
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "WITH {x: 7} AS m RETURN m.x AS a, m['x'] AS b"
        ).collect()
        assert r.a == 7 and r.b == 7

    def test_unwind_list_of_maps(self, eng):
        rs = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "UNWIND [{k: 1}, {k: 2}] AS m RETURN m.k AS k ORDER BY k"
        ).collect()
        assert [r.k for r in rs] == [1, 2]

    def test_mod_and_pow(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN 7 % 3 AS m, -7 % 3 AS mneg, 2 ^ 3 AS p, "
            "-2 ^ 2 AS np, 2 ^ 3 ^ 2 AS rassoc"
        ).collect()
        assert r.m == 1
        assert r.mneg == -1          # Java/Cypher: sign of the dividend
        assert r.p == 8.0            # exponent yields float
        assert r.np == -4.0          # ^ binds tighter than unary minus
        assert r.rassoc == 512.0     # right-associative

    def test_regex_full_match(self, eng):
        rs = eng.run(
            "MATCH (a:PhageGenome) WHERE a.accession =~ 'A.' "
            "RETURN a.accession AS acc ORDER BY acc"
        ).collect()
        assert [r.acc for r in rs] == ["A1", "A2", "A3"]
        # partial matches do NOT count (Java String.matches semantics)
        assert eng.run(
            "MATCH (a:PhageGenome) WHERE a.accession =~ '1' "
            "RETURN a.accession AS acc"
        ).count() == 0


class TestMathFunctions:
    """The Neo4j math/scalar function tail (round 3): trig/exp/log return
    FLOAT, sign() returns INTEGER, toBoolean maps only 'true'/'false',
    isEmpty dispatches on string vs list."""

    def test_math_values(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN sign(-3) AS s, round(2.5) AS rd, round(2.345, 2) AS r2, "
            "ceil(1.2) AS c, floor(1.8) AS f, sqrt(4) AS q, exp(0) AS ex, "
            "log(e()) AS lg, log10(100) AS l10, sin(0) AS sn, "
            "atan2(1.0, 1.0) AS at, degrees(pi()) AS dg, haversin(0) AS hv"
        ).collect()
        assert r.s == -1 and isinstance(r.s, int)   # sign -> INTEGER
        assert r.rd == 3.0                          # HALF_UP, returns FLOAT
        assert r.r2 == 2.35
        assert (r.c, r.f, r.q, r.ex) == (2.0, 1.0, 2.0, 1.0)
        assert r.lg == 1.0 and r.l10 == 2.0 and r.sn == 0.0
        assert abs(r.at - 0.7853981633974483) < 1e-15
        assert r.dg == 180.0 and r.hv == 0.0

    def test_toboolean_and_isempty(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN toBoolean('TRUE') AS t, toBoolean('False') AS f, "
            "toBoolean('x') AS n, isEmpty('') AS es, isEmpty('a') AS ns, "
            "isEmpty([]) AS el, isEmpty([1]) AS nl"
        ).collect()
        assert r.t is True and r.f is False and r.n is None
        assert r.es is True and r.ns is False
        assert r.el is True and r.nl is False

    def test_nondeterministic_funcs_run(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN rand() AS rd, timestamp() AS ts, randomUUID() AS u"
        ).collect()
        assert 0.0 <= r.rd < 1.0 and r.ts > 1500000000000 and len(r.u) == 36


class TestCallProcedures:
    """CALL db.labels()/db.relationshipTypes()/db.propertyKeys() (round 3):
    Neo4j's schema introspection, answered from the GraphCatalog."""

    def test_labels_standalone(self, eng):
        assert [r.label for r in eng.run("CALL db.labels()").collect()] == [
            "Host", "PhageGenome",
        ]

    def test_reltypes_yield_alias_and_return(self, eng):
        rows = eng.run(
            "CALL db.relationshipTypes() YIELD relationshipType AS t "
            "RETURN t ORDER BY t"
        ).collect()
        assert [r.t for r in rows] == ["infects", "sharesDNA"]

    def test_property_keys_cover_all_tables(self, eng):
        keys = {r.propertyKey for r in eng.run("CALL db.propertyKeys()").collect()}
        assert {"accession", "distance", "genus", "taxonomy"} <= keys

    def test_proc_feeds_aggregation(self, eng):
        [r] = eng.run("CALL db.labels() YIELD label RETURN count(*) AS n").collect()
        assert r.n == 2

    def test_unknown_proc_and_bad_yield(self, eng):
        with pytest.raises(CypherCompileError):
            eng.run("CALL db.nope()")
        with pytest.raises(CypherCompileError):
            eng.run("CALL db.labels() YIELD wrong RETURN wrong")


class TestTemporal:
    """date()/datetime() constructors and temporal accessors (round 3)."""

    def test_date_parse_and_fields(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "WITH date('2024-03-15') AS d "
            "RETURN d.year AS y, d.month AS m, d.day AS dd, d.quarter AS q, "
            "d.dayOfWeek AS dow, d.ordinalDay AS od, d.week AS w"
        ).collect()
        assert (r.y, r.m, r.dd, r.q) == (2024, 3, 15, 1)
        assert r.dow == 5          # 2024-03-15 is a Friday; ISO Monday=1
        assert r.od == 75 and r.w == 11

    def test_datetime_fields_and_epoch(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "WITH datetime('1970-01-02T03:04:05') AS ts "
            "RETURN ts.hour AS h, ts.minute AS mi, ts.second AS s, "
            "ts.epochSeconds AS es"
        ).collect()
        assert (r.h, r.mi, r.s) == (3, 4, 5)
        assert r.es == 86400 + 3 * 3600 + 4 * 60 + 5

    def test_date_comparison_filters(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN date('2024-01-02') > date('2024-01-01') AS gt, "
            "date('2024-01-01') = date('2024-01-01') AS eq"
        ).collect()
        assert r.gt is True and r.eq is True

    def test_now_constructors_run(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN date().year AS y, datetime().year AS ty"
        ).collect()
        assert r.y >= 2024 and r.ty >= 2024

    def test_unknown_temporal_field_rejected(self, eng):
        with pytest.raises(CypherCompileError):
            eng.run(
                "MATCH (a:PhageGenome {accession:'A1'}) "
                "RETURN date('2024-01-01').parsec AS x"
            )


class TestDuration:
    """duration() literals and temporal arithmetic (round 3)."""

    def test_duration_arithmetic(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN date('2024-01-31') + duration('P1M') AS pm, "
            "date('2024-01-01') + duration({days: 7}) AS pw, "
            "(datetime('2024-01-01T00:00:00') + duration('PT2H30M')).minute AS mi, "
            "date('2024-01-02') - duration('P1D') AS md"
        ).collect()
        import datetime as dt
        assert r.pm == dt.date(2024, 2, 29)   # month-end clamp, as Neo4j
        assert r.pw == dt.date(2024, 1, 8)
        assert r.mi == 30
        assert r.md == dt.date(2024, 1, 1)

    def test_duration_errors(self, eng):
        with pytest.raises(CypherCompileError):
            eng.run("MATCH (a:PhageGenome) RETURN duration('nope') AS x")
        with pytest.raises(CypherCompileError):
            eng.run("MATCH (a:PhageGenome) RETURN duration({parsecs: 1}) AS x")
        with pytest.raises(CypherCompileError):
            eng.run("MATCH (a:PhageGenome) RETURN duration(a.accession) AS x")


class TestRangeTail:
    def test_range_inclusive_and_step(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN range(0, 5) AS r, range(0, 10, 3) AS r3, "
            "tail([1,2,3]) AS t, tail([]) AS te"
        ).collect()
        assert r.r == [0, 1, 2, 3, 4, 5]   # inclusive end, as Neo4j
        assert r.r3 == [0, 3, 6, 9]
        assert r.t == [2, 3] and r.te == []

    def test_unwind_range(self, eng):
        rs = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "UNWIND range(1, 3) AS i RETURN i ORDER BY i"
        ).collect()
        assert [x.i for x in rs] == [1, 2, 3]


def test_element_id_is_string_typed(eng):
    df = eng.run(
        "MATCH (a:PhageGenome {accession:'A1'}) "
        "RETURN elementId(a) AS e, id(a) AS i"
    )
    assert dict(df.dtypes)["e"] == "string"
    [r] = df.collect()
    assert r.e == "A1" and r.i == "A1"


class TestLoadCsv:
    """LOAD CSV (round 3): Neo4j's ingest clause — strings in, the user
    casts (toInteger), headers bind a struct, headerless binds a list."""

    @pytest.fixture()
    def csv_path(self, tmp_path):
        p = tmp_path / "in.csv"
        p.write_text("acc,size\nX1,100\nX2,250\n")
        return str(p)

    def test_headers_struct_access_and_cast(self, eng, csv_path):
        rows = eng.run(
            f"LOAD CSV WITH HEADERS FROM 'file://{csv_path}' AS row "
            "RETURN row.acc AS a, toInteger(row.size) AS s ORDER BY a"
        ).collect()
        assert [(r.a, r.s) for r in rows] == [("X1", 100), ("X2", 250)]

    def test_headerless_list_access(self, eng, csv_path):
        rows = eng.run(
            f"LOAD CSV FROM '{csv_path}' AS row RETURN row[1] AS c ORDER BY c"
        ).collect()
        # no header handling: the header line is an ordinary row
        assert [r.c for r in rows] == ["100", "250", "size"]

    def test_fieldterminator(self, eng, tmp_path):
        p = tmp_path / "semi.csv"
        p.write_text("a;b\n1;2\n")
        [r] = eng.run(
            f"LOAD CSV WITH HEADERS FROM '{p}' AS row FIELDTERMINATOR ';' "
            "RETURN row.b AS b"
        ).collect()
        assert r.b == "2"

    def test_ingest_create_nodes(self, eng, csv_path):
        cat = eng.apply(
            f"LOAD CSV WITH HEADERS FROM '{csv_path}' AS row "
            "CREATE (n:PhageGenome {accession: row.acc, "
            "genome_size: toInteger(row.size)})"
        )
        accs = {r.accession for r in cat.node("PhageGenome").df.collect()}
        assert {"X1", "X2"} <= accs


class TestApocLite:
    """apoc.coll.* / apoc.text.* helpers (round 3) as built-in mappings."""

    def test_coll_functions(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN apoc.coll.sort([3,1,2]) AS s, apoc.coll.toSet([1,1,2]) AS t, "
            "apoc.coll.flatten([[1,2],[3]]) AS f, apoc.coll.contains([1,2], 2) AS c, "
            "apoc.coll.indexOf([5,6,7], 6) AS ix, apoc.coll.indexOf([5], 9) AS ixm, "
            "apoc.coll.sum([1,2,3]) AS sm, apoc.coll.max([1,9,2]) AS mx, "
            "apoc.coll.reverse([1,2,3]) AS rv"
        ).collect()
        assert r.s == [1, 2, 3] and r.t == [1, 2] and r.f == [1, 2, 3]
        assert r.c is True
        assert r.ix == 1 and r.ixm == -1   # APOC: 0-based, -1 when absent
        assert r.sm == 6.0 and r.mx == 9 and r.rv == [3, 2, 1]

    def test_text_functions(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN apoc.text.join(['a','b'], '-') AS j, "
            "apoc.text.clean('He l-LO!') AS cl, "
            "apoc.text.replace('aXbXc', 'X+', '.') AS rp, "
            "apoc.text.split('a1b2c', '[0-9]') AS sp, "
            "apoc.text.capitalize('hello') AS cap"
        ).collect()
        assert r.j == "a-b" and r.cl == "hello" and r.rp == "a.b.c"
        assert r.sp == ["a", "b", "c"] and r.cap == "Hello"

    def test_unknown_apoc_rejected(self, eng):
        with pytest.raises(CypherCompileError):
            eng.run("MATCH (a:PhageGenome) RETURN apoc.agg.median([1]) AS x")


class TestCollectSubquery:
    """COLLECT { MATCH ... RETURN expr } (Neo4j 5.6) — parses into the
    pattern-comprehension node (identical semantics, incl. the documented
    sorted-ascending deviation)."""

    def test_collect_subquery(self, eng):
        rows = eng.run(
            "MATCH (a:PhageGenome {source:'NCBI'}) "
            "RETURN a.accession AS acc, "
            "COLLECT { MATCH (a)-[r:sharesDNA]->(b:PhageGenome) "
            "WHERE r.distance <= 0.25 RETURN b.accession } AS nbrs "
            "ORDER BY acc"
        ).collect()
        got = {r.acc: r.nbrs for r in rows}
        assert got["A1"] == ["A2", "A3"]
        assert got["E1"] == []          # empty list, not NULL

    def test_collect_fn_still_aggregates(self, eng):
        # collect( stays the aggregate; only collect { is the subquery
        [r] = eng.run(
            "MATCH (a:PhageGenome {source:'NCBI'}) "
            "WITH collect(a.accession) AS xs RETURN size(xs) AS n"
        ).collect()
        assert r.n == 6


class TestMixedAggregates:
    """Expressions AROUND aggregates (round 3): size(collect(x)),
    count(*) * 2, and Neo4j's implicit-grouping-key rule for
    variable-rooted subtrees outside the aggregate."""

    def test_size_of_collect(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {source:'NCBI'}) "
            "RETURN size(collect(a.accession)) AS n"
        ).collect()
        assert r.n == 6

    def test_arith_around_count_groups_by_plain_item(self, eng):
        rows = eng.run(
            "MATCH (a:PhageGenome) RETURN a.source AS s, count(*) * 2 AS n2 "
            "ORDER BY s"
        ).collect()
        got = {r.s: r.n2 for r in rows}
        assert got["NCBI"] == 12

    def test_implicit_grouping_key(self, eng):
        # a.genome_size outside the aggregate is an implicit grouping key
        rows = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN a.genome_size + count(*) AS g"
        ).collect()
        assert [r.g for r in rows] == [168001]

    def test_agg_over_agg_arithmetic(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {source:'NCBI'}) "
            "RETURN sum(a.genome_size) / count(*) AS mean_sz"
        ).collect()
        # = sum(NCBI genome sizes) / 6 over the FIXTURES.md graph
        assert r.mean_sz == 137417.0


class TestOrderByAggAndSizeString:
    def test_order_by_aggregate_matches_item(self, eng):
        rows = eng.run(
            "MATCH (a:PhageGenome) RETURN a.source AS s, count(*) AS n "
            "ORDER BY count(*) DESC, s"
        ).collect()
        ns = [r.n for r in rows]
        assert ns == sorted(ns, reverse=True)

    def test_size_on_string_counts_chars(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN size('hello') AS ls, size([1,2]) AS la, "
            "size(a.accession) AS sa"
        ).collect()
        assert (r.ls, r.la, r.sa) == (5, 2, 2)


class TestPoints:
    """point() / point.distance() (round 3): cartesian euclidean exact,
    wgs-84 haversine meters (documented mean-radius approximation). Trig
    is libm-dependent, so spatial stays unit-tested rather than
    oracle-checked."""

    def test_cartesian_distance_exact(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN point.distance(point({x: 0, y: 0}), point({x: 3, y: 4})) AS d"
        ).collect()
        assert r.d == 5.0

    def test_geographic_distance_approx(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "RETURN point.distance(point({latitude: 52.52, longitude: 13.405}), "
            "point({latitude: 48.8566, longitude: 2.3522})) AS d"
        ).collect()
        assert abs(r.d - 878_000) < 4_000   # Berlin-Paris great circle

    def test_point_fields_and_errors(self, eng):
        [r] = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "WITH point({x: 1, y: 2}) AS p RETURN p.x AS x, p.crs AS crs"
        ).collect()
        assert r.x == 1.0 and r.crs == "cartesian"
        with pytest.raises(CypherCompileError):
            eng.run("MATCH (a:PhageGenome) RETURN point({lat: 1}) AS p")


def test_call_in_transactions_parses_and_runs(eng):
    # batched-commit syntax is accepted; semantics are a single atomic
    # action in Spark (documented deviation on failure behavior)
    rows = eng.run(
        "MATCH (n:PhageGenome {source:'NCBI'}) "
        "CALL { WITH n RETURN n.accession AS acc } IN TRANSACTIONS OF 2 ROWS "
        "RETURN acc ORDER BY acc LIMIT 2"
    ).collect()
    assert [r.acc for r in rows] == ["A1", "A2"]


class TestGqlQuantifiers:
    """GQL/Neo4j-5 quantified relationships: -[:T]->{m,n} / {n} / + map
    onto the same var-length machinery as [:T*m..n]."""

    def test_brace_range(self, eng):
        rows = eng.run(
            "MATCH (a:PhageGenome {accession:'C1'})-[:sharesDNA]->{1,2}"
            "(b:PhageGenome) RETURN b.accession AS t ORDER BY t"
        ).collect()
        # C1->A1 (1 hop), A1->{A2,A3} (2 hops)
        assert [r.t for r in rows] == ["A1", "A2", "A3"]

    def test_exact_count_and_plus(self, eng):
        two = eng.run(
            "MATCH (a:PhageGenome {accession:'C1'})-[:sharesDNA]->{2}"
            "(b:PhageGenome) RETURN b.accession AS t ORDER BY t"
        ).collect()
        assert [r.t for r in two] == ["A2", "A3"]
        plus = eng.run(
            "MATCH (a:PhageGenome {accession:'C1'})-[:sharesDNA]->+"
            "(b:PhageGenome) RETURN b.accession AS t ORDER BY t"
        ).collect()
        # no threshold: + walks the whole out-reachable set incl. B-side
        assert [r.t for r in plus] == ["A1", "A2", "A3", "B1", "B2"]

    def test_still_parses_node_props_after_edge(self, eng):
        # `{` after the closing node paren is props, not a quantifier
        rows = eng.run(
            "MATCH (a:PhageGenome)-[:sharesDNA]->(b:PhageGenome "
            "{accession:'A2'}) RETURN a.accession AS s ORDER BY s"
        ).collect()
        assert [r.s for r in rows] == ["A1"]

    def test_group_form_matches_short_form(self, eng):
        # the GROUP form (()-[:T]->()){m,n} lowers to the same plan as the
        # short form -[:T]->{m,n}
        grp = rows(eng.run(
            "MATCH (a:PhageGenome)(()-[:sharesDNA]->()){1,2}(b:PhageGenome)"
            " RETURN a.accession AS s, b.accession AS t"
        ))
        short = rows(eng.run(
            "MATCH (a:PhageGenome)-[:sharesDNA]->{1,2}(b:PhageGenome)"
            " RETURN a.accession AS s, b.accession AS t"
        ))
        assert grp == short and len(grp) > 0

    def test_group_form_plus_and_exact(self, eng):
        plus = eng.run(
            "MATCH (a:PhageGenome {accession:'C1'})(()-[:sharesDNA]->())+"
            "(b:PhageGenome) RETURN b.accession AS t ORDER BY t"
        ).collect()
        assert [r.t for r in plus] == ["A1", "A2", "A3", "B1", "B2"]
        two = eng.run(
            "MATCH (a:PhageGenome {accession:'C1'})(()-[:sharesDNA]->()){2}"
            "(b:PhageGenome) RETURN b.accession AS t ORDER BY t"
        ).collect()
        assert [r.t for r in two] == ["A2", "A3"]

    @pytest.mark.parametrize("bad,msg", [
        ("MATCH (a:PhageGenome)(()-[:sharesDNA]->())*(b:PhageGenome) "
         "RETURN a.accession AS x", "zero-hop"),
        ("MATCH (a:PhageGenome)((x)-[:sharesDNA]->()){1,2}(b:PhageGenome) "
         "RETURN a.accession AS x", "anonymous"),
        ("MATCH (a:PhageGenome)(()-[:sharesDNA]->()-[:sharesDNA]->())"
         "{1,2}(b:PhageGenome) RETURN a.accession AS x",
         "single relationship"),
        ("MATCH (a:PhageGenome)(()-[r:sharesDNA]->()){1,2}(b:PhageGenome) "
         "RETURN a.accession AS x", "relationship variables"),
        ("MATCH (a:PhageGenome)(()-[:sharesDNA*1..2]->()){1,2}"
         "(b:PhageGenome) RETURN a.accession AS x", "nested"),
    ])
    def test_group_form_rejections(self, eng, bad, msg):
        with pytest.raises(CypherSyntaxError, match=msg):
            eng.run(bad)


def test_tointeger_tofloat_null_on_bad_strings(eng):
    # Neo4j: unparseable strings -> NULL (not an ANSI cast error);
    # toInteger('3.7') parses then truncates; numeric inputs cast exactly
    [r] = eng.run(
        "MATCH (a:PhageGenome {accession:'A1'}) "
        "RETURN toInteger('abc') AS bad, toInteger('42') AS ok, "
        "toInteger('3.7') AS tr, toFloat('x') AS fbad, toFloat('2.5') AS fok, "
        "toInteger(a.genome_size) AS exact, toIntegerOrNull('z') AS orn"
    ).collect()
    assert r.bad is None and r.ok == 42 and r.tr == 3
    assert r.fbad is None and r.fok == 2.5
    assert r.exact == 168000 and r.orn is None


def test_tointeger_numeric_nan_overflow_null(eng):
    # round-3 ADVICE: the numeric branch must try_cast too — toInteger of
    # a double NaN or a value past long range returns NULL in Neo4j where
    # an ANSI cast throws
    [r] = eng.run(
        "MATCH (a:PhageGenome {accession:'A1'}) "
        "RETURN toInteger(sqrt(-1.0)) AS nan, toInteger(1.0e300) AS big, "
        "toInteger(2.9) AS tr"
    ).collect()
    assert r.nan is None and r.big is None and r.tr == 2


def test_xor_three_valued(eng):
    [r] = eng.run(
        "MATCH (a:PhageGenome {accession:'A1'}) "
        "RETURN (true XOR false) AS t, (true XOR true) AS f, "
        "(true XOR null) AS n"
    ).collect()
    assert r.t is True and r.f is False and r.n is None


def test_start_end_node_keys(eng):
    rows = eng.run(
        "MATCH (a:PhageGenome {accession:'A1'})-[r:sharesDNA]->(b:PhageGenome) "
        "RETURN startNode(r) AS s, endNode(r) AS e ORDER BY e"
    ).collect()
    assert [(x.s, x.e) for x in rows] == [("A1", "A2"), ("A1", "A3")]


def test_label_predicate_and_bare_return(eng):
    # n:Label in expression position (single-label catalog: compile-time)
    rows = eng.run(
        "MATCH (n:PhageGenome {accession:'A1'}) "
        "RETURN n:PhageGenome AS isp, n:Host AS ish"
    ).collect()
    assert rows[0].isp is True and rows[0].ish is False
    # bare RETURN evaluates over one implicit row
    [r] = eng.run("RETURN 1 + 2 AS x, toUpper('hi') AS s").collect()
    assert r.x == 3 and r.s == "HI"


def test_postfix_after_dotted_calls_and_aggregates(eng):
    # subscript chains keep folding after a dotted call and around
    # aggregates (the mixed-aggregate projection path)
    [r] = eng.run(
        "MATCH (n:PhageGenome {source:'NCBI'}) "
        "RETURN apoc.coll.sort(collect(n.accession))[0] AS first, "
        "size(collect(n.accession)[0..2]) AS head_n"
    ).collect()
    assert r.first == "A1" and r.head_n == 2


def test_legacy_exists_forms(eng):
    # Neo4j 3/4 exists(n.prop) and exists((n)-[:T]->()) forms
    rows = eng.run(
        "MATCH (n:PhageGenome) WHERE exists(n.genome_size) "
        "RETURN count(*) AS c"
    ).collect()
    assert rows[0].c == 12
    rows = eng.run(
        "MATCH (n:PhageGenome) "
        "WHERE exists((n)-[:infects]->(:Host)) "
        "RETURN n.accession AS a ORDER BY a"
    ).collect()
    assert len(rows) >= 1


def test_keys_properties_on_map_values(eng):
    [r] = eng.run(
        "MATCH (a:PhageGenome {accession:'A1'}) "
        "WITH {x: 1, y: 'v'} AS m RETURN keys(m) AS k, properties(m).x AS px"
    ).collect()
    assert r.k == ["x", "y"] and r.px == 1


def test_leading_unwind_and_with_without_explicit_spark(eng):
    # a leading UNWIND / WITH seeds one implicit row from the catalog's
    # session — no CypherEngine(spark=...) needed
    rows = eng.run(
        "UNWIND [1,2] AS x UNWIND [10,20] AS y RETURN x * y AS p ORDER BY p"
    ).collect()
    assert [r.p for r in rows] == [10, 20, 20, 40]
    [r] = eng.run(
        "WITH 5 AS n RETURN [x IN range(1, n) WHERE x % 2 = 0] AS evens"
    ).collect()
    assert r.evens == [2, 4]


# --------------------------------------------------------------------------
# Unlabeled MATCH (n) — the union-over-all-labels binding
# --------------------------------------------------------------------------


class TestUnlabeledMatch:
    """``MATCH (n)`` binds the union of every catalog label: one zero-shuffle
    unionByName of the per-label scans, with runtime ``labels(n)`` and a
    collision-free composite id. Expectations hand-derived from the conftest
    fixture (12 PhageGenome + 4 Host = distinct infects genera)."""

    def test_count_by_label(self, eng):
        got = rows(eng.run(
            "MATCH (n) RETURN labels(n)[0] AS label, count(*) AS n "
            "ORDER BY label"
        ))
        assert got == [("Host", 4), ("PhageGenome", 12)]

    def test_property_access_null_for_other_labels(self, eng):
        # taxonomy exists only on PhageGenome; Host rows read NULL
        got = rows(eng.run(
            "MATCH (n) RETURN labels(n)[0] AS label, "
            "count(n.taxonomy) AS with_tax, count(n.genus) AS with_genus "
            "ORDER BY label"
        ))
        # Host.genus is the Host key (4 non-null); 6 phages carry a genus
        assert got == [("Host", 0, 4), ("PhageGenome", 12, 6)]

    def test_runtime_label_predicate(self, eng):
        got = rows(eng.run(
            "MATCH (n) WHERE n:Host RETURN count(*) AS c"
        ))
        assert got == [(4,)]
        got = rows(eng.run(
            "MATCH (n) WHERE n.genome_size >= 150000 OR n:Host "
            "RETURN labels(n)[0] AS label, count(*) AS c ORDER BY label"
        ))
        # A1 168k, A2 171k, D1 152k, D2 158k pass the size filter
        assert got == [("Host", 4), ("PhageGenome", 4)]

    def test_expansion_from_any_node(self, eng):
        # inner expansion restricts to the edge's src label implicitly
        got = rows(eng.run(
            "MATCH (n) MATCH (n)-[r:sharesDNA]->(b:PhageGenome) "
            "RETURN count(*) AS c"
        ))
        assert got == [(9,)]

    def test_optional_expansion_keeps_other_labels_null(self, eng):
        got = rows(eng.run(
            "MATCH (n) OPTIONAL MATCH (n)-[:infects]->(h:Host) "
            "RETURN labels(n)[0] AS label, count(*) AS n_rows, "
            "count(h.genus) AS n_hosts ORDER BY label"
        ))
        # B2 infects two hosts -> 12 phages + 1 extra row; 6 infect edges
        assert got == [("Host", 4, 0), ("PhageGenome", 13, 6)]

    def test_id_is_composite_and_keys_drop_nulls(self, eng):
        got = rows(eng.run(
            "MATCH (n) WHERE n:Host "
            "RETURN id(n) AS nid, keys(n) AS ks ORDER BY nid LIMIT 1"
        ))
        assert got == [("Host|Bacillus", ["genus"])]
        # a phage without genus: keys() drops the NULL placeholder
        got = rows(eng.run(
            "MATCH (n) WHERE n.accession = 'A3' RETURN keys(n) AS ks"
        ))
        # field order follows the union schema (Neo4j leaves it unspecified)
        assert got == [(["accession", "source", "taxonomy", "genome_size"],)]

    def test_properties_strips_metadata(self, eng):
        [r] = eng.run(
            "MATCH (n) WHERE n.accession = 'A1' RETURN properties(n) AS p"
        ).collect()
        assert "__label" not in r.p.asDict() and r.p.accession == "A1"

    def test_labels_function_runtime(self, eng):
        got = sorted(
            r.ls
            for r in eng.run(
                "MATCH (n) RETURN DISTINCT labels(n) AS ls"
            ).collect()
        )
        assert got == [["Host"], ["PhageGenome"]]

    def test_var_length_from_any_equals_labeled(self, eng):
        # single-segment var-length/shortest expansion RESOLVES any-label
        # anchors (label filter + harmonized key seed) instead of rejecting
        any_ = rows(eng.run(
            "MATCH (n) MATCH (n)-[:sharesDNA*1..2]->(b:PhageGenome) "
            "RETURN n.accession AS s, b.accession AS t"
        ))
        lab = rows(eng.run(
            "MATCH (n:PhageGenome) MATCH (n)-[:sharesDNA*1..2]->"
            "(b:PhageGenome) RETURN n.accession AS s, b.accession AS t"
        ))
        assert any_ == lab and len(any_) > 0

    def test_shortest_path_from_any_equals_labeled(self, eng):
        any_ = rows(eng.run(
            "MATCH (n) MATCH p = shortestPath((n)-[:sharesDNA*..3]-"
            "(b:PhageGenome {accession:'A2'})) "
            "RETURN n.accession AS s, length(p) AS l"
        ))
        lab = rows(eng.run(
            "MATCH (n:PhageGenome) MATCH p = shortestPath((n)-"
            "[:sharesDNA*..3]-(b:PhageGenome {accession:'A2'})) "
            "RETURN n.accession AS s, length(p) AS l"
        ))
        assert any_ == lab and len(any_) > 0

    def test_optional_var_length_from_any_null_extends(self, eng):
        got = rows(eng.run(
            "MATCH (n) OPTIONAL MATCH (n)-[:sharesDNA*1..2]->"
            "(b:PhageGenome) RETURN labels(n)[0] AS lab, count(*) AS c, "
            "count(b.accession) AS hits ORDER BY lab"
        ))
        assert got == [("Host", 4, 0), ("PhageGenome", 18, 14)]

    def test_multi_edge_chain_from_any_rejected(self, eng):
        with pytest.raises(CypherCompileError, match="unlabeled"):
            eng.run(
                "MATCH (n) MATCH p = (n)-[:sharesDNA*1..2]->"
                "(m:PhageGenome)-[:sharesDNA]->(b:PhageGenome) "
                "RETURN length(p) AS l"
            )

    def test_writes_through_any_rejected(self, eng):
        with pytest.raises(CypherCompileError, match="unlabeled"):
            eng.run("MATCH (n) SET n.x = 1")
        with pytest.raises(CypherCompileError, match="unlabeled"):
            eng.run("MATCH (n) DETACH DELETE n")


class TestExplainProfile:
    """EXPLAIN / PROFILE prefixes — Neo4j's plan-inspection surface, mapped
    to Catalyst: EXPLAIN returns the formatted physical plan (scans with
    PushedFilters/ReadSchema, join strategies) one line per row without
    executing; PROFILE drives this queryExecution's plan to completion and
    returns the FINAL AQE plan plus a leading `rows: N` line."""

    def test_explain_returns_plan_rows(self, eng):
        df = eng.run(
            "EXPLAIN MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome) "
            "WHERE r.distance <= 0.25 RETURN a.accession AS s"
        )
        assert df.columns == ["line", "plan"]
        text = "\n".join(r.plan for r in df.collect())
        assert "== Physical Plan ==" in text and "Join" in text

    def test_profile_executes_and_reports_rows(self, eng):
        rows_ = eng.run(
            "PROFILE MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome) "
            "RETURN a.accession AS s"
        ).collect()
        assert rows_[0].plan == "rows: 9"
        assert any("isFinalPlan=true" in r.plan for r in rows_)

    def test_explain_case_insensitive_and_union(self, eng):
        text = "\n".join(r.plan for r in eng.run(
            "explain MATCH (a:PhageGenome) RETURN a.accession AS x "
            "UNION MATCH (h:Host) RETURN h.genus AS x"
        ).collect())
        assert "Union" in text or "union" in text


class TestUntypedRelationships:
    """``(a)-[r]->(b)`` without a type — the union over every relationship
    type (edge-side twin of unlabeled MATCH). type(r) and r:TYPE resolve at
    runtime from __type; arms are compile-time pruned by anchor/far labels;
    mixed far labels bind through the union-of-labels node machinery."""

    def test_exploration_by_type_and_far_label(self, eng):
        got = rows(eng.run(
            "MATCH (p:PhageGenome)-[r]->(x) RETURN type(r) AS t, "
            "labels(x)[0] AS far, count(*) AS n, "
            "count(r.distance) AS wd ORDER BY t"
        ))
        # infects carries no distance property -> NULL placeholders
        assert got == [("infects", "Host", 6, 0),
                       ("sharesDNA", "PhageGenome", 9, 9)]

    def test_both_directions_union_all_types(self, eng):
        got = rows(eng.run(
            "MATCH (p:PhageGenome {accession:'A1'})-[r]-(x) "
            "RETURN type(r) AS t, count(*) AS n ORDER BY t"
        ))
        # A1: out sharesDNA to A2,A3 + in from C1; one infects edge
        assert got == [("infects", 1), ("sharesDNA", 3)]

    def test_far_label_prunes_arms(self, eng):
        assert rows(eng.run(
            "MATCH (p:PhageGenome)-[r]->(h:Host) RETURN count(*) AS n"
        )) == [(6,)]

    def test_where_on_missing_property_drops_arm_rows(self, eng):
        # r.distance is NULL on infects rows (three-valued WHERE)
        assert rows(eng.run(
            "MATCH (p:PhageGenome)-[r]->(x) WHERE r.distance <= 0.15 "
            "RETURN count(*) AS n"
        )) == [(6,)]

    def test_runtime_type_predicate_and_keys(self, eng):
        got = rows(eng.run(
            "MATCH (p:PhageGenome {accession:'A1'})-[r]->(x) "
            "WHERE r:sharesDNA RETURN keys(r) AS ks, r.distance AS d "
            "ORDER BY d"
        ))
        assert got == [(["src", "dst", "distance"], 0.1),
                       (["src", "dst", "distance"], 0.2)]

    def test_no_compatible_type_is_empty_not_error(self, eng):
        # no relationship type starts at Host: Neo4j returns no rows
        assert rows(eng.run(
            "MATCH (h:Host)-[r]->(x) RETURN count(*) AS n"
        )) == [(0,)]

    def test_optional_untyped_null_extends(self, eng):
        got = rows(eng.run(
            "MATCH (n) OPTIONAL MATCH (n)-[r]->(m) "
            "RETURN labels(n)[0] AS l, count(*) AS c, count(r) AS hits "
            "ORDER BY l"
        ))
        assert got == [("Host", 4, 0), ("PhageGenome", 18, 15)]

    def test_anonymous_midpoint_advances_chain(self, eng):
        # regression (round-3 ADVICE, compiler.py _join_step_anyrel): a
        # mid-chain anonymous () must BIND the far endpoint so the next hop
        # anchors at the midpoint — the no-far-join shortcut is only valid
        # when the anonymous node ends the chain
        anon = rows(eng.run(
            "MATCH (a:PhageGenome)-[]->()-[]->(b:PhageGenome) "
            "RETURN a.accession AS s, b.accession AS t ORDER BY s, t"
        ))
        named = rows(eng.run(
            "MATCH (a:PhageGenome)-[]->(m)-[]->(b:PhageGenome) "
            "RETURN a.accession AS s, b.accession AS t ORDER BY s, t"
        ))
        assert anon == named and len(anon) > 0
        # and the 2-hop pairs are NOT the 1-hop pairs re-anchored at `a`
        one_hop = rows(eng.run(
            "MATCH (a:PhageGenome)-[]->(b:PhageGenome) "
            "RETURN a.accession AS s, b.accession AS t ORDER BY s, t"
        ))
        assert anon != one_hop

    def test_anonymous_trailing_node_still_skips_far_join(self, eng):
        # the end-of-chain shortcut keeps its cardinality semantics
        short = rows(eng.run(
            "MATCH (p:PhageGenome)-[r]->() RETURN count(*) AS n"
        ))
        full = rows(eng.run(
            "MATCH (p:PhageGenome)-[r]->(x) RETURN count(*) AS n"
        ))
        assert short == full == [(15,)]

    def test_startnode_rejected_on_untyped(self, eng):
        with pytest.raises(CypherCompileError, match="typed relationship"):
            eng.run(
                "MATCH (p:PhageGenome)-[r]->(x) RETURN startNode(r) AS s"
            )


class TestGdsProcedures:
    """CALL gds.*.stream — the Neo4j GDS stream-procedure surface,
    compiled to the SAME operators/graph.py plans the DataFrame API
    exposes. Scores are the engine's deterministic integer-scaled forms;
    nodeId is the node key (the id() convention)."""

    def test_degree_stream(self, eng):
        got = rows(eng.run(
            "CALL gds.degree.stream('sharesDNA') YIELD nodeId, score "
            "RETURN nodeId, score ORDER BY score DESC, nodeId LIMIT 3"
        ))
        assert got == [("A1", 3), ("A2", 2), ("A3", 3)]

    def test_wcc_stream_matches_components(self, eng):
        got = rows(eng.run(
            "CALL gds.wcc.stream('sharesDNA') YIELD nodeId, componentId "
            "RETURN componentId, count(*) AS n ORDER BY n DESC, componentId"
        ))
        # full (unthresholded) sharesDNA graph: A*/B*/C1 merge via A3->B1
        assert got == [("A1", 7), ("D1", 2), ("F1", 2)]

    def test_katz_stream_hand_values(self, eng):
        got = rows(eng.run(
            "CALL gds.katz.stream('sharesDNA', {maxIterations: 2}) "
            "YIELD nodeId AS id, score RETURN id, score "
            "ORDER BY score DESC, id LIMIT 2"
        ))
        # A3 in-edges {A1, A2}: 1e6 + (1,125,000+1,125,000)//8
        assert got == [("A3", 1_281_250), ("B2", 1_265_625)]

    def test_alpha_katz_alias_matches_katz(self, eng):
        # the portable Neo4j name is gds.alpha.katz (ADVICE r4); both
        # spellings hit the same integer-Katz plan
        q = (
            "CALL {name}('sharesDNA', {{maxIterations: 2}}) "
            "YIELD nodeId AS id, score RETURN id, score "
            "ORDER BY score DESC, id LIMIT 2"
        )
        a = rows(eng.run(q.format(name="gds.alpha.katz.stream")))
        b = rows(eng.run(q.format(name="gds.katz.stream")))
        assert a == b == [("A3", 1_281_250), ("B2", 1_265_625)]

    def test_articlerank_eigenvector_streams_match_operators(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        # round 6: the two gds.alpha.katz successors through the proc
        # surface must equal their operators
        e = shares_dna.select("src", "dst")
        got_ar = rows(eng.run(
            "CALL gds.articleRank.stream('sharesDNA', {maxIterations: 2}) "
            "YIELD nodeId, score RETURN nodeId, score"
        ))
        want_ar = sorted(
            (r.id, r.ar_scaled)
            for r in G.article_rank_scaled(e, iterations=2).collect()
        )
        assert got_ar == want_ar and len(got_ar) > 0
        got_ev = rows(eng.run(
            "CALL gds.eigenvector.stream('sharesDNA', {maxIterations: 2}) "
            "YIELD nodeId, score RETURN nodeId, score"
        ))
        want_ev = sorted(
            (r.id, r.eig_scaled)
            for r in G.eigenvector_scaled(e, iterations=2).collect()
        )
        assert got_ev == want_ev and len(got_ev) > 0

    def test_articlerank_eigenvector_parity_optins(self, eng, shares_dna):
        import math

        from phageclouds_graphdatabase_spark.operators import graph as G

        # round 7 (VERDICT r6 ask #4): avgDegreeMode 'exact' and
        # normalized: true — closer-to-stock-GDS value semantics behind
        # config, defaults unchanged
        e = shares_dna.select("src", "dst")
        got_ar = rows(eng.run(
            "CALL gds.articleRank.stream('sharesDNA', "
            "{maxIterations: 2, avgDegreeMode: 'exact'}) "
            "YIELD nodeId, score RETURN nodeId, score"
        ))
        want_ar = sorted(
            (r.id, r.ar_scaled)
            for r in G.article_rank_scaled(
                e, iterations=2, avg_mode="exact"
            ).collect()
        )
        assert got_ar == want_ar and len(got_ar) > 0
        got_ev = rows(eng.run(
            "CALL gds.eigenvector.stream('sharesDNA', "
            "{maxIterations: 2, normalized: true}) "
            "YIELD nodeId, score RETURN nodeId, score"
        ))
        # unit-L2: the score vector must have norm 1 and preserve the
        # integer form's rank order
        assert abs(sum(s * s for _, s in got_ev) - 1.0) < 1e-12
        ints = dict(rows(eng.run(
            "CALL gds.eigenvector.stream('sharesDNA', {maxIterations: 2}) "
            "YIELD nodeId, score RETURN nodeId, score"
        )))
        norm = math.sqrt(sum(v * v for v in ints.values()))
        for nid, s in got_ev:
            assert abs(s - ints[nid] / norm) < 1e-12
        with pytest.raises(CypherCompileError, match="avgDegreeMode"):
            eng.run(
                "CALL gds.articleRank.stream('sharesDNA', "
                "{avgDegreeMode: 'mean'}) YIELD nodeId RETURN nodeId"
            )
        with pytest.raises(CypherCompileError, match="normalized"):
            eng.run(
                "CALL gds.eigenvector.stream('sharesDNA', "
                "{normalized: 'yes'}) YIELD nodeId RETURN nodeId"
            )

    def test_closeness_stream_matches_operator(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        # round 7: sampled raw closeness through the proc surface must
        # equal the operator (default roots = the degree-aware sampler)
        e = shares_dna.select("src", "dst")
        for wf in (False, True):
            got = rows(eng.run(
                "CALL gds.closeness.stream('sharesDNA', "
                "{sourceNodes: ['A1', 'C1'], maxDepth: 3, "
                f"useWassermanFaust: {'true' if wf else 'false'}}}) "
                "YIELD nodeId, score RETURN nodeId, score"
            ))
            roots = e.sparkSession.createDataFrame(
                [("A1",), ("C1",)], "id string"
            )
            want = sorted(
                (r.id, r.closeness_scaled)
                for r in G.closeness_centrality_scaled(
                    roots, e, k=3, wasserman_faust=wf
                ).collect()
            )
            assert got == want and len(got) > 0, wf
        with pytest.raises(CypherCompileError, match="maxDepth"):
            eng.run(
                "CALL gds.closeness.stream('sharesDNA', {maxDepth: 21}) "
                "YIELD nodeId RETURN nodeId"
            )
        with pytest.raises(CypherCompileError, match="useWassermanFaust"):
            eng.run(
                "CALL gds.closeness.stream('sharesDNA', "
                "{useWassermanFaust: 'yes'}) YIELD nodeId RETURN nodeId"
            )

    def test_louvain_stream_matches_operator(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        # round 7: bounded synchronous Louvain through the proc surface
        got = rows(eng.run(
            "CALL gds.louvain.stream('sharesDNA', {maxIterations: 2}) "
            "YIELD nodeId, communityId RETURN nodeId, communityId"
        ))
        want = sorted(
            (r.id, r.label)
            for r in G.louvain_refine(
                shares_dna.select("src", "dst"), rounds=2
            ).collect()
        )
        assert got == want and len(got) > 0
        # maxLevels (round 7): the coarsening phases through the proc
        got2 = rows(eng.run(
            "CALL gds.louvain.stream('sharesDNA', "
            "{maxIterations: 2, maxLevels: 2}) "
            "YIELD nodeId, communityId RETURN nodeId, communityId"
        ))
        want2 = sorted(
            (r.id, r.label)
            for r in G.louvain_refine(
                shares_dna.select("src", "dst"), rounds=2, levels=2
            ).collect()
        )
        assert got2 == want2 and len(got2) > 0
        with pytest.raises(CypherCompileError, match="maxLevels"):
            eng.run(
                "CALL gds.louvain.stream('sharesDNA', {maxLevels: 0}) "
                "YIELD nodeId RETURN nodeId"
            )

    def test_scaleproperties_stream(self, eng, phage_nodes):
        from phageclouds_graphdatabase_spark.functions import derive

        # round 7: each scaler through the proc surface must equal the
        # derive.scale_property operator on the same projection
        props = phage_nodes.select(
            F.col("accession").alias("id"),
            F.col("genome_size").cast("long").alias("value"),
        ).filter(F.col("value").isNotNull())
        for scaler in ("MinMax", "Mean", "Center", "StdScore"):
            got = rows(eng.run(
                "CALL gds.scaleProperties.stream('sharesDNA', "
                f"{{nodeProperties: ['genome_size'], scaler: '{scaler}'}}) "
                "YIELD nodeId, scaledProperty "
                "RETURN nodeId, scaledProperty"
            ))
            want = sorted(
                (r.id, r.scaled)
                for r in derive.scale_property(
                    props, scaler.lower()
                ).collect()
            )
            assert got == want and len(got) > 0, scaler
        with pytest.raises(CypherCompileError, match="scaler"):
            eng.run(
                "CALL gds.scaleProperties.stream('sharesDNA', "
                "{nodeProperties: ['genome_size'], scaler: 'Log'}) "
                "YIELD nodeId RETURN nodeId"
            )

    def test_knn_stream_scalar_property(self, eng, phage_nodes):
        from phageclouds_graphdatabase_spark.operators import ann

        # round 7: exact 1-D KNN over genome_size through the proc surface
        # must equal the operator on the same (id, value) projection
        got = rows(eng.run(
            "CALL gds.knn.stream('sharesDNA', "
            "{nodeProperties: ['genome_size'], topK: 2}) "
            "YIELD node1, node2, similarity "
            "RETURN node1, node2, similarity"
        ))
        props = phage_nodes.select(
            F.col("accession").alias("id"),
            F.col("genome_size").cast("long").alias("value"),
        ).filter(F.col("value").isNotNull())
        want = sorted(
            (r.id1, r.id2, r.sim_scaled)
            for r in ann.knn_scalar_topk(props, k=2).collect()
        )
        assert got == want and len(got) > 0
        with pytest.raises(CypherCompileError, match="nodeProperties"):
            eng.run(
                "CALL gds.knn.stream('sharesDNA', {topK: 2}) "
                "YIELD node1 RETURN node1"
            )
        with pytest.raises(CypherCompileError, match="node property"):
            eng.run(
                "CALL gds.knn.stream('sharesDNA', "
                "{nodeProperties: ['nope']}) YIELD node1 RETURN node1"
            )
        with pytest.raises(CypherCompileError, match="integral"):
            eng.run(
                "CALL gds.knn.stream('sharesDNA', "
                "{nodeProperties: ['taxonomy']}) YIELD node1 RETURN node1"
            )

    def test_yield_flows_into_clauses(self, eng):
        got = rows(eng.run(
            "CALL gds.pageRank.stream('sharesDNA') YIELD nodeId, score "
            "WITH nodeId, score WHERE score > 1000000 "
            "RETURN nodeId, score ORDER BY nodeId"
        ))
        assert got == [("A3", 1_063_750), ("B1", 1_361_250),
                       ("B2", 1_127_500)]

    def test_yield_where_filters_directly(self, eng):
        # Neo4j allows WHERE straight after YIELD
        got = rows(eng.run(
            "CALL gds.pageRank.stream('sharesDNA') YIELD nodeId, score "
            "WHERE score > 1000000 RETURN nodeId, score ORDER BY nodeId"
        ))
        assert got == [("A3", 1_063_750), ("B1", 1_361_250),
                       ("B2", 1_127_500)]

    def test_betweenness_stream_matches_operator(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        # explicit sourceNodes wins over any sampling (VERDICT r4 ask #2):
        # with every endpoint listed, the proc must equal the operator
        # called with all endpoints as roots
        e = shares_dna.select("src", "dst")
        roots = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        ids = sorted(r.id for r in roots.collect())
        src_list = "[" + ", ".join(f"'{i}'" for i in ids) + "]"
        got = rows(eng.run(
            "CALL gds.betweenness.stream('sharesDNA', "
            f"{{sourceNodes: {src_list}}}) "
            "YIELD nodeId, score RETURN nodeId, score"
        ))
        want = sorted(
            (r.id, r.bc_scaled)
            for r in G.betweenness_centrality_scaled(
                e, roots, max_depth=3
            ).collect()
        )
        assert got == want and len(got) > 0

    def test_betweenness_stream_default_sampler_degree_aware(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        # the DEFAULT sampler is sample_roots (degree-aware, deterministic):
        # the proc with no sourceNodes must equal the operator seeded with
        # exactly that sample
        got = rows(eng.run(
            "CALL gds.betweenness.stream('sharesDNA', {samplingSize: 5}) "
            "YIELD nodeId, score RETURN nodeId, score"
        ))
        e = shares_dna.select("src", "dst")
        roots = G.sample_roots(e, 5, max_degree_pct=0.90)
        want = sorted(
            (r.id, r.bc_scaled)
            for r in G.betweenness_centrality_scaled(
                e, roots, max_depth=3
            ).collect()
        )
        assert got == want

    def test_harmonic_stream_hand_values(self, eng):
        # sourceNodes pins the roots; score = 6/d integer scaling. A1's
        # depth-1 neighbours {A2, A3} score 6; depth-2 score 3.
        got = dict(eng.run(
            "CALL gds.closeness.harmonic.stream('sharesDNA', "
            "{sourceNodes: ['A1'], maxDepth: 2}) "
            "YIELD nodeId, score RETURN nodeId, score"
        ).collect())
        assert got["A2"] == 6 and got["A3"] == 6
        assert all(s in (6, 3) for s in got.values())

    def test_fastrp_stream_config_dims(self, eng):
        got = eng.run(
            "CALL gds.fastRP.stream('sharesDNA', "
            "{embeddingDimension: 4, maxIterations: 1}) "
            "YIELD nodeId, embedding RETURN nodeId, embedding"
        ).collect()
        assert len(got) > 0 and all(len(r.embedding) == 4 for r in got)

    def test_scc_stream_matches_operator(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        got = rows(eng.run(
            "CALL gds.scc.stream('sharesDNA') "
            "YIELD nodeId, componentId RETURN nodeId, componentId"
        ))
        e = shares_dna.select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
        )
        want = sorted(
            (r.id, r.scc)
            for r in G.strongly_connected_components(e).collect()
        )
        assert got == want and len(got) > 0

    def test_kcore_stream_full_decomposition(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        # round 6: stock GDS semantics — every node's core VALUE (the
        # h-index-iteration fixpoint), not the round-5 given-k survivors
        got = rows(eng.run(
            "CALL gds.kcore.stream('sharesDNA') "
            "YIELD nodeId, coreValue RETURN nodeId, coreValue"
        ))
        want = sorted(
            (r.id, r.core)
            for r in G.core_decomposition(
                shares_dna.select("src", "dst")
            ).collect()
        )
        assert got == want and len(got) > 0
        # fixture cross-check: the A1-A2-A3 triangle is the only 2-core
        core = dict(got)
        assert core["A1"] == core["A2"] == core["A3"] == 2
        assert all(c == 1 for n, c in core.items() if not n.startswith("A"))

    def test_ktruss_stream_k_config(self, eng):
        got = rows(eng.run(
            "CALL gds.ktruss.stream('sharesDNA', {k: 3, rounds: 2}) "
            "YIELD sourceNodeId, targetNodeId, support "
            "RETURN sourceNodeId, targetNodeId, support"
        ))
        # 3-truss: every surviving edge closes >= 1 triangle
        assert all(s >= 1 for _, _, s in got)

    def test_pagerank_sourcenodes_is_personalized(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        got = rows(eng.run(
            "CALL gds.pageRank.stream('sharesDNA', "
            "{sourceNodes: ['A1'], maxIterations: 2}) "
            "YIELD nodeId, score WHERE score > 0 RETURN nodeId, score"
        ))
        e = shares_dna.select("src", "dst")
        seeds = eng.catalog.node("PhageGenome").df.sparkSession.createDataFrame(
            [("A1",)], "id string"
        )
        want = sorted(
            (r.id, r.pr_scaled)
            for r in G.personalized_pagerank_scaled(e, seeds, iterations=2)
            .filter(F.col("pr_scaled") > 0)
            .collect()
        )
        assert got == want and len(got) > 0

    def test_labelpropagation_stream_matches_graphframe(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.graphframe import GraphFrame

        got = rows(eng.run(
            "CALL gds.labelPropagation.stream('sharesDNA', "
            "{maxIterations: 2}) "
            "YIELD nodeId, communityId RETURN nodeId, communityId"
        ))
        e = shares_dna.select("src", "dst")
        v = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        want = sorted(map(tuple, GraphFrame(v, e).labelPropagation(2).collect()))
        assert got == want and len(got) > 0

    def test_trianglecount_stream_hand_values(self, eng):
        # A1-A2-A3 form the only sharesDNA triangle among A*; every
        # returned count is >= 1 by construction
        got = dict(eng.run(
            "CALL gds.triangleCount.stream('sharesDNA') "
            "YIELD nodeId, triangleCount RETURN nodeId, triangleCount"
        ).collect())
        assert got.get("A1", 0) >= 1 and got.get("A2", 0) >= 1
        assert all(c >= 1 for c in got.values())

    def test_lcc_stream_bounds(self, eng):
        got = rows(eng.run(
            "CALL gds.localClusteringCoefficient.stream('sharesDNA') "
            "YIELD nodeId, localClusteringCoefficient "
            "RETURN nodeId, localClusteringCoefficient"
        ))
        assert len(got) > 0 and all(0.0 <= c <= 1.0 for _, c in got)

    def test_nodesimilarity_stream_topk_config(self, eng):
        got = rows(eng.run(
            "CALL gds.nodeSimilarity.stream('sharesDNA', {topK: 1}) "
            "YIELD nodeId1, nodeId2, similarity "
            "RETURN nodeId1, nodeId2, similarity"
        ))
        # topK=1 -> at most one partner per source node
        from collections import Counter
        c = Counter(a for a, _, _ in got)
        assert len(got) > 0 and max(c.values()) == 1
        assert all(0.0 < s <= 1.0 for _, _, s in got)

    def test_nodesimilarity_freqcap_config(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        got = rows(eng.run(
            "CALL gds.nodeSimilarity.stream('sharesDNA', "
            "{topK: 5, freqCap: 2}) "
            "YIELD nodeId1, nodeId2, similarity "
            "RETURN nodeId1, nodeId2, similarity"
        ))
        want = sorted(
            (r.a, r.b, r.jaccard)
            for r in G.node_similarity_topk_capped(
                shares_dna.select("src", "dst"), k=5, freq_cap=2
            ).collect()
        )
        assert got == want

    def test_dijkstra_stream_matches_operator(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        got = rows(eng.run(
            "CALL gds.allShortestPaths.dijkstra.stream('sharesDNA', "
            "{sourceNodes: ['A1'], maxDepth: 2}) "
            "YIELD sourceNodeId, targetNodeId, totalCost "
            "RETURN sourceNodeId, targetNodeId, totalCost"
        ))
        seeds = shares_dna.sparkSession.createDataFrame([("A1",)], "id string")
        want = sorted(
            (r.src, r.dst, r.cost)
            for r in G.cheapest_path_costs(
                seeds, shares_dna, max_hops=2, directed=False
            ).collect()
        )
        assert got == want and len(got) > 0

    def test_dijkstra_stream_requires_sourcenodes(self, eng):
        with pytest.raises(CypherCompileError, match="sourceNodes"):
            eng.run(
                "CALL gds.allShortestPaths.dijkstra.stream('sharesDNA') "
                "YIELD sourceNodeId RETURN sourceNodeId"
            )

    def test_dijkstra_stream_bad_weight_property(self, eng):
        with pytest.raises(CypherCompileError, match="not a column"):
            eng.run(
                "CALL gds.allShortestPaths.dijkstra.stream('sharesDNA', "
                "{sourceNodes: ['A1'], relationshipWeightProperty: 'nope'}) "
                "YIELD sourceNodeId RETURN sourceNodeId"
            )

    def test_sourcenodes_must_be_list(self, eng):
        with pytest.raises(CypherCompileError, match="sourceNodes"):
            eng.run(
                "CALL gds.betweenness.stream('sharesDNA', "
                "{sourceNodes: 'A1'}) YIELD nodeId RETURN nodeId"
            )

    def test_harmonic_maxdepth_above_3_rejected(self, eng):
        # ADVICE r5: the x6 scaling would silently weight every d >= 4
        # level as depth 3 — fail fast at compile time instead
        with pytest.raises(CypherCompileError, match="maxDepth 1..3"):
            eng.run(
                "CALL gds.closeness.harmonic.stream('sharesDNA', "
                "{maxDepth: 4}) YIELD nodeId RETURN nodeId"
            )

    def test_dijkstra_maxdepth_out_of_range_rejected(self, eng):
        # ADVICE r5: surface the [1, 10] bound as CypherCompileError like
        # every other proc config error, not the operator's bare ValueError
        for bad in (0, 11):
            with pytest.raises(CypherCompileError, match="maxDepth"):
                eng.run(
                    "CALL gds.allShortestPaths.dijkstra.stream('sharesDNA', "
                    f"{{sourceNodes: ['A1'], maxDepth: {bad}}}) "
                    "YIELD sourceNodeId RETURN sourceNodeId"
                )

    def test_betweenness_orientation_natural_is_directed(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        # round 6: orientation 'NATURAL' (the GDS projection vocabulary)
        # runs the directed form — reversed-edge sigma-BFS + ordered pairs
        e = shares_dna.select("src", "dst")
        roots = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        ids = sorted(r.id for r in roots.collect())
        src_list = "[" + ", ".join(f"'{i}'" for i in ids) + "]"
        got = rows(eng.run(
            "CALL gds.betweenness.stream('sharesDNA', "
            f"{{sourceNodes: {src_list}, orientation: 'NATURAL'}}) "
            "YIELD nodeId, score RETURN nodeId, score"
        ))
        want = sorted(
            (r.id, r.bc_scaled)
            for r in G.betweenness_centrality_scaled(
                e, roots, max_depth=3, directed=True
            ).collect()
        )
        assert got == want and len(got) > 0
        # and it differs from the undirected default on this digraph
        undirected = rows(eng.run(
            "CALL gds.betweenness.stream('sharesDNA', "
            f"{{sourceNodes: {src_list}}}) "
            "YIELD nodeId, score RETURN nodeId, score"
        ))
        assert got != undirected

    def test_betweenness_bad_orientation_rejected(self, eng):
        with pytest.raises(CypherCompileError, match="orientation"):
            eng.run(
                "CALL gds.betweenness.stream('sharesDNA', "
                "{orientation: 'REVERSE'}) YIELD nodeId RETURN nodeId"
            )

    def test_modularity_conductance_streams(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.graphframe import GraphFrame
        from phageclouds_graphdatabase_spark.operators import graph as G

        # maxIterations runs the deterministic LP internally; the procs
        # must equal community_quality over that assignment
        e = shares_dna.select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
        )
        v = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        q = G.community_quality(e, GraphFrame(v, e).labelPropagation(2))
        got_m = rows(eng.run(
            "CALL gds.modularity.stream('sharesDNA', {maxIterations: 2}) "
            "YIELD communityId, modularity RETURN communityId, modularity"
        ))
        want_m = sorted((r.community, r.modularity) for r in q.collect())
        assert got_m == want_m and len(got_m) > 0
        got_c = rows(eng.run(
            "CALL gds.conductance.stream('sharesDNA', {maxIterations: 2}) "
            "YIELD community, conductance RETURN community, conductance"
        ))
        want_c = sorted((r.community, r.conductance) for r in q.collect())
        assert got_c == want_c
        # communityProperty reads a precomputed node property: 'source'
        # partitions the fixture nodes into NCBI/EBI communities
        got_p = rows(eng.run(
            "CALL gds.modularity.stream('sharesDNA', "
            "{communityProperty: 'source'}) "
            "YIELD communityId, modularity RETURN communityId, modularity"
        ))
        assert len(got_p) >= 1
        with pytest.raises(CypherCompileError, match="node property"):
            eng.run(
                "CALL gds.modularity.stream('sharesDNA', "
                "{communityProperty: 'nope'}) "
                "YIELD communityId RETURN communityId"
            )

    def test_bfs_stream_levels(self, eng):
        # round 6: multi-source BFS levels through the proc surface; on
        # the t<=0.25 fixture from A1: A2/A3 at level 1, nothing at 3+
        got = sorted(rows(eng.run(
            "CALL gds.bfs.stream('sharesDNA', "
            "{sourceNodes: ['A1'], maxDepth: 3, orientation: 'NATURAL'}) "
            "YIELD sourceNodeId, nodeId, level "
            "RETURN sourceNodeId, nodeId, level"
        )))
        assert ("A1", "A2", 1) in got and ("A1", "A3", 1) in got
        assert all(s == "A1" and 1 <= lv <= 3 for s, _, lv in got)
        with pytest.raises(CypherCompileError, match="sourceNodes"):
            eng.run(
                "CALL gds.bfs.stream('sharesDNA') YIELD nodeId RETURN nodeId"
            )

    def test_wcc_stream_weight_bounds(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        # round 6: maxDistance keeps weight <= bound (the phage cloud
        # idiom); stock threshold keeps weight > bound — together they
        # partition the edge set
        got_close = rows(eng.run(
            "CALL gds.wcc.stream('sharesDNA', "
            "{relationshipWeightProperty: 'distance', maxDistance: 0.25}) "
            "YIELD nodeId, componentId RETURN nodeId, componentId"
        ))
        want_close = sorted(
            (r.id, r.component)
            for r in G.connected_components(
                shares_dna.filter(F.col("distance") <= 0.25).select("src", "dst")
            ).collect()
        )
        assert got_close == want_close and len(got_close) > 0
        got_far = rows(eng.run(
            "CALL gds.wcc.stream('sharesDNA', "
            "{relationshipWeightProperty: 'distance', threshold: 0.25}) "
            "YIELD nodeId, componentId RETURN nodeId, componentId"
        ))
        want_far = sorted(
            (r.id, r.component)
            for r in G.connected_components(
                shares_dna.filter(F.col("distance") > 0.25).select("src", "dst")
            ).collect()
        )
        assert got_far == want_far and got_far != got_close
        with pytest.raises(CypherCompileError, match="not a column"):
            eng.run(
                "CALL gds.wcc.stream('sharesDNA', "
                "{relationshipWeightProperty: 'nope'}) "
                "YIELD nodeId RETURN nodeId"
            )

    def test_randomwalk_stream_matches_operator(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        got = sorted(
            (r.start, r.walkId, tuple(r.nodeIds))
            for r in eng.run(
                "CALL gds.randomWalk.stream('sharesDNA', "
                "{walkLength: 2, walksPerNode: 2}) "
                "YIELD start, walkId, nodeIds RETURN start, walkId, nodeIds"
            ).collect()
        )
        want = sorted(
            (r.start, r.wid, tuple(r.walk))
            for r in G.deterministic_walks(
                shares_dna.select("src", "dst"),
                walk_length=2,
                walks_per_node=2,
                directed=False,
            ).collect()
        )
        assert got == want and len(got) > 0
        with pytest.raises(CypherCompileError, match="walkLength"):
            eng.run(
                "CALL gds.randomWalk.stream('sharesDNA', {walkLength: 21}) "
                "YIELD start RETURN start"
            )

    def test_degree_stream_orientation(self, eng):
        # round 6: NATURAL = out, REVERSE = in, and they sum to the
        # UNDIRECTED default on every node
        q = ("CALL gds.degree.stream('sharesDNA', {{orientation: '{o}'}}) "
             "YIELD nodeId, score RETURN nodeId, score")
        out_d = dict(rows(eng.run(q.format(o="NATURAL"))))
        in_d = dict(rows(eng.run(q.format(o="REVERSE"))))
        total = dict(rows(eng.run(q.format(o="UNDIRECTED"))))
        assert total == {
            n: out_d.get(n, 0) + in_d.get(n, 0) for n in total
        } and len(total) > 0
        with pytest.raises(CypherCompileError, match="orientation"):
            eng.run(
                "CALL gds.degree.stream('sharesDNA', {orientation: 'BOTH'}) "
                "YIELD nodeId RETURN nodeId"
            )

    def test_nodesimilarity_metric_config(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        # round 6: similarityMetric OVERLAP through the proc surface
        got = rows(eng.run(
            "CALL gds.nodeSimilarity.stream('sharesDNA', "
            "{topK: 5, similarityMetric: 'OVERLAP'}) "
            "YIELD nodeId1, nodeId2, similarity "
            "RETURN nodeId1, nodeId2, similarity"
        ))
        want = sorted(
            (r.a, r.b, r.overlap)
            for r in G.node_similarity_topk(
                shares_dna.select("src", "dst"), k=5, metric="overlap"
            ).collect()
        )
        assert got == want and len(got) > 0
        with pytest.raises(CypherCompileError, match="similarityMetric"):
            eng.run(
                "CALL gds.nodeSimilarity.stream('sharesDNA', "
                "{similarityMetric: 'DICE'}) YIELD nodeId1 RETURN nodeId1"
            )

    def test_nodesimilarity_freqcap_auto(self, eng, shares_dna):
        from phageclouds_graphdatabase_spark.operators import graph as G

        # 'auto' engages the df-histogram skew gate (VERDICT r5 fix)
        got = rows(eng.run(
            "CALL gds.nodeSimilarity.stream('sharesDNA', "
            "{topK: 5, freqCap: 'auto'}) "
            "YIELD nodeId1, nodeId2, similarity "
            "RETURN nodeId1, nodeId2, similarity"
        ))
        want = sorted(
            (r.a, r.b, r.jaccard)
            for r in G.node_similarity_topk_capped(
                shares_dna.select("src", "dst"), k=5, freq_cap="auto"
            ).collect()
        )
        assert got == want and len(got) > 0
        # ADVICE r6: a non-'auto' string must fail the UNIFORM config
        # error contract (CypherCompileError), not a bare ValueError
        with pytest.raises(CypherCompileError, match="freqCap"):
            eng.run(
                "CALL gds.nodeSimilarity.stream('sharesDNA', "
                "{topK: 5, freqCap: 'high'}) YIELD nodeId1 RETURN nodeId1"
            )

    def test_stress_stream_positive_counts(self, eng):
        got = rows(eng.run(
            "CALL gds.stress.stream('sharesDNA', {samplingSize: 20}) "
            "YIELD nodeId, score WHERE score > 0 RETURN nodeId, score"
        ))
        # shortest-path COUNTS: every scored node is a real interior node
        assert len(got) > 0 and all(s >= 1 for _, s in got)

    def test_multi_type_catalog_requires_name(self, eng):
        with pytest.raises(CypherCompileError, match="name one"):
            eng.run("CALL gds.degree.stream() YIELD nodeId RETURN nodeId")

    def test_unknown_reltype_rejected(self, eng):
        with pytest.raises(Exception):
            eng.run(
                "CALL gds.degree.stream('nope') YIELD nodeId RETURN nodeId"
            )

    def test_db_procs_take_no_arguments(self, eng):
        with pytest.raises(CypherCompileError, match="no arguments"):
            eng.run("CALL db.labels('x') YIELD label RETURN label")


class TestSchemaProcedures:
    """db.schema.nodeTypeProperties()/relTypeProperties() — catalog-derived
    schema introspection with multi-column YIELD subsets. `mandatory` is
    schema-derived (key property or non-nullable column), documented
    deviation from Neo4j's per-entity scan."""

    def test_node_type_properties(self, eng):
        got = rows(eng.run(
            "CALL db.schema.nodeTypeProperties() "
            "YIELD nodeType, propertyName, propertyTypes, mandatory "
            "RETURN nodeType, propertyName, propertyTypes[0] AS t, "
            "mandatory ORDER BY nodeType, propertyName"
        ))
        assert (":`Host`", "genus", "String", True) in got
        assert (":`PhageGenome`", "genome_size", "Long", False) in got
        assert (":`PhageGenome`", "accession", "String", True) in got

    def test_rel_type_properties_yield_subset_and_alias(self, eng):
        got = rows(eng.run(
            "CALL db.schema.relTypeProperties() "
            "YIELD relType AS rt, propertyName "
            "RETURN rt, propertyName ORDER BY rt, propertyName"
        ))
        assert (":`infects`", "host_genus") in got
        assert (":`sharesDNA`", "distance") in got

    def test_unknown_yield_column_rejected(self, eng):
        with pytest.raises(CypherCompileError, match="not one of them"):
            eng.run(
                "CALL db.schema.nodeTypeProperties() YIELD nope RETURN nope"
            )


class TestUntypedVarLength:
    """``-[*lo..hi]->`` without a type: distinct-pairs frontier expansion
    over the union of every relationship type, in composite 'label|key'
    coordinates so hops cross label domains."""

    def test_crosses_label_domains(self, eng):
        got = rows(eng.run(
            "MATCH (a:PhageGenome {accession:'A1'})-[*1..2]->(x) "
            "RETURN labels(x)[0] AS l, id(x) AS i ORDER BY i"
        ))
        # hop 1: A2, A3 (sharesDNA), Escherichia (infects);
        # hop 2: A3 via A2 (dedup), B1 via A3, Escherichia via A2 (dedup)
        assert got == [
            ("Host", "Host|Escherichia"),
            ("PhageGenome", "PhageGenome|A2"),
            ("PhageGenome", "PhageGenome|A3"),
            ("PhageGenome", "PhageGenome|B1"),
        ]

    def test_equals_typed_when_far_label_restricts(self, eng):
        # infects paths dead-end at Host, so restricting the far endpoint
        # to :PhageGenome reduces the untyped walk to the sharesDNA walk
        un = rows(eng.run(
            "MATCH (a:PhageGenome)-[*1..2]->(b:PhageGenome) "
            "RETURN a.accession AS s, b.accession AS t"
        ))
        ty = rows(eng.run(
            "MATCH (a:PhageGenome)-[:sharesDNA*1..2]->(b:PhageGenome) "
            "RETURN a.accession AS s, b.accession AS t"
        ))
        assert un == ty and len(un) > 0

    def test_both_direction_unions_all_types(self, eng):
        got = rows(eng.run(
            "MATCH (a:PhageGenome {accession:'B2'})-[*1..1]-(x) "
            "RETURN labels(x)[0] AS l, count(*) AS n ORDER BY l"
        ))
        # in-edges from B1 and B3; infects Cellulophaga and Salmonella
        assert got == [("Host", 2), ("PhageGenome", 2)]

    def test_from_any_label_anchor(self, eng):
        got = rows(eng.run(
            "MATCH (n) MATCH (n)-[*1..1]->(x) "
            "RETURN labels(n)[0] AS nl, labels(x)[0] AS xl, count(*) AS c "
            "ORDER BY nl, xl"
        ))
        assert got == [("PhageGenome", "Host", 6),
                       ("PhageGenome", "PhageGenome", 9)]
