"""Cypher write-clause tests (CREATE / MERGE / SET / DELETE).

The reference never writes (read-only Neo4j clients,
/root/reference/phageclouds_gdb.py:24-37), so these pin the engine's own
documented semantics (cypher/writes.py): copy-on-write catalogs, one
full-outer-join MERGE plan, anti-join deletes, schema validation on CREATE.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.cypher import (
    CypherEngine,
    parse,
    phage_catalog,
)
from phageclouds_graphdatabase_spark.cypher import ast_nodes as A
from phageclouds_graphdatabase_spark.cypher.compiler import CypherCompileError
from phageclouds_graphdatabase_spark import schemas


@pytest.fixture()
def eng(phage_nodes, shares_dna, infects):
    return CypherEngine(phage_catalog(phage_nodes, shares_dna, infects))


def rows(df):
    return sorted(map(tuple, df.collect()))


def node_row(cat, acc):
    out = cat.node("PhageGenome").df.filter(F.col("accession") == acc).collect()
    return tuple(out[0]) if out else None


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------


class TestWriteParsing:
    def test_create_clause(self):
        q = parse("CREATE (n:PhageGenome {accession:'Z1', genome_size: 5})")
        (c,) = q.clauses
        assert isinstance(c, A.CreateClause)
        assert c.patterns[0].nodes[0].label == "PhageGenome"

    def test_merge_on_create_on_match(self):
        q = parse(
            "MERGE (n:PhageGenome {accession:'A1'}) "
            "ON CREATE SET n.source = 'NEW', n.genome_size = 1 "
            "ON MATCH SET n.genome_size = n.genome_size + 1"
        )
        (m,) = q.clauses
        assert isinstance(m, A.MergeClause)
        assert len(m.on_create) == 2 and len(m.on_match) == 1
        prop, val = m.on_match[0]
        assert prop == A.Prop("n", "genome_size")
        assert isinstance(val, A.Arith)

    def test_merge_on_clauses_either_order(self):
        q = parse(
            "MERGE (n:Host {genus:'X'}) ON MATCH SET n.genus = 'X' "
            "ON CREATE SET n.genus = 'X'"
        )
        (m,) = q.clauses
        assert m.on_create and m.on_match

    def test_detach_delete_and_set(self):
        q = parse("MATCH (a:PhageGenome {accession:'A1'}) DETACH DELETE a")
        assert q.clauses[-1] == A.DeleteClause(("a",), True)
        q = parse("MATCH (a:L) SET a.x = 1, a.y = 'z'")
        assert isinstance(q.clauses[-1], A.SetClause)
        assert len(q.clauses[-1].items) == 2

    def test_write_query_needs_no_return(self):
        q = parse("CREATE (n:L {k: 1});")
        assert len(q.clauses) == 1

    def test_pattern_props_may_be_expressions(self):
        q = parse("UNWIND ['a'] AS x MERGE (n:L {accession: x})")
        (name, val) = q.clauses[1].pattern.nodes[0].props[0]
        assert name == "accession" and val == A.Var("x")


# --------------------------------------------------------------------------
# routing errors
# --------------------------------------------------------------------------


class TestRouting:
    def test_run_write_with_return_yields_rows(self, eng):
        rows = eng.run(
            "CREATE (n:PhageGenome {accession:'Z1'}) RETURN n.accession AS a"
        ).collect()
        assert [r.a for r in rows] == ["Z1"]

    def test_run_rejects_write_without_return(self, eng):
        with pytest.raises(CypherCompileError, match="apply"):
            eng.run("CREATE (n:PhageGenome {accession:'Z1'})")

    def test_apply_rejects_reads(self, eng):
        with pytest.raises(CypherCompileError, match="no write clause"):
            eng.apply("MATCH (a:PhageGenome) RETURN a.accession")

    def test_apply_accepts_trailing_return(self, eng):
        cat = eng.apply("CREATE (n:PhageGenome {accession:'Z1'}) RETURN n")
        assert (
            cat.node("PhageGenome").df.where("accession = 'Z1'").count() == 1
        )


# --------------------------------------------------------------------------
# CREATE
# --------------------------------------------------------------------------


class TestCreate:
    def test_standalone_node(self, eng):
        cat = eng.apply(
            "CREATE (n:PhageGenome {accession:'Z1', source:'NCBI', "
            "genome_size: 1000})"
        )
        assert cat.node("PhageGenome").df.count() == 13
        assert node_row(cat, "Z1") == ("Z1", "NCBI", None, 1000, None)
        # the original engine catalog is untouched (copy-on-write)
        assert eng.catalog.node("PhageGenome").df.count() == 12

    def test_create_validates_schema(self, eng):
        with pytest.raises(CypherCompileError, match="not in the declared schema"):
            eng.apply("CREATE (n:PhageGenome {accession:'Z1', nope: 1})")
        with pytest.raises(CypherCompileError, match="key property"):
            eng.apply("CREATE (n:PhageGenome {source:'NCBI'})")
        with pytest.raises(CypherCompileError, match="label"):
            eng.apply("CREATE (n {accession:'Z1'})")

    def test_unwind_driven_bulk_create(self, eng, spark):
        eng.spark = spark
        cat = eng.apply(
            "UNWIND ['Z1', 'Z2', 'Z3'] AS a "
            "CREATE (n:PhageGenome {accession: a, source: 'Tara'})"
        )
        df = cat.node("PhageGenome").df
        assert df.count() == 15
        assert df.filter(F.col("source") == "Tara").count() == 3 + 3

    def test_match_create_edge(self, eng):
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'E1'}), "
            "(b:PhageGenome {accession:'D1'}) "
            "CREATE (a)-[:sharesDNA {distance: 0.5}]->(b)"
        )
        edf = cat.rel("sharesDNA").df
        assert edf.count() == 10
        assert rows(edf.filter(F.col("src") == "E1")) == [("E1", "D1", 0.5)]

    def test_create_full_path_literal_nodes(self, eng):
        cat = eng.apply(
            "CREATE (a:PhageGenome {accession:'Z1', source:'NCBI'})"
            "-[:sharesDNA {distance: 0.01}]->"
            "(b:PhageGenome {accession:'Z2', source:'NCBI'})"
        )
        assert cat.node("PhageGenome").df.count() == 14
        assert rows(
            cat.rel("sharesDNA").df.filter(F.col("src") == "Z1")
        ) == [("Z1", "Z2", 0.01)]

    def test_create_edge_label_mismatch(self, eng):
        with pytest.raises(CypherCompileError, match="needs :PhageGenome"):
            eng.apply(
                "MATCH (a:PhageGenome {accession:'A1'})"
                "-[:infects]->(h:Host) "
                "CREATE (h)-[:sharesDNA]->(a)"
            )


# --------------------------------------------------------------------------
# MERGE
# --------------------------------------------------------------------------


class TestMerge:
    def test_node_create_branch(self, eng):
        cat = eng.apply(
            "MERGE (n:PhageGenome {accession:'Z1'}) "
            "ON CREATE SET n.source = 'NEW', n.genome_size = 7 "
            "ON MATCH SET n.genome_size = 0"
        )
        assert cat.node("PhageGenome").df.count() == 13
        assert node_row(cat, "Z1") == ("Z1", "NEW", None, 7, None)
        # nobody else touched
        assert node_row(cat, "A1") == node_row(eng.catalog, "A1")

    def test_node_match_branch_reads_existing(self, eng):
        cat = eng.apply(
            "MERGE (n:PhageGenome {accession:'A1'}) "
            "ON CREATE SET n.source = 'NEW' "
            "ON MATCH SET n.genome_size = n.genome_size + 1"
        )
        assert cat.node("PhageGenome").df.count() == 12
        assert node_row(cat, "A1")[3] == 168001

    def test_unwind_bulk_upsert(self, eng, spark):
        eng.spark = spark
        cat = eng.apply(
            "UNWIND ['A1', 'Z1', 'Z2'] AS x "
            "MERGE (n:PhageGenome {accession: x}) "
            "ON CREATE SET n.source = 'NEW' "
            "ON MATCH SET n.source = 'SEEN'"
        )
        df = cat.node("PhageGenome").df
        assert df.count() == 14
        assert node_row(cat, "A1")[1] == "SEEN"
        assert node_row(cat, "Z1")[1] == "NEW"
        assert node_row(cat, "Z2")[1] == "NEW"
        assert node_row(cat, "A2")[1] == "NCBI"  # untouched

    def test_merge_is_idempotent(self, eng):
        q = "MERGE (n:PhageGenome {accession:'Z1'}) ON CREATE SET n.source = 'NEW'"
        cat1 = eng.apply(q)
        eng2 = CypherEngine(cat1, eng.spark)
        cat2 = eng2.apply(q)
        assert cat2.node("PhageGenome").df.count() == 13

    def test_edge_merge_existing_noop(self, eng):
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'A1'}), "
            "(b:PhageGenome {accession:'A2'}) "
            "MERGE (a)-[r:sharesDNA]->(b) ON CREATE SET r.distance = 0.99"
        )
        edf = cat.rel("sharesDNA").df
        assert edf.count() == 9
        assert rows(edf.filter((F.col("src") == "A1") & (F.col("dst") == "A2"))) == [
            ("A1", "A2", 0.10)
        ]

    def test_edge_merge_create(self, eng):
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'A1'}), "
            "(b:PhageGenome {accession:'E1'}) "
            "MERGE (a)-[r:sharesDNA]->(b) ON CREATE SET r.distance = 0.99"
        )
        edf = cat.rel("sharesDNA").df
        assert edf.count() == 10
        assert rows(edf.filter(F.col("dst") == "E1")) == [("A1", "E1", 0.99)]

    def test_merge_needs_props(self, eng):
        with pytest.raises(CypherCompileError, match="at least one property"):
            eng.apply("MERGE (n:PhageGenome)")


# --------------------------------------------------------------------------
# SET
# --------------------------------------------------------------------------


class TestSet:
    def test_node_set_filtered(self, eng):
        cat = eng.apply(
            "MATCH (a:PhageGenome {source:'Tara'}) SET a.genus = 'TaraGenus'"
        )
        df = cat.node("PhageGenome").df
        assert df.filter(F.col("genus") == "TaraGenus").count() == 3  # A3,F1,F2
        assert node_row(cat, "A1")[4] == "Tequatrovirus"  # untouched

    def test_set_expression_from_own_properties(self, eng):
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "SET a.genome_size = a.genome_size * 2"
        )
        assert node_row(cat, "A1")[3] == 336000

    def test_edge_set(self, eng):
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'A1'})-[r:sharesDNA]->"
            "(b:PhageGenome) WHERE r.distance <= 0.15 SET r.distance = 0.0"
        )
        edf = cat.rel("sharesDNA").df
        assert rows(edf.filter(F.col("src") == "A1")) == [
            ("A1", "A2", 0.0), ("A1", "A3", 0.20)
        ]
        assert edf.count() == 9

    def test_set_key_rejected(self, eng):
        with pytest.raises(CypherCompileError, match="key/endpoint"):
            eng.apply("MATCH (a:PhageGenome {accession:'A1'}) SET a.accession = 'X'")


# --------------------------------------------------------------------------
# DELETE
# --------------------------------------------------------------------------


class TestDelete:
    def test_detach_delete_cascades(self, eng):
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'A1'}) DETACH DELETE a"
        )
        assert cat.node("PhageGenome").df.count() == 11
        # A1->A2, A1->A3 (src side) and C1->A1 (dst side) all gone
        edf = cat.rel("sharesDNA").df
        assert edf.count() == 6
        assert edf.filter(
            (F.col("src") == "A1") | (F.col("dst") == "A1")
        ).count() == 0
        # infects rows for A1 cascade too
        assert cat.rel("infects").df.filter(F.col("src") == "A1").count() == 0

    def test_plain_node_delete_isolated_ok(self, eng):
        # E1 has no sharesDNA or infects rows: Neo4j semantics allow the
        # plain DELETE (the runtime guard finds nothing).
        cat = eng.apply("MATCH (a:PhageGenome {accession:'E1'}) DELETE a")
        assert node_row(cat, "E1") is None
        assert cat.node("PhageGenome").df.count() == 11

    def test_plain_node_delete_with_edges_raises(self, eng):
        from phageclouds_graphdatabase_spark.cypher.writes import (
            CypherDeleteConstraintError,
        )

        # D1 still has a sharesDNA edge and an infects edge
        with pytest.raises(CypherDeleteConstraintError, match="DETACH"):
            eng.apply("MATCH (a:PhageGenome {accession:'D1'}) DELETE a")

    def test_edge_delete(self, eng):
        cat = eng.apply(
            "MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome) "
            "WHERE r.distance <= 0.05 DELETE r"
        )
        edf = cat.rel("sharesDNA").df
        # B1->B2, B3->B2 (0.05) and F1->F2 (-0.0) are deleted
        assert edf.count() == 6
        assert edf.filter(F.col("dst") == "B2").count() == 0
        # nodes untouched
        assert cat.node("PhageGenome").df.count() == 12

    def test_untyped_edge_delete_multi_type(self, eng):
        # MATCH (a)-[r]->(x) DELETE r over the union binding (round-3
        # VERDICT ask #6): rows route to their origin table by the
        # runtime __type — BOTH tables shrink in one statement
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'A1'})-[r]->(x) DELETE r"
        )
        edf = cat.rel("sharesDNA").df
        assert edf.count() == 7  # A1->A2, A1->A3 gone
        assert edf.filter(F.col("src") == "A1").count() == 0
        assert edf.filter(F.col("dst") == "A1").count() == 1  # C1->A1 kept
        assert cat.rel("infects").df.count() == 5  # A1->Escherichia gone
        assert cat.node("PhageGenome").df.count() == 12

    def test_untyped_edge_delete_undirected_with_type_predicate(self, eng):
        # -[r]- matches both orientations; WHERE r:sharesDNA keeps only
        # that arm's rows, so infects survives untouched
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'A1'})-[r]-(x) "
            "WHERE r:sharesDNA DELETE r"
        )
        edf = cat.rel("sharesDNA").df
        assert edf.filter(
            (F.col("src") == "A1") | (F.col("dst") == "A1")
        ).count() == 0
        assert edf.count() == 6
        assert cat.rel("infects").df.count() == 6

    def test_typed_delete_spares_parallel_edges(self, spark, phage_nodes):
        # ADVICE r4: DELETE anti-joins on the FULL stored row, so a
        # parallel edge sharing (src, dst) but differing in a property
        # survives when only its twin matched the WHERE
        edges = spark.createDataFrame(
            [("A1", "A2", 0.01), ("A1", "A2", 0.2), ("A2", "A3", 0.01)],
            schemas.SHARES_DNA,
        )
        e = CypherEngine(phage_catalog(phage_nodes, edges))
        cat = e.apply(
            "MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome) "
            "WHERE r.distance <= 0.05 DELETE r"
        )
        left = rows(cat.rel("sharesDNA").df)
        assert left == [("A1", "A2", 0.2)]

    def test_untyped_delete_spares_parallel_edges(self, spark, phage_nodes):
        # same contract through the anyrel (union-binding) DELETE path
        edges = spark.createDataFrame(
            [("A1", "A2", 0.01), ("A1", "A2", 0.2)], schemas.SHARES_DNA
        )
        e = CypherEngine(phage_catalog(phage_nodes, edges))
        cat = e.apply(
            "MATCH (a:PhageGenome {accession:'A1'})-[r]->(x) "
            "WHERE r.distance <= 0.05 DELETE r"
        )
        assert rows(cat.rel("sharesDNA").df) == [("A1", "A2", 0.2)]

    def test_delete_matches_null_propertied_rows(self, spark, phage_nodes):
        # eqNullSafe keying: a NULL-propertied bound row still deletes
        # (plain = would never match NULL = NULL and orphan it)
        edges = spark.createDataFrame(
            [("A1", "A2", None), ("A2", "A3", 0.2)],
            "src string, dst string, distance double",
        )
        e = CypherEngine(phage_catalog(phage_nodes, edges))
        cat = e.apply(
            "MATCH (a:PhageGenome {accession:'A1'})-[r:sharesDNA]->(b) "
            "DELETE r"
        )
        assert rows(cat.rel("sharesDNA").df) == [("A2", "A3", 0.2)]

    def test_untyped_edge_delete_then_return_count(self, eng):
        got = eng.run(
            "MATCH (a:PhageGenome {accession:'B2'})-[r]->(x) DELETE r "
            "RETURN a.accession AS acc, count(*) AS n"
        ).collect()
        # B2's out-edges: two infects rows (Cellulophaga, Salmonella)
        assert [(r.acc, r.n) for r in got] == [("B2", 2)]


# --------------------------------------------------------------------------
# clause ordering: reads after writes see pending writes
# --------------------------------------------------------------------------


class TestClauseOrdering:
    def test_match_after_create_sees_created_node(self, eng):
        cat = eng.apply(
            "CREATE (n:PhageGenome {accession:'Z9', source:'Tara', "
            "genome_size: 5}) "
            "MATCH (m:PhageGenome {accession:'Z9'}) SET m.genus = 'Fresh'"
        )
        assert node_row(cat, "Z9") == ("Z9", "Tara", None, 5, "Fresh")


# --------------------------------------------------------------------------
# REMOVE
# --------------------------------------------------------------------------


class TestRemove:
    def test_parse_remove(self):
        q = parse("MATCH (n:PhageGenome) REMOVE n.genus, n.source, n:PhageGenome")
        c = q.clauses[1]
        assert isinstance(c, A.RemoveClause)
        assert [(p.var, p.name) for p in c.props] == [
            ("n", "genus"), ("n", "source")
        ]
        assert c.labels == (("n", "PhageGenome"),)

    def test_remove_property_sets_null(self, eng):
        cat = eng.apply(
            "MATCH (a:PhageGenome) WHERE a.accession IN ['A1','A2'] "
            "REMOVE a.genus"
        )
        df = cat.node("PhageGenome").df
        assert df.where("accession IN ('A1','A2') AND genus IS NULL").count() == 2
        # untouched rows keep their value
        assert node_row(cat, "B1")[4] == "Lambdavirus"
        assert df.count() == 12

    def test_remove_two_properties_one_clause(self, eng):
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'D1'}) REMOVE a.genus, a.source"
        )
        assert node_row(cat, "D1")[1] is None
        assert node_row(cat, "D1")[4] is None

    def test_remove_key_property_rejected(self, eng):
        with pytest.raises(CypherCompileError, match="key"):
            eng.apply("MATCH (a:PhageGenome) REMOVE a.accession")

    def test_remove_label_drops_rows_keeps_edges(self, eng):
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'D1'}) REMOVE a:PhageGenome"
        )
        assert node_row(cat, "D1") is None
        assert cat.node("PhageGenome").df.count() == 11
        # unlike DELETE, incident edges are kept
        assert cat.rel("sharesDNA").df.where("src = 'D1'").count() == 1

    def test_remove_mismatched_label_is_noop(self, eng):
        # Neo4j: removing a label the entity does not carry is a silent
        # no-op (round-3 ADVICE) — defensive REMOVEs must not fail
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'D1'}) REMOVE a:Host"
        )
        assert node_row(cat, "D1") is not None
        assert cat.node("PhageGenome").df.count() == 12
        assert cat.node("Host").df.count() == 4

    def test_remove_unknown_property_rejected(self, eng):
        with pytest.raises(CypherCompileError, match="schema"):
            eng.apply("MATCH (a:PhageGenome) REMOVE a.nope")

    def test_remove_needs_match(self, eng):
        with pytest.raises(CypherCompileError, match="MATCH"):
            eng.apply("REMOVE a.genus")

    def test_remove_then_return_sees_null(self, eng):
        rows = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) REMOVE a.genus "
            "RETURN a.accession AS acc, a.genus AS g"
        ).collect()
        assert [(r.acc, r.g) for r in rows] == [("A1", None)]


# --------------------------------------------------------------------------
# RETURN after write clauses
# --------------------------------------------------------------------------


class TestWriteReturn:
    def test_create_return_node_props(self, eng):
        rows = eng.run(
            "CREATE (n:PhageGenome {accession:'Z1', genome_size: 5}) "
            "RETURN n.accession AS acc, n.genome_size AS gs"
        ).collect()
        assert [(r.acc, r.gs) for r in rows] == [("Z1", 5)]

    def test_create_edge_return_edge_var(self, eng):
        rows = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}), "
            "(b:PhageGenome {accession:'D1'}) "
            "CREATE (a)-[r:sharesDNA {distance: 0.33}]->(b) "
            "RETURN r.distance AS d"
        ).collect()
        assert [r.d for r in rows] == [0.33]

    def test_merge_return_on_match_values(self, eng):
        # A1 exists: ON MATCH fires, RETURN sees the updated entity
        rows = eng.run(
            "MERGE (n:PhageGenome {accession:'A1'}) "
            "ON MATCH SET n.source = 'SEEN' "
            "RETURN n.accession AS acc, n.source AS src, n.genome_size AS gs"
        ).collect()
        assert [(r.acc, r.src, r.gs) for r in rows] == [("A1", "SEEN", 168000)]

    def test_merge_return_on_create_values(self, eng):
        rows = eng.run(
            "MERGE (n:PhageGenome {accession:'NEW9'}) "
            "ON CREATE SET n.source = 'FRESH' "
            "RETURN n.accession AS acc, n.source AS src"
        ).collect()
        assert [(r.acc, r.src) for r in rows] == [("NEW9", "FRESH")]

    def test_unwind_merge_return_one_row_per_key(self, eng, spark):
        eng.spark = spark
        rows = eng.run(
            "UNWIND ['A1', 'NEW1', 'NEW1'] AS acc "
            "MERGE (n:PhageGenome {accession: acc}) "
            "RETURN n.accession AS a ORDER BY a"
        ).collect()
        # duplicate context rows collapse per distinct merge key (documented)
        assert [r.a for r in rows] == ["A1", "NEW1"]

    def test_set_return_sees_new_value(self, eng):
        rows = eng.run(
            "MATCH (a:PhageGenome {accession:'B1'}) "
            "SET a.genome_size = a.genome_size + 1 "
            "RETURN a.genome_size AS gs"
        ).collect()
        assert [r.gs for r in rows] == [48503]

    def test_delete_then_return_deleted_var_errors(self, eng):
        with pytest.raises(CypherCompileError, match="unbound"):
            eng.run(
                "MATCH (a:PhageGenome {accession:'E1'}) DELETE a "
                "RETURN a.accession"
            )

    def test_delete_return_other_var(self, eng):
        rows = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'})-[r:sharesDNA]->"
            "(b:PhageGenome {accession:'A2'}) DELETE r "
            "RETURN a.accession AS src, b.accession AS dst"
        ).collect()
        assert [(r.src, r.dst) for r in rows] == [("A1", "A2")]

    def test_create_return_aggregate(self, eng, spark):
        eng.spark = spark
        rows = eng.run(
            "UNWIND ['X1','X2','X3'] AS acc "
            "CREATE (n:PhageGenome {accession: acc}) "
            "RETURN count(n.accession) AS n_created"
        ).collect()
        assert rows[0].n_created == 3


# --------------------------------------------------------------------------
# FOREACH
# --------------------------------------------------------------------------


class TestForeach:
    def test_parse_foreach(self):
        q = parse(
            "FOREACH (x IN ['a','b'] | MERGE (n:L {accession: x}) "
            "SET n.source = x)"
        )
        (c,) = q.clauses
        assert isinstance(c, A.ForeachClause)
        assert c.var == "x" and len(c.body) == 2

    def test_parse_foreach_empty_body_rejected(self):
        from phageclouds_graphdatabase_spark.cypher.parser import (
            CypherSyntaxError,
        )

        with pytest.raises(CypherSyntaxError, match="update clause"):
            parse("FOREACH (x IN [1] | )")

    def test_foreach_merge_ingestion(self, eng, spark):
        eng.spark = spark
        cat = eng.apply(
            "FOREACH (acc IN ['A1', 'Z7', 'Z8'] | "
            "MERGE (n:PhageGenome {accession: acc}) "
            "ON CREATE SET n.source = 'FE')"
        )
        df = cat.node("PhageGenome").df
        assert df.count() == 14
        assert df.where("source = 'FE'").count() == 2
        # existing A1 untouched
        assert node_row(cat, "A1") == node_row(eng.catalog, "A1")

    def test_foreach_preserves_outer_frame(self, eng, spark):
        eng.spark = spark
        # the outer MATCH frame survives the FOREACH: RETURN still sees `a`
        rows = eng.run(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "FOREACH (x IN ['Q1','Q2'] | "
            "CREATE (n:PhageGenome {accession: x})) "
            "RETURN a.accession AS acc"
        ).collect()
        assert [r.acc for r in rows] == ["A1"]

    def test_foreach_set_via_merge_list_from_frame(self, eng, spark):
        eng.spark = spark
        # list expression referencing the outer frame: per-row lists unwind
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "FOREACH (x IN [a.accession + '_c1', a.accession + '_c2'] | "
            "CREATE (n:PhageGenome {accession: x, source: 'CLONE'}))"
        )
        df = cat.node("PhageGenome").df
        assert sorted(
            r.accession for r in df.where("source = 'CLONE'").collect()
        ) == ["A1_c1", "A1_c2"]

    def test_nested_foreach(self, eng, spark):
        eng.spark = spark
        cat = eng.apply(
            "FOREACH (x IN ['N1','N2'] | FOREACH (y IN ['a','b'] | "
            "MERGE (n:PhageGenome {accession: x + y})))"
        )
        df = cat.node("PhageGenome").df
        assert df.count() == 16
        assert df.where("accession IN ('N1a','N1b','N2a','N2b')").count() == 4

    def test_foreach_empty_list_noop(self, eng, spark):
        eng.spark = spark
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "FOREACH (x IN [] | CREATE (n:PhageGenome {accession: 'NOPE'}))"
        )
        assert cat.node("PhageGenome").df.count() == 12


# --------------------------------------------------------------------------
# SET += / SET = (property-map forms)
# --------------------------------------------------------------------------


class TestMapSet:
    def test_parse_map_set(self):
        q = parse("MATCH (n:L) SET n += {a: 1}, n.b = 2, n = $props")
        items = q.clauses[1].items
        assert isinstance(items[0][0], A.MapSet)
        assert items[0][0].mode == "merge"
        assert isinstance(items[1][0], A.Prop)
        assert isinstance(items[2][0], A.MapSet)
        assert items[2][0].mode == "replace"
        assert isinstance(items[2][1], A.Param)

    def test_merge_mode_updates_listed_only(self, eng):
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'A1'}) "
            "SET a += {genus: 'Mapped', genome_size: 7}"
        )
        assert node_row(cat, "A1") == ("A1", "NCBI", 
            "Viruses;Duplodnaviria;Myoviridae;Tequatrovirus", 7, "Mapped")

    def test_replace_mode_nulls_unlisted(self, eng):
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'A1'}) SET a = {genus: 'Only'}"
        )
        # key kept; every other non-listed property nulled
        assert node_row(cat, "A1") == ("A1", None, None, None, "Only")

    def test_param_dict_merge(self, eng):
        cat = eng.apply(
            "MATCH (a:PhageGenome {accession:'B1'}) SET a += $props",
            {"props": {"source": "PARAM", "genome_size": 9}},
        )
        assert node_row(cat, "B1") == ("B1", "PARAM",
            "Viruses;Siphoviridae;Lambdavirus", 9, "Lambdavirus")

    def test_param_must_be_dict(self, eng):
        with pytest.raises(CypherCompileError, match="dict"):
            eng.apply(
                "MATCH (a:PhageGenome {accession:'B1'}) SET a += $props",
                {"props": [1, 2]},
            )

    def test_map_set_key_rejected(self, eng):
        with pytest.raises(CypherCompileError, match="key"):
            eng.apply(
                "MATCH (a:PhageGenome {accession:'B1'}) "
                "SET a += {accession: 'NEW'}"
            )

    def test_on_create_set_plus_equals(self, eng, spark):
        eng.spark = spark
        cat = eng.apply(
            "UNWIND ['W1', 'A1'] AS x "
            "MERGE (n:PhageGenome {accession: x}) "
            "ON CREATE SET n += $fresh "
            "ON MATCH SET n += {source: 'TOUCHED'}",
            {"fresh": {"source": "NEW", "genome_size": 3}},
        )
        assert node_row(cat, "W1") == ("W1", "NEW", None, 3, None)
        assert node_row(cat, "A1")[1] == "TOUCHED"

    def test_replace_in_on_create_rejected(self, eng, spark):
        eng.spark = spark
        with pytest.raises(CypherCompileError, match="replace"):
            eng.apply(
                "MERGE (n:PhageGenome {accession:'Q1'}) "
                "ON CREATE SET n = {genus: 'X'}"
            )

    def test_map_set_then_return(self, eng):
        rows = eng.run(
            "MATCH (a:PhageGenome {accession:'A2'}) "
            "SET a += {genus: 'Ret'} "
            "RETURN a.accession AS acc, a.genus AS g"
        ).collect()
        assert [(r.acc, r.g) for r in rows] == [("A2", "Ret")]


class TestSetLabel:
    """SET n:Label (round 3): matched rows enter Label's table — shared
    columns carried, others NULL, idempotent by key. The source must carry
    the target's key column (one-table-per-label catalogs are typed,
    unlike Neo4j's schema-free labels — compile error otherwise)."""

    def test_set_label_unions_into_target(self, spark):
        from phageclouds_graphdatabase_spark.cypher import (
            CypherEngine, phage_catalog,
        )
        nodes = spark.createDataFrame(
            [("A1", "NCBI", 1, "x", "G1")],
            "accession string, source string, genome_size long, "
            "taxonomy string, genus string",
        )
        edges = spark.createDataFrame([], "src string, dst string, distance double")
        inf = spark.createDataFrame([("A1", "H0")], "src string, host_genus string")
        eng = CypherEngine(phage_catalog(nodes, edges, inf))
        cat = eng.apply("MATCH (n:PhageGenome {accession:'A1'}) SET n:Host")
        assert sorted(r.genus for r in cat.node("Host").df.collect()) == ["G1", "H0"]
        # idempotent: applying again adds nothing
        cat2 = CypherEngine(cat).apply(
            "MATCH (n:PhageGenome {accession:'A1'}) SET n:Host"
        )
        assert cat2.node("Host").df.count() == 2

    def test_set_label_requires_target_key(self, spark):
        from phageclouds_graphdatabase_spark.cypher import (
            CypherEngine, phage_catalog,
        )
        from phageclouds_graphdatabase_spark.cypher.compiler import (
            CypherCompileError,
        )
        import pytest as _pytest
        # nodes WITHOUT a genus column: no way to key into :Host
        nodes = spark.createDataFrame(
            [("A1", "NCBI", 1, "x")],
            "accession string, source string, genome_size long, taxonomy string",
        )
        edges = spark.createDataFrame([], "src string, dst string, distance double")
        inf = spark.createDataFrame([("A1", "H0")], "src string, host_genus string")
        eng = CypherEngine(phage_catalog(nodes, edges, inf))
        with _pytest.raises(CypherCompileError):
            eng.apply("MATCH (n:PhageGenome {accession:'A1'}) SET n:Host")
