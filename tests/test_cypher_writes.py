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
    def test_run_rejects_writes(self, eng):
        with pytest.raises(CypherCompileError, match="apply"):
            eng.run("CREATE (n:PhageGenome {accession:'Z1'}) RETURN n.accession")

    def test_apply_rejects_reads(self, eng):
        with pytest.raises(CypherCompileError, match="no write clause"):
            eng.apply("MATCH (a:PhageGenome) RETURN a.accession")

    def test_apply_rejects_return(self, eng):
        with pytest.raises(CypherCompileError, match="RETURN"):
            eng.apply("CREATE (n:PhageGenome {accession:'Z1'}) RETURN n")


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

    def test_plain_node_delete_rejected(self, eng):
        with pytest.raises(CypherCompileError, match="DETACH"):
            eng.apply("MATCH (a:PhageGenome {accession:'E1'}) DELETE a")

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
