"""Cypher-subset frontend: parse the reference's query language and compile
it to Catalyst DataFrame plans.

The reference is a Cypher client — every query a user of
guille0387/PhageClouds_GraphDatabase runs today is a Cypher string shipped to
Neo4j (/root/reference/phageclouds_gdb.py:56-73,
phageclouds_gdb_family.py:94-99, phageclouds_gdb_host.py:57-65). This package
closes that last switch-over gap: the exact query texts those scripts build
(including the interpolated IN-lists) parse and run here, but the planner is
Catalyst instead of Neo4j — MATCH chains become equi-joins, existential
pattern predicates become left-semi joins, OPTIONAL MATCH becomes a left
outer join, WITH collect() becomes a (grouped) aggregation, and list
comprehensions become higher-order array expressions. One logical plan per
query, no driver round-trips.

Usage::

    from phageclouds_graphdatabase_spark.cypher import CypherEngine, phage_catalog
    eng = CypherEngine(phage_catalog(nodes, edges, infects))
    df = eng.run("MATCH (a:PhageGenome {source:'NCBI'}) RETURN a.accession")

Scale note: literal IN-lists compile to Catalyst ``InSet``; for node sets too
big to inline (the 100 TB path), pass a DataFrame parameter instead —
``eng.run("... WHERE a.accession IN $ids ...", params={"ids": ids_df})``
compiles to a broadcast left-semi join.
"""

from phageclouds_graphdatabase_spark.cypher.compiler import (
    CypherEngine,
    GraphCatalog,
    NodeTable,
    RelTable,
    phage_catalog,
)
from phageclouds_graphdatabase_spark.cypher.parser import CypherSyntaxError, parse

__all__ = [
    "CypherEngine",
    "GraphCatalog",
    "NodeTable",
    "RelTable",
    "phage_catalog",
    "parse",
    "CypherSyntaxError",
]
