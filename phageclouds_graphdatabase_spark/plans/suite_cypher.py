"""Oracle-checked queries driven through the Cypher frontend (S2: the
engine's query-language entry point).

Each entry parses a reference-shaped Cypher text
(/root/reference/phageclouds_gdb.py:56-73, phageclouds_gdb_host.py:57-65)
with ``cypher.parse``, compiles it to a DataFrame plan, and is checked
against a DuckDB oracle over the same derived property graph the other
graph-suite queries use (the phage tables aren't in /root/testdata):

    PhageGenome nodes = parts  ('P<key>', source = first p_type word,
                                taxonomy = p_name, genome_size = p_size,
                                genus = p_brand)
                      ∪ suppliers ('S<key>', source 'SUPPLIER',
                                taxonomy = s_name, genome_size = s_nationkey)
    sharesDNA edges   = lineitem-derived P->S with distance = MIN(l_discount)
    infects edges     = part -> Host(p_brand)

The collect()-based entries explode the result array back to rows: Cypher's
collect order is partition-order-dependent (so un-hashable), but the
MULTISET of elements is deterministic — exactly what the reference relies on
when it set()s the list client-side (phageclouds_gdb_family.py:95).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.cypher import (
    CypherEngine,
    GraphCatalog,
    NodeTable,
    phage_catalog,
)
from phageclouds_graphdatabase_spark.plans._suite_helpers import (
    GRAPH_EDGES_SQL,
    GRAPH_THRESHOLD,
    SuiteEntry,
    arr_str,
    graph_edges,
    t,
)

_NODES_SQL = """
    SELECT 'P' || p_partkey AS accession,
           split_part(p_type, ' ', 1) AS source,
           p_name AS taxonomy,
           CAST(p_size AS BIGINT) AS genome_size,
           p_brand AS genus
    FROM part
    UNION ALL
    SELECT 'S' || s_suppkey, 'SUPPLIER', s_name,
           CAST(s_nationkey AS BIGINT), NULL
    FROM supplier
"""

_INFECTS_SQL = "SELECT 'P' || p_partkey AS src, p_brand AS host_genus FROM part"

_CTE = f"""
WITH nodes AS ({_NODES_SQL}),
edges AS ({GRAPH_EDGES_SQL}),
infects AS ({_INFECTS_SQL})
"""


def _nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    parts = p.select(
        F.concat(F.lit("P"), F.col("p_partkey")).alias("accession"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("source"),
        F.col("p_name").alias("taxonomy"),
        F.col("p_size").cast("long").alias("genome_size"),
        F.col("p_brand").alias("genus"),
    )
    sups = s.select(
        F.concat(F.lit("S"), F.col("s_suppkey")).alias("accession"),
        F.lit("SUPPLIER").alias("source"),
        F.col("s_name").alias("taxonomy"),
        F.col("s_nationkey").cast("long").alias("genome_size"),
        F.lit(None).cast("string").alias("genus"),
    )
    return parts.unionByName(sups)


def _infects(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "part").select(
        F.concat(F.lit("P"), F.col("p_partkey")).alias("src"),
        F.col("p_brand").alias("host_genus"),
    )


def _engine(spark: SparkSession, sf_dir: str) -> CypherEngine:
    return CypherEngine(
        phage_catalog(
            _nodes(spark, sf_dir),
            graph_edges(spark, sf_dir),
            _infects(spark, sf_dir),
        )
    )


def cypher_seed_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The taxon script's Q1 shape (phageclouds_gdb.py:56-58) through the
    Cypher frontend: property-map filter + CONTAINS + range predicate over a
    2-node/1-edge motif."""
    q = """MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome)
            WHERE a.taxonomy CONTAINS '{}' AND r.distance <= {}
            RETURN a.accession AS seed, b.accession AS target, r.distance AS dist;""".format(
        "red", GRAPH_THRESHOLD
    )
    return _engine(spark, sf_dir).run(q)


CYPHER_SEED_EXPAND_SQL = _CTE + f"""
SELECT n.accession AS seed, e.dst AS target, e.distance AS dist
FROM edges e JOIN nodes n ON e.src = n.accession
WHERE n.taxonomy LIKE '%red%' AND e.distance <= {GRAPH_THRESHOLD}
"""


_IN_LIST = ["P1", "P2", "P3", "P4", "P5", "S1", "S2", "S3"]


def cypher_induced_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The induced-edges shape with the node set interpolated as a Python
    list literal, exactly as the reference scripts do
    (phageclouds_gdb.py:64-67)."""
    q = """MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome)
            WHERE a.accession in {} AND b.accession in {} AND r.distance <= {}
            RETURN a.accession AS Source, b.accession AS Target,
            r.distance as Distance;""".format(_IN_LIST, _IN_LIST, GRAPH_THRESHOLD)
    return _engine(spark, sf_dir).run(q)


_IN_SQL = "('" + "', '".join(_IN_LIST) + "')"

CYPHER_INDUCED_SQL = _CTE + f"""
SELECT e.src AS Source, e.dst AS Target, e.distance AS Distance
FROM edges e
WHERE e.src IN {_IN_SQL} AND e.dst IN {_IN_SQL}
  AND e.distance <= {GRAPH_THRESHOLD}
"""


def cypher_optional_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The host script's attribute query (phageclouds_gdb_host.py:61-62):
    OPTIONAL MATCH left-outer host join, NULL when no host."""
    q = """MATCH (a:PhageGenome) WHERE a.accession IN {} OPTIONAL MATCH (a)-[:infects]->(h:Host)
            RETURN a.accession AS Phage, a.source AS Source, a.genome_size AS Genome_size, h.genus AS Host;""".format(
        _IN_LIST
    )
    return _engine(spark, sf_dir).run(q)


CYPHER_OPTIONAL_SQL = _CTE + f"""
SELECT n.accession AS Phage, n.source AS Source,
       n.genome_size AS Genome_size, i.host_genus AS Host
FROM nodes n LEFT JOIN infects i ON n.accession = i.src
WHERE n.accession IN {_IN_SQL}
"""


def cypher_existential_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The harsh host query end-to-end (phageclouds_gdb_host.py:57):
    existential pattern predicate, inequality source filter on endpoint `a`
    only, WITH collect() x2, and the A2 list-union comprehension — then
    exploded back to rows (multiset is deterministic, order is not)."""
    q = (
        'MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome) '
        'WHERE (a)-[:infects]->(:Host {{genus:"{}"}}) AND r.distance <= {} '
        'AND a.source <> "PROMO" '
        "WITH collect(a.accession) as a_list, collect(b.accession) as b_list "
        "RETURN a_list + [x IN b_list WHERE NOT x IN a_list] AS node_list;"
    ).format("Brand#13", GRAPH_THRESHOLD)
    out = _engine(spark, sf_dir).run(q)
    return out.select(F.explode("node_list").alias("node_id"))


CYPHER_EXISTENTIAL_SQL = _CTE + f"""
, q AS (
    SELECT e.src AS a, e.dst AS b
    FROM edges e
    JOIN nodes n ON e.src = n.accession
    WHERE EXISTS (SELECT 1 FROM infects i
                  WHERE i.src = e.src AND i.host_genus = 'Brand#13')
      AND e.distance <= {GRAPH_THRESHOLD}
      AND n.source <> 'PROMO'
)
SELECT a AS node_id FROM q
UNION ALL
SELECT b FROM q WHERE b NOT IN (SELECT a FROM q)
"""


def cypher_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cypher implicit grouping (non-aggregate RETURN items are the keys):
    per-source node counts and max genome size."""
    q = ("MATCH (a:PhageGenome) RETURN a.source AS src, "
         "count(a.accession) AS n, max(a.genome_size) AS biggest")
    return _engine(spark, sf_dir).run(q)


CYPHER_GROUPED_SQL = _CTE + """
SELECT source AS src, CAST(COUNT(accession) AS BIGINT) AS n,
       MAX(genome_size) AS biggest
FROM nodes GROUP BY source
"""


def cypher_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentileCont/percentileDisc aggregates (the standard Neo4j
    aggregation surface, VERDICT r1 missing #3): cont = Spark's exact
    ``percentile`` (linear interpolation, = DuckDB quantile_cont); disc =
    lower nearest-rank over the sorted group (= DuckDB quantile_disc).
    Grouped per source to exercise the implicit-grouping path too."""
    q = ("MATCH (a:PhageGenome) RETURN a.source AS src, "
         "percentileCont(a.genome_size, 0.5) AS p50c, "
         "percentileDisc(a.genome_size, 0.5) AS p50d, "
         "percentileCont(a.genome_size, 0.9) AS p90c, "
         "percentileDisc(a.genome_size, 0.9) AS p90d, "
         "count(a.accession) AS n")
    return _engine(spark, sf_dir).run(q)


CYPHER_PERCENTILES_SQL = _CTE + """
SELECT source AS src,
       quantile_cont(genome_size, 0.5) AS p50c,
       quantile_disc(genome_size, 0.5) AS p50d,
       quantile_cont(genome_size, 0.9) AS p90c,
       quantile_disc(genome_size, 0.9) AS p90d,
       CAST(COUNT(accession) AS BIGINT) AS n
FROM nodes GROUP BY source
"""


_KHOP_SEEDS = ["P1", "P2", "P3", "P4"]
_KHOP_SEED_SQL = "('" + "', '".join(_KHOP_SEEDS) + "')"


def cypher_var_length_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length undirected pattern [:sharesDNA*1..2] — the Cypher
    syntax for the W6 k-hop/BFS expand; distinct (a, b) pairs, self-pairs
    excluded (deviation from Neo4j's per-path rows documented on
    cypher/compiler.py _join_var_length)."""
    q = """MATCH (a:PhageGenome)-[:sharesDNA*1..2]-(b:PhageGenome)
            WHERE a.accession IN {}
            RETURN a.accession AS a, b.accession AS b;""".format(_KHOP_SEEDS)
    return _engine(spark, sf_dir).run(q)


CYPHER_VAR_LENGTH_SQL = _CTE + f"""
, und AS (
    SELECT src AS a, dst AS b FROM edges
    UNION ALL
    SELECT dst AS a, src AS b FROM edges
),
hop1 AS (SELECT DISTINCT a, b FROM und),
hop2 AS (
    SELECT DISTINCT h.a, u.b
    FROM hop1 h JOIN und u ON h.b = u.a
),
reached AS (SELECT a, b FROM hop1 UNION SELECT a, b FROM hop2)
SELECT a, b FROM reached
WHERE a IN {_KHOP_SEED_SQL} AND a <> b
"""


def cypher_path_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named path with PER-PATH var-length semantics — exact Neo4j
    cardinality for ``MATCH p = (a)-[:sharesDNA*2..3]-(b) RETURN p``:
    one row per distinct path under relationship-uniqueness (closes the
    distinct-pair deviation documented on _join_var_length). Runs over the
    thresholded subgraph (the materialize-then-query usage; the full
    derived graph's path count is combinatorial)."""
    eng = CypherEngine(
        phage_catalog(
            _nodes(spark, sf_dir),
            graph_edges(spark, sf_dir, GRAPH_THRESHOLD),
            _infects(spark, sf_dir),
        )
    )
    q = """MATCH p = (a:PhageGenome)-[:sharesDNA*2..3]-(b:PhageGenome)
            WHERE a.accession IN {}
            RETURN nodes(p) AS path, length(p) AS hops,
            b.accession AS dst;""".format(_KHOP_SEEDS)
    return eng.run(q).withColumn("path", arr_str("path"))


CYPHER_PATHS_SQL = _CTE + f"""
, fe AS (
    SELECT src, dst FROM edges WHERE distance <= {GRAPH_THRESHOLD}
),
und AS (
    SELECT src, dst,
           LEAST(src, dst) || '|' || GREATEST(src, dst) AS rid FROM fe
    UNION ALL
    SELECT dst AS src, src AS dst,
           LEAST(src, dst) || '|' || GREATEST(src, dst) AS rid FROM fe
),
p2 AS (
    SELECT u1.src AS n0, u1.dst AS n1, u2.dst AS n2, u1.rid AS r1, u2.rid AS r2
    FROM und u1
    JOIN und u2 ON u2.src = u1.dst AND u2.rid <> u1.rid
    WHERE u1.src IN {_KHOP_SEED_SQL}
),
p3 AS (
    SELECT p.n0, p.n1, p.n2, u3.dst AS n3
    FROM p2 p
    JOIN und u3 ON u3.src = p.n2 AND u3.rid <> p.r1 AND u3.rid <> p.r2
)
SELECT array_to_string([n0, n1, n2], '->') AS path,
       CAST(2 AS INTEGER) AS hops, n2 AS dst FROM p2
UNION ALL
SELECT array_to_string([n0, n1, n2, n3], '->'), 3, n3 FROM p3
"""


def cypher_exists_count_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neo4j 5 block subqueries: ``EXISTS { pattern WHERE ... }`` (with an
    inner WHERE the inline existential can't express) filtering the match,
    and ``COUNT { pattern }`` as the per-row degree expression. EXISTS
    compiles to a semi-join on the anchor key; COUNT to a grouped count
    left-joined back (0 for no match)."""
    q = """MATCH (a:PhageGenome)
            WHERE EXISTS {{ MATCH (a)-[r:sharesDNA]->(b:PhageGenome)
                            WHERE r.distance <= {t} }}
            RETURN a.accession AS id,
            COUNT {{ (a)-[:sharesDNA]->(c:PhageGenome) }} AS outdeg;""".format(
        t=GRAPH_THRESHOLD
    )
    return _engine(spark, sf_dir).run(q)


CYPHER_EXISTS_COUNT_SQL = _CTE + f"""
SELECT n.accession AS id,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges e
        WHERE e.src = n.accession) AS outdeg
FROM nodes n
WHERE EXISTS (SELECT 1 FROM edges e2
              WHERE e2.src = n.accession AND e2.distance <= {GRAPH_THRESHOLD})
"""


def cypher_call_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL { } scoped subquery (Neo4j 4+): per-row top-2 nearest
    neighbors — the inner ORDER BY + LIMIT applies PER INVOCATION, which
    compiles to a row_number window partitioned by the import key (no
    per-row re-execution). Oracle: the same window in SQL."""
    q = """MATCH (a:PhageGenome {source:'ECONOMY'})
            CALL { WITH a
                   MATCH (a)-[r:sharesDNA]->(b:PhageGenome)
                   RETURN b.accession AS nbr, r.distance AS d
                   ORDER BY r.distance ASC, b.accession ASC LIMIT 2 }
            RETURN a.accession AS id, nbr, d;"""
    return _engine(spark, sf_dir).run(q)


CYPHER_CALL_TOPK_SQL = _CTE + """
SELECT id, nbr, d FROM (
    SELECT n.accession AS id, e.dst AS nbr, e.distance AS d,
           ROW_NUMBER() OVER (
               PARTITION BY n.accession ORDER BY e.distance ASC, e.dst ASC
           ) AS rn
    FROM nodes n JOIN edges e ON e.src = n.accession
    WHERE n.source = 'ECONOMY'
) WHERE rn <= 2
"""


def cypher_chain_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-edge named var-length CHAIN (VERDICT r1 next #5, previously
    fail-fast): ``p = (a)-[:sharesDNA*1..2]-(m)-[:sharesDNA]->(b)`` — a
    var-length undirected segment followed by a fixed DIRECTED hop, with
    relationship-uniqueness spanning the whole chain. Oracle unrolls both
    segment lengths plus the fixed hop with explicit rid disequalities."""
    eng = CypherEngine(
        phage_catalog(
            _nodes(spark, sf_dir),
            graph_edges(spark, sf_dir, GRAPH_THRESHOLD),
            _infects(spark, sf_dir),
        )
    )
    q = """MATCH p = (a:PhageGenome)-[:sharesDNA*1..2]-(m:PhageGenome)
            -[:sharesDNA]->(b:PhageGenome)
            WHERE a.accession IN {}
            RETURN nodes(p) AS path, m.accession AS mid,
            b.accession AS dst;""".format(_KHOP_SEEDS)
    return eng.run(q).withColumn("path", arr_str("path"))


CYPHER_CHAIN_SQL = _CTE + f"""
, fe AS (
    SELECT src, dst,
           LEAST(src, dst) || '|' || GREATEST(src, dst) AS rid
    FROM edges WHERE distance <= {GRAPH_THRESHOLD}
),
und AS (
    SELECT src, dst, rid FROM fe
    UNION ALL
    SELECT dst AS src, src AS dst, rid FROM fe
),
s1 AS (
    SELECT u.src AS n0, u.dst AS n1, u.rid AS r1 FROM und u
    WHERE u.src IN {_KHOP_SEED_SQL}
),
s2 AS (
    SELECT s.n0, s.n1, u.dst AS n2, s.r1, u.rid AS r2
    FROM s1 s JOIN und u ON u.src = s.n1 AND u.rid <> s.r1
)
SELECT array_to_string([n0, n1, f.dst], '->') AS path,
       n1 AS mid, f.dst AS dst
FROM s1 JOIN fe f ON f.src = s1.n1 AND f.rid <> s1.r1
UNION ALL
SELECT array_to_string([n0, n1, n2, f.dst], '->'),
       n2, f.dst
FROM s2 JOIN fe f ON f.src = s2.n2 AND f.rid <> s2.r1 AND f.rid <> s2.r2
"""


def cypher_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``allShortestPaths((a)-[:sharesDNA*..3]-(b))`` through the frontend:
    every shortest path per reachable pair (level-synchronous BFS with
    visited-pair anti-joins), named-path accessors projected out. Runs on
    the thresholded subgraph like cypher_path_enumeration."""
    eng = CypherEngine(
        phage_catalog(
            _nodes(spark, sf_dir),
            graph_edges(spark, sf_dir, GRAPH_THRESHOLD),
            _infects(spark, sf_dir),
        )
    )
    q = """MATCH p = allShortestPaths((a:PhageGenome)-[:sharesDNA*..3]-(b:PhageGenome))
            WHERE a.accession IN {}
            RETURN nodes(p) AS path, length(p) AS hops,
            b.accession AS dst;""".format(_KHOP_SEEDS)
    return eng.run(q).withColumn("path", arr_str("path"))


CYPHER_SHORTEST_SQL = _CTE + f"""
, fe AS (
    SELECT src, dst FROM edges WHERE distance <= {GRAPH_THRESHOLD}
),
und AS (
    SELECT src, dst FROM fe
    UNION ALL
    SELECT dst AS src, src AS dst FROM fe
),
p1 AS (
    SELECT u.src AS n0, u.dst AS n1 FROM und u
    WHERE u.src IN {_KHOP_SEED_SQL} AND u.dst <> u.src
),
v1 AS (SELECT DISTINCT n0, n1 AS v FROM p1),
p2 AS (
    SELECT p.n0, p.n1, u.dst AS n2 FROM p1 p JOIN und u ON u.src = p.n1
    WHERE u.dst <> p.n0
      AND NOT EXISTS (SELECT 1 FROM v1 WHERE v1.n0 = p.n0 AND v1.v = u.dst)
),
v2 AS (SELECT DISTINCT n0, n2 AS v FROM p2),
p3 AS (
    SELECT p.n0, p.n1, p.n2, u.dst AS n3 FROM p2 p JOIN und u ON u.src = p.n2
    WHERE u.dst <> p.n0
      AND NOT EXISTS (SELECT 1 FROM v1 WHERE v1.n0 = p.n0 AND v1.v = u.dst)
      AND NOT EXISTS (SELECT 1 FROM v2 WHERE v2.n0 = p.n0 AND v2.v = u.dst)
)
SELECT array_to_string([n0, n1], '->') AS path,
       CAST(1 AS INTEGER) AS hops, n1 AS dst FROM p1
UNION ALL SELECT array_to_string([n0, n1, n2], '->'), 2, n2 FROM p2
UNION ALL SELECT array_to_string([n0, n1, n2, n3], '->'), 3, n3 FROM p3
"""


def cypher_weighted_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted path cost through the frontend: ``reduce()`` (Neo4j's left
    fold, compiled to F.aggregate) over the per-hop ``p.dists`` array that
    named var-length paths carry — the total-DNA-distance-along-a-path
    query the PhageClouds model implies. The fold is left-associated in
    both engines, so the IEEE double result is bit-identical."""
    eng = CypherEngine(
        phage_catalog(
            _nodes(spark, sf_dir),
            graph_edges(spark, sf_dir, GRAPH_THRESHOLD),
            _infects(spark, sf_dir),
        )
    )
    q = """MATCH p = (a:PhageGenome)-[:sharesDNA*2..2]-(b:PhageGenome)
            WHERE a.accession IN {}
            RETURN nodes(p) AS path,
            reduce(acc = 0.0, d IN p.dists | acc + d) AS cost;""".format(
        _KHOP_SEEDS
    )
    return eng.run(q).withColumn("path", arr_str("path"))


CYPHER_WEIGHTED_SQL = _CTE + f"""
, fe AS (
    SELECT src, dst, distance FROM edges WHERE distance <= {GRAPH_THRESHOLD}
),
und AS (
    SELECT src, dst, distance,
           LEAST(src, dst) || '|' || GREATEST(src, dst) AS rid FROM fe
    UNION ALL
    SELECT dst AS src, src AS dst, distance,
           LEAST(src, dst) || '|' || GREATEST(src, dst) AS rid FROM fe
)
SELECT array_to_string([u1.src, u1.dst, u2.dst], '->') AS path,
       0.0 + u1.distance + u2.distance AS cost
FROM und u1
JOIN und u2 ON u2.src = u1.dst AND u2.rid <> u1.rid
WHERE u1.src IN {_KHOP_SEED_SQL}
"""


def cypher_quantified_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List-quantifier predicates over named paths: all()/any() compile to
    F.forall / F.exists over the per-hop dists array — the Neo4j idiom for
    per-relationship conditions on var-length matches
    (``WHERE all(d IN p.dists WHERE ...)``). Oracle unrolls the two hops
    into explicit per-hop conjuncts."""
    eng = CypherEngine(
        phage_catalog(
            _nodes(spark, sf_dir),
            graph_edges(spark, sf_dir, GRAPH_THRESHOLD),
            _infects(spark, sf_dir),
        )
    )
    q = """MATCH p = (a:PhageGenome)-[:sharesDNA*2..2]-(b:PhageGenome)
            WHERE a.accession IN {} AND all(d IN p.dists WHERE d <= 0.01)
            RETURN nodes(p) AS path,
            any(d IN p.dists WHERE d > 0.005) AS has_loose;""".format(
        _KHOP_SEEDS
    )
    return eng.run(q).withColumn("path", arr_str("path"))


CYPHER_QUANTIFIED_SQL = _CTE + f"""
, fe AS (
    SELECT src, dst, distance FROM edges WHERE distance <= {GRAPH_THRESHOLD}
),
und AS (
    SELECT src, dst, distance,
           LEAST(src, dst) || '|' || GREATEST(src, dst) AS rid FROM fe
    UNION ALL
    SELECT dst AS src, src AS dst, distance,
           LEAST(src, dst) || '|' || GREATEST(src, dst) AS rid FROM fe
)
SELECT array_to_string([u1.src, u1.dst, u2.dst], '->') AS path,
       (u1.distance > 0.005 OR u2.distance > 0.005) AS has_loose
FROM und u1
JOIN und u2 ON u2.src = u1.dst AND u2.rid <> u1.rid
WHERE u1.src IN {_KHOP_SEED_SQL}
  AND u1.distance <= 0.01 AND u2.distance <= 0.01
"""


def cypher_optional_shortest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIONAL MATCH p = shortestPath(...): anchors that cannot reach the
    target keep their row with a NULL path (the classic Neo4j
    degrees-of-separation-or-null query). The optional sub-frame seeds
    from the bound anchors only. Oracle: two unrolled BFS levels with
    new-pair exclusions, lex-min per pair, LEFT JOIN from the seed list."""
    eng = CypherEngine(
        phage_catalog(
            _nodes(spark, sf_dir),
            graph_edges(spark, sf_dir, GRAPH_THRESHOLD),
            _infects(spark, sf_dir),
        )
    )
    q = """MATCH (a:PhageGenome) WHERE a.accession IN {}
            OPTIONAL MATCH p = shortestPath(
            (a)-[:sharesDNA*..2]-(b:PhageGenome {{accession:'S1'}}))
            RETURN a.accession AS src, nodes(p) AS path;""".format(_KHOP_SEEDS)
    return eng.run(q).withColumn("path", arr_str("path"))


CYPHER_OPTIONAL_SHORTEST_SQL = _CTE + f"""
, fe AS (
    SELECT src, dst FROM edges WHERE distance <= {GRAPH_THRESHOLD}
),
und AS (
    SELECT src, dst FROM fe
    UNION ALL
    SELECT dst AS src, src AS dst FROM fe
),
p1 AS (
    SELECT u.src AS n0, u.dst AS n1 FROM und u
    WHERE u.src IN {_KHOP_SEED_SQL} AND u.dst <> u.src
),
v1 AS (SELECT DISTINCT n0, n1 AS v FROM p1),
p2 AS (
    SELECT p.n0, p.n1, u.dst AS n2 FROM p1 p JOIN und u ON u.src = p.n1
    WHERE u.dst <> p.n0
      AND NOT EXISTS (SELECT 1 FROM v1 WHERE v1.n0 = p.n0 AND v1.v = u.dst)
),
sp AS (
    SELECT n0, MIN(path) AS path FROM (
        SELECT n0, [n0, n1] AS path FROM p1 WHERE n1 = 'S1'
        UNION ALL
        SELECT n0, [n0, n1, n2] FROM p2 WHERE n2 = 'S1'
    ) GROUP BY n0
)
SELECT s.id AS src, array_to_string(sp.path, '->') AS path
FROM (SELECT DISTINCT accession AS id FROM nodes
      WHERE accession IN {_KHOP_SEED_SQL}) s
LEFT JOIN sp ON sp.n0 = s.id
"""


def cypher_union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION across two full queries (A3 through the query language):
    distinct union of the supplier-labelled genomes and the large-genome
    parts, same output columns both sides (Neo4j's rule, enforced)."""
    q = """MATCH (a:PhageGenome {source:'SUPPLIER'})
            RETURN a.accession AS id, a.taxonomy AS name
            UNION
            MATCH (b:PhageGenome) WHERE b.genome_size >= 40
            RETURN b.accession AS id, b.taxonomy AS name;"""
    return _engine(spark, sf_dir).run(q)


CYPHER_UNION_SQL = _CTE + """
SELECT accession AS id, taxonomy AS name FROM nodes WHERE source = 'SUPPLIER'
UNION
SELECT accession AS id, taxonomy AS name FROM nodes WHERE genome_size >= 40
"""


def cypher_entity_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-metadata + string scalar functions (V8 through the query
    language): labels()/type()/id() resolve from the catalog binding at
    compile time (constants in the plan — zero runtime cost);
    substring (0-based -> substr 1-based), left/right/replace/reverse are
    the engine-native string kernels in both engines."""
    q = """MATCH (a:PhageGenome {source:'ECONOMY'})-[r:sharesDNA]->(b:PhageGenome)
            RETURN id(a) AS aid, labels(a) AS la, type(r) AS tr,
            substring(a.taxonomy, 0, 4) AS sub4,
            left(b.accession, 1) AS lb, right(b.accession, 2) AS rb,
            replace(a.taxonomy, 'e', '_') AS rep,
            reverse(b.accession) AS rev;"""
    return _engine(spark, sf_dir).run(q).withColumn("la", arr_str("la"))


CYPHER_ENTITY_FUNCS_SQL = _CTE + """
SELECT n.accession AS aid, 'PhageGenome' AS la, 'sharesDNA' AS tr,
       substr(n.taxonomy, 1, 4) AS sub4,
       left(e.dst, 1) AS lb, right(e.dst, 2) AS rb,
       replace(n.taxonomy, 'e', '_') AS rep,
       reverse(e.dst) AS rev
FROM edges e JOIN nodes n ON e.src = n.accession
WHERE n.source = 'ECONOMY'
"""


def cypher_topk_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 through the query language: ORDER BY with full tie-break + LIMIT
    compiles to Catalyst Sort + GlobalLimit (TakeOrderedAndProject)."""
    q = """MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome)
            RETURN a.accession AS src, b.accession AS dst, r.distance AS d
            ORDER BY d ASC, src ASC, dst ASC LIMIT 20;"""
    return _engine(spark, sf_dir).run(q)


CYPHER_TOPK_SQL = _CTE + """
SELECT src, dst, distance AS d FROM edges
ORDER BY d ASC, src ASC, dst ASC LIMIT 20
"""



def cypher_unwind_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNWIND a collected list back to rows + CASE derivation (the V1 color
    shape through the query language)."""
    q = """MATCH (a:PhageGenome) WHERE a.accession IN {}
            WITH collect(a.accession) AS accs
            UNWIND accs AS acc
            RETURN acc,
                   CASE WHEN acc STARTS WITH 'P' THEN 'part'
                        WHEN acc STARTS WITH 'S' THEN 'supplier'
                        ELSE 'other' END AS kind;""".format(_IN_LIST)
    return _engine(spark, sf_dir).run(q)


CYPHER_UNWIND_CASE_SQL = _CTE + f"""
SELECT accession AS acc,
       CASE WHEN accession LIKE 'P%' THEN 'part'
            WHEN accession LIKE 'S%' THEN 'supplier'
            ELSE 'other' END AS kind
FROM nodes WHERE accession IN {_IN_SQL}
"""



def _engine_sp(spark: SparkSession, sf_dir: str) -> CypherEngine:
    return CypherEngine(
        phage_catalog(
            _nodes(spark, sf_dir),
            graph_edges(spark, sf_dir),
            _infects(spark, sf_dir),
        ),
        spark,
    )


_UPSERT_KEYS = ["P1", "P2", "P3", "X1", "X2"]


def cypher_merge_upsert_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write surface: UNWIND-driven MERGE bulk upsert (cypher/writes.py) —
    the declarative full-outer-join plan; existing keys take the ON MATCH
    branch, fresh keys the ON CREATE branch."""
    q = """UNWIND {} AS x
           MERGE (n:PhageGenome {{accession: x}})
           ON CREATE SET n.source = 'NEW', n.genome_size = 0
           ON MATCH SET n.source = 'SEEN';""".format(_UPSERT_KEYS)
    cat = _engine_sp(spark, sf_dir).apply(q)
    return cat.node("PhageGenome").df


_UPSERT_SQL = "(SELECT unnest(" + str(_UPSERT_KEYS) + ") AS acc)"

CYPHER_MERGE_UPSERT_SQL = _CTE + f"""
, upsert AS {_UPSERT_SQL}
SELECT n.accession,
       CASE WHEN u.acc IS NOT NULL THEN 'SEEN' ELSE n.source END AS source,
       n.taxonomy, n.genome_size, n.genus
FROM nodes n LEFT JOIN upsert u ON n.accession = u.acc
UNION ALL
SELECT u.acc, 'NEW', CAST(NULL AS VARCHAR), CAST(0 AS BIGINT),
       CAST(NULL AS VARCHAR)
FROM upsert u WHERE u.acc NOT IN (SELECT accession FROM nodes)
"""


def cypher_set_property(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write surface: MATCH ... SET — the update set joins back into the
    node table (left-outer + per-column CASE, one broadcast join)."""
    q = """MATCH (a:PhageGenome {source:'SUPPLIER'})
           SET a.genus = 'SUP', a.genome_size = a.genome_size * 2;"""
    cat = _engine_sp(spark, sf_dir).apply(q)
    return cat.node("PhageGenome").df


CYPHER_SET_SQL = _CTE + """
SELECT accession,
       source,
       taxonomy,
       CASE WHEN source = 'SUPPLIER' THEN genome_size * 2
            ELSE genome_size END AS genome_size,
       CASE WHEN source = 'SUPPLIER' THEN 'SUP' ELSE genus END AS genus
FROM nodes
"""


def cypher_detach_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write surface: DETACH DELETE — anti-join on the deleted key set,
    cascaded over every incident relationship table; returns the surviving
    edges."""
    q = """MATCH (a:PhageGenome) WHERE a.genus = 'Brand#13'
           DETACH DELETE a;"""
    cat = _engine_sp(spark, sf_dir).apply(q)
    return cat.rel("sharesDNA").df


CYPHER_DETACH_DELETE_SQL = _CTE + """
, doomed AS (SELECT accession FROM nodes WHERE genus = 'Brand#13')
SELECT src, dst, distance FROM edges
WHERE src NOT IN (SELECT accession FROM doomed)
  AND dst NOT IN (SELECT accession FROM doomed)
"""


def cypher_create_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write surface: MATCH ... CREATE — reverse edges materialized for
    every close pair (the frame projection unions into the edge table)."""
    q = """MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome)
           WHERE r.distance <= 0.01
           CREATE (b)-[:sharesDNA {distance: 9.9}]->(a);"""
    cat = _engine_sp(spark, sf_dir).apply(q)
    return cat.rel("sharesDNA").df


CYPHER_CREATE_EDGES_SQL = _CTE + """
SELECT src, dst, distance FROM edges
UNION ALL
SELECT dst AS src, src AS dst, 9.9 AS distance FROM edges
WHERE distance <= 0.01
"""


def cypher_remove_property(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write surface: REMOVE — property removal (== SET NULL, same
    update-join plan) on the supplier nodes, then label removal (the
    matched rows leave the label's table, edges kept) for one genus
    (cypher/writes.py _apply_remove)."""
    q = """MATCH (a:PhageGenome {source:'SUPPLIER'}) REMOVE a.taxonomy
           MATCH (b:PhageGenome {genus:'Brand#13'}) REMOVE b:PhageGenome;"""
    cat = _engine_sp(spark, sf_dir).apply(q)
    return cat.node("PhageGenome").df


CYPHER_REMOVE_SQL = _CTE + """
SELECT accession, source,
       CASE WHEN source = 'SUPPLIER' THEN CAST(NULL AS VARCHAR)
            ELSE taxonomy END AS taxonomy,
       genome_size, genus
FROM nodes
WHERE genus IS NULL OR genus <> 'Brand#13'
"""


_MERGE_RETURN_KEYS = ["P1", "P2", "P3", "X1", "X2"]


def cypher_merge_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write surface: MERGE ... RETURN n — Neo4j's upsert-and-read idiom.
    The trailing RETURN projects the POST-write entity struct (created
    values on the ON CREATE branch, updated values on ON MATCH), one row
    per distinct merge key (cypher/writes.py apply_write_returning)."""
    q = """UNWIND {} AS x
           MERGE (n:PhageGenome {{accession: x}})
           ON CREATE SET n.source = 'NEW', n.genome_size = 0
           ON MATCH SET n.source = 'SEEN'
           RETURN n.accession AS accession, n.source AS source,
                  n.genome_size AS genome_size;""".format(_MERGE_RETURN_KEYS)
    return _engine_sp(spark, sf_dir).run(q)


CYPHER_MERGE_RETURN_SQL = _CTE + f"""
, upsert AS (SELECT DISTINCT unnest({_MERGE_RETURN_KEYS}) AS acc)
SELECT u.acc AS accession,
       CASE WHEN n.accession IS NOT NULL THEN 'SEEN' ELSE 'NEW' END AS source,
       CASE WHEN n.accession IS NOT NULL THEN n.genome_size
            ELSE CAST(0 AS BIGINT) END AS genome_size
FROM upsert u LEFT JOIN nodes n ON n.accession = u.acc
"""


def cypher_delete_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write surface: plain DELETE with Neo4j's runtime edge-guard — the
    matched nodes are provably isolated (NOT EXISTS prunes every supplier
    with an incident sharesDNA edge; suppliers have no infects rows), so
    the guard's per-rel-table semi-join probe finds nothing and the delete
    proceeds (cypher/writes.py _apply_delete)."""
    q = """MATCH (a:PhageGenome)
           WHERE a.source = 'SUPPLIER'
             AND NOT EXISTS { MATCH (a)<-[:sharesDNA]-(b:PhageGenome) }
           DELETE a;"""
    cat = _engine_sp(spark, sf_dir).apply(q)
    return cat.node("PhageGenome").df


CYPHER_DELETE_NODES_SQL = _CTE + """
SELECT * FROM nodes
WHERE NOT (source = 'SUPPLIER'
           AND accession NOT IN (SELECT dst FROM edges))
"""


def cypher_delete_untyped_rels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write surface: MATCH (a)-[r]->(x) DELETE r through an UNTYPED
    relationship binding (round-4) — the defensive-cleanup idiom. The
    union binding's rows route to their origin table by the runtime
    __type, so ONE statement shrinks both sharesDNA and infects
    (cypher/writes.py _delete_anyrel_edges, one anti-join per arm).
    Returns both post-delete edge tables tagged by type."""
    q = """MATCH (a:PhageGenome {genus:'Brand#21'})-[r]->(x) DELETE r;"""
    cat = _engine_sp(spark, sf_dir).apply(q)
    shares = cat.rel("sharesDNA").df.select(
        F.lit("sharesDNA").alias("rel"), "src", "dst"
    )
    infects = cat.rel("infects").df.select(
        F.lit("infects").alias("rel"), "src", F.col("host_genus").alias("dst")
    )
    return shares.unionByName(infects)


CYPHER_DELETE_UNTYPED_SQL = _CTE + """
, del AS (SELECT accession FROM nodes WHERE genus = 'Brand#21')
SELECT 'sharesDNA' AS rel, src, dst FROM edges
WHERE src NOT IN (SELECT accession FROM del)
UNION ALL
SELECT 'infects' AS rel, src, host_genus AS dst FROM infects
WHERE src NOT IN (SELECT accession FROM del)
"""


def cypher_gds_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL gds.pageRank.stream (round 4) — the Neo4j GDS stream-procedure
    surface through the Cypher frontend, compiled to the same
    integer-scaled power iteration as graph_pagerank
    (operators/graph.py pagerank_scaled) over the FULL (unthresholded)
    sharesDNA projection; YIELD aliases flow into the trailing RETURN."""
    q = ("CALL gds.pageRank.stream('sharesDNA', {maxIterations: 2}) "
         "YIELD nodeId AS id, score AS pr_scaled RETURN id, pr_scaled")
    return _engine_sp(spark, sf_dir).run(q)


CYPHER_GDS_PAGERANK_SQL = f"""
WITH e AS (SELECT src, dst FROM ({GRAPH_EDGES_SQL})),
n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
od AS (SELECT src AS id, COUNT(*) AS od FROM e GROUP BY src),
c1 AS (
    SELECT e.dst, SUM(1000000 // od.od) AS s
    FROM e JOIN od ON e.src = od.id GROUP BY e.dst
),
p1 AS (
    SELECT n.id, CAST(150000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS pr
    FROM n LEFT JOIN c1 ON n.id = c1.dst
),
c2 AS (
    SELECT e.dst, SUM(p1.pr // od.od) AS s
    FROM e JOIN od ON e.src = od.id JOIN p1 ON p1.id = e.src
    GROUP BY e.dst
)
SELECT n.id, CAST(150000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS pr_scaled
FROM n LEFT JOIN c2 ON n.id = c2.dst
"""


def cypher_untyped_anon_midpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Untyped 2-hop chain THROUGH an anonymous midpoint (round 4) — the
    regression surface of the r3-ADVICE is_last fix
    (cypher/compiler.py _join_step_anyrel): a mid-chain ``()`` must BIND
    through the union-of-labels table so the second hop anchors at the
    midpoint, not back at ``a``. Both relationship arms contribute
    midpoints — suppliers via sharesDNA, hosts via infects — and the
    result keeps per-path multiplicity (one row per shared midpoint)."""
    q = """MATCH (a:PhageGenome {accession:'P1'})-[]->()<-[]-(b:PhageGenome)
           WHERE b.accession <> 'P1'
           RETURN b.accession AS partner"""
    return _engine_sp(spark, sf_dir).run(q)


CYPHER_ANON_MID_SQL = _CTE + """
, mid AS (
  SELECT src AS p, 'P|' || dst AS m FROM edges
  UNION ALL
  SELECT src, 'H|' || host_genus FROM infects
)
SELECT m2.p AS partner
FROM mid m1 JOIN mid m2 ON m1.m = m2.m
WHERE m1.p = 'P1' AND m2.p <> 'P1'
"""


_FOREACH_KEYS = ["P5", "P6", "Y1", "Y2", "Y3"]


def cypher_foreach_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write surface: FOREACH (x IN list | MERGE ...) — Neo4j's per-element
    update block, compiled as a scoped UNWIND whose writes persist while the
    outer frame's cardinality is untouched (cypher/writes.py
    _apply_foreach). Same bulk-upsert plan as UNWIND+MERGE underneath."""
    q = """FOREACH (acc IN {} |
             MERGE (n:PhageGenome {{accession: acc}})
             ON CREATE SET n.source = 'FE', n.genome_size = 1
             ON MATCH SET n.source = 'SEEN');""".format(_FOREACH_KEYS)
    cat = _engine_sp(spark, sf_dir).apply(q)
    return cat.node("PhageGenome").df


CYPHER_FOREACH_SQL = _CTE + f"""
, upsert AS (SELECT unnest({_FOREACH_KEYS}) AS acc)
SELECT n.accession,
       CASE WHEN u.acc IS NOT NULL THEN 'SEEN' ELSE n.source END AS source,
       n.taxonomy, n.genome_size, n.genus
FROM nodes n LEFT JOIN upsert u ON n.accession = u.acc
UNION ALL
SELECT u.acc, 'FE', CAST(NULL AS VARCHAR), CAST(1 AS BIGINT),
       CAST(NULL AS VARCHAR)
FROM upsert u WHERE u.acc NOT IN (SELECT accession FROM nodes)
"""


def cypher_set_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write surface: SET n += $props (dict-param merge, the bulk-enrich
    idiom) on the supplier nodes and SET n = {map} (whole-map replace:
    unlisted non-key properties nulled) on one genus — both lowered at
    compile time to the same single update join as per-property SET
    (cypher/writes.py _expand_set_items)."""
    q = """MATCH (a:PhageGenome {source:'SUPPLIER'}) SET a += $enrich
           MATCH (b:PhageGenome {genus:'Brand#15'}) SET b = {genus: 'B15'};"""
    cat = _engine_sp(spark, sf_dir).apply(
        q, {"enrich": {"genus": "SUP", "genome_size": 0}}
    )
    return cat.node("PhageGenome").df


CYPHER_SET_MAP_SQL = _CTE + """
SELECT accession,
       CASE WHEN genus = 'Brand#15' THEN CAST(NULL AS VARCHAR)
            ELSE source END AS source,
       CASE WHEN genus = 'Brand#15' THEN CAST(NULL AS VARCHAR)
            ELSE taxonomy END AS taxonomy,
       CASE WHEN genus = 'Brand#15' THEN CAST(NULL AS BIGINT)
            WHEN source = 'SUPPLIER' THEN CAST(0 AS BIGINT)
            ELSE genome_size END AS genome_size,
       CASE WHEN genus = 'Brand#15' THEN 'B15'
            WHEN source = 'SUPPLIER' THEN 'SUP'
            ELSE genus END AS genus
FROM nodes
"""


def cypher_pattern_comprehension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern comprehension ``[(a)-[:T]->(b) WHERE ... | b.x]`` — Neo4j's
    inline correlated-collect idiom (the reference builds exactly this list
    client-side at phageclouds_gdb_family.py:94-99). Compiles to ONE grouped
    collect_list + ONE left join on the anchor key — never a per-row
    subquery — so at 100 TB it costs a single shuffle on the anchor key.
    Elements are sorted ascending (documented deviation: Neo4j match order
    is nondeterministic), which is what makes the list value-hashable."""
    q = """MATCH (a:PhageGenome)
            WITH a, [(a)-[r:sharesDNA]->(b:PhageGenome)
                     WHERE r.distance <= {t} | b.accession] AS nbrs
            WHERE size(nbrs) > 0
            RETURN a.accession AS acc, size(nbrs) AS degree, nbrs;""".format(
        t=GRAPH_THRESHOLD
    )
    out = _engine(spark, sf_dir).run(q)
    return out.select(
        "acc",
        F.col("degree").cast("long").alias("degree"),
        arr_str("nbrs").alias("nbrs"),
    )


CYPHER_PATTERN_COMP_SQL = _CTE + f"""
, lists AS (
    SELECT e.src AS acc, list_sort(list(e.dst)) AS nbrs
    FROM edges e
    WHERE e.distance <= {GRAPH_THRESHOLD}
    GROUP BY e.src
)
SELECT n.accession AS acc,
       CAST(len(l.nbrs) AS BIGINT) AS degree,
       array_to_string(l.nbrs, '->') AS nbrs
FROM nodes n JOIN lists l ON l.acc = n.accession
"""


def cypher_star_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WITH ... WHERE ... RETURN *`` — the carry-everything projection
    (round 3). Star expands at compile time to the bound variables in
    binding order; compiling to a plain column projection means it costs
    nothing over an explicit list."""
    q = """MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome)
            WITH a.accession AS src, b.accession AS dst, r.distance AS d
            WHERE d <= {t}
            RETURN *;""".format(t=GRAPH_THRESHOLD)
    return _engine(spark, sf_dir).run(q)


CYPHER_STAR_SQL = _CTE + f"""
SELECT e.src AS src, e.dst AS dst, e.distance AS d
FROM edges e WHERE e.distance <= {GRAPH_THRESHOLD}
"""


def cypher_list_slicing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``list[i]`` / ``list[lo..hi]`` (round 3): Neo4j 0-based element
    access (negative counts from the end, out-of-range -> NULL) and
    half-open slices with omitted/clamped bounds. Compiles to F.get /
    F.slice over the already-built array — pure expression work, no extra
    shuffle beyond the pattern comprehension's single grouped collect."""
    q = """MATCH (a:PhageGenome)
            WITH a, [(a)-[r:sharesDNA]->(b:PhageGenome)
                     WHERE r.distance <= {t} | b.accession] AS nbrs
            WHERE size(nbrs) >= 2
            RETURN a.accession AS acc,
                   nbrs[0] AS first_nbr,
                   nbrs[-1] AS last_nbr,
                   nbrs[1..3] AS mid,
                   size(nbrs[1..]) AS rest_n;""".format(t=GRAPH_THRESHOLD)
    out = _engine(spark, sf_dir).run(q)
    return out.select(
        "acc",
        "first_nbr",
        "last_nbr",
        arr_str("mid").alias("mid"),
        F.col("rest_n").cast("long").alias("rest_n"),
    )


CYPHER_LIST_SLICE_SQL = _CTE + f"""
, lists AS (
    SELECT e.src AS acc, list_sort(list(e.dst)) AS nbrs
    FROM edges e
    WHERE e.distance <= {GRAPH_THRESHOLD}
    GROUP BY e.src
)
SELECT n.accession AS acc,
       l.nbrs[1] AS first_nbr,
       l.nbrs[-1] AS last_nbr,
       array_to_string(list_slice(l.nbrs, 2, 3), '->') AS mid,
       CAST(len(l.nbrs) - 1 AS BIGINT) AS rest_n
FROM nodes n JOIN lists l ON l.acc = n.accession
WHERE len(l.nbrs) >= 2
"""


def cypher_map_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map projection ``a {.prop, k: expr}`` plus the %, ^ and =~ operators
    (round 3). The projection compiles to a named struct of column
    references, so Catalyst prunes the scan to exactly the projected
    properties; % / ^ are JVM-side arithmetic; =~ anchors the pattern
    (Neo4j matches the WHOLE string, Java String.matches semantics)."""
    q = """MATCH (a:PhageGenome)
            WITH a {.accession, .genus, sz: a.genome_size} AS m
            WHERE m.sz % 5 = 0 AND m.accession =~ 'P.*[02468]'
            RETURN m.accession AS acc, m.genus AS genus, m.sz ^ 2 AS sz_sq;"""
    return _engine(spark, sf_dir).run(q)


CYPHER_MAP_PROJ_SQL = _CTE + """
SELECT accession AS acc, genus, pow(genome_size, 2) AS sz_sq
FROM nodes
WHERE genome_size % 5 = 0 AND regexp_full_match(accession, 'P.*[02468]')
"""


def cypher_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Neo4j math/scalar function surface (round 3): sign() -> INTEGER,
    floor/ceil/round/sqrt -> FLOAT (even for integer input), toBoolean's
    strict 'true'/'false' mapping, isEmpty on strings. Only IEEE-exact
    functions appear here (sqrt is correctly-rounded per IEEE 754; round
    has no representable .5 ties for x/7.0) so the cross-engine hash is
    bit-exact; transcendentals (exp/log/trig) are libm-dependent and are
    pinned by unit tests instead."""
    q = """MATCH (a:PhageGenome) WHERE a.genome_size > 0
            RETURN a.accession AS acc,
                   sign(a.genome_size - 25) AS sgn,
                   floor(a.genome_size / 7.0) AS fl,
                   ceil(a.genome_size / 7.0) AS cl,
                   round(a.genome_size / 7.0) AS rnd,
                   sqrt(a.genome_size) AS sq,
                   toBoolean(CASE WHEN a.genome_size % 2 = 0
                             THEN 'true' ELSE 'nope' END) AS beven,
                   isEmpty(a.taxonomy) AS tax_empty;"""
    return _engine(spark, sf_dir).run(q)


CYPHER_MATH_SQL = _CTE + """
SELECT accession AS acc,
       CAST(sign(genome_size - 25) AS BIGINT) AS sgn,
       FLOOR(genome_size / 7.0) AS fl,
       CEIL(genome_size / 7.0) AS cl,
       ROUND(genome_size / 7.0) AS rnd,
       SQRT(CAST(genome_size AS DOUBLE)) AS sq,
       CASE WHEN genome_size % 2 = 0 THEN TRUE
            ELSE CAST(NULL AS BOOLEAN) END AS beven,
       len(taxonomy) = 0 AS tax_empty
FROM nodes WHERE genome_size > 0
"""


def cypher_temporal_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal surface (round 3): date()/datetime() constructors and the
    d.year/.quarter/.month/.dayOfWeek accessors (dayOfWeek is ISO,
    Monday=1 — Spark's weekday()+1, NOT its Sunday-based dayofweek). Runs
    over a SECOND catalog (orders as :Order nodes) — the engine is
    schema-agnostic, not hardwired to the phage graph."""
    cat = GraphCatalog(
        {"Order": NodeTable(t(spark, sf_dir, "orders"), "o_orderkey")}, {}
    )
    q = """MATCH (o:Order)
            WITH o, date(o.o_orderdate) AS d
            WHERE d >= date('1995-01-01') AND d < date('1996-01-01')
            RETURN d.year AS yr, d.quarter AS q, d.month AS mon,
                   count(*) AS n,
                   sum(CASE WHEN d.dayOfWeek = 1 THEN 1 ELSE 0 END) AS n_monday
            ORDER BY mon;"""
    out = CypherEngine(cat).run(q)
    return out.select(
        F.col("yr").cast("long").alias("yr"),
        F.col("q").cast("long").alias("q"),
        F.col("mon").cast("long").alias("mon"),
        F.col("n").cast("long").alias("n"),
        F.col("n_monday").cast("long").alias("n_monday"),
    )


CYPHER_TEMPORAL_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(quarter(o_orderdate) AS BIGINT) AS q,
       CAST(month(o_orderdate) AS BIGINT) AS mon,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN isodow(o_orderdate) = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_monday
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
GROUP BY 1, 2, 3
"""


def cypher_apoc_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APOC-lite surface (round 3): the apoc.coll.* / apoc.text.* helpers
    a Neo4j migration leans on, mapped 1:1 to built-in JVM functions (no
    UDFs). apoc.text.split is regex-based and apoc.coll.indexOf keeps
    APOC's 0-based / -1-absent contract, both pinned by the oracle."""
    q = """MATCH (a:PhageGenome) WHERE a.source = 'SUPPLIER'
            WITH a, apoc.text.split(a.taxonomy, '[ #]') AS words
            RETURN a.accession AS acc,
                   apoc.text.join(apoc.coll.sort(words), '|') AS sorted_words,
                   size(apoc.coll.toSet(words)) AS n_distinct,
                   apoc.text.clean(a.taxonomy) AS cleaned,
                   apoc.coll.indexOf(apoc.coll.sort(words),
                                     apoc.coll.max(words)) AS max_ix;"""
    out = _engine(spark, sf_dir).run(q)
    return out.select(
        "acc", "sorted_words",
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "cleaned",
        F.col("max_ix").cast("long").alias("max_ix"),
    )


CYPHER_APOC_SQL = _CTE + """
, w AS (
    SELECT accession AS acc, taxonomy,
           string_split_regex(taxonomy, '[ #]') AS words
    FROM nodes WHERE source = 'SUPPLIER'
)
SELECT acc,
       array_to_string(list_sort(words), '|') AS sorted_words,
       CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
       regexp_replace(lower(taxonomy), '[^a-z0-9]', '', 'g') AS cleaned,
       CAST(list_position(list_sort(words), list_max(words)) - 1 AS BIGINT)
           AS max_ix
FROM w
"""


def cypher_mixed_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expressions AROUND aggregates (round 3): size(collect(x)),
    count(*) arithmetic, agg/agg division — Neo4j evaluates the enclosing
    expression over the aggregated row, with variable-rooted subtrees
    outside aggregates as implicit grouping keys. Compiles to ONE groupBy
    + one post-projection, no second shuffle."""
    q = """MATCH (a:PhageGenome)
            RETURN a.source AS src,
                   size(collect(a.accession)) AS n_collected,
                   count(*) * 2 AS n2,
                   sum(a.genome_size) / count(*) AS mean_sz;"""
    out = _engine(spark, sf_dir).run(q)
    return out.select(
        "src",
        F.col("n_collected").cast("long").alias("n_collected"),
        F.col("n2").cast("long").alias("n2"),
        F.col("mean_sz").cast("double").alias("mean_sz"),
    )


CYPHER_MIXED_AGG_SQL = _CTE + """
SELECT source AS src,
       CAST(COUNT(accession) AS BIGINT) AS n_collected,
       CAST(COUNT(*) * 2 AS BIGINT) AS n2,
       CAST(CAST(SUM(genome_size) AS BIGINT) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mean_sz
FROM nodes GROUP BY source
"""


def cypher_load_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOAD CSV under the driver contract (round 3): the nation table is
    exported to CSV, re-ingested through the Cypher clause (all columns
    STRING — the user casts, exactly Neo4j's contract), and aggregated.
    The oracle computes the same numbers from the original parquet, so a
    lossy export/ingest (quoting, separators, header handling) breaks the
    hash."""
    import hashlib
    import os
    import shutil
    import tempfile

    nation = t(spark, sf_dir, "nation")
    out = os.path.join(
        tempfile.gettempdir(),
        "pcgdb_csv_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    nation.select("n_nationkey", "n_name", "n_regionkey").coalesce(
        1
    ).write.option("header", True).csv(out)
    eng = CypherEngine(
        phage_catalog(
            _nodes(spark, sf_dir), graph_edges(spark, sf_dir),
            _infects(spark, sf_dir),
        )
    )
    q = """LOAD CSV WITH HEADERS FROM '{}' AS row
            WITH toInteger(row.n_regionkey) AS region,
                 toInteger(row.n_nationkey) AS key, row.n_name AS name
            RETURN region, count(*) AS n, sum(key) AS sum_keys,
                   apoc.text.join(apoc.coll.sort(collect(name)), '|') AS names
            ORDER BY region;""".format(out)
    res = eng.run(q)
    return res.select(
        F.col("region").cast("long").alias("region"),
        F.col("n").cast("long").alias("n"),
        F.col("sum_keys").cast("long").alias("sum_keys"),
        "names",
    )


CYPHER_LOAD_CSV_SQL = """
SELECT CAST(n_regionkey AS BIGINT) AS region,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_nationkey) AS BIGINT) AS sum_keys,
       array_to_string(list_sort(list(n_name)), '|') AS names
FROM nation GROUP BY n_regionkey
"""


def cypher_match_any_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unlabeled ``MATCH (n)`` — the union-over-all-labels binding (closes
    the last round-3 Cypher surface gap). Exercises the whole any-label
    path: the harmonized union bind, three-valued NULL property access
    across labels (Host rows have no genome_size), a runtime ``n:Host``
    label predicate, OPTIONAL MATCH expansion from an any-label anchor
    (the label restriction rides in the left join's condition so Host rows
    null-extend), and runtime ``labels(n)``."""
    q = """MATCH (n) WHERE n.genome_size >= 25 OR n:Host
           OPTIONAL MATCH (n)-[:infects]->(h:Host)
           RETURN labels(n)[0] AS label, count(*) AS n_rows,
                  count(h.genus) AS n_hosts, count(n.taxonomy) AS with_tax
           ORDER BY label;"""
    df = _engine(spark, sf_dir).run(q)
    return df.select(
        "label",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_hosts").cast("long").alias("n_hosts"),
        F.col("with_tax").cast("long").alias("with_tax"),
    )


CYPHER_MATCH_ANY_SQL = _CTE + """
, hosts AS (SELECT DISTINCT host_genus FROM infects),
anyn AS (
    SELECT 'PhageGenome' AS label, accession, taxonomy, genome_size
    FROM nodes
    UNION ALL
    SELECT 'Host', NULL, NULL, NULL FROM hosts
)
SELECT a.label AS label,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(i.host_genus) AS BIGINT) AS n_hosts,
       CAST(COUNT(a.taxonomy) AS BIGINT) AS with_tax
FROM anyn a
LEFT JOIN infects i ON a.label = 'PhageGenome' AND a.accession = i.src
WHERE a.genome_size >= 25 OR a.label = 'Host'
GROUP BY a.label
ORDER BY label
"""


def cypher_point_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian point()/point.distance() under the value oracle. The
    engine computes sqrt(dx*dx + dy*dy) over doubles — subtraction,
    multiplication, addition and sqrt are all IEEE-754 correctly-rounded
    in both JVM Spark and DuckDB, so writing the SAME operation order in
    the oracle SQL makes the doubles bit-identical (the wgs-84 haversine
    path stays unit-test-only: libm trig is not correctly rounded)."""
    q = """MATCH (a:PhageGenome)-[r:sharesDNA]->(b:PhageGenome)
           WHERE r.distance <= {}
           RETURN a.accession AS src, b.accession AS dst,
                  point.distance(point({{x: a.genome_size, y: 0}}),
                                 point({{x: b.genome_size,
                                         y: r.distance * 1000}})) AS dist;
        """.format(GRAPH_THRESHOLD)
    return _engine(spark, sf_dir).run(q)


CYPHER_POINT_DIST_SQL = _CTE + f"""
SELECT e.src AS src, e.dst AS dst,
       sqrt((CAST(na.genome_size AS DOUBLE) - CAST(nb.genome_size AS DOUBLE))
            * (CAST(na.genome_size AS DOUBLE) - CAST(nb.genome_size AS DOUBLE))
            + (0.0 - e.distance * 1000) * (0.0 - e.distance * 1000)) AS dist
FROM edges e
JOIN nodes na ON e.src = na.accession
JOIN nodes nb ON e.dst = nb.accession
WHERE e.distance <= {GRAPH_THRESHOLD}
"""


def cypher_untyped_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Untyped relationship pattern ``(p)-[r]->(x)`` — the union over
    every relationship type with runtime ``type(r)``/``labels(x)``, the
    classic Neo4j schema-exploration query. Exercises arm harmonization
    (infects carries no distance property → NULL placeholders counted by
    the oracle as absent) and the mixed-far-label union-node binding."""
    q = """MATCH (p:PhageGenome)-[r]->(x)
           RETURN type(r) AS rtype, labels(x)[0] AS far_label,
                  count(*) AS n, count(r.distance) AS with_dist
           ORDER BY rtype;"""
    df = _engine(spark, sf_dir).run(q)
    return df.select(
        "rtype", "far_label",
        F.col("n").cast("long").alias("n"),
        F.col("with_dist").cast("long").alias("with_dist"),
    )


CYPHER_UNTYPED_RELS_SQL = _CTE + """
, unioned AS (
    SELECT 'sharesDNA' AS rtype, 'PhageGenome' AS far_label, distance
    FROM edges
    UNION ALL
    SELECT 'infects', 'Host', NULL FROM infects
)
SELECT rtype, far_label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(distance) AS BIGINT) AS with_dist
FROM unioned GROUP BY rtype, far_label ORDER BY rtype
"""


def cypher_untyped_varlength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Untyped var-length ``-[*1..2]->`` — frontier expansion over the
    union of BOTH relationship types in composite 'label|key' coordinates,
    so a 2-hop walk crosses from the sharesDNA domain into infects→Host.
    Distinct-pairs semantics (the documented var-length deviation),
    grouped by the far endpoint's runtime label."""
    q = """MATCH (a:PhageGenome)-[*1..2]->(x)
           WHERE a.accession IN {}
           RETURN labels(x)[0] AS far_label, count(*) AS n
           ORDER BY far_label;""".format(_IN_LIST)
    df = _engine(spark, sf_dir).run(q)
    return df.select("far_label", F.col("n").cast("long").alias("n"))


CYPHER_UNTYPED_VARLEN_SQL = _CTE + f"""
, step AS (
    SELECT 'PhageGenome|' || src AS va, 'PhageGenome|' || dst AS vb
    FROM edges
    UNION ALL
    SELECT 'PhageGenome|' || src, 'Host|' || host_genus FROM infects
),
seeds AS (
    SELECT DISTINCT 'PhageGenome|' || accession AS s FROM nodes
    WHERE accession IN {_IN_SQL}
),
h1 AS (SELECT DISTINCT s AS va, vb FROM seeds JOIN step ON s = step.va),
h2 AS (SELECT DISTINCT h1.va, st.vb FROM h1 JOIN step st ON h1.vb = st.va),
reach AS (
    SELECT * FROM (SELECT * FROM h1 UNION SELECT * FROM h2)
    WHERE va <> vb
)
SELECT split_part(vb, '|', 1) AS far_label, CAST(COUNT(*) AS BIGINT) AS n
FROM reach GROUP BY far_label ORDER BY far_label
"""


ENTRIES = {
    "cypher_seed_expand": SuiteEntry(
        cypher_seed_expand, CYPHER_SEED_EXPAND_SQL, ("S2", "J1", "P2", "P3")
    ),
    "cypher_induced_in_list": SuiteEntry(
        cypher_induced_in_list, CYPHER_INDUCED_SQL, ("S2", "J3", "P5")
    ),
    "cypher_optional_host": SuiteEntry(
        cypher_optional_host, CYPHER_OPTIONAL_SQL, ("S2", "J4", "J5")
    ),
    "cypher_existential_collect": SuiteEntry(
        cypher_existential_collect, CYPHER_EXISTENTIAL_SQL, ("S2", "P8", "A1", "A2")
    ),
    "cypher_grouped_agg": SuiteEntry(
        cypher_grouped_agg, CYPHER_GROUPED_SQL, ("S2", "A6")
    ),
    "cypher_percentiles": SuiteEntry(
        cypher_percentiles, CYPHER_PERCENTILES_SQL, ("S2", "A6")
    ),
    "cypher_var_length_khop": SuiteEntry(
        cypher_var_length_khop, CYPHER_VAR_LENGTH_SQL, ("S2", "J2", "W6")
    ),
    "cypher_path_enumeration": SuiteEntry(
        cypher_path_enumeration, CYPHER_PATHS_SQL, ("S2", "J2", "W6")
    ),
    "cypher_chain_paths": SuiteEntry(
        cypher_chain_paths, CYPHER_CHAIN_SQL, ("S2", "J1", "J2", "W6")
    ),
    "cypher_exists_count_blocks": SuiteEntry(
        cypher_exists_count_blocks, CYPHER_EXISTS_COUNT_SQL, ("S2", "P8", "A6")
    ),
    "cypher_call_topk": SuiteEntry(
        cypher_call_topk, CYPHER_CALL_TOPK_SQL, ("S2", "W1", "W2")
    ),
    "cypher_shortest_paths": SuiteEntry(
        cypher_shortest_paths, CYPHER_SHORTEST_SQL, ("S2", "J2", "W6")
    ),
    "cypher_weighted_paths": SuiteEntry(
        cypher_weighted_paths, CYPHER_WEIGHTED_SQL, ("S2", "J2", "V8", "W6")
    ),
    "cypher_union_sources": SuiteEntry(
        cypher_union_sources, CYPHER_UNION_SQL, ("S2", "A3")
    ),
    "cypher_quantified_paths": SuiteEntry(
        cypher_quantified_paths, CYPHER_QUANTIFIED_SQL, ("S2", "J2", "V8")
    ),
    "cypher_optional_shortest": SuiteEntry(
        cypher_optional_shortest, CYPHER_OPTIONAL_SHORTEST_SQL,
        ("S2", "J4", "J2", "W6")
    ),
    "cypher_entity_functions": SuiteEntry(
        cypher_entity_functions, CYPHER_ENTITY_FUNCS_SQL, ("S2", "V8")
    ),
    "cypher_topk_order_limit": SuiteEntry(
        cypher_topk_order_limit, CYPHER_TOPK_SQL, ("S2", "W1")
    ),
    "cypher_unwind_case": SuiteEntry(
        cypher_unwind_case, CYPHER_UNWIND_CASE_SQL, ("S2", "V1", "A1")
    ),
    "cypher_merge_upsert_nodes": SuiteEntry(
        cypher_merge_upsert_nodes, CYPHER_MERGE_UPSERT_SQL, ("S2", "J7", "A4")
    ),
    "cypher_set_property": SuiteEntry(
        cypher_set_property, CYPHER_SET_SQL, ("S2", "V8")
    ),
    "cypher_detach_delete": SuiteEntry(
        cypher_detach_delete, CYPHER_DETACH_DELETE_SQL, ("S2", "J7", "P5")
    ),
    "cypher_create_edges": SuiteEntry(
        cypher_create_edges, CYPHER_CREATE_EDGES_SQL, ("S2", "S7")
    ),
    "cypher_remove_property": SuiteEntry(
        cypher_remove_property, CYPHER_REMOVE_SQL, ("S2", "V8")
    ),
    "cypher_merge_return": SuiteEntry(
        cypher_merge_return, CYPHER_MERGE_RETURN_SQL, ("S2", "J7", "A4")
    ),
    "cypher_delete_nodes": SuiteEntry(
        cypher_delete_nodes, CYPHER_DELETE_NODES_SQL, ("S2", "P8", "J7")
    ),
    "cypher_delete_untyped_rels": SuiteEntry(
        cypher_delete_untyped_rels, CYPHER_DELETE_UNTYPED_SQL, ("S2", "J7")
    ),
    "cypher_untyped_anon_midpoint": SuiteEntry(
        cypher_untyped_anon_midpoint, CYPHER_ANON_MID_SQL, ("S2", "J2", "J1")
    ),
    "cypher_gds_pagerank": SuiteEntry(
        cypher_gds_pagerank, CYPHER_GDS_PAGERANK_SQL, ("S2", "W6")
    ),
    "cypher_foreach_ingest": SuiteEntry(
        cypher_foreach_ingest, CYPHER_FOREACH_SQL, ("S2", "J7", "A4")
    ),
    "cypher_set_map_props": SuiteEntry(
        cypher_set_map_props, CYPHER_SET_MAP_SQL, ("S2", "V8", "V2")
    ),
    "cypher_pattern_comprehension": SuiteEntry(
        cypher_pattern_comprehension, CYPHER_PATTERN_COMP_SQL, ("S2", "A1", "J1")
    ),
    "cypher_star_projection": SuiteEntry(
        cypher_star_projection, CYPHER_STAR_SQL, ("S2", "P6")
    ),
    "cypher_list_slicing": SuiteEntry(
        cypher_list_slicing, CYPHER_LIST_SLICE_SQL, ("S2", "V8", "A1")
    ),
    "cypher_map_projection": SuiteEntry(
        cypher_map_projection, CYPHER_MAP_PROJ_SQL, ("S2", "V8", "V2")
    ),
    "cypher_math_functions": SuiteEntry(
        cypher_math_functions, CYPHER_MATH_SQL, ("S2", "V8", "V4")
    ),
    "cypher_temporal_orders": SuiteEntry(
        cypher_temporal_orders, CYPHER_TEMPORAL_SQL, ("S2", "V8", "A6")
    ),
    "cypher_apoc_lite": SuiteEntry(
        cypher_apoc_lite, CYPHER_APOC_SQL, ("S2", "V8")
    ),
    "cypher_mixed_aggregates": SuiteEntry(
        cypher_mixed_aggregates, CYPHER_MIXED_AGG_SQL, ("S2", "A6", "A1")
    ),
    "cypher_load_csv": SuiteEntry(
        cypher_load_csv, CYPHER_LOAD_CSV_SQL, ("S2", "S4", "V8")
    ),
    "cypher_match_any_node": SuiteEntry(
        cypher_match_any_node, CYPHER_MATCH_ANY_SQL, ("S2", "J4", "A6")
    ),
    "cypher_point_distance": SuiteEntry(
        cypher_point_distance, CYPHER_POINT_DIST_SQL, ("S2", "V8", "V4")
    ),
    "cypher_untyped_relationships": SuiteEntry(
        cypher_untyped_relationships, CYPHER_UNTYPED_RELS_SQL,
        ("S2", "J1", "A6")
    ),
    "cypher_untyped_varlength": SuiteEntry(
        cypher_untyped_varlength, CYPHER_UNTYPED_VARLEN_SQL,
        ("S2", "W6", "A6")
    ),
}


# --------------------------------------------------------------------------
# CALL gds.*.stream round-5 surface (VERDICT r4 ask #3): each proc shares
# its oracle with the DataFrame twin — sourceNodes pins the same root set,
# the catalog carries the same (thresholded) projection, and zero-padded
# string keys keep lexicographic MIN/canonical ordering equal to the
# twins' numeric one where the twin graph is integer-keyed.
# --------------------------------------------------------------------------

from phageclouds_graphdatabase_spark.cypher import RelTable
from phageclouds_graphdatabase_spark.plans import suite_extensions as _ext
from phageclouds_graphdatabase_spark.plans import suite_pipeline as _pipe


def _engine_sp_thresh(spark: SparkSession, sf_dir: str) -> CypherEngine:
    """Same derived property graph as _engine_sp but with the sharesDNA
    relationship THRESHOLDED (distance <= GRAPH_THRESHOLD) — the
    projection the graph-suite DataFrame twins run on, so gds procs over
    this catalog share those twins' oracle SQL."""
    return CypherEngine(
        phage_catalog(
            _nodes(spark, sf_dir),
            graph_edges(spark, sf_dir, GRAPH_THRESHOLD),
            _infects(spark, sf_dir),
        ),
        spark,
    )


def cypher_gds_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL gds.closeness.harmonic.stream (round 5) — sampled harmonic
    centrality through the Cypher frontend: sourceNodes pins the SAME
    deterministic ECONOMY %64 root sample as graph_harmonic_centrality,
    so the proc shares that twin's unrolled BFS oracle (minus the
    n_reached column the proc does not emit)."""
    seeds = [
        r.id
        for r in t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "ECONOMY") & (F.col("p_partkey") % 64 == 1))
        .select(F.concat(F.lit("P"), F.col("p_partkey")).alias("id"))
        .distinct()
        .collect()
    ]
    q = ("CALL gds.closeness.harmonic.stream('sharesDNA', "
         "{sourceNodes: $seeds, maxDepth: 3}) "
         "YIELD nodeId AS id, score AS h6 RETURN id, h6")
    return _engine_sp_thresh(spark, sf_dir).run(q, params={"seeds": seeds})


CYPHER_GDS_HARMONIC_SQL = (
    "SELECT id, h6 FROM (" + _ext.GRAPH_HARMONIC_SQL + ") z"
)


def cypher_gds_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL gds.closeness.stream (round 7) — sampled raw closeness through
    the Cypher frontend: sourceNodes pins the SAME deterministic ECONOMY
    %64 root sample as graph_closeness_centrality, so the proc shares
    that twin's unrolled BFS oracle (minus the n_reached/sum_d component
    columns the proc does not emit)."""
    seeds = [
        r.id
        for r in t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "ECONOMY") & (F.col("p_partkey") % 64 == 1))
        .select(F.concat(F.lit("P"), F.col("p_partkey")).alias("id"))
        .distinct()
        .collect()
    ]
    q = ("CALL gds.closeness.stream('sharesDNA', "
         "{sourceNodes: $seeds, maxDepth: 3}) "
         "YIELD nodeId AS id, score AS closeness_scaled "
         "RETURN id, closeness_scaled")
    return _engine_sp_thresh(spark, sf_dir).run(q, params={"seeds": seeds})


CYPHER_GDS_CLOSENESS_SQL = (
    "SELECT id, closeness_scaled FROM ("
    + _ext.GRAPH_CLOSENESS_SQL
    + ") z"
)


def cypher_gds_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL gds.louvain.stream (round 7) — the deterministic bounded
    synchronous Louvain refinement through the Cypher frontend; shares
    graph_louvain's 2-round unrolled oracle."""
    q = ("CALL gds.louvain.stream('sharesDNA', {maxIterations: 2}) "
         "YIELD nodeId AS id, communityId AS label RETURN id, label")
    return _engine_sp_thresh(spark, sf_dir).run(q)


CYPHER_GDS_LOUVAIN_SQL = _ext.GRAPH_LOUVAIN_SQL


def cypher_gds_scaleprops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL gds.scaleProperties.stream (round 7) — StdScore scaling of
    genome_size through the Cypher frontend (exact-integer numerator,
    one correctly-rounded sqrt + division, hash-stable)."""
    q = ("CALL gds.scaleProperties.stream('sharesDNA', "
         "{nodeProperties: ['genome_size'], scaler: 'StdScore'}) "
         "YIELD nodeId AS id, scaledProperty AS scaled RETURN id, scaled")
    return _engine_sp_thresh(spark, sf_dir).run(q)


CYPHER_GDS_SCALEPROPS_SQL = """
WITH props AS (
    SELECT 'P' || p_partkey AS id, CAST(p_size AS BIGINT) AS value FROM part
    UNION ALL
    SELECT 'S' || s_suppkey, CAST(s_nationkey AS BIGINT) FROM supplier
),
st AS (
    SELECT CAST(SUM(value) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(value * value) AS q
    FROM props
)
SELECT id,
       CASE WHEN st.n * st.q - st.s * st.s > 0
            THEN CAST(value * st.n - st.s AS DOUBLE)
                 / SQRT(CAST(st.n * st.q - st.s * st.s AS DOUBLE))
            ELSE 0.0 END AS scaled
FROM props, st
"""


def cypher_gds_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL gds.knn.stream (round 7) — exact 1-D KNN over the catalog's
    genome_size node property (p_size for P nodes, s_nationkey for S
    nodes — heavy ties across both) through the Cypher frontend."""
    q = ("CALL gds.knn.stream('sharesDNA', "
         "{nodeProperties: ['genome_size'], topK: 5}) "
         "YIELD node1, node2, similarity RETURN node1, node2, similarity")
    return _engine_sp_thresh(spark, sf_dir).run(q)


CYPHER_GDS_KNN_SQL = """
WITH props AS (
    SELECT 'P' || p_partkey AS id, CAST(p_size AS BIGINT) AS value FROM part
    UNION ALL
    SELECT 'S' || s_suppkey, CAST(s_nationkey AS BIGINT) FROM supplier
),
pos AS (
    SELECT id, value,
           CAST(row_number() OVER (ORDER BY value, id) AS BIGINT) AS pos
    FROM props
),
cand AS (
    SELECT a.id AS id1, a.value AS v1, b.id AS id2, b.value AS v2,
           abs(a.pos - b.pos) AS posdist
    FROM pos a JOIN pos b
      ON b.pos BETWEEN a.pos - 5 AND a.pos + 5 AND b.pos <> a.pos
),
r AS (
    SELECT id1, id2, abs(v1 - v2) AS diff, posdist,
           row_number() OVER (PARTITION BY id1
                              ORDER BY abs(v1 - v2) ASC, posdist ASC,
                                       id2 ASC) AS rn
    FROM cand
)
SELECT id1 AS node1, id2 AS node2,
       CAST(1000000 // (1 + diff) AS BIGINT) AS similarity
FROM r WHERE rn <= 5
"""


def cypher_gds_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.pageRank.stream with sourceNodes (round 5) — the GDS
    personalization convention compiled to personalized_pagerank_scaled;
    seeds = the full ECONOMY sample graph_personalized_pagerank uses, so
    the oracle is that twin's unrolled 2-iteration SQL verbatim."""
    from phageclouds_graphdatabase_spark.plans._suite_helpers import (
        graph_seeds,
    )

    seeds = [r.id for r in graph_seeds(spark, sf_dir).collect()]
    q = ("CALL gds.pageRank.stream('sharesDNA', "
         "{sourceNodes: $seeds, maxIterations: 2}) "
         "YIELD nodeId AS id, score AS pr_scaled "
         "WHERE pr_scaled > 0 RETURN id, pr_scaled")
    return _engine_sp_thresh(spark, sf_dir).run(q, params={"seeds": seeds})


def cypher_gds_articlerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.articleRank.stream (round 6): avg-out-degree-damped PageRank
    through the proc surface — shares graph_article_rank's unrolled
    2-iteration SQL verbatim (avg_od = |E| div |V| in both engines)."""
    q = ("CALL gds.articleRank.stream('sharesDNA', {maxIterations: 2}) "
         "YIELD nodeId AS id, score AS ar_scaled RETURN id, ar_scaled")
    return _engine_sp_thresh(spark, sf_dir).run(q)


def cypher_gds_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.eigenvector.stream (round 6): the fixed-iteration integer
    power step through the proc surface — shares graph_eigenvector's
    unrolled SQL (documented divergence from GDS's per-round L2
    normalization: identical ranks, scaled values)."""
    q = ("CALL gds.eigenvector.stream('sharesDNA', {maxIterations: 2}) "
         "YIELD nodeId AS id, score AS eig_scaled RETURN id, eig_scaled")
    return _engine_sp_thresh(spark, sf_dir).run(q)


def cypher_gds_fastrp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.fastRP.stream (round 5): integer FastRP embeddings through the
    proc surface — embeddingDimension/maxIterations map onto the twin's
    dims=8/iters=2, the embedding array renders through arr_str exactly
    like graph_fastrp_embeddings, so the twin's SQL is the oracle."""
    q = ("CALL gds.fastRP.stream('sharesDNA', "
         "{embeddingDimension: 8, maxIterations: 2}) "
         "YIELD nodeId AS id, embedding RETURN id, embedding")
    out = _engine_sp_thresh(spark, sf_dir).run(q)
    return out.select("id", arr_str("embedding").alias("emb"))


def cypher_gds_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.scc.stream (round 5) over the same synthetic directed doc
    graph as graph_scc. Keys are zero-padded to 9 digits BEFORE entering
    the catalog: the proc's componentId is MIN(node key) as a string, and
    padding makes lexicographic MIN coincide with the oracle's numeric
    MIN; both columns cast back to long for the comparison."""
    docs = t(spark, sf_dir, "documents")
    m = docs.agg((F.max("doc_id") + F.lit(1)).alias("m"))
    base = docs.select("doc_id").crossJoin(F.broadcast(m))
    pad = lambda c: F.format_string("%09d", c)  # noqa: E731
    e1 = base.select(
        pad(F.col("doc_id")).alias("src"),
        pad(F.pmod(F.col("doc_id") * F.col("doc_id") + 1, F.col("m"))).alias(
            "dst"
        ),
    )
    e2 = base.filter(F.col("doc_id") % 7 == 0).select(
        pad(F.col("doc_id")).alias("src"),
        pad(F.pmod(F.col("doc_id") * 17 + 3, F.col("m"))).alias("dst"),
    )
    cat = GraphCatalog(
        {"Doc": NodeTable(docs.select(pad(F.col("doc_id")).alias("id")), "id")},
        {"links": RelTable(e1.unionByName(e2), "src", "dst", "Doc", "Doc")},
    )
    out = CypherEngine(cat, spark).run(
        "CALL gds.scc.stream('links') YIELD nodeId, componentId "
        "RETURN nodeId, componentId"
    )
    return out.select(
        F.col("nodeId").cast("long").alias("id"),
        F.col("componentId").cast("long").alias("scc"),
    )


def cypher_gds_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.kcore.stream (upgraded round 6): FULL core-value decomposition
    — stock GDS semantics, retiring the round-5 given-k divergence. The
    proc runs the h-index iteration to the fixpoint and shares
    graph_core_decomposition's 8-round-unrolled SQL (measured
    convergence 5/6 updates at sf0.001/sf0.01; fixpoint rounds are
    no-ops)."""
    q = ("CALL gds.kcore.stream('sharesDNA') "
         "YIELD nodeId AS id, coreValue AS core RETURN id, core")
    return _engine_sp_thresh(spark, sf_dir).run(q)


def cypher_gds_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.ktruss.stream (round 5) on the same-brand adjacent-size part
    graph as graph_ktruss — zero-padded keys keep the canonical (a, b)
    string ordering identical to the twin's numeric a < b, so its
    2-round-unrolled SQL is the oracle after casting back to long."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    pad = lambda c: F.format_string("%09d", c)  # noqa: E731
    x, y = p.alias("x"), p.alias("y")
    e = x.join(
        y,
        (F.col("x.p_brand") == F.col("y.p_brand"))
        & (F.abs(F.col("x.p_size") - F.col("y.p_size")) <= 1)
        & (F.col("x.p_partkey") < F.col("y.p_partkey")),
    ).select(
        pad(F.col("x.p_partkey")).alias("src"),
        pad(F.col("y.p_partkey")).alias("dst"),
    )
    cat = GraphCatalog(
        {"Part": NodeTable(p.select(pad(F.col("p_partkey")).alias("id")), "id")},
        {"similarTo": RelTable(e, "src", "dst", "Part", "Part")},
    )
    out = CypherEngine(cat, spark).run(
        "CALL gds.ktruss.stream('similarTo', {k: 4, rounds: 2}) "
        "YIELD sourceNodeId, targetNodeId, support "
        "RETURN sourceNodeId, targetNodeId, support"
    )
    return out.select(
        F.col("sourceNodeId").cast("long").alias("a"),
        F.col("targetNodeId").cast("long").alias("b"),
        F.col("support").cast("long").alias("support"),
    )


def cypher_gds_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.labelPropagation.stream (round 5): the deterministic
    synchronous 2-round label propagation through the proc surface,
    sharing graph_label_propagation's round-unrolled SQL (same
    most-frequent-label / smallest-label tie-break)."""
    q = ("CALL gds.labelPropagation.stream('sharesDNA', "
         "{maxIterations: 2}) "
         "YIELD nodeId AS id, communityId AS label RETURN id, label")
    return _engine_sp_thresh(spark, sf_dir).run(q)


def cypher_gds_trianglecount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.triangleCount.stream (round 5) on the same supplier co-supply
    graph as graph_triangle_counts — both route through
    operators/graph.py triangle_counts, so the twin's canonical-3-join
    SQL is the oracle verbatim."""
    cat = _cosupply_catalog(spark, sf_dir)
    out = CypherEngine(cat, spark).run(
        "CALL gds.triangleCount.stream('coSupplies') "
        "YIELD nodeId AS id, triangleCount AS n_triangles "
        "RETURN id, n_triangles"
    )
    return out


def cypher_gds_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.localClusteringCoefficient.stream (round 5), sharing
    graph_clustering_coefficient's SQL projected to the two columns the
    proc yields (lcc doubles are exact-int ratios — correctly-rounded
    identically in both engines)."""
    cat = _cosupply_catalog(spark, sf_dir)
    return CypherEngine(cat, spark).run(
        "CALL gds.localClusteringCoefficient.stream('coSupplies') "
        "YIELD nodeId AS id, localClusteringCoefficient AS lcc "
        "RETURN id, lcc"
    )


def cypher_gds_nodesim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.nodeSimilarity.stream (round 5): out-neighbor Jaccard top-k
    through the proc surface (config {topK: 10} = the GDS default the
    twin uses), sharing graph_node_similarity's SQL projected to the
    (nodeId1, nodeId2, similarity) triple."""
    q = ("CALL gds.nodeSimilarity.stream('sharesDNA', {topK: 10}) "
         "YIELD nodeId1 AS a, nodeId2 AS b, similarity AS jaccard "
         "RETURN a, b, jaccard")
    return _engine_sp_thresh(spark, sf_dir).run(q)


def cypher_gds_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.bfs.stream (round 6): level-synchronous multi-source BFS
    through the proc surface — (sourceNodeId, nodeId, level) rows
    instead of stock GDS's path-shaped single-source yield (documented
    divergence). Roots pin graph_harmonic_centrality's ECONOMY %64
    sample, so the oracle is that twin's 3-level unrolled BFS projected
    to per-(root, id) rows instead of the harmonic aggregate."""
    seeds = [
        r.id
        for r in t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "ECONOMY") & (F.col("p_partkey") % 64 == 1))
        .select(F.concat(F.lit("P"), F.col("p_partkey")).alias("id"))
        .distinct()
        .collect()
    ]
    q = ("CALL gds.bfs.stream('sharesDNA', "
         "{sourceNodes: $seeds, maxDepth: 3}) "
         "YIELD sourceNodeId AS src, nodeId AS id, level "
         "RETURN src, id, level")
    return _engine_sp_thresh(spark, sf_dir).run(q, params={"seeds": seeds})


CYPHER_GDS_BFS_SQL = f"""
WITH edges AS ({GRAPH_EDGES_SQL}),
und AS (
    SELECT src, dst FROM edges WHERE distance <= {GRAPH_THRESHOLD}
    UNION
    SELECT dst AS src, src AS dst FROM edges WHERE distance <= {GRAPH_THRESHOLD}
),
r0 AS (SELECT id AS root, id FROM (
    SELECT DISTINCT 'P' || p_partkey AS id FROM part
    WHERE p_type = 'ECONOMY' AND p_partkey % 64 = 1)),
l1 AS (
    SELECT DISTINCT r.root, u.dst AS id
    FROM r0 r JOIN und u ON u.src = r.id
    WHERE u.dst <> r.root
),
l2 AS (
    SELECT DISTINCT l1.root, u.dst AS id
    FROM l1 JOIN und u ON u.src = l1.id
    WHERE u.dst <> l1.root
      AND NOT EXISTS (SELECT 1 FROM l1 z WHERE z.root = l1.root AND z.id = u.dst)
),
l3 AS (
    SELECT DISTINCT l2.root, u.dst AS id
    FROM l2 JOIN und u ON u.src = l2.id
    WHERE u.dst <> l2.root
      AND NOT EXISTS (SELECT 1 FROM l1 z WHERE z.root = l2.root AND z.id = u.dst)
      AND NOT EXISTS (SELECT 1 FROM l2 z WHERE z.root = l2.root AND z.id = u.dst)
)
SELECT root AS src, id, CAST(1 AS BIGINT) AS level FROM l1
UNION ALL SELECT root, id, 2 FROM l2
UNION ALL SELECT root, id, 3 FROM l3
"""


def cypher_gds_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.modularity.stream (round 6): per-community modularity over the
    deterministic 2-round LP assignment ({maxIterations: 2} — the engine
    extension; stock GDS reads a precomputed communityProperty, also
    supported). Shares graph_community_quality's SQL projected to the
    two yielded columns."""
    q = ("CALL gds.modularity.stream('sharesDNA', {maxIterations: 2}) "
         "YIELD communityId AS community, modularity "
         "RETURN community, modularity")
    return _engine_sp_thresh(spark, sf_dir).run(q)


def cypher_gds_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.conductance.stream (round 6): per-community conductance
    φ_c = cut_c / min(vol_c, 2m − vol_c) over the same LP assignment,
    sharing the community-quality SQL."""
    q = ("CALL gds.conductance.stream('sharesDNA', {maxIterations: 2}) "
         "YIELD community, conductance RETURN community, conductance")
    return _engine_sp_thresh(spark, sf_dir).run(q)


CYPHER_GDS_MODULARITY_SQL = (
    "SELECT community, modularity FROM ("
    + _ext.GRAPH_COMMUNITY_QUALITY_SQL
    + ") z"
)

CYPHER_GDS_CONDUCTANCE_SQL = (
    "SELECT community, conductance FROM ("
    + _ext.GRAPH_COMMUNITY_QUALITY_SQL
    + ") z"
)


def cypher_gds_wcc_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.wcc.stream with a relationship-weight bound (round 6): the
    reference's CLOUD is exactly wcc(distance <= t) (reference
    README.md:3), so the weighted proc over the UNTHRESHOLDED catalog
    with {relationshipWeightProperty: 'distance', maxDistance: t} must
    reproduce it — the maxDistance knob (engine extension; stock GDS's
    `threshold` keeps weight > t, also supported) does the filtering
    inside the proc, not the catalog. Oracle: recursive min-label
    closure over the thresholded full graph (subqueries inlined — the
    DuckDB WITH RECURSIVE sibling-CTE hazard)."""
    q = ("CALL gds.wcc.stream('sharesDNA', "
         "{relationshipWeightProperty: 'distance', "
         f"maxDistance: {GRAPH_THRESHOLD}}}) "
         "YIELD nodeId AS id, componentId AS component "
         "RETURN id, component")
    return _engine_sp(spark, sf_dir).run(q)


def cypher_gds_graph_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stock-GDS graph-catalog call sequence (round 8 — VERDICT r7 ask
    #4): project once, filter once, stream against the NAME —
    gds.graph.project registers the sharesDNA projection WITH its
    distance property, gds.graph.filter derives the thresholded reusable
    projection (the reference's repeated per-query ``r.distance <= t``,
    /root/reference/phageclouds_gdb.py:57,67), and gds.wcc.stream takes
    the graph name where it takes a relationship type. Value-identical to
    cypher_gds_wcc_threshold (same oracle): the projection IS the
    threshold, hoisted out of the proc config."""
    eng = _engine_sp(spark, sf_dir)
    eng.run("CALL gds.graph.project('phages', 'PhageGenome', 'sharesDNA')")
    eng.run(
        "CALL gds.graph.filter('phagesT', 'phages', '*', "
        f"'r.distance <= {GRAPH_THRESHOLD}')"
    )
    return eng.run(
        "CALL gds.wcc.stream('phagesT') "
        "YIELD nodeId AS id, componentId AS component RETURN id, component"
    )


_FE_SUB = (
    f"(SELECT src, dst FROM ({GRAPH_EDGES_SQL}) _e "
    f"WHERE distance <= {GRAPH_THRESHOLD})"
)

CYPHER_GDS_WCC_THRESHOLD_SQL = f"""
WITH RECURSIVE reach(id, nbr) AS (
    SELECT id, id FROM (
        SELECT src AS id FROM {_FE_SUB} f1
        UNION
        SELECT dst FROM {_FE_SUB} f2
    ) n
    UNION
    SELECT r.id, u.b
    FROM reach r JOIN (
        SELECT src AS a, dst AS b FROM {_FE_SUB} f3
        UNION
        SELECT dst AS a, src AS b FROM {_FE_SUB} f4
    ) u ON r.nbr = u.a
)
SELECT id, MIN(nbr) AS component FROM reach GROUP BY id
"""


def cypher_gds_randomwalk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.randomWalk.stream (round 6): the deterministic md5-argmin
    DeepWalk corpus through the proc surface — walkLength counts STEPS
    (documented divergence from GDS's node count, which also uses a
    seeded RNG the engine deliberately avoids for cross-engine
    reproducibility). Config {walkLength: 3, walksPerNode: 2} replays
    graph_random_walks, whose unrolled SQL is the oracle after the walk
    array renders through arr_str."""
    q = ("CALL gds.randomWalk.stream('sharesDNA', "
         "{walkLength: 3, walksPerNode: 2}) "
         "YIELD start, walkId AS wid, nodeIds RETURN start, wid, nodeIds")
    out = _engine_sp_thresh(spark, sf_dir).run(q)
    return out.select("start", "wid", arr_str("nodeIds").alias("walk"))


def cypher_gds_nodesim_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.nodeSimilarity.stream with similarityMetric: 'COSINE'
    (round 6 — the stock-GDS metric knob): score = inter / sqrt(da·db).
    da·db is an exact long and sqrt/division are IEEE correctly rounded,
    so the doubles hash-match the shared metric-template SQL."""
    q = ("CALL gds.nodeSimilarity.stream('sharesDNA', "
         "{topK: 10, similarityMetric: 'COSINE'}) "
         "YIELD nodeId1 AS a, nodeId2 AS b, similarity AS cosine "
         "RETURN a, b, cosine")
    return _engine_sp_thresh(spark, sf_dir).run(q)


def cypher_gds_dijkstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.allShortestPaths.dijkstra.stream (round 5): hop-bounded
    multi-source weighted SSSP through the proc surface — sourceNodes
    pins graph_cheapest_paths' ECONOMY %20 seed set and
    relationshipWeightProperty/scale/maxDepth replay its exact
    integer-scaled Bellman-Ford, so that twin's three-round unrolled SQL
    is the oracle verbatim."""
    seeds = [
        r.id
        for r in t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "ECONOMY") & (F.col("p_partkey") % 20 == 0))
        .select(F.concat(F.lit("P"), F.col("p_partkey")).alias("id"))
        .distinct()
        .collect()
    ]
    q = ("CALL gds.allShortestPaths.dijkstra.stream('sharesDNA', "
         "{sourceNodes: $seeds, maxDepth: 3, scale: 10000.0, "
         "relationshipWeightProperty: 'distance'}) "
         "YIELD sourceNodeId AS src, targetNodeId AS dst, "
         "totalCost AS cost RETURN src, dst, cost")
    return _engine_sp_thresh(spark, sf_dir).run(q, params={"seeds": seeds})


def _cosupply_catalog(spark: SparkSession, sf_dir: str) -> GraphCatalog:
    """Supplier co-supply projection (S_i — S_j iff both supply a part)
    as a one-relationship catalog — the graph the triangle-family twins
    measure; 'S<k>' string keys compare identically in both engines (the
    twins' SQL uses the same 'S' || l_suppkey strings)."""
    li = t(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("p"),
        F.concat(F.lit("S"), F.col("l_suppkey")).alias("s"),
    ).distinct()
    e = (
        ps.alias("x")
        .join(ps.alias("y"), "p")
        .filter(F.col("x.s") < F.col("y.s"))
        .select(F.col("x.s").alias("src"), F.col("y.s").alias("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    return GraphCatalog(
        {"Supplier": NodeTable(nodes, "id")},
        {"coSupplies": RelTable(e, "src", "dst", "Supplier", "Supplier")},
    )


CYPHER_GDS_LCC_SQL = (
    "SELECT id, lcc FROM (" + _pipe.GRAPH_LCC_SQL + ") z"
)

CYPHER_GDS_NODESIM_SQL = (
    "SELECT a, b, jaccard FROM (" + _pipe.GRAPH_NODE_SIM_SQL + ") z"
)

CYPHER_GDS_NODESIM_COSINE_SQL = (
    "SELECT a, b, cosine FROM (" + _pipe.GRAPH_NODE_SIM_COSINE_SQL + ") z"
)


ENTRIES.update({
    "cypher_gds_labelprop": SuiteEntry(
        cypher_gds_labelprop, _ext.GRAPH_LABEL_PROP_SQL, ("S2", "W6")
    ),
    "cypher_gds_trianglecount": SuiteEntry(
        cypher_gds_trianglecount, _pipe.GRAPH_TRIANGLES_SQL, ("S2", "J1", "W6")
    ),
    "cypher_gds_lcc": SuiteEntry(
        cypher_gds_lcc, CYPHER_GDS_LCC_SQL, ("S2", "J1", "W6")
    ),
    "cypher_gds_nodesim": SuiteEntry(
        cypher_gds_nodesim, CYPHER_GDS_NODESIM_SQL, ("S2", "W6", "W5")
    ),
    "cypher_gds_nodesim_cosine": SuiteEntry(
        cypher_gds_nodesim_cosine, CYPHER_GDS_NODESIM_COSINE_SQL,
        ("S2", "W6", "W5"),
    ),
    "cypher_gds_randomwalk": SuiteEntry(
        cypher_gds_randomwalk, _ext.GRAPH_WALKS_SQL, ("S2", "W6", "W5")
    ),
    "cypher_gds_wcc_threshold": SuiteEntry(
        cypher_gds_wcc_threshold, CYPHER_GDS_WCC_THRESHOLD_SQL, ("S2", "W6")
    ),
    "cypher_gds_bfs": SuiteEntry(
        cypher_gds_bfs, CYPHER_GDS_BFS_SQL, ("S2", "W6", "J2")
    ),
    "cypher_gds_modularity": SuiteEntry(
        cypher_gds_modularity, CYPHER_GDS_MODULARITY_SQL, ("S2", "W6", "A6")
    ),
    "cypher_gds_conductance": SuiteEntry(
        cypher_gds_conductance, CYPHER_GDS_CONDUCTANCE_SQL, ("S2", "W6", "A6")
    ),
    "cypher_gds_dijkstra": SuiteEntry(
        cypher_gds_dijkstra, _ext.GRAPH_CHEAPEST_SQL, ("S2", "W6", "J2")
    ),
})


ENTRIES.update({
    "cypher_gds_harmonic": SuiteEntry(
        cypher_gds_harmonic, CYPHER_GDS_HARMONIC_SQL, ("S2", "W6", "A6")
    ),
    "cypher_gds_closeness": SuiteEntry(
        cypher_gds_closeness, CYPHER_GDS_CLOSENESS_SQL, ("S2", "W6", "A6")
    ),
    "cypher_gds_knn": SuiteEntry(
        cypher_gds_knn, CYPHER_GDS_KNN_SQL, ("S2", "W5", "W2")
    ),
    "cypher_gds_louvain": SuiteEntry(
        cypher_gds_louvain, CYPHER_GDS_LOUVAIN_SQL, ("S2", "W6", "A6")
    ),
    "cypher_gds_scaleprops": SuiteEntry(
        cypher_gds_scaleprops, CYPHER_GDS_SCALEPROPS_SQL, ("S2", "V4", "A6")
    ),
    "cypher_gds_ppr": SuiteEntry(
        cypher_gds_ppr, _ext.GRAPH_PPR_SQL, ("S2", "W6")
    ),
    "cypher_gds_articlerank": SuiteEntry(
        cypher_gds_articlerank, _ext.GRAPH_ARTICLE_RANK_SQL, ("S2", "W6")
    ),
    "cypher_gds_eigenvector": SuiteEntry(
        cypher_gds_eigenvector, _ext.GRAPH_EIGENVECTOR_SQL, ("S2", "W6")
    ),
    "cypher_gds_fastrp": SuiteEntry(
        cypher_gds_fastrp, _ext.GRAPH_FASTRP_SQL, ("S2", "W6", "W5")
    ),
    "cypher_gds_scc": SuiteEntry(
        cypher_gds_scc, _ext.GRAPH_SCC_SQL, ("S2", "W6")
    ),
    "cypher_gds_kcore": SuiteEntry(
        cypher_gds_kcore, _ext.GRAPH_CORE_DECOMP_SQL, ("S2", "W6")
    ),
    "cypher_gds_ktruss": SuiteEntry(
        cypher_gds_ktruss, _pipe.GRAPH_KTRUSS_SQL, ("S2", "J1", "W6")
    ),
})


ENTRIES.update({
    # round 8: the gds.graph.project/filter catalog sequence — the
    # reusable thresholded projection (same oracle as wcc_threshold:
    # the projection IS the threshold)
    "cypher_gds_graph_project": SuiteEntry(
        cypher_gds_graph_project, CYPHER_GDS_WCC_THRESHOLD_SQL, ("S2", "W6")
    ),
})


def cypher_gds_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL gds.alpha.hits.stream (round 8) — HITS hubs/authorities over
    the thresholded sharesDNA projection through the Cypher frontend;
    RETURN aliases nodeId back to id so the DataFrame twin's oracle
    (suite_extensions.GRAPH_HITS_SQL) applies verbatim."""
    q = ("CALL gds.alpha.hits.stream('sharesDNA', {hitsIterations: 2}) "
         "YIELD nodeId, auth, hub RETURN nodeId AS id, auth, hub")
    return _engine_sp_thresh(spark, sf_dir).run(q)


def cypher_gds_toposort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL gds.dag.topologicalSort.stream (round 8) on the natural P→S
    direction of the thresholded sharesDNA projection — a depth-1 DAG
    (parts are sources, suppliers sinks), so the oracle is the closed
    form: dist 0 for never-a-dst nodes, 1 otherwise. Depth beyond 1 is
    exercised by the DataFrame twin (graph_topological_sort, degree-
    oriented DAG of measured depth 16 at sf0.01) and the cycle-failure
    contract by tests/test_round8b.py."""
    q = ("CALL gds.dag.topologicalSort.stream('sharesDNA') "
         "YIELD nodeId, maxDistanceFromSource "
         "RETURN nodeId, maxDistanceFromSource")
    return _engine_sp_thresh(spark, sf_dir).run(q)


CYPHER_GDS_TOPOSORT_SQL = f"""
WITH e AS (
    SELECT src, dst FROM ({GRAPH_EDGES_SQL})
    WHERE distance <= {GRAPH_THRESHOLD}
),
nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e)
SELECT id AS nodeId,
       CAST(CASE WHEN id IN (SELECT dst FROM e) THEN 1 ELSE 0 END
            AS DOUBLE) AS maxDistanceFromSource
FROM nodes
"""


ENTRIES.update({
    "cypher_gds_hits": SuiteEntry(
        cypher_gds_hits, _ext.GRAPH_HITS_SQL, ("S2", "W6")
    ),
    "cypher_gds_toposort": SuiteEntry(
        cypher_gds_toposort, CYPHER_GDS_TOPOSORT_SQL, ("S2", "W6")
    ),
})


def cypher_gds_bellmanford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL gds.bellmanFord.stream (round 8) — fixpoint shortest paths,
    DIRECTED as stored, through the Cypher frontend with the usual
    ECONOMY %64 seed pins. On the bipartite P→S projection the fixpoint
    lands in one effective round (every path is one hop), which the
    convergence probe must detect — the negative-weight/deep-DAG arc is
    exercised by the DataFrame twin (graph_bellman_ford) and the
    negative-cycle failure contract by tests/test_round8b.py."""
    seeds = [
        r.id
        for r in t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "ECONOMY") & (F.col("p_partkey") % 64 == 1))
        .select(F.concat(F.lit("P"), F.col("p_partkey")).alias("id"))
        .distinct()
        .collect()
    ]
    q = ("CALL gds.bellmanFord.stream('sharesDNA', {sourceNodes: $seeds}) "
         "YIELD sourceNodeId, targetNodeId, totalCost "
         "RETURN sourceNodeId, targetNodeId, totalCost")
    return _engine_sp_thresh(spark, sf_dir).run(q, params={"seeds": seeds})


CYPHER_GDS_BELLMANFORD_SQL = f"""
WITH e AS (
    SELECT src, dst,
           CAST(FLOOR(distance * 10000.0 + 0.5) AS BIGINT) AS w
    FROM ({GRAPH_EDGES_SQL}) _e WHERE distance <= {GRAPH_THRESHOLD}
),
seeds AS (
    SELECT DISTINCT 'P' || p_partkey AS id FROM part
    WHERE p_type = 'ECONOMY' AND p_partkey % 64 = 1
)
SELECT s.id AS sourceNodeId, e.dst AS targetNodeId,
       CAST(MIN(e.w) AS BIGINT) AS totalCost
FROM seeds s JOIN e ON e.src = s.id
GROUP BY 1, 2
"""


ENTRIES.update({
    "cypher_gds_bellmanford": SuiteEntry(
        cypher_gds_bellmanford, CYPHER_GDS_BELLMANFORD_SQL, ("S2", "W6", "J7")
    ),
})


def cypher_gds_dag_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL gds.dag.longestPath.stream (round 8) on the natural P→S
    direction of the thresholded sharesDNA projection: sources = the P
    tier (never a dst), each supplier's distance = the MAX quantized
    edge weight over its incoming edges — the one-hop closed form the
    oracle states directly; deep weighted DAGs are exercised by the
    DataFrame twin (graph_dag_longest_path)."""
    q = ("CALL gds.dag.longestPath.stream('sharesDNA') "
         "YIELD targetNodeId, distance RETURN targetNodeId, distance")
    return _engine_sp_thresh(spark, sf_dir).run(q)


CYPHER_GDS_DAG_LONGEST_SQL = f"""
WITH e AS (
    SELECT src, dst,
           CAST(FLOOR(distance * 10000.0 + 0.5) AS BIGINT) AS w
    FROM ({GRAPH_EDGES_SQL}) _e WHERE distance <= {GRAPH_THRESHOLD}
)
SELECT src AS targetNodeId, CAST(0 AS BIGINT) AS distance
FROM (SELECT DISTINCT src FROM e)
UNION ALL
SELECT dst AS targetNodeId, CAST(MAX(w) AS BIGINT) AS distance
FROM e GROUP BY dst
"""


ENTRIES.update({
    "cypher_gds_dag_longest": SuiteEntry(
        cypher_gds_dag_longest, CYPHER_GDS_DAG_LONGEST_SQL, ("S2", "W6")
    ),
})
