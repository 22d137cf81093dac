"""Graph pattern-matching operators (SURVEY.md §2.3, §2.6 W6).

The reference expresses these as Cypher `MATCH` patterns executed inside
Neo4j (`/root/reference/phageclouds_gdb.py:56-67`); here each is a
composition of DataFrame joins so Catalyst plans them (broadcast semi-joins
for node sets, AQE skew splitting for hub nodes).

Conventions: an *edge* DataFrame has columns (src, dst, distance); a *node
set* is a single-column DataFrame named ``id`` (always kept distinct, always
joined semi -- never collected to the driver as an IN-list; SURVEY.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def as_node_set(df: DataFrame, col: str) -> DataFrame:
    """Project a column into a deduplicated node-set DataFrame ``(id)``."""
    return df.select(F.col(col).alias("id")).distinct()


def expand(
    seeds: DataFrame,
    edges: DataFrame,
    threshold: float | None = None,
    directed: bool = True,
) -> DataFrame:
    """1-hop expand (J2): from seed nodes, follow ``sharesDNA`` edges with
    ``distance <= threshold``; result node set = seeds UNION targets.

    ``directed=True`` reproduces the reference's semantics exactly: edges are
    stored once per unordered pair with arbitrary direction, and every Cypher
    match is directed (`/root/reference/phageclouds_gdb.py:56-58`), so
    "neighbors" silently means *outgoing* neighbors. ``directed=False`` is
    the correct-semantics variant (SURVEY.md §2.1 J2 golden-parity trap).

    Seeds with no qualifying edge are kept (matches the OPTIONAL MATCH
    expand of `/root/reference/phageclouds_gdb_family.py:94`, J4).
    """
    e = edges if threshold is None else edges.filter(F.col("distance") <= F.lit(threshold))
    # seeds is small relative to edges -> broadcast the semi side.
    out = e.join(F.broadcast(seeds), e["src"] == seeds["id"], "left_semi").select(
        F.col("dst").alias("id")
    )
    frontier = out
    if not directed:
        inc = e.join(F.broadcast(seeds), e["dst"] == seeds["id"], "left_semi").select(
            F.col("src").alias("id")
        )
        frontier = out.unionByName(inc)
    return seeds.unionByName(frontier).distinct()


def induced_subgraph(
    node_set: DataFrame,
    edges: DataFrame,
    threshold: float | None = None,
) -> DataFrame:
    """Induced-subgraph edge extraction (J3): edges whose *both* endpoints lie
    in ``node_set`` and pass the distance threshold.

    The reference round-trips the node set as a Python list literal inside
    the Cypher text (`/root/reference/phageclouds_gdb.py:64-67`) -- an
    O(|nodes|) query string. Here it is two broadcast semi-joins, and at the
    100 TB tier a runtime bloom filter on the scan side
    (spark.sql.optimizer.runtime.bloomFilter.enabled, see session.py).
    """
    e = edges if threshold is None else edges.filter(F.col("distance") <= F.lit(threshold))
    ns = node_set.select("id")
    e = e.join(F.broadcast(ns), e["src"] == ns["id"], "left_semi")
    e = e.join(F.broadcast(ns), e["dst"] == ns["id"], "left_semi")
    return e


def degrees(edges: DataFrame) -> DataFrame:
    """Per-node out/in/total degree over an edge set (analytics surface for
    the 'clouds'; not in the reference scripts but implied by README's cloud
    analysis)."""
    out_d = edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))
    in_d = edges.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("in_degree"))
    return (
        out_d.join(in_d, "id", "full_outer")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components (W6) -- the "phage clouds" themselves: the paper's
    cloud = component of the distance-thresholded graph (reference README.md:3
    describes clouds; the scripts only ever materialize one neighborhood).

    DataFrame-native hash-min label propagation with pointer jumping
    (FastSV-style): every node starts labeled with its own id; each round a
    node takes (1) the min label in its undirected neighborhood, then (2) the
    label of its label (``component[component[id]]``). Step (2) collapses
    label chains exponentially, so rounds = O(log diameter) instead of
    O(diameter) -- measured 7 -> 5 rounds on the sf0.1 bench graph, and the
    gap widens on long-chain graphs. Deterministic: final label = min node id
    in the component; stop at fixpoint.

    Scale notes: each round is one shuffle on the edge table plus one on the
    (much smaller) label table. ``localCheckpoint`` truncates the plan
    lineage each round so the plan doesn't grow with iterations (SURVEY.md
    §4 'iterative fixpoint'); the convergence count runs on the checkpointed
    result, so it adds no recompute.
    """
    # Materialize the undirected edge list once -- the iteration below would
    # otherwise recompute the (possibly expensive) upstream edge plan every
    # round. localCheckpoint is eager and truncates lineage.
    und = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    if nodes is None:
        nodes = as_node_set(und, "a")
    labels = nodes.select("id", F.col("id").alias("component")).localCheckpoint()
    for _ in range(max_iterations):
        # (1) min label among neighbors, per node
        neighbor_min = (
            und.join(labels, und["b"] == labels["id"])
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = labels.join(neighbor_min, "id", "left_outer").select(
            "id",
            F.least(
                F.col("component"), F.coalesce("nbr_component", F.col("component"))
            ).alias("component"),
            (F.col("nbr_component") < F.col("component")).alias("_changed"),
        )
        # (2) pointer jumping: component <- component[component]. Labels only
        # ever point within their own component, so the invariant holds.
        parents = updated.select(
            F.col("id").alias("component"), F.col("component").alias("_parent")
        )
        jumped = (
            updated.join(parents, "component", "left_outer")
            .select(
                "id",
                F.coalesce("_parent", "component").alias("component"),
                (
                    F.col("_changed")
                    | (F.coalesce("_parent", "component") < F.col("component"))
                ).alias("_changed"),
            )
            .localCheckpoint()
        )
        n_changed = jumped.filter(F.col("_changed")).count()
        labels = jumped.drop("_changed")
        if n_changed == 0:
            break
    return labels


def cloud_membership(
    edges: DataFrame,
    threshold: float,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Cloud-membership table: node id -> cloud (component) label over the
    thresholded graph, plus per-cloud size. The queryable form of the
    PhageClouds concept."""
    comp = connected_components(edges.filter(F.col("distance") <= F.lit(threshold)), nodes)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cloud_size"))
    return comp.join(sizes, "component").select("id", "component", "cloud_size")
