"""The three cloud-extraction entry points (SURVEY.md §3 E1-E3), each a
single Catalyst plan replacing the reference's 2-3 Neo4j round-trips plus
driver-side pandas post-processing.

All pipelines share the canonical shape: seed-predicate -> 1-hop expand ->
induced subgraph -> attribute join -> derived presentation columns. The node
set is cached and reused across the expand/induced/attribute stages (the
reference re-ships it as a Python list literal inside each Cypher string,
/root/reference/phageclouds_gdb.py:65-71).

Golden-parity quirks reproduced on purpose (flags give correct semantics):
- expand is DIRECTED-only: edges are stored once per unordered pair and all
  reference matches are `-[r]->` (SURVEY.md §1.1);
- host 'harsh' filters source on endpoint *a* only, so excluded-source
  phages still enter as edge targets
  (/root/reference/phageclouds_gdb_host.py:57);
- host attribute join takes ANY host of each phage (left outer,
  row-multiplying, then per-key dedup), not the queried one
  (/root/reference/phageclouds_gdb_host.py:61-62).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from phageclouds_graphdatabase_spark.functions import derive
from phageclouds_graphdatabase_spark.operators import graph as G


@dataclass
class CloudResult:
    """Presentation-ready cloud graph: `nodes` carry pyvis-compatible
    columns (id, size, color_background, color_border, title), `edges` carry
    (src, dst, weight, value, color)."""

    nodes: DataFrame
    edges: DataFrame
    threshold: float


def _present_edges(
    edges: DataFrame, threshold: float, with_title: bool = False
) -> DataFrame:
    """Edge presentation columns (V4): value = t - distance + 0.1, gray
    color (/root/reference/phageclouds_gdb.py:112-116). The host/family
    scripts additionally set the hover title to the raw weight
    (goldens embed it); the taxon script does not."""
    cols = [
        F.col("src"),
        F.col("dst"),
        F.col("distance").alias("weight"),
        derive.edge_value(F.col("distance"), threshold).alias("value"),
        F.lit("lightgray").alias("color"),
    ]
    if with_title:
        cols.append(F.col("distance").alias("title"))
    return edges.select(*cols)


def clouds_by_taxon(
    nodes: DataFrame,
    edges: DataFrame,
    taxon: str,
    threshold: float = 0.25,
    directed: bool = True,
) -> CloudResult:
    """E1 -- `phageclouds_gdb.py -t <taxon> -d <dist>`
    (/root/reference/phageclouds_gdb.py:44-120).

    Seeds: NCBI phages whose taxonomy contains `taxon` with at least one
    qualifying out-edge is NOT required (the expand keeps edgeless seeds out
    naturally here: the reference's Q1 is a non-optional MATCH, so a seed
    enters the node set only via an edge row -- reproduced by requiring the
    edge join before the union).
    """
    qual = edges.filter(F.col("distance") <= F.lit(threshold))
    seed_pred = (F.col("source") == "NCBI") & F.col("taxonomy").contains(taxon)
    seeds = nodes.filter(seed_pred).select(F.col("accession").alias("id"))
    # Non-optional MATCH: only seeds that actually have a qualifying
    # out-edge (and their targets) enter the node set
    # (/root/reference/phageclouds_gdb.py:56-62).
    seed_edges = qual.join(G.maybe_broadcast(seeds), qual["src"] == seeds["id"], "left_semi")
    if directed:
        node_set = (
            seed_edges.select(F.col("src").alias("id"))
            .unionByName(seed_edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    else:
        incoming = qual.join(G.maybe_broadcast(seeds), qual["dst"] == seeds["id"], "left_semi")
        node_set = (
            seed_edges.select(F.col("src").alias("id"))
            .unionByName(seed_edges.select(F.col("dst").alias("id")))
            .unionByName(incoming.select(F.col("src").alias("id")))
            .unionByName(incoming.select(F.col("dst").alias("id")))
            .distinct()
        )
    node_set = node_set.cache()

    induced = G.induced_subgraph(node_set, qual)

    flag = f"Phage_is_{taxon}"
    attrs = (
        nodes.join(node_set, nodes["accession"] == node_set["id"], "left_semi")
        .withColumn(flag, F.col("taxonomy").contains(taxon))
        .withColumn("color", derive.taxon_color(F.col("source"), F.col(flag)))
        .select(
            F.col("accession").alias("id"),
            "source",
            "genome_size",
            F.col(flag),
            derive.node_size(F.col("genome_size")).alias("size"),
            F.col("color").alias("color_background"),
            F.lit("#000000").alias("color_border"),
            F.lit(None).cast("string").alias("title"),
        )
    )
    return CloudResult(attrs, _present_edges(induced, threshold), threshold)


def clouds_by_family(
    nodes: DataFrame,
    edges: DataFrame,
    lineages: DataFrame,
    family: str,
    rank: str,
    threshold: float = 0.15,
) -> CloudResult:
    """E2 -- `phageclouds_gdb_family.py -f <family> -t <genus|subfamily>`
    (/root/reference/phageclouds_gdb_family.py:80-123).

    OPTIONAL MATCH expand: family members are kept even with no qualifying
    edge (J4). Colors come from a broadcast (taxon -> hex) palette table
    derived from the lineages dim -- replacing the per-row ete3-sqlite +
    colormap work of color_phage_tax (:47-66); rank extraction (V5) is a
    lineages join instead of per-row ete3 get_lineage (:68-76).
    """
    qual = edges.filter(F.col("distance") <= F.lit(threshold))
    seed_pred = (F.col("source") == "NCBI") & F.col("taxonomy").contains(family)
    seeds = nodes.filter(seed_pred).select(F.col("accession").alias("id"))
    node_set = G.expand(seeds, qual).cache()  # keeps edgeless seeds (J4)

    induced = G.induced_subgraph(node_set, qual)

    palette = derive.taxon_palette(lineages, family, rank)

    attrs = nodes.join(node_set, nodes["accession"] == node_set["id"], "left_semi").select(
        F.col("accession").alias("id"),
        "source",
        "genome_size",
        F.col("taxonomy").alias("lineage"),
    )
    # First-substring-match against the lineage, in palette order: non-equi
    # broadcast join + min-index window (the palette is tiny).
    matched = (
        attrs.join(
            F.broadcast(palette),
            F.col("lineage").contains(F.col("taxon")) & (F.col("source") == "NCBI"),
            "left_outer",
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy(F.col("palette_idx").asc_nulls_last())
            ),
        )
        .filter(F.col("rn") == 1)
        .withColumn(
            "color",
            F.when(F.col("source") != "NCBI", "#FFFFFF").otherwise(
                F.coalesce(F.col("hex"), F.lit("#000000"))
            ),
        )
    )
    ranked = matched.join(
        lineages.select(F.col("accession").alias("id"), F.col(rank).alias("target_taxon")),
        "id",
        "left_outer",
    ).withColumn(
        "target_taxon",
        F.when(F.col("target_taxon") == "", None).otherwise(F.col("target_taxon")),
    )
    out = ranked.select(
        "id",
        "source",
        "genome_size",
        "target_taxon",
        derive.node_size(F.col("genome_size")).alias("size"),
        F.col("color").alias("color_background"),
        F.lit("#000000").alias("color_border"),
        derive.family_title(
            F.col("source"), F.col("genome_size"), rank, F.col("target_taxon")
        ).alias("title"),
    )
    return CloudResult(out, _present_edges(induced, threshold, with_title=True), threshold)


def clouds_by_host(
    nodes: DataFrame,
    edges: DataFrame,
    infects: DataFrame,
    host_genus: str,
    threshold: float = 0.25,
    harsh: bool = False,
    strict_colors: bool = False,
) -> CloudResult:
    """E3 -- `phageclouds_gdb_host.py -g <genus> [-t <dist>] [--harsh]`
    (/root/reference/phageclouds_gdb_host.py:44-92).

    Seeds: phages with an `infects` edge to the host genus (existential
    semi-join P8) AND at least one qualifying out-edge; `harsh` additionally
    excludes GTDB_predicted_prophages -- on endpoint a ONLY (the golden-
    preserved quirk: GTDB phages still enter as targets). The attribute join
    picks ANY host per phage (left-outer then deterministic last-write-wins;
    the reference's dict-update order is nondeterministic, the engine pins
    max(host_genus)).
    """
    qual = edges.filter(F.col("distance") <= F.lit(threshold))
    hosted = nodes.join(
        infects.filter(F.col("host_genus") == host_genus),
        nodes["accession"] == infects["src"],
        "left_semi",
    )
    if harsh:
        hosted = hosted.filter(F.col("source") != "GTDB_predicted_prophages")
    seeds = hosted.select(F.col("accession").alias("id"))
    seed_edges = qual.join(G.maybe_broadcast(seeds), qual["src"] == seeds["id"], "left_semi")
    node_set = (
        seed_edges.select(F.col("src").alias("id"))
        .unionByName(seed_edges.select(F.col("dst").alias("id")))
        .distinct()
        .cache()
    )

    induced = G.induced_subgraph(node_set, qual)

    # J5 optional any-host attribute join, row-multiplying, then A4
    # last-write-wins dedup pinned to a deterministic order.
    with_host = (
        nodes.join(node_set, nodes["accession"] == node_set["id"], "left_semi")
        .join(infects, nodes["accession"] == infects["src"], "left_outer")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("accession").orderBy(F.col("host_genus").desc_nulls_last())
            ),
        )
        .filter(F.col("rn") == 1)
    )
    out = with_host.select(
        F.col("accession").alias("id"),
        "source",
        "genome_size",
        F.col("genus").alias("phage_genus"),
        F.col("host_genus").alias("host"),
        derive.node_size(F.col("genome_size")).alias("size"),
        derive.source_hex_color(F.col("source"), strict=strict_colors).alias("color_background"),
        F.lit("#000000").alias("color_border"),
        derive.host_title(F.col("host_genus"), F.col("genus"), F.col("genome_size")).alias("title"),
    )
    return CloudResult(out, _present_edges(induced, threshold, with_title=True), threshold)
