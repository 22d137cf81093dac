"""Golden-output parser: the reference's committed HTML files are its only
correctness artifacts (SURVEY.md §5) -- each embeds the exact result graph as
``vis.DataSet`` JSON. This module parses them into DataFrames for parity
tests and can *reconstruct* the input graph for the taxon goldens (the
pipeline is idempotent on its own output: every non-seed node entered via a
seed edge that the golden retains, so re-running the query on the
reconstructed graph must reproduce the golden exactly)."""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

GOLDEN_DIR = "/root/reference"

# color -> source for the taxon pipeline (V1 CASE inverted;
# /root/reference/phageclouds_gdb.py:79-93). 'yellow' is the else-branch --
# GTDB is the only remaining source enum value.
_TAXON_COLOR_TO_SOURCE = {
    "green": ("NCBI", True),
    "red": ("NCBI", False),
    "cyan": ("Tara", False),
    "pink": ("GPD_Isolate", False),
    "purple": ("GPD_Metagenome", False),
    "yellow": ("GTDB_predicted_prophages", False),
}


def parse_vis_html(path: str) -> tuple[list[dict], list[dict]]:
    """Extract the nodes/edges vis.DataSet JSON arrays from a golden HTML."""
    html = open(path).read()
    nodes = json.loads(re.search(r"nodes = new vis\.DataSet\((\[.*?\])\);", html, re.S).group(1))
    edges = json.loads(re.search(r"edges = new vis\.DataSet\((\[.*?\])\);", html, re.S).group(1))
    return nodes, edges


def golden_frames(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Golden result graph as DataFrames:
    nodes(id, color_background, color_border, size, title),
    edges(src, dst, weight, value, color)."""
    nodes, edges = parse_vis_html(path)
    ndf = spark.createDataFrame(
        [
            (
                n["id"],
                n["color"]["background"],
                n["color"]["border"],
                int(n["size"]),
                n.get("title"),
            )
            for n in nodes
        ],
        "id string, color_background string, color_border string, size int, title string",
    )
    edf = spark.createDataFrame(
        [
            (e["from"], e["to"], float(e["weight"]), float(e["value"]), e["color"])
            for e in edges
        ],
        "src string, dst string, weight double, value double, color string",
    )
    return ndf, edf


# hex -> source for the host pipeline (V2 dict inverted,
# /root/reference/phageclouds_gdb_host.py:66). Values are unique.
_HEX_TO_SOURCE = {
    "#8acb4a": "NCBI",
    "#39dede": "Tara",
    "#f1e653": "GTDB_predicted_prophages",
    "#9b4aed": "GPD_Isolate",
    "#c734df": "GPD_Metagenome",
}

_HOST_TITLE_RE = re.compile(
    r"Target host genus: (.*?)<br>Phage genus: (.*?)<br>Genome size: ([\d_]+) bp"
)
_FAMILY_TITLE_RE = re.compile(r"Source: (.*?)<br>Genome size: ([\d_]+)<br>(\w+): (.*)")


def _none(s: str) -> str | None:
    return None if s == "None" else s


def reconstruct_host_input(
    spark: SparkSession, path: str, host_genus: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Invert a host golden into (nodes, edges, infects) input frames.

    Exactly recoverable: source (hex inverse), genome_size and phage genus
    (title), edge distances. Not exactly recoverable: WHICH nodes were true
    seeds -- so every node with an outgoing golden edge is made a seed
    (infects the queried genus). That is a superset of the true seeds whose
    expansion still lands exactly on the golden node set (all their edges
    are golden edges, so every target is a golden node). Consequence: a
    node's displayed any-host may differ from the golden title (our dedup
    pins max(host_genus), the extra infects row can win), so parity tests
    compare ids/colors/sizes/edges, not host titles."""
    nodes, edges = parse_vis_html(path)
    out_nodes = {e["from"] for e in edges}
    node_rows, infects_rows = [], []
    for n in nodes:
        host, genus, size = _HOST_TITLE_RE.match(n["title"]).groups()
        node_rows.append(
            (
                n["id"],
                _HEX_TO_SOURCE[n["color"]["background"]],
                "",
                int(size.replace("_", "")),
                _none(genus),
            )
        )
        if _none(host):
            infects_rows.append((n["id"], host))
    for nid in out_nodes:
        infects_rows.append((nid, host_genus))
    ndf = spark.createDataFrame(
        node_rows,
        "accession string, source string, taxonomy string, genome_size long, genus string",
    )
    edf = spark.createDataFrame(
        [(e["from"], e["to"], float(e["weight"])) for e in edges],
        "src string, dst string, distance double",
    )
    idf = spark.createDataFrame(
        sorted(set(infects_rows)), "src string, host_genus string"
    )
    return ndf, edf, idf


def reconstruct_family_input(
    spark: SparkSession, path: str, family: str, rank: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Invert a family golden into (nodes, edges, lineages) input frames.

    Source, genome_size and the rank taxon come from the title; every NCBI
    node is made a family member (superset of true seeds -- J4 keeps
    edgeless seeds and expansion stays within the golden node set).
    Palette COLORS are not comparable by design: the reference assigns
    palette indices in Python set-iteration order (SURVEY.md §7 hard-part
    3); parity tests compare ids/sizes/titles/edges."""
    nodes, edges = parse_vis_html(path)
    node_rows, lineage_rows = [], []
    for n in nodes:
        source, size, got_rank, taxon = _FAMILY_TITLE_RE.match(n["title"]).groups()
        assert got_rank == rank, (got_rank, rank)
        taxon = _none(taxon)
        tax_blob = (
            f"Viruses;{family};{taxon or ''}" if source == "NCBI" else f"Viruses;{taxon or ''}"
        )
        node_rows.append(
            (n["id"], source, tax_blob, int(size.replace("_", "")), None)
        )
        lineage_rows.append(
            (
                n["id"],
                0,
                "Viruses", "", "", "",
                family if source == "NCBI" else "",
                taxon or "" if rank == "subfamily" else "",
                taxon or "" if rank == "genus" else "",
                "",
            )
        )
    ndf = spark.createDataFrame(
        node_rows,
        "accession string, source string, taxonomy string, genome_size long, genus string",
    )
    edf = spark.createDataFrame(
        [(e["from"], e["to"], float(e["weight"])) for e in edges],
        "src string, dst string, distance double",
    )
    ldf = spark.createDataFrame(
        lineage_rows,
        "accession string, taxid long, superkingdom string, phylum string, "
        "class string, order string, family string, subfamily string, "
        "genus string, species string",
    )
    return ndf, edf, ldf


def reconstruct_taxon_input(
    spark: SparkSession, path: str, taxon: str
) -> tuple[DataFrame, DataFrame]:
    """Invert the taxon pipeline's derivations to recover an input graph
    (nodes: accession/source/taxonomy/genome_size; edges: src/dst/distance)
    from a taxon golden. genome_size is recovered as size*3000 (int division
    is lossy but round-trips through the same derivation); taxonomy is the
    taxon name for is-taxon nodes, empty otherwise."""
    nodes, edges = parse_vis_html(path)
    rows = []
    for n in nodes:
        source, is_tax = _TAXON_COLOR_TO_SOURCE[n["color"]["background"]]
        rows.append(
            (
                n["id"],
                source,
                taxon if is_tax else "",
                int(n["size"]) * 3000,
                None,
            )
        )
    ndf = spark.createDataFrame(
        rows, "accession string, source string, taxonomy string, genome_size long, genus string"
    )
    edf = spark.createDataFrame(
        [(e["from"], e["to"], float(e["weight"])) for e in edges],
        "src string, dst string, distance double",
    )
    return ndf, edf
