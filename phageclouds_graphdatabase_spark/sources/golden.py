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
