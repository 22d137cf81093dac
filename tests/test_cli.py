"""End-to-end CLI test: write the synthetic graph fixture to Parquet, run
the taxon pipeline through the CLI, parse the emitted HTML back with the
golden parser, and check the graph."""

from __future__ import annotations

import csv
import os

from phageclouds_graphdatabase_spark import cli
from phageclouds_graphdatabase_spark.sources import golden
from tests.conftest import LINEAGE_ROWS


def _write_data_dir(tmp_path, phage_nodes, shares_dna, infects):
    d = str(tmp_path / "data")
    phage_nodes.write.parquet(os.path.join(d, "nodes"))
    shares_dna.write.parquet(os.path.join(d, "edges"))
    infects.write.parquet(os.path.join(d, "infects"))
    with open(os.path.join(d, "lineages.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            "accession taxid superkingdom phylum class order family subfamily genus species".split()
        )
        w.writerows(LINEAGE_ROWS)
    return d


def test_cli_taxon_end_to_end(spark, tmp_path, phage_nodes, shares_dna, infects):
    d = _write_data_dir(tmp_path, phage_nodes, shares_dna, infects)
    out = cli.main(
        ["--data-dir", d, "--out-dir", str(tmp_path),
         "taxon", "-t", "Tequatrovirus", "-d", "0.25"]
    )
    assert os.path.basename(out) == "Tequatrovirus_025_clouds.html"
    nodes, edges = golden.parse_vis_html(out)
    assert {n["id"] for n in nodes} == {"A1", "A2", "A3"}
    assert len(edges) == 3


def test_cli_host_harsh_filename(spark, tmp_path, phage_nodes, shares_dna, infects):
    d = _write_data_dir(tmp_path, phage_nodes, shares_dna, infects)
    out = cli.main(
        ["--data-dir", d, "--out-dir", str(tmp_path),
         "host", "-g", "Escherichia", "-t", "0.25", "--harsh"]
    )
    assert os.path.basename(out) == "Escherichia_025_clouds_v2_harsh.html"
    nodes, _ = golden.parse_vis_html(out)
    assert {n["id"] for n in nodes} == {"A1", "A2", "A3", "B1", "B2"}


def test_cli_family(spark, tmp_path, phage_nodes, shares_dna, infects):
    d = _write_data_dir(tmp_path, phage_nodes, shares_dna, infects)
    out = cli.main(
        ["--data-dir", d, "--out-dir", str(tmp_path),
         "family", "-f", "Herelleviridae", "-t", "genus", "-d", "0.25"]
    )
    assert os.path.basename(out) == "Herelleviridae_025_genus_clouds.html"
    nodes, edges = golden.parse_vis_html(out)
    assert {n["id"] for n in nodes} == {"D1", "D2", "E1"}
    assert len(edges) == 1


def test_cli_query_parquet_out(spark, tmp_path, phage_nodes, shares_dna, infects):
    d = _write_data_dir(tmp_path, phage_nodes, shares_dna, infects)
    out = str(tmp_path / "result")
    cli.main(
        ["--data-dir", d, "query",
         "MATCH (a:PhageGenome {source:'NCBI'})-[r:sharesDNA]->(b:PhageGenome) "
         "WHERE r.distance <= 0.25 "
         "RETURN a.accession AS src, b.accession AS dst",
         "--out", out]
    )
    got = {(r.src, r.dst) for r in spark.read.parquet(out).collect()}
    assert got == {("A1", "A2"), ("A1", "A3"), ("A2", "A3"),
                   ("B1", "B2"), ("D1", "D2")}


def test_cli_query_prints(spark, tmp_path, phage_nodes, shares_dna, infects, capsys):
    d = _write_data_dir(tmp_path, phage_nodes, shares_dna, infects)
    cli.main(
        ["--data-dir", d, "query",
         "MATCH (a:PhageGenome) RETURN a.source AS src, count(a.accession) AS n"]
    )
    printed = capsys.readouterr().out
    assert "NCBI" in printed and "Tara" in printed
