"""End-to-end golden parity for the host and family pipelines (SURVEY.md §5):
inputs reconstructed from the goldens themselves, pipelines re-run, outputs
compared. What each comparison includes/excludes is documented on the
reconstruction functions (host titles: any-host ambiguity; family colors:
reference palette order is nondeterministic upstream)."""

from __future__ import annotations

import os

import pytest

from phageclouds_graphdatabase_spark.plans import clouds
from phageclouds_graphdatabase_spark.sources import golden

REF = "/root/reference"

HOST_GOLDENS = [
    # (file, genus, threshold, harsh, nodes, edges)
    ("Cellulophaga_025_clouds_v2.html", "Cellulophaga", 0.25, False, 60, 111),
    ("Cellulophaga_025_clouds_v2_harsh.html", "Cellulophaga", 0.25, True, 33, 72),
    ("Pseudomonas_01_clouds_v2_harsh.html", "Pseudomonas", 0.1, True, 476, 7395),
]

FAMILY_GOLDENS = [
    # (file, family, rank, threshold, nodes, edges)
    ("Ackermannviridae_015_genus_clouds.html", "Ackermannviridae", "genus", 0.15, 137, 2349),
    ("Herelleviridae_015_genus_clouds.html", "Herelleviridae", "genus", 0.15, 292, 3761),
    ("Herelleviridae_025_subfamily_clouds.html", "Herelleviridae", "subfamily", 0.25, 341, 4568),
]

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, HOST_GOLDENS[0][0])),
    reason="reference goldens absent",
)


def edge_set(df):
    return {(r.src, r.dst, r.weight, r.value) for r in df.collect()}


def golden_edge_set(path, spark):
    _, e = golden.golden_frames(spark, path)
    return {(r.src, r.dst, r.weight, r.value) for r in e.collect()}


@pytest.mark.parametrize("fname,genus,thr,harsh,nn,ne", HOST_GOLDENS,
                         ids=[g[0] for g in HOST_GOLDENS])
def test_host_golden_parity(spark, fname, genus, thr, harsh, nn, ne):
    path = os.path.join(REF, fname)
    nodes, edges, infects = golden.reconstruct_host_input(spark, path, genus)
    res = clouds.clouds_by_host(nodes, edges, infects, genus, thr, harsh=harsh)

    got_nodes = {(r.id, r.color_background, r.size) for r in res.nodes.collect()}
    g_nodes, _ = golden.golden_frames(spark, path)
    want_nodes = {(r.id, r.color_background, r.size) for r in g_nodes.collect()}
    assert len(got_nodes) == nn and got_nodes == want_nodes

    got_edges = edge_set(res.edges)
    assert len(got_edges) == ne and got_edges == golden_edge_set(path, spark)


@pytest.mark.parametrize("fname,family,rank,thr,nn,ne", FAMILY_GOLDENS,
                         ids=[g[0] for g in FAMILY_GOLDENS])
def test_family_golden_parity(spark, fname, family, rank, thr, nn, ne):
    path = os.path.join(REF, fname)
    nodes, edges, lineages = golden.reconstruct_family_input(spark, path, family, rank)
    res = clouds.clouds_by_family(nodes, edges, lineages, family, rank, thr)

    # ids + sizes + full titles (Source/genome/rank-taxon) are exact;
    # colors excluded (reference palette order nondeterministic, SURVEY §7).
    got = {(r.id, r.size, r.title) for r in res.nodes.collect()}
    g_nodes, _ = golden.golden_frames(spark, path)
    want = {(r.id, r.size, r.title) for r in g_nodes.collect()}
    assert len(got) == nn and got == want

    got_edges = edge_set(res.edges)
    assert len(got_edges) == ne and got_edges == golden_edge_set(path, spark)
