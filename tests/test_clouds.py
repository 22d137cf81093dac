"""End-to-end tests for the three cloud-extraction pipelines (SURVEY.md §3
E1-E3): synthetic-fixture semantics (every quirk pinned) plus golden parity
against the reference's committed HTML outputs (SURVEY.md §5)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.plans import clouds
from phageclouds_graphdatabase_spark.sources import golden

GOLDEN = "/root/reference/Tequatrovirus_025_clouds.html"

# (filename, threshold, expected nodes, expected edges) -- BASELINE.md
TAXON_GOLDENS = [
    ("Tequatrovirus_015_clouds.html", 0.15, 156, 11504),
    ("Tequatrovirus_025_clouds.html", 0.25, 264, 23247),
]


def node_ids(df):
    return {r.id for r in df.select("id").collect()}


# --- E1 taxon pipeline on the synthetic fixture ------------------------------

def test_taxon_seed_requires_qualifying_out_edge(spark, phage_nodes, shares_dna):
    # E1/D1-style: Q1 is a non-optional MATCH -- an NCBI Tequatrovirus node
    # with no qualifying out-edge must NOT appear.
    res = clouds.clouds_by_taxon(phage_nodes, shares_dna, "Tequatrovirus", 0.25)
    assert node_ids(res.nodes) == {"A1", "A2", "A3"}
    got_edges = {(r.src, r.dst) for r in res.edges.collect()}
    assert got_edges == {("A1", "A2"), ("A1", "A3"), ("A2", "A3")}


def test_taxon_colors_and_sizes(spark, phage_nodes, shares_dna):
    res = clouds.clouds_by_taxon(phage_nodes, shares_dna, "Tequatrovirus", 0.25)
    rows = {r.id: r for r in res.nodes.collect()}
    assert rows["A1"].color_background == "green"     # NCBI + is-taxon
    assert rows["A3"].color_background == "cyan"      # Tara
    assert rows["A1"].size == 168000 // 3000
    erows = {(r.src, r.dst): r for r in res.edges.collect()}
    assert erows[("A1", "A2")].value == 0.25 - 0.10 + 0.1


def test_taxon_non_ncbi_seeds_excluded(spark, phage_nodes, shares_dna):
    # A3 is Tara with 'Myoviridae' in taxonomy; seeds require source=NCBI
    # (/root/reference/phageclouds_gdb.py:56), so expanding 'Myoviridae'
    # must seed only from NCBI nodes (A1, A2).
    res = clouds.clouds_by_taxon(phage_nodes, shares_dna, "Myoviridae", 0.25)
    assert node_ids(res.nodes) == {"A1", "A2", "A3"}


# --- E3 host pipeline --------------------------------------------------------

def test_host_seeds_are_existential_semi_join(spark, phage_nodes, shares_dna, infects):
    # Cellulophaga is hosted only by B2; B2 has no OUT-edges, so the
    # directed expand yields nothing -> empty cloud (the reference would
    # render an empty graph).
    res = clouds.clouds_by_host(phage_nodes, shares_dna, infects, "Cellulophaga", 0.25)
    assert res.nodes.count() == 0

    # Escherichia hosts A1, A2, B1 -> their out-neighborhoods.
    res2 = clouds.clouds_by_host(phage_nodes, shares_dna, infects, "Escherichia", 0.25)
    assert node_ids(res2.nodes) == {"A1", "A2", "A3", "B1", "B2"}


def test_host_harsh_filters_seed_side_only(spark, phage_nodes, shares_dna, infects):
    # Add a GTDB seed phage: G1 infects Escherichia, G1 -> B3 edge. Harsh
    # drops G1 as a SEED, but GTDB node B3 still enters as a TARGET of
    # B3->B2?? -- no: B3 enters only if some kept seed points at it. Build
    # that: B1 -> B3 would be needed; instead assert G1 gone entirely.
    nodes2 = phage_nodes.unionByName(
        spark.createDataFrame(
            [("G1", "GTDB_predicted_prophages", "Viruses", 30000, None)],
            phage_nodes.schema,
        )
    )
    edges2 = shares_dna.unionByName(
        spark.createDataFrame([("G1", "B3", 0.05)], shares_dna.schema)
    )
    infects2 = infects.unionByName(
        spark.createDataFrame([("G1", "Escherichia")], infects.schema)
    )
    loose = clouds.clouds_by_host(nodes2, edges2, infects2, "Escherichia", 0.25, harsh=False)
    assert {"G1", "B3"} <= node_ids(loose.nodes)
    harsh = clouds.clouds_by_host(nodes2, edges2, infects2, "Escherichia", 0.25, harsh=True)
    assert "G1" not in node_ids(harsh.nodes) and "B3" not in node_ids(harsh.nodes)


def test_host_any_host_join_deduped_deterministically(spark, phage_nodes, shares_dna, infects):
    # B2 infects {Cellulophaga, Salmonella}; the attribute join multiplies
    # rows then A4 dedups last-write-wins pinned to max(host_genus).
    res = clouds.clouds_by_host(phage_nodes, shares_dna, infects, "Escherichia", 0.25)
    rows = {r.id: r for r in res.nodes.collect()}
    assert rows["B2"].host == "Salmonella"
    assert res.nodes.count() == res.nodes.select("id").distinct().count()
    # A3 has no host -> NULL host, title renders 'None' like a Python f-string.
    assert rows["A3"].host is None
    assert rows["A3"].title.startswith("Target host genus: None<br>")
    assert rows["A1"].color_background == "#8acb4a"  # V2 hex map, NCBI


# --- E2 family pipeline ------------------------------------------------------

def test_family_keeps_edgeless_members(spark, phage_nodes, shares_dna, lineages):
    # OPTIONAL MATCH (J4): E1 (Herelleviridae, no edges) stays in.
    res = clouds.clouds_by_family(
        phage_nodes, shares_dna, lineages, "Herelleviridae", "genus", 0.15
    )
    assert node_ids(res.nodes) == {"D1", "D2", "E1"}
    # d=0.15 excludes the D1->D2 edge (0.25).
    assert res.edges.count() == 0


def test_family_palette_and_rank_extraction(spark, phage_nodes, shares_dna, lineages):
    res = clouds.clouds_by_family(
        phage_nodes, shares_dna, lineages, "Herelleviridae", "genus", 0.25
    )
    rows = {r.id: r for r in res.nodes.collect()}
    assert rows["D1"].target_taxon == "Bastillevirus"
    assert rows["E1"].target_taxon == "Okubovirus"
    # Palette pinned alphabetical: Bastillevirus, Nitunavirus, Okubovirus ->
    # tab20[0], tab20[1], tab20[2] via lineage substring match.
    from phageclouds_graphdatabase_spark.functions.derive import TAB20_HEX

    assert rows["D1"].color_background == TAB20_HEX[0]
    assert rows["D2"].color_background == TAB20_HEX[1]
    assert rows["E1"].color_background == TAB20_HEX[2]
    assert rows["D1"].title == "Source: NCBI<br>Genome size: 152_000<br>genus: Bastillevirus"


def test_family_uncatalogued_fails_loud(spark, phage_nodes, shares_dna, lineages):
    # VERDICT r6 "What's missing" #1: the reference resolves any family via
    # the live NCBI sqlite and fails loudly on an unknown name
    # (phageclouds_gdb_family.py:49 — None[0] TypeError); with the committed
    # lineages dim the engine must raise, not silently emit an empty
    # palette / all-black cloud.
    from phageclouds_graphdatabase_spark.functions import derive

    with pytest.raises(derive.UncataloguedFamilyError, match="Nonexistviridae"):
        clouds.clouds_by_family(
            phage_nodes, shares_dna, lineages, "Nonexistviridae", "genus", 0.25
        )
    # catalogued family: must NOT raise regardless of rank coverage (the
    # reference's empty-taxa-set path colors NCBI nodes black, no error)
    derive.taxon_palette(lineages, "Herelleviridae", "genus").count()
    # strict=False restores the permissive empty palette for unknown names
    assert derive.taxon_palette(lineages, "Nonexistviridae", "genus", strict=False).count() == 0


# --- Golden parity (SURVEY.md §5: the reference's only correctness artifacts)

@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference goldens absent")
class TestGoldenParity:
    @pytest.fixture(scope="class", params=TAXON_GOLDENS, ids=lambda p: p[0])
    def golden_run(self, request, spark):
        fname, threshold, n_nodes, n_edges = request.param
        path = os.path.join("/root/reference", fname)
        g_nodes, g_edges = golden.golden_frames(spark, path)
        in_nodes, in_edges = golden.reconstruct_taxon_input(spark, path, "Tequatrovirus")
        res = clouds.clouds_by_taxon(in_nodes, in_edges, "Tequatrovirus", threshold)
        return g_nodes, g_edges, res, n_nodes, n_edges

    def test_golden_cardinalities(self, golden_run):
        g_nodes, g_edges, res, n_nodes, n_edges = golden_run
        assert g_nodes.count() == n_nodes and g_edges.count() == n_edges
        assert res.nodes.count() == n_nodes and res.edges.count() == n_edges

    def test_golden_node_parity(self, golden_run):
        g_nodes, _, res, *_ = golden_run
        got = {(r.id, r.color_background, r.size) for r in res.nodes.collect()}
        want = {(r.id, r.color_background, r.size) for r in g_nodes.collect()}
        assert got == want

    def test_golden_edge_parity_bit_exact(self, golden_run):
        # value = t - distance + 0.1 with identical IEEE ops -> bit-exact.
        _, g_edges, res, *_ = golden_run
        got = {(r.src, r.dst, r.weight, r.value) for r in res.edges.collect()}
        want = {(r.src, r.dst, r.weight, r.value) for r in g_edges.collect()}
        assert got == want
