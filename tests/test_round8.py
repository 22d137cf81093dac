"""Round-8 changes: ADVICE r7 fixes (knn auto bucket width, uniform
CypherCompileError config contract, scale_property decimal aggregates,
community_quality assigned-volume conductance), the gds.graph.project
named-projection catalog (VERDICT r7 ask #4), Louvain early-exit (#5),
and exact closeness (#7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.cypher import (
    CypherEngine,
    phage_catalog,
)
from phageclouds_graphdatabase_spark.cypher.compiler import CypherCompileError
from phageclouds_graphdatabase_spark.operators import ann, graph as G


# --------------------------------------------------------------------------
# knn_scalar_topk auto bucket width (ADVICE r7 medium)
# --------------------------------------------------------------------------


def _brute_knn(vals: dict[str, int], k: int) -> dict[str, list[str]]:
    order = sorted(vals, key=lambda i: (vals[i], i))
    pos = {i: p for p, i in enumerate(order)}
    out = {}
    for i in vals:
        cands = [
            j for j in vals
            if j != i and abs(pos[j] - pos[i]) <= k
        ]
        cands.sort(
            key=lambda j: (abs(vals[j] - vals[i]), abs(pos[j] - pos[i]), j)
        )
        out[i] = cands[:k]
    return out


@pytest.mark.parametrize(
    "vals",
    [
        # wide sparse domain (epoch-millis-like): fixed width 1024 would
        # create ~|V| buckets; auto width keeps offsets <= target_buckets
        {f"N{i:02d}": 1_700_000_000_000 + i * 86_400_000 for i in range(40)},
        # narrow heavy-tie domain: fixed width 1024 would collapse to ONE
        # bucket (the single global window task); auto width spreads it
        {f"N{i:02d}": i % 7 for i in range(40)},
        # negative-anchored range
        {f"N{i:02d}": -500 + 37 * i for i in range(30)},
    ],
)
def test_knn_scalar_auto_bucket_width(spark, vals):
    props = spark.createDataFrame(
        list(vals.items()), "id string, value long"
    )
    got = {}
    for r in ann.knn_scalar_topk(props, k=3).collect():
        got.setdefault(r.id1, []).append(r.id2)
    want = _brute_knn(vals, 3)
    assert {i: set(v) for i, v in got.items()} == {
        i: set(v) for i, v in want.items() if v
    }


def test_knn_scalar_target_buckets_validation(spark):
    props = spark.createDataFrame([("a", 1)], "id string, value long")
    with pytest.raises(ValueError, match="target_buckets"):
        ann.knn_scalar_topk(props, k=1, target_buckets=0)


def test_knn_scalar_empty_input(spark):
    props = spark.createDataFrame([], "id string, value long")
    assert ann.knn_scalar_topk(props, k=2).count() == 0


# --------------------------------------------------------------------------
# uniform CypherCompileError config contract (ADVICE r7 low)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def engine(phage_nodes, shares_dna, infects):
    return CypherEngine(phage_catalog(phage_nodes, shares_dna, infects))


@pytest.mark.parametrize(
    "q",
    [
        "CALL gds.closeness.stream('sharesDNA', {maxDepth: 'three'}) "
        "YIELD nodeId RETURN nodeId",
        "CALL gds.louvain.stream('sharesDNA', {maxLevels: 'x'}) "
        "YIELD nodeId RETURN nodeId",
        "CALL gds.knn.stream('sharesDNA', {nodeProperties: ['genome_size'],"
        " topK: 'lots'}) YIELD node1 RETURN node1",
        "CALL gds.bfs.stream('sharesDNA', {sourceNodes: ['A1'], "
        "maxDepth: 'deep'}) YIELD nodeId RETURN nodeId",
        "CALL gds.pageRank.stream('sharesDNA', {maxIterations: 'many'}) "
        "YIELD nodeId RETURN nodeId",
    ],
)
def test_non_integer_config_raises_compile_error(engine, q):
    with pytest.raises(CypherCompileError, match="must be an integer"):
        engine.run(q)


# --------------------------------------------------------------------------
# scale_property exact decimal aggregates (ADVICE r7 low)
# --------------------------------------------------------------------------


def test_scale_property_no_long_wrap(spark):
    """Values whose x*n and S exceed 2^63 in long arithmetic: the
    decimal(38,0) path must produce the exactly-computed quotients (the
    old long path silently wrapped under non-ANSI Spark)."""
    big = 2**61
    vals = {"a": big, "b": big + 7, "c": big + 13}  # S = 3*big+20 > 2^62
    props = spark.createDataFrame(
        list(vals.items()), "id string, value long"
    )
    n, s = len(vals), sum(vals.values())
    mn, mx = min(vals.values()), max(vals.values())
    q = sum(v * v for v in vals.values())
    for scaler, want in {
        "minmax": {i: (v - mn) / (mx - mn) for i, v in vals.items()},
        "mean": {i: (v * n - s) / (n * (mx - mn)) for i, v in vals.items()},
        "center": {i: (v * n - s) / n for i, v in vals.items()},
        "stdscore": {
            i: (v * n - s) / float((n * q - s * s)) ** 0.5
            for i, v in vals.items()
        },
    }.items():
        from phageclouds_graphdatabase_spark.functions import derive

        got = {
            r.id: r.scaled
            for r in derive.scale_property(props, scaler).collect()
        }
        for i in vals:
            assert got[i] == pytest.approx(want[i], rel=1e-12), (scaler, i)


# --------------------------------------------------------------------------
# community_quality conductance over the ASSIGNED volume (ADVICE r7 low)
# --------------------------------------------------------------------------


def test_community_quality_partial_assignment_conductance(spark):
    # path graph A-B-C-D-E; only A,B,C assigned (X={A,B}, Y={C}).
    # assigned edge set: A-B (intra X), B-C (cut X|Y) -> m_assigned=2.
    # vol(X)=3 (A:1 + B:2), vol(Y)=1, total assigned volume = 4 = 2*2.
    # conductance(X) = 1 / min(3, 4-3) = 1.0 (full-graph 2m=8 would give
    # 1/min(3,5) = 1/3 — the ADVICE r7 inflation).
    e = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "D"), ("D", "E")],
        "src string, dst string",
    )
    lab = spark.createDataFrame(
        [("A", "X"), ("B", "X"), ("C", "Y")], "id string, label string"
    )
    got = {
        r.community: r for r in G.community_quality(e, lab).collect()
    }
    assert got["X"].intra_edges == 1
    assert got["X"].cut_edges == 1
    assert got["X"].degree_sum == 3
    assert got["X"].conductance == pytest.approx(1.0)
    assert got["Y"].conductance == pytest.approx(1.0)
    # modularity still normalizes by the FULL canonical m (=4)
    assert got["X"].modularity == pytest.approx((4 * 4 * 1 - 9) / (4 * 16))


def test_community_quality_full_assignment_unchanged(spark):
    # full assignment: m_assigned == m, so the r7 fix changes nothing
    e = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "A"), ("C", "D")],
        "src string, dst string",
    )
    lab = spark.createDataFrame(
        [("A", "T"), ("B", "T"), ("C", "T"), ("D", "U")],
        "id string, label string",
    )
    got = {r.community: r for r in G.community_quality(e, lab).collect()}
    # vol(T)=7, vol(U)=1, 2m=8; conductance(T)=1/min(7,1)=1.0
    assert got["T"].conductance == pytest.approx(1.0)
    assert got["U"].conductance == pytest.approx(1.0)


# --------------------------------------------------------------------------
# gds.graph.project named-projection catalog (VERDICT r7 ask #4)
# --------------------------------------------------------------------------


@pytest.fixture()
def eng(phage_nodes, shares_dna, infects):
    # function-scoped: catalog procs mutate engine state
    return CypherEngine(phage_catalog(phage_nodes, shares_dna, infects))


def test_graph_project_filter_stream_sequence(eng):
    r = eng.run(
        "CALL gds.graph.project('g', 'PhageGenome', 'sharesDNA')"
    ).collect()
    assert r[0].graphName == "g"
    assert r[0].relationshipCount == 9
    f = eng.run(
        "CALL gds.graph.filter('gt', 'g', '*', 'r.distance <= 0.15')"
    ).collect()
    assert f[0].fromGraphName == "g"
    # A1-A2, A2-A3 (exact-threshold 0.15), B1-B2, B3-B2, C1-A1, F1-F2
    assert f[0].relationshipCount == 6
    via_name = {
        (r.nodeId, r.componentId)
        for r in eng.run(
            "CALL gds.wcc.stream('gt') YIELD nodeId, componentId "
            "RETURN nodeId, componentId"
        ).collect()
    }
    via_config = {
        (r.nodeId, r.componentId)
        for r in eng.run(
            "CALL gds.wcc.stream('sharesDNA', "
            "{relationshipWeightProperty: 'distance', maxDistance: 0.15}) "
            "YIELD nodeId, componentId RETURN nodeId, componentId"
        ).collect()
    }
    assert via_name == via_config and via_name


def test_graph_project_catalog_management(eng):
    eng.run("CALL gds.graph.project('g', '*', 'sharesDNA')")
    assert eng.run("CALL gds.graph.exists('g')").collect()[0].exists
    assert not eng.run("CALL gds.graph.exists('nope')").collect()[0].exists
    rows = eng.run("CALL gds.graph.list()").collect()
    assert [r.graphName for r in rows] == ["g"]
    eng.run("CALL gds.graph.drop('g')")
    assert eng.run("CALL gds.graph.list()").collect() == []
    with pytest.raises(CypherCompileError, match="no projected graph"):
        eng.run("CALL gds.graph.drop('g')")


def test_graph_project_error_contracts(eng):
    eng.run("CALL gds.graph.project('g', 'PhageGenome', 'sharesDNA')")
    with pytest.raises(CypherCompileError, match="already exists"):
        eng.run("CALL gds.graph.project('g', 'PhageGenome', 'sharesDNA')")
    with pytest.raises(CypherCompileError, match="unknown node label"):
        eng.run("CALL gds.graph.project('h', 'Nope', 'sharesDNA')")
    with pytest.raises(CypherCompileError, match="unknown relationship"):
        eng.run("CALL gds.graph.project('h', 'PhageGenome', 'nope')")
    with pytest.raises(CypherCompileError, match="no projected graph"):
        eng.run("CALL gds.graph.filter('x', 'gone', '*', '*')")
    with pytest.raises(CypherCompileError, match="nodeFilter"):
        eng.run("CALL gds.graph.filter('x', 'g', 'n:Host', '*')")
    with pytest.raises(CypherCompileError, match="not a property"):
        eng.run(
            "CALL gds.graph.project('h', 'PhageGenome', "
            "{sharesDNA: {properties: ['nope']}})"
        )
    with pytest.raises(CypherCompileError, match="unsupported"):
        eng.run(
            "CALL gds.graph.project('h', 'PhageGenome', "
            "{sharesDNA: {orientation: 'NATURAL'}})"
        )


def test_graph_filter_yield_and_reuse(eng):
    """A projection filtered twice at different thresholds: both stay
    live and procs resolve each by name."""
    eng.run("CALL gds.graph.project('g', 'PhageGenome', 'sharesDNA')")
    eng.run("CALL gds.graph.filter('t1', 'g', '*', 'r.distance <= 0.05')")
    eng.run("CALL gds.graph.filter('t2', 'g', '*', 'r.distance <= 0.25')")
    n1 = eng.run(
        "CALL gds.wcc.stream('t1') YIELD nodeId RETURN nodeId"
    ).count()
    n2 = eng.run(
        "CALL gds.wcc.stream('t2') YIELD nodeId RETURN nodeId"
    ).count()
    assert n1 < n2


# --------------------------------------------------------------------------
# Louvain early-exit (VERDICT r7 ask #5)
# --------------------------------------------------------------------------


def test_louvain_early_exit_differential(spark):
    """early_exit=True must be value-IDENTICAL to the full budget — the
    exit only fires at the exact fixpoint (synchronous moves are a
    deterministic function of the assignment)."""
    import random

    rng = random.Random(83)
    rows = sorted({tuple(sorted(rng.sample(range(20), 2))) for _ in range(40)})
    e = spark.createDataFrame(
        [(f"N{a:02d}", f"N{b:02d}") for a, b in rows],
        "src string, dst string",
    )
    for rounds, levels in ((6, 1), (4, 3), (2, 2)):
        full = {
            r.id: r.label
            for r in G.louvain_refine(
                e, rounds=rounds, levels=levels, early_exit=False
            ).collect()
        }
        fast = {
            r.id: r.label
            for r in G.louvain_refine(
                e, rounds=rounds, levels=levels, early_exit=True
            ).collect()
        }
        assert fast == full, (rounds, levels)


def test_louvain_early_exit_cypher_config(eng):
    got = eng.run(
        "CALL gds.louvain.stream('sharesDNA', "
        "{maxIterations: 8, maxLevels: 4, earlyExit: true}) "
        "YIELD nodeId, communityId RETURN nodeId, communityId"
    ).collect()
    want = eng.run(
        "CALL gds.louvain.stream('sharesDNA', "
        "{maxIterations: 8, maxLevels: 4, earlyExit: false}) "
        "YIELD nodeId, communityId RETURN nodeId, communityId"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    with pytest.raises(CypherCompileError, match="earlyExit"):
        eng.run(
            "CALL gds.louvain.stream('sharesDNA', {earlyExit: 3}) "
            "YIELD nodeId RETURN nodeId"
        )


# --------------------------------------------------------------------------
# exact closeness (VERDICT r7 ask #7)
# --------------------------------------------------------------------------


def test_closeness_exact_path_graph(spark):
    # path A-B-C-D: distances are textbook; score = n_reached / sum_d
    e = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "D")], "src string, dst string"
    )
    got = {r.id: r for r in G.closeness_centrality_exact(e).collect()}
    assert got["A"].n_reached == 3 and got["A"].sum_d == 6
    assert got["A"].score == pytest.approx(3 / 6)
    assert got["B"].score == pytest.approx(3 / 4)
    assert got["C"].score == pytest.approx(3 / 4)
    assert got["D"].score == pytest.approx(3 / 6)


def test_closeness_exact_wasserman_faust(spark):
    # two components: A-B and C-D-E; WF damps the small component
    e = spark.createDataFrame(
        [("A", "B"), ("C", "D"), ("D", "E")], "src string, dst string"
    )
    n = 5
    got = {
        r.id: r
        for r in G.closeness_centrality_exact(
            e, wasserman_faust=True
        ).collect()
    }
    assert got["A"].score == pytest.approx(1 * 1 / (1 * (n - 1)))
    assert got["D"].score == pytest.approx(2 * 2 / (2 * (n - 1)))
    assert got["C"].score == pytest.approx(2 * 2 / (3 * (n - 1)))


def test_closeness_exact_max_nodes_guard(spark):
    e = spark.createDataFrame(
        [("A", "B"), ("B", "C")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="max_nodes"):
        G.closeness_centrality_exact(e, max_nodes=2)


def test_closeness_exact_cypher_opt_in(eng, spark):
    got = {
        r.nodeId: r.score
        for r in eng.run(
            "CALL gds.closeness.stream('sharesDNA', {exact: true}) "
            "YIELD nodeId, score RETURN nodeId, score"
        ).collect()
    }
    # A-cluster: A1-A2, A1-A3, A2-A3, C1-A1, A3-B1, B1-B2, B3-B2 connect
    # 8 nodes; spot-check A1 by hand: d(A2)=1,d(A3)=1,d(C1)=1,d(B1)=2,
    # d(B2)=3,d(B3)=4 -> 6/12
    assert got["A1"] == pytest.approx(6 / 12)
    with pytest.raises(CypherCompileError, match="exact"):
        eng.run(
            "CALL gds.closeness.stream('sharesDNA', {exact: 'yes'}) "
            "YIELD nodeId RETURN nodeId"
        )


# --------------------------------------------------------------------------
# core_decomposition pack_ids="auto" probe (VERDICT r7 ask #3)
# --------------------------------------------------------------------------


def test_coredec_auto_pack_probe_decisions(spark):
    # shallow graph: path -> degree h-index 2, far below the cut
    path = spark.createDataFrame(
        [(f"N{i}", f"N{i+1}") for i in range(50)], "src string, dst string"
    )
    assert G._coredec_auto_pack(path, min_nodes=1) is False
    # deep graph: K20 clique -> degree h-index 19 >= cut 16
    k20 = spark.createDataFrame(
        [(f"C{a}", f"C{b}") for a in range(20) for b in range(a + 1, 20)],
        "src string, dst string",
    )
    assert G._coredec_auto_pack(k20, depth_bound_cut=16, min_nodes=1) is True
    # size gate: the same deep graph below min_nodes stays unpacked
    assert G._coredec_auto_pack(k20, depth_bound_cut=16) is False


def test_coredec_auto_pack_hindex_between_degrees(spark):
    # K6: every degree is 5, so the histogram has ONE step (d=5, n=6)
    # where running(6) > d(5) — h = min(5, 6) = 5, the
    # between-distinct-degrees case the max-form handles
    k6 = spark.createDataFrame(
        [(f"H{a}", f"H{b}") for a in range(6) for b in range(a + 1, 6)],
        "src string, dst string",
    )
    assert G._coredec_auto_pack(k6, depth_bound_cut=5, min_nodes=1) is True
    assert G._coredec_auto_pack(k6, depth_bound_cut=6, min_nodes=1) is False


def test_coredec_auto_matches_explicit(spark):
    import random

    rng = random.Random(7)
    rows = sorted({tuple(sorted(rng.sample(range(40), 2))) for _ in range(150)})
    e = spark.createDataFrame(
        [(f"N{a:02d}", f"N{b:02d}") for a, b in rows],
        "src string, dst string",
    )
    want = {
        r.id: r.core
        for r in G.core_decomposition(e, pack_ids=False).collect()
    }
    for mode in ("auto", True):
        got = {
            r.id: r.core
            for r in G.core_decomposition(e, pack_ids=mode).collect()
        }
        assert got == want, mode
