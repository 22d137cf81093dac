"""Cell-partitioned IVF index (operators/ann.py): the probe must be a
partition-PRUNED scan (the measured fix for the join-probe's candidate
shuffle, SCALE.md "ANN rehearsal"), and its top-k must equal brute force
restricted to the probed cells."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.operators import ann


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    from tools.ann_rehearsal import assign_cells, gen_vectors, train_centroids

    corpus = gen_vectors(spark, 5000, 16, 32).cache()
    cents = train_centroids(corpus, 8, 16, iters=1)
    assigned = assign_cells(corpus, cents).cache()
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    ann.write_ivf_index(assigned, path)
    return path, assigned, cents


def test_index_layout_one_file_per_cell(index, spark):
    import glob
    import os

    path, assigned, _ = index
    cells = sorted(
        r.cell for r in assigned.select("cell").distinct().collect()
    )
    for c in cells:
        files = glob.glob(os.path.join(path, f"cell={c}", "*.parquet"))
        assert len(files) == 1, (c, files)
    # nothing lost in the round trip
    assert spark.read.parquet(path).count() == assigned.count()


def test_index_layout_salted_multi_file_cells(index, spark, tmp_path):
    # round-3 ADVICE: hashing by cell alone pinned every cell to ONE file;
    # max_files_per_cell > 1 now salts deterministically on vec_id so a
    # large cell fans out (up to the cap) — the 100-TB knob for keeping
    # single files at ~128-512 MB
    import glob
    import os

    _, assigned, _ = index
    path = str(tmp_path / "salted")
    ann.write_ivf_index(assigned, path, max_files_per_cell=4)
    sizes = []
    for c in (r.cell for r in assigned.select("cell").distinct().collect()):
        files = glob.glob(os.path.join(path, f"cell={c}", "*.parquet"))
        assert 1 <= len(files) <= 4, (c, files)
        sizes.append(len(files))
    # with ~625 rows/cell the xxhash64 salt hits all 4 buckets
    assert max(sizes) == 4
    assert spark.read.parquet(path).count() == assigned.count()
    # deterministic layout: a rerun produces the same file fan-out
    path2 = str(tmp_path / "salted2")
    ann.write_ivf_index(assigned, path2, max_files_per_cell=4)
    n2 = sorted(
        len(glob.glob(os.path.join(path2, d, "*.parquet")))
        for d in os.listdir(path2) if d.startswith("cell=")
    )
    assert n2 == sorted(sizes)


def test_probe_scan_is_partition_pruned(index, spark):
    path, assigned, _ = index
    probed = ann.read_ivf_cells(spark, path, [1, 3])
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    want = assigned.filter(F.col("cell").isin([1, 3])).count()
    assert probed.count() == want
    # the pruned scan reads only the probed directories
    n_parts = spark.read.parquet(path).select("cell").distinct().count()
    assert want < assigned.count() or n_parts <= 2


def test_probe_topk_matches_bruteforce_in_cells(index, spark):
    path, assigned, cents = index
    qrows = assigned.filter(F.col("vec_id") < 3).collect()
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    query_cells = []
    queries = []
    for r in qrows:
        v = np.array(r.vec)
        top2 = np.argsort(-(v / np.linalg.norm(v)) @ cn.T)[:2]
        query_cells.append((r.vec_id, [int(c) for c in top2]))
        queries.append((r.vec_id, [float(x) for x in r.vec]))
    got = ann.probe_topk(spark, path, query_cells, queries, k=5)
    rows = got.collect()
    assert len(rows) == 15  # 3 queries x k
    # brute-force within the same cells (numpy) must agree
    adf = assigned.collect()
    by_id = {r.vec_id: (r.cell, np.array(r.vec)) for r in adf}
    for qid, cells in query_cells:
        qv = np.array(dict(queries)[qid])
        qn = qv / np.linalg.norm(qv)
        sims = sorted(
            (
                (float(qn @ (v / np.linalg.norm(v))), vid)
                for vid, (cell, v) in by_id.items()
                if cell in cells
            ),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        want_ids = [vid for _, vid in sims]
        got_ids = [
            r.vec_id
            for r in sorted(
                (r for r in rows if r.qid == qid),
                key=lambda r: (-r.sim, r.vec_id),
            )
        ]
        assert got_ids == want_ids
        # the query itself is in its own top cells -> sim 1.0 first
        assert got_ids[0] == qid


def test_pq_ann_codes_and_recall(spark):
    """PQ entry invariants: every vector gets exactly M codes in [0, K);
    the ADC top-1 for a query that IS a codebook seed includes vectors
    whose exact distance is small (PQ distance >= 0 and self-excluded)."""
    from phageclouds_graphdatabase_spark.plans import suite_extensions as ext

    sf = "/root/testdata/sf0.001"
    out = ext.pq_ann_topk(spark, sf).collect()
    assert len(out) == ext._PQ_NQ * ext._PQ_TOPK
    for r in out:
        assert r.qid != r.nbr          # self excluded
        assert r.adc_d2 >= 0
        assert 1 <= r.rank <= ext._PQ_TOPK
    # ranks are dense per query and ordered by (adc_d2, nbr)
    for qid in {r.qid for r in out}:
        rs = sorted((r for r in out if r.qid == qid), key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, ext._PQ_TOPK + 1))
        pairs = [(r.adc_d2, r.nbr) for r in rs]
        assert pairs == sorted(pairs)


@pytest.fixture(scope="module")
def ivfpq_index(spark, tmp_path_factory):
    from tools.ann_rehearsal import assign_cells, gen_vectors, train_centroids

    corpus = gen_vectors(spark, 20_000, 16, 32).cache()
    cents = train_centroids(corpus, 8, 16)
    assigned = assign_cells(corpus, cents).cache()
    books = ann.pq_train_np(
        np.stack(corpus.filter(F.col("vec_id") < 5000).toPandas()["vec"]).astype(
            float
        ),
        m_sub=4,
        n_codes=32,
    )
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    ann.write_ivfpq_index(assigned, path, books)
    return path, assigned, cents, books


def test_ivfpq_index_carries_codes_and_vecs(ivfpq_index, spark):
    path, assigned, _, books = ivfpq_index
    back = spark.read.parquet(path)
    assert {"vec_id", "vec", "codes", "cell"} <= set(back.columns)
    assert back.count() == assigned.count()
    row = back.filter(F.col("vec_id") == 7).collect()[0]
    assert len(row.codes) == 4 and all(0 <= c < 32 for c in row.codes)


def test_ivfpq_adc_scan_prunes_vec_column(ivfpq_index, spark):
    path, _, _, _ = ivfpq_index
    scan = ann.read_ivf_cells(spark, path, [0, 1]).select(
        "vec_id", "cell", "codes"
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    rs = plan.split("ReadSchema")[1].split("\n")[0]
    assert "codes" in rs and "vec:" not in rs, rs


def test_ivfpq_full_refine_equals_exact_probe(ivfpq_index, spark):
    # shortlist >= every candidate in the probed cells -> the rescore IS
    # the exact cosine ranking -> identical to probe_topk
    path, assigned, cents, books = ivfpq_index
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    qrows = assigned.filter(F.col("vec_id") < 3).collect()
    query_cells, queries = [], []
    for r in qrows:
        qv = np.array(r.vec)
        top2 = np.argsort(-((qv / np.linalg.norm(qv)) @ cn.T))[:2]
        query_cells.append((r.vec_id, [int(c) for c in top2]))
        queries.append((r.vec_id, [float(x) for x in r.vec]))
    exact = ann.probe_topk(spark, path, query_cells, queries, k=5)
    pq = ann.probe_ivfpq_topk(
        spark, path, query_cells, queries, books, k=5, refine=100_000
    )
    want = {(r.qid, r.vec_id) for r in exact.collect()}
    got = {(r.qid, r.vec_id) for r in pq.collect()}
    assert got == want


def test_ivfpq_modest_refine_recall(ivfpq_index, spark):
    path, assigned, cents, books = ivfpq_index
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    qrows = assigned.filter(F.col("vec_id") < 5).collect()
    query_cells, queries = [], []
    for r in qrows:
        qv = np.array(r.vec)
        top2 = np.argsort(-((qv / np.linalg.norm(qv)) @ cn.T))[:2]
        query_cells.append((r.vec_id, [int(c) for c in top2]))
        queries.append((r.vec_id, [float(x) for x in r.vec]))
    exact = ann.probe_topk(spark, path, query_cells, queries, k=10)
    pq = ann.probe_ivfpq_topk(
        spark, path, query_cells, queries, books, k=10, refine=50
    )
    want = {(r.qid, r.vec_id) for r in exact.collect()}
    got = {(r.qid, r.vec_id) for r in pq.collect()}
    overlap = len(want & got) / len(want)
    assert overlap >= 0.6, overlap


def test_knn_scalar_topk_matches_bruteforce(spark):
    """The ±k positional window with the (diff, posdist, id) result order
    must equal the brute-force all-pairs top-k under the SAME order —
    including heavy value ties, where an id-only tiebreak would be wrong
    (round 7, gds.knn.stream)."""
    import random

    from phageclouds_graphdatabase_spark.operators import ann

    rng = random.Random(41)
    n, k = 60, 4
    vals = {f"N{i:02d}": rng.randrange(0, 12) for i in range(n)}  # heavy ties
    order = sorted(vals.items(), key=lambda kv: (kv[1], kv[0]))
    posof = {nid: i for i, (nid, _) in enumerate(order)}

    def brute(nid):
        cands = [
            (abs(vals[nid] - vals[o]), abs(posof[nid] - posof[o]), o)
            for o in vals
            if o != nid
        ]
        return [
            (nid, o, 1_000_000 // (1 + d)) for d, _, o in sorted(cands)[:k]
        ]

    want = sorted(row for nid in vals for row in brute(nid))
    props = spark.createDataFrame(list(vals.items()), "id string, value long")
    got = sorted(tuple(r) for r in ann.knn_scalar_topk(props, k=k).collect())
    assert got == want
    # cross-bucket positions: a tiny bucket width forces many buckets, the
    # two-phase prefix count must still produce the same global order
    got_b = sorted(
        tuple(r)
        for r in ann.knn_scalar_topk(props, k=k, bucket_width=2).collect()
    )
    assert got_b == want
