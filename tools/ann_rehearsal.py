"""Scale rehearsal for similarity search (W5): brute-force cosine top-k
baseline vs IVF (k-means coarse quantizer + cell-pruned probe) on a
synthetic clustered embedding corpus — recall@10 and throughput together.

Corpus (distributed generation, deterministic): `n_vec` vectors of `dim`
dims drawn around `n_latent` latent centers (hash-derived center + per-id
noise), so the space has real cluster structure for IVF to exploit and
every run is bit-identical.

The compute shape matches production, not the oracle entries: the suite's
ivf/knn entries keep everything in JVM expressions because they must be
DuckDB-checkable at sf0.01; at rehearsal scale the right tool is an
Arrow-batched numpy matmul inside ``mapInPandas`` (one BLAS GEMM per
record batch — the vectorized-Python path the engine reserves for exactly
this), with centroids broadcast in the closure. Ground truth comes from
the same brute-force kernel, so recall measures IVF's pruning loss only.

Run: python tools/ann_rehearsal.py --vecs 2000000
Prints one JSON line; record the row in SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from phageclouds_graphdatabase_spark.session import get_spark  # noqa: E402


def gen_vectors(spark, n_vec: int, dim: int, n_latent: int) -> DataFrame:
    """(vec_id, cell_true, vec[dim]) — latent center + per-id noise, all
    hash expressions (no driver data, no RNG state)."""
    d = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.pmod(F.xxhash64("id", F.lit("c")), F.lit(n_latent)).alias("latent"),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            (F.pmod(F.xxhash64("latent", i, F.lit("ctr")), F.lit(2000)) - 1000)
            / 1000.0
            + (F.pmod(F.xxhash64("vec_id", i, F.lit("nz")), F.lit(400)) - 200)
            / 1000.0
        ).cast("float"),
    )
    return d.select("vec_id", vec.alias("vec"))


def _topk_against(queries: np.ndarray, qids: np.ndarray, k: int):
    """Returns a mapInPandas function computing, per input batch of corpus
    vectors, the per-query top-k by cosine — one GEMM per Arrow batch."""
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)

    def fn(batches):
        for pdf in batches:
            m = np.stack(pdf["vec"].to_numpy())
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = qn @ m.T  # (n_q, batch)
            top = min(k, sims.shape[1])
            idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            rows = {
                "qid": np.repeat(qids, top),
                "vec_id": pdf["vec_id"].to_numpy()[idx.ravel()],
                "sim": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    return fn


def brute_topk(corpus: DataFrame, queries, qids, k: int) -> DataFrame:
    """Per-batch GEMM top-k, then a global per-query top-k (the classic
    two-phase distributed top-k: candidates per partition are already
    bounded by k, so the final shuffle is tiny)."""
    from pyspark.sql.window import Window

    part = corpus.mapInPandas(
        _topk_against(queries, qids, k),
        "qid long, vec_id long, sim double",
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def train_centroids(
    corpus: DataFrame, k: int, dim: int, iters: int = 2
) -> np.ndarray:
    """Lloyd iterations: hash-sampled init, Arrow-batched GEMM assignment,
    per-cell mean via explode+groupBy (map-side partial avg). Centroids are
    k x dim — driver-resident by design (they broadcast into the UDF)."""
    cents = np.stack(
        corpus.filter(F.col("vec_id") < k).orderBy("vec_id").toPandas()["vec"]
    )
    for _ in range(iters):
        assigned = assign_cells(corpus, cents)
        means = (
            assigned.select(
                "cell", F.posexplode("vec").alias("d", "x")
            )
            .groupBy("cell", "d")
            .agg(F.avg("x").alias("m"))
            .toPandas()
        )
        new = cents.copy()
        for cell, grp in means.groupby("cell"):
            new[int(cell)] = grp.sort_values("d")["m"].to_numpy()
        cents = new
    return cents


def assign_cells(corpus: DataFrame, cents: np.ndarray) -> DataFrame:
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    def fn(batches):
        for pdf in batches:
            m = np.stack(pdf["vec"].to_numpy())
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            cell = np.argmax(mn @ cn.T, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell": cell, "vec": pdf["vec"]}
            )

    return corpus.mapInPandas(fn, "vec_id long, cell int, vec array<float>")


def pq_train(sample: np.ndarray, m_sub: int, n_codes: int, iters: int = 3):
    """Per-subspace Lloyd codebooks over a (normalized) sample — M x K x sub.
    Driver-resident by design: M*K*sub floats (KBs) broadcast into UDFs."""
    books = []
    for s in np.split(sample, m_sub, axis=1):
        c = s[:n_codes].copy()
        s2 = (s ** 2).sum(1, keepdims=True)
        for _ in range(iters):
            # |x-c|^2 = |x|^2 + |c|^2 - 2 x.c — one GEMM, not a broadcast cube
            d = s2 + (c ** 2).sum(1)[None, :] - 2.0 * (s @ c.T)
            a = d.argmin(1)
            for j in range(n_codes):
                mem = s[a == j]
                if len(mem):
                    c[j] = mem.mean(0)
        books.append(c)
    return np.stack(books)


def pq_encode(corpus: DataFrame, books: np.ndarray) -> DataFrame:
    """(vec_id, codes[M]) — each normalized subvector becomes its nearest
    codebook id. One pass over the corpus; output is M small ints per
    vector (the 16-32x at-rest compression that makes 100-TB ANN fit)."""
    m_sub, _, sub = books.shape

    def fn(batches):
        for pdf in batches:
            mat = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            codes = np.empty((len(mat), m_sub), dtype=np.int32)
            for m in range(m_sub):
                s = mat[:, m * sub:(m + 1) * sub]
                c = books[m]
                d = (
                    (s ** 2).sum(1, keepdims=True)
                    + (c ** 2).sum(1)[None, :]
                    - 2.0 * (s @ c.T)
                )
                codes[:, m] = d.argmin(1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "codes": list(codes)})

    return corpus.mapInPandas(fn, "vec_id long, codes array<int>")


def pq_scan(encoded: DataFrame, queries: np.ndarray, qids: np.ndarray,
            books: np.ndarray, k: int) -> DataFrame:
    """Exhaustive ADC scan (the FAISS IndexPQ shape): per query an M x K
    lookup table of exact subspace distances, approx distance = M gathers +
    a sum. No raw vectors move; the scan reads only the code table."""
    from pyspark.sql.window import Window

    m_sub = books.shape[0]
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sub = books.shape[2]
    luts = np.stack([
        np.stack([
            ((qv[m * sub:(m + 1) * sub][None, :] - books[m]) ** 2).sum(-1)
            for m in range(m_sub)
        ])
        for qv in qn
    ])  # nq x M x K

    def fn(batches):
        ar = np.arange(m_sub)
        for pdf in batches:
            codes = np.stack(pdf["codes"].to_numpy())  # b x M
            vid = pdf["vec_id"].to_numpy()
            out = []
            for qi, qid in enumerate(qids):
                d = luts[qi][ar[None, :], codes].sum(1)
                out.append(pd.DataFrame(
                    {"qid": int(qid), "vec_id": vid, "adc": d}
                ))
            yield pd.concat(out)

    scored = encoded.mapInPandas(fn, "qid long, vec_id long, adc double")
    w = Window.partitionBy("qid").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vecs", type=int, default=2_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--latent", type=int, default=1024)
    ap.add_argument("--n-queries", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cells", type=int, default=128)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--pq", action="store_true",
                    help="also run the product-quantization tier")
    ap.add_argument("--pq-m", type=int, default=8, help="PQ subspaces")
    ap.add_argument("--pq-codes", type=int, default=256,
                    help="codes per subspace codebook")
    ap.add_argument("--pq-refine", type=int, default=20,
                    help="shortlist over-fetch factor for the exact rescore")
    ap.add_argument("--knnvec", action="store_true",
                    help="probe ONLY the banded-LSH all-pairs vector KNN "
                    "(knn_vector_topk, the multi-property gds.knn surface) "
                    "at this tier: wall + per-query recall vs brute force")
    ap.add_argument("--knnvec-planes", type=int, default=16)
    ap.add_argument("--knnvec-bands", type=int, default=8)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(
        "ann-rehearsal", shuffle_partitions=max(32, args.vecs // 20_000)
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    corpus = gen_vectors(spark, args.vecs, args.dim, args.latent)
    corpus = corpus.repartition(64).cache()
    n_vec = corpus.count()
    gen_sec = round(time.time() - t0, 2)

    qpdf = (
        corpus.filter(F.col("vec_id") % (n_vec // args.n_queries) == 1)
        .limit(args.n_queries)
        .toPandas()
    )
    queries = np.stack(qpdf["vec"])
    qids = qpdf["vec_id"].to_numpy()

    if args.knnvec:
        # all-pairs KNN (every node, not just the sampled queries) via the
        # operator itself; the sampled queries only ground the recall
        # measurement. Quantize to integer micro-units (the operator's
        # contract — exact dots); recall vs the FLOAT brute truth, so the
        # number includes quantization noise (documented).
        from phageclouds_graphdatabase_spark.operators.ann import (
            knn_vector_topk,
        )

        t0 = time.time()
        truth = brute_topk(corpus, queries, qids, args.k).cache()
        n_truth = truth.count()
        brute_sec = round(time.time() - t0, 2)

        qv = corpus.select(
            F.col("vec_id").cast("string").alias("id"),
            F.transform(
                "vec",
                lambda x: F.floor(x.cast("double") * 10000.0 + 0.5).cast(
                    "long"
                ),
            ).alias("vec"),
        )
        t0 = time.time()
        ann = knn_vector_topk(
            qv, k=args.k, planes=args.knnvec_planes, bands=args.knnvec_bands
        ).cache()
        n_ann = ann.count()
        knn_sec = round(time.time() - t0, 2)
        sample_ann = ann.filter(
            F.col("id1").isin([str(int(q)) for q in qids])
        ).select(
            F.col("id1").cast("long").alias("qid"),
            F.col("id2").cast("long").alias("vec_id"),
        )
        hits = sample_ann.join(truth, ["qid", "vec_id"], "left_semi").count()
        print(json.dumps({
            "probe": "knnvec",
            "n_vec": n_vec,
            "dim": args.dim,
            "latent": args.latent,
            "planes": args.knnvec_planes,
            "bands": args.knnvec_bands,
            "k": args.k,
            "gen_sec": gen_sec,
            "brute_sec": brute_sec,
            "knnvec_sec": knn_sec,
            "n_topk_rows": n_ann,
            "recall_at_k": round(hits / max(n_truth, 1), 4),
        }))
        return

    t0 = time.time()
    truth = brute_topk(corpus, queries, qids, args.k).cache()
    n_truth = truth.count()
    brute_sec = round(time.time() - t0, 2)

    t0 = time.time()
    cents = train_centroids(corpus, args.cells, args.dim)
    train_sec = round(time.time() - t0, 2)

    t0 = time.time()
    assigned = assign_cells(corpus, cents).cache()
    assigned.count()
    assign_sec = round(time.time() - t0, 2)

    # probe: each query searches only its nprobe nearest cells
    t0 = time.time()
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    qcells = np.argsort(-(qn @ cn.T), axis=1)[:, : args.nprobe]
    probe_rows = [
        (int(qids[i]), int(c)) for i in range(len(qids)) for c in qcells[i]
    ]
    probe = spark.createDataFrame(probe_rows, "qid long, cell int")
    cand = assigned.join(F.broadcast(probe), "cell").select(
        "qid", "vec_id", "vec"
    )

    # within-candidate exact cosine: reuse the GEMM kernel per query group
    from pyspark.sql.window import Window

    def score(batches):
        for pdf in batches:
            m = np.stack(pdf["vec"].to_numpy())
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            qidx = {int(q): j for j, q in enumerate(qids)}
            rows_q = pdf["qid"].to_numpy()
            sel = np.array([qidx[int(q)] for q in rows_q])
            sims = np.einsum("ij,ij->i", qn[sel], mn)
            yield pd.DataFrame(
                {"qid": rows_q, "vec_id": pdf["vec_id"], "sim": sims}
            )

    scored = cand.mapInPandas(score, "qid long, vec_id long, sim double")
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    ivf = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= args.k)
        .drop("rk")
        .cache()
    )
    n_ivf = ivf.count()
    probe_sec = round(time.time() - t0, 2)

    hits = ivf.join(truth, ["qid", "vec_id"], "left_semi").count()
    recall = hits / max(n_truth, 1)

    pq_stats = {}
    if args.pq:
        t0 = time.time()
        sample = np.stack(
            corpus.filter(F.col("vec_id") < 50_000).toPandas()["vec"]
        ).astype(np.float64)
        sample /= np.linalg.norm(sample, axis=1, keepdims=True)
        books = pq_train(sample, args.pq_m, args.pq_codes)
        pq_train_sec = round(time.time() - t0, 2)

        t0 = time.time()
        encoded = pq_encode(corpus, books).cache()
        encoded.count()
        pq_encode_sec = round(time.time() - t0, 2)

        # ADC shortlist (20x over-fetch), then exact rescore on raw vectors:
        # the production IndexPQ + refine shape — the code-table scan prunes
        # 100k -> 200 per query, only the shortlist touches raw floats
        t0 = time.time()
        shortlist = pq_scan(encoded, queries, qids, books, args.k * args.pq_refine).cache()
        shortlist.count()
        pq_scan_sec = round(time.time() - t0, 2)
        pq_hits_adc = (
            pq_scan(encoded, queries, qids, books, args.k)
            .join(truth, ["qid", "vec_id"], "left_semi")
            .count()
        )

        t0 = time.time()
        cand_pq = shortlist.join(corpus, "vec_id").select("qid", "vec_id", "vec")
        rescored = cand_pq.mapInPandas(score, "qid long, vec_id long, sim double")
        wq = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
        pq_top = (
            rescored.withColumn("rk", F.row_number().over(wq))
            .filter(F.col("rk") <= args.k)
            .drop("rk")
            .cache()
        )
        n_pq = pq_top.count()
        pq_rescore_sec = round(time.time() - t0, 2)
        pq_hits = pq_top.join(truth, ["qid", "vec_id"], "left_semi").count()
        pq_stats = {
            "pq_m": args.pq_m,
            "pq_codes": args.pq_codes,
            "pq_refine": args.pq_refine,
            "pq_train_sec": pq_train_sec,
            "pq_encode_sec": pq_encode_sec,
            "pq_scan_sec": pq_scan_sec,
            "pq_rescore_sec": pq_rescore_sec,
            "pq_adc_recall_at_k": round(pq_hits_adc / max(n_truth, 1), 4),
            "pq_recall_at_k": round(pq_hits / max(n_truth, 1), 4),
            "n_pq_results": n_pq,
        }

    print(
        json.dumps(
            {
                "n_vec": n_vec,
                "dim": args.dim,
                "n_queries": len(qids),
                "k": args.k,
                "cells": args.cells,
                "nprobe": args.nprobe,
                "gen_sec": gen_sec,
                "brute_sec": brute_sec,
                "train_sec": train_sec,
                "assign_sec": assign_sec,
                "probe_sec": probe_sec,
                "recall_at_k": round(recall, 4),
                "n_ivf_results": n_ivf,
                **pq_stats,
            }
        )
    )


if __name__ == "__main__":
    main()
