"""Scale rehearsal for the dedup/near-dup family (W5 north star) on a
planted-near-duplicate corpus — measures THROUGHPUT and RECALL together,
because a dedup pipeline that is fast but misses its duplicates is not done.

Corpus (fully distributed generation — `spark.range` + hash expressions, no
driver-side data): `n_docs` documents over a 50k-word vocabulary, ~60-100
tokens each. A `dup_frac` fraction are near-duplicates: the doc re-derives
its base's token stream and mutates ~1-in-`mut_inv` tokens (deterministic
xxhash64 choices). With 5-gram shingles, a 5% token mutation rate gives
planted Jaccard ≈ 0.6 — squarely in near-dup territory, not trivially
exact. Ground truth = all same-base pairs, so recall is computable by an
equi-join, no oracle needed.

Measured paths (the production shapes from operators/dedup.py and the
minhash suite entries, at rehearsal scale):
- exact dedup: hash-groupBy over the full text
- capped n-gram Jaccard: df<=cap inverted index candidates + exact full-set
  verification (THE bounded-reducer plan)
- MinHash 16-perm / 8-band LSH: banded bucket equi-join candidates,
  Jaccard-verified
- near-dup components -> canonical doc per cluster

Run: python tools/dedup_rehearsal.py --docs 1000000
Prints one JSON line; record the row in SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from phageclouds_graphdatabase_spark.operators.dedup import (  # noqa: E402
    jaccard_pairs_capped,
)
from phageclouds_graphdatabase_spark.operators.graph import (  # noqa: E402
    connected_components,
)
from phageclouds_graphdatabase_spark.session import get_spark  # noqa: E402

VOCAB = 50_000
SHINGLE_K = 5


def gen_docs(spark, n_docs: int, dup_frac: float, mut_inv: int) -> DataFrame:
    """(doc_id, base_id, tokens[]) — dups re-derive the base stream and
    mutate ~1/mut_inv tokens. Pure column expressions: generation scales
    with the cluster, and every run is bit-identical (seeded hashes)."""
    n_base = int(n_docs * (1.0 - dup_frac))
    d = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_base, F.col("id"))
        .otherwise(F.pmod(F.xxhash64("id", F.lit("pick")), F.lit(n_base)))
        .alias("base_id"),
        (F.col("id") >= n_base).alias("is_dup"),
    )
    n_tok = (60 + F.pmod(F.xxhash64("base_id", F.lit("len")), F.lit(40))).cast(
        "int"
    )
    base_word = lambda i: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.xxhash64("base_id", i), F.lit(VOCAB))
    )
    mut_word = lambda i: F.concat(  # noqa: E731
        F.lit("m"), F.pmod(F.xxhash64("doc_id", i, F.lit("mv")), F.lit(VOCAB))
    )
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda i: F.when(
            F.col("is_dup")
            & (F.pmod(F.xxhash64("doc_id", i, F.lit("mut")), F.lit(mut_inv)) == 0),
            mut_word(i),
        ).otherwise(base_word(i)),
    )
    return d.select("doc_id", "base_id", tokens.alias("tokens"))


def shingle(docs: DataFrame) -> DataFrame:
    grams = F.transform(
        F.sequence(F.lit(1), F.size("tokens") - (SHINGLE_K - 1)),
        lambda i: F.concat_ws(" ", F.slice("tokens", i, SHINGLE_K)),
    )
    return docs.select("doc_id", F.explode(grams).alias("shingle"))


def minhash_lsh(shingles: DataFrame, n_perm: int = 16, bands: int = 8) -> DataFrame:
    """16-perm minhash signatures as one grouped agg (map-side partial
    min), banded into `bands` bucket keys, candidates from the bucket
    equi-join. The band table is (doc_id, band, hash) — tiny vs the corpus.

    Band geometry is the recall dial (S-curve P = 1-(1-J^r)^b with r rows
    per band): at the planted J≈0.6, 4 bands x 4 rows gives P≈0.43
    (measured 0.49 at 20k docs) while 8 bands x 2 rows gives P≈0.97 — the
    default here. More bands = more candidate volume; the Jaccard verify
    step keeps precision exact either way."""
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(p))).alias(f"mh_{p}")
        for p in range(n_perm)
    ]
    sigs = shingles.groupBy("doc_id").agg(*aggs)
    rows = bands
    per = n_perm // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(f"mh_{b * per + j}") for j in range(per)]
            ).alias("bh"),
        )
        for b in range(rows)
    ]
    bt = sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc_id", "b.band", "b.bh")
    a, b = bt.alias("a"), bt.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--dup-frac", type=float, default=0.2)
    ap.add_argument("--mut-inv", type=int, default=20, help="mutate 1/N tokens")
    ap.add_argument("--min-jaccard", type=float, default=0.35)
    ap.add_argument("--freq-cap", type=int, default=50)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(
        "dedup-rehearsal",
        shuffle_partitions=max(32, args.docs // 10_000),
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    docs = gen_docs(spark, args.docs, args.dup_frac, args.mut_inv)
    docs = docs.repartition(64).cache()
    n_docs = docs.count()
    gen_sec = round(time.time() - t0, 2)

    # ground truth: same-base pairs (families are small: one base + its dups)
    fam = docs.select("doc_id", "base_id")
    fa, fb = fam.alias("a"), fam.alias("b")
    planted = (
        fa.join(
            fb,
            (F.col("a.base_id") == F.col("b.base_id"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .cache()
    )
    n_planted = planted.count()

    # exact dedup over the full text (near-dups must NOT collapse here)
    t0 = time.time()
    text = docs.select("doc_id", F.concat_ws(" ", "tokens").alias("text"))
    n_exact_groups = (
        text.groupBy(F.xxhash64("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter("n > 1")
        .count()
    )
    exact_sec = round(time.time() - t0, 2)

    sh = shingle(docs)

    # capped n-gram Jaccard (candidates bounded by freq_cap, exact verify)
    t0 = time.time()
    jac = jaccard_pairs_capped(
        sh, min_jaccard=args.min_jaccard, freq_cap=args.freq_cap
    ).cache()
    n_jac = jac.count()
    jac_sec = round(time.time() - t0, 2)
    jac_hits = jac.join(planted, ["doc_a", "doc_b"], "left_semi").count()

    # minhash LSH bands
    t0 = time.time()
    lsh = minhash_lsh(sh).cache()
    n_lsh = lsh.count()
    lsh_sec = round(time.time() - t0, 2)
    lsh_hits = lsh.join(planted, ["doc_a", "doc_b"], "left_semi").count()

    # near-dup graph -> canonical per cluster (min doc_id wins)
    t0 = time.time()
    edges = jac.select(
        F.col("doc_a").cast("string").alias("src"),
        F.col("doc_b").cast("string").alias("dst"),
    )
    comp = connected_components(edges)
    n_clusters = comp.select("component").distinct().count()
    comp_sec = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "dup_frac": args.dup_frac,
                "mut_inv": args.mut_inv,
                "n_planted_pairs": n_planted,
                "gen_sec": gen_sec,
                "exact_sec": exact_sec,
                "n_exact_dup_groups": n_exact_groups,
                "jaccard_sec": jac_sec,
                "n_jaccard_pairs": n_jac,
                "jaccard_recall": round(jac_hits / max(n_planted, 1), 4),
                "lsh_sec": lsh_sec,
                "n_lsh_candidates": n_lsh,
                "lsh_recall": round(lsh_hits / max(n_planted, 1), 4),
                "components_sec": comp_sec,
                "n_clusters": n_clusters,
            }
        )
    )


if __name__ == "__main__":
    main()
