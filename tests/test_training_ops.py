"""Hand-derived fixtures for the round-2 training-op additions (BPE merge
training, BM25 exact-integer scoring, negative-sampling weights) — the
oracle suite proves cross-engine equality at sf0.01; these pin the
SEMANTICS against values computed by hand."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.plans.suite_training import (
    _BPE_FOLD_SPARK,
    _bpe_pairs,
    bm25_doc_ranking,
    negative_sampling_table,
)


def _syms_frame(spark, rows):
    df = spark.createDataFrame(rows, "word string, wf long")
    return df.select(
        "wf",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    )


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    s0 = _syms_frame(spark, [("abab", 2), ("abc", 1)])
    got = {(r["l"], r["r"]): r["cnt"] for r in _bpe_pairs(s0).collect()}
    # abab (wf 2): (a,b) twice, (b,a) once; abc (wf 1): (a,b), (b,c)
    assert got == {("a", "b"): 5, ("b", "a"): 2, ("b", "c"): 1}


def test_bpe_merge_fold_greedy_non_overlapping(spark):
    s0 = _syms_frame(spark, [("aaa", 1), ("abab", 1), ("bab", 1), ("z", 1)])
    merged = s0.withColumn("ml", F.lit("a")).withColumn("mr", F.lit("a"))
    out = merged.select(
        F.expr(
            "aggregate(slice(syms, 2, size(syms) - 1),"
            f" element_at(syms, 1), (acc, x) -> {_BPE_FOLD_SPARK})"
        ).alias("m")
    )
    got = sorted(r["m"] for r in out.collect())
    # merge (a,a): "aaa" -> "aa a" (greedy left, non-overlapping);
    # others have no adjacent (a,a)
    assert got == sorted(["aa a", "a b a b", "b a b", "z"])


def test_bpe_merge_fold_single_symbol_word(spark):
    s0 = _syms_frame(spark, [("q", 7)])
    out = s0.withColumn("ml", F.lit("a")).withColumn("mr", F.lit("b")).select(
        F.expr(
            "aggregate(slice(syms, 2, size(syms) - 1),"
            f" element_at(syms, 1), (acc, x) -> {_BPE_FOLD_SPARK})"
        ).alias("m")
    )
    assert out.collect()[0]["m"] == "q"


def test_bm25_score_matches_hand_computation(spark, sf_dir):
    rows = {r["doc_id"]: r for r in bm25_doc_ranking(spark, sf_dir).collect()}
    assert rows, "no docs matched the query terms"
    # recompute one doc's score from raw data with exact integer arithmetic
    from phageclouds_graphdatabase_spark.plans._suite_helpers import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = {
        r["doc_id"]: [t for t in r["text"].strip().lower().split() if t]
        for r in docs.collect()
    }
    n_docs = len(toks)
    corpus_len = sum(len(v) for v in toks.values())
    terms = ("spark", "join", "merge", "window")
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    some_id = next(iter(rows))
    want = 0
    n_terms = 0
    for t in terms:
        tf = toks[some_id].count(t)
        if tf == 0:
            continue
        n_terms += 1
        dl = len(toks[some_id])
        num = 22 * tf * corpus_len * (2 * n_docs - 2 * df[t] + 1)
        den = (
            10 * corpus_len * tf + 3 * corpus_len + 9 * dl * n_docs
        ) * (2 * df[t] + 1)
        want += math.floor(num / den * 1000000.0 + 0.5)
    assert rows[some_id]["score_micro"] == want
    assert rows[some_id]["n_terms"] == n_terms


def test_negative_sampling_weights_and_ppb(spark, sf_dir):
    out = negative_sampling_table(spark, sf_dir).collect()
    assert out and out[0]["rnk"] == 1
    # weight = floor(sqrt(sqrt(cnt^3)) * 1e6 + .5), ranks strictly ordered
    for r in out:
        c = r["cnt"]
        assert r["weight_q"] == math.floor(
            math.sqrt(math.sqrt(float(c * c * c))) * 1000000.0 + 0.5
        )
    ws = [(r["weight_q"], r["tok"]) for r in out]
    assert ws == sorted(ws, key=lambda p: (-p[0], p[1]))
    # p_ppb consistent with one shared normalizer
    tot = set()
    for r in out:
        if r["p_ppb"]:
            lo = r["weight_q"] * 1000000000.0 / (r["p_ppb"] + 1)
            hi = r["weight_q"] * 1000000000.0 / r["p_ppb"]
            tot.add((math.floor(lo), math.ceil(hi)))
    # all implied normalizer intervals intersect
    lo = max(a for a, _ in tot)
    hi = min(b for _, b in tot)
    assert lo <= hi
