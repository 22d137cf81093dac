"""Frequency-capped Jaccard near-dup (operators/dedup.py): capped candidate
generation + exact verification. With no cap it must equal the single-pass
inverted-index join; with a cap, every reported pair carries the EXACT
uncapped jaccard, and only all-hot-shingle pairs may be missing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.operators.dedup import jaccard_pairs_capped
from phageclouds_graphdatabase_spark.plans import suite_extensions as ext


@pytest.fixture(scope="module")
def shingles(spark, sf_dir):
    return ext._shingled(spark, sf_dir).cache()


def rows(df):
    return sorted((r.doc_a, r.doc_b, r.n_shared, round(r.jaccard, 12)) for r in df.collect())


def test_uncapped_equals_single_pass(spark, sf_dir, shingles):
    got = rows(jaccard_pairs_capped(shingles, 0.03, freq_cap=None))
    want = rows(ext.neardup_jaccard_pairs(spark, sf_dir))
    assert got == want and len(got) > 0


def test_capped_is_subset_with_exact_values(spark, sf_dir, shingles):
    capped = rows(jaccard_pairs_capped(shingles, 0.03, freq_cap=5))
    full = rows(jaccard_pairs_capped(shingles, 0.03, freq_cap=None))
    # values are exact (verification runs on full sets), so any pair that
    # survives capping appears with an identical row
    assert set(capped) <= set(full)
    assert len(capped) > 0


def test_huge_cap_changes_nothing(shingles):
    assert rows(jaccard_pairs_capped(shingles, 0.03, freq_cap=10**6)) == rows(
        jaccard_pairs_capped(shingles, 0.03, freq_cap=None)
    )


def test_planted_neardup_recall(spark):
    """Recall regression guard on a tiny planted-near-dup corpus (the
    rehearsal tool's generator at 2k docs): the capped-Jaccard production
    shape must recover >90% of planted same-base pairs at t=0.35, and the
    16-perm/8-band LSH >85% (S-curve P≈0.97 at the planted J≈0.6, minus
    the pairs whose mutations land below the curve's sweet spot)."""
    from tools.dedup_rehearsal import gen_docs, minhash_lsh, shingle
    from phageclouds_graphdatabase_spark.operators.dedup import (
        jaccard_pairs_capped,
    )

    docs = gen_docs(spark, 2000, 0.2, 20).cache()
    fam = docs.select("doc_id", "base_id")
    fa, fb = fam.alias("a"), fam.alias("b")
    planted = fa.join(
        fb,
        (F.col("a.base_id") == F.col("b.base_id"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    ).cache()
    n_planted = planted.count()
    assert n_planted > 100
    sh = shingle(docs)
    jac = jaccard_pairs_capped(sh, min_jaccard=0.35, freq_cap=50)
    jac_recall = (
        jac.join(planted, ["doc_a", "doc_b"], "left_semi").count() / n_planted
    )
    assert jac_recall > 0.9, jac_recall
    lsh = minhash_lsh(sh)
    lsh_recall = (
        lsh.join(planted, ["doc_a", "doc_b"], "left_semi").count() / n_planted
    )
    assert lsh_recall > 0.85, lsh_recall
