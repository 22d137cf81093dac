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
