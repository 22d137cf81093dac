"""Invariant tests for the training-data construction wave
(plans/suite_training.py) -- properties the DuckDB value-hash comparison
can't express: permutation-ness, prefix-sum consistency, budget bounds,
and determinism across re-runs (the pipeline's backfill guarantee)."""

from __future__ import annotations

from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.plans import suite_training as tr


def test_shuffle_order_is_permutation(spark, sf_dir):
    rows = tr.shuffle_order_global(spark, sf_dir).collect()
    positions = sorted(r.position for r in rows)
    assert positions == list(range(1, len(rows) + 1))


def test_pack_sequences_prefix_sum_consistent(spark, sf_dir):
    rows = sorted(
        tr.pack_sequences(spark, sf_dir).collect(), key=lambda r: r.doc_id
    )
    cap = tr._PACK_CAPACITY
    expected_start = 0
    for r in rows:
        assert 0 <= r.chunk_offset < cap
        assert r.chunk_id * cap + r.chunk_offset == expected_start
        expected_start += r.n_tokens


def test_split_fractions_and_determinism(spark, sf_dir):
    df = tr.split_train_val_test(spark, sf_dir)
    a = {(r.doc_id, r.split) for r in df.collect()}
    b = {(r.doc_id, r.split) for r in tr.split_train_val_test(spark, sf_dir).collect()}
    assert a == b  # pure function of doc_id: re-runs land identically
    counts = {s: 0 for s in ("train", "val", "test")}
    for _, s in a:
        counts[s] += 1
    n = sum(counts.values())
    # 12/16 - 2/16 - 2/16 nibble slices; allow sampling noise on small sf.
    assert counts["train"] / n > 0.6
    assert counts["val"] > 0 and counts["test"] > 0


def test_source_mixture_respects_budget(spark, sf_dir):
    rows = tr.source_mixture_budget(spark, sf_dir).collect()
    assert rows, "budget admits at least one doc per non-empty source"
    per_source: dict[str, list] = {}
    for r in rows:
        assert r.cum_tokens <= tr._MIX_BUDGET
        per_source.setdefault(r.source, []).append(r)
    for group in per_source.values():
        # cum_tokens is a prefix sum of n_tokens in the (deterministic)
        # selection order.
        assert sorted(r.cum_tokens for r in group)[-1] == sum(
            r.n_tokens for r in group
        )


def test_contamination_bounds(spark, sf_dir):
    rows = tr.contamination_check(spark, sf_dir).collect()
    for r in rows:
        assert r.doc_id >= tr._BENCH_MAX_DOC  # benchmark docs excluded
        assert 0 <= r.n_contaminated <= r.n_shingles
        assert 0.0 <= r.contamination <= 1.0


def test_stratified_sample_caps_every_stratum(spark, sf_dir):
    df = tr.stratified_sample_bylang(spark, sf_dir)
    per_lang = df.groupBy("lang").agg(F.count(F.lit(1)).alias("k")).collect()
    assert per_lang
    for r in per_lang:
        assert r.k <= tr._STRAT_K
