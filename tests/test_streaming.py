"""Structured Streaming tests (W3): each streaming plan runs over the events
parquet with Trigger.AvailableNow and must agree with its batch twin from
plans/suite_extensions.py (stream-batch parity is the correctness contract
for every streaming operator)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.plans import suite_extensions as ext
from phageclouds_graphdatabase_spark.sources.readers import read_table
from phageclouds_graphdatabase_spark.streaming import events as stream


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return stream.read_events_stream(spark, sf_dir)


def test_stream_is_streaming(events_stream):
    assert events_stream.isStreaming


def test_tumbling_counts_match_batch(spark, sf_dir, events_stream):
    # Append mode would (correctly) hold back windows the watermark hasn't
    # passed; complete mode emits the full table for whole-run parity.
    got = stream.run_available_now(
        stream.tumbling_counts(events_stream), output_mode="complete"
    )
    want = (
        ext.events_tumbling_window(spark, sf_dir)
        .select("window_start", "event_type", "n_events")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_session_counts_match_batch(spark, sf_dir, events_stream):
    got = stream.run_available_now(
        stream.session_counts(events_stream), output_mode="complete"
    )
    want = ext.events_session_window(spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(
        (r.user_id, r.session_start, r.n_events) for r in want
    )


def test_stream_dedup_unique_event_ids(spark, sf_dir, events_stream):
    got = stream.run_available_now(stream.stream_dedup(events_stream))
    ids = [r.event_id for r in got]
    assert len(ids) == len(set(ids))
    n_distinct = (
        read_table(spark, sf_dir, "events").select("event_id").distinct().count()
    )
    assert len(ids) == n_distinct


def test_running_user_totals_stateful(spark, sf_dir, events_stream):
    got = stream.run_available_now(
        stream.running_user_totals(events_stream), output_mode="update"
    )
    # Update-mode emits one row per user per micro-batch; the LAST row per
    # user carries the final running totals -- compare against batch.
    final = {}
    for r in got:
        final[r.user_id] = (r.n_events, r.sum_value_cents)
    e = read_table(spark, sf_dir, "events")
    want = {
        r.user_id: (r.n, r.s)
        for r in e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")).alias("s"),
        )
        .collect()
    }
    assert final == want
