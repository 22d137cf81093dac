"""Streaming graph ingestion: fold micro-batches of new similarity edges
into the cloud-membership table with INCREMENTAL component maintenance
(operators/graph.py merge_components) — the live form of the phage-clouds
model: genomes and sharesDNA edges arrive continuously; clouds merge.

Pattern: ``readStream`` on the edge source → ``foreachBatch`` folds each
batch into a VERSIONED membership directory (``{state_dir}/v=N`` per
micro-batch). Versioning gives exactly-once state evolution with the same
trick as the parquet sink (streaming/events.py run_foreach_batch_parquet):
a replayed batch rereads the version strictly BEFORE its own id and
overwrites its own output path idempotently. The per-batch work is
merge_components' label-graph fold — batch-sized, never graph-sized — so
sustained ingest cost tracks the arrival rate, not the accumulated graph
(SCALE.md: 6.3 s fold vs 14.5 s recompute at 640k/2.49M, gap widening
with scale).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from phageclouds_graphdatabase_spark.operators.graph import merge_components

_EMPTY_SCHEMA = "id string, component string"


def _latest_version(state_dir: str, before: int) -> int | None:
    if not os.path.isdir(state_dir):
        return None
    versions = [
        int(m.group(1))
        for d in os.listdir(state_dir)
        if (m := re.fullmatch(r"v=(\d+)", d))
    ]
    versions = [v for v in versions if v < before]
    return max(versions) if versions else None


def read_membership(
    spark: SparkSession, state_dir: str, version: int | None = None
) -> DataFrame:
    """Membership as of a state version — time travel over the ingest
    history. ``version=None`` reads the highest committed version;
    ``version=N`` reads the newest version <= N (the state as it stood
    after micro-batch N). Empty frame if nothing has been ingested."""
    before = (1 << 62) if version is None else version + 1
    v = _latest_version(state_dir, before=before)
    if v is None:
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    return spark.read.parquet(os.path.join(state_dir, f"v={v}"))


def run_streaming_component_merge(
    edge_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    threshold: float | None = None,
) -> int:
    """Drain the edge stream (availableNow) folding each micro-batch into
    the versioned membership state. Returns the number of batches folded
    THIS run — rerunning over the same checkpoint returns 0 and leaves the
    state untouched (exactly-once, see module docstring)."""
    spark = edge_stream.sparkSession
    n_batches = [0]

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        prev = _latest_version(state_dir, before=batch_id)
        if prev is None:
            membership = spark.createDataFrame([], _EMPTY_SCHEMA)
        else:
            membership = spark.read.parquet(
                os.path.join(state_dir, f"v={prev}")
            )
        out = merge_components(membership, batch_df, threshold=threshold)
        # materialize before writing: out reads the previous version's
        # files, and (on replay) the output path may be its own input's
        # sibling — localCheckpoint cuts the dependency
        out.localCheckpoint().write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v={batch_id}")
        )
        n_batches[0] += 1

    q = (
        edge_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return n_batches[0]
