"""SparkSession factory tuned for the engine.

The reference crosses a network boundary (driver -> Neo4j bolt) 2-3x per
query (``/root/reference/phageclouds_gdb.py:24-37``); here the only process
boundary is Spark's own driver<->executor RPC. All defaults below are chosen
for scale-out behavior (AQE, skew-join splitting, broadcast thresholds) and
are equally valid on local[N] and a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the test environment (local[32], 128 GiB); on a real
# cluster these are overridden by spark-submit conf. shuffle.partitions is
# intentionally modest locally -- AQE coalesces further -- while at 100 TB the
# same code runs with shuffle.partitions in the thousands (AQE's
# advisoryPartitionSizeInBytes then governs actual post-shuffle sizing, so the
# static number only needs to be an upper bound).
_DEFAULT_CONF: dict[str, str] = {
    # Adaptive execution: runtime re-planning, partition coalescing, and skew
    # join splitting. Hub accessions make induced-subgraph joins skewed
    # (SURVEY.md §4 "skew handling"), AQE splits those at runtime.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Broadcast node-set / dimension tables (taxonomy dim is ~14k rows in the
    # reference data; node sets are <= a few thousand accessions).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Runtime bloom-filter pushdown for large semi-joins (accession node sets
    # against a 100 TB edge table -- SURVEY.md §4 custom-rule candidates).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Arrow for any pandas interchange (sink-side toPandas, pandas UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp behavior regardless of host TZ.
    "spark.sql.session.timeZone": "UTC",
    # Parquet: vectorized reader on, predicate pushdown on (defaults, pinned
    # here because the engine depends on them for min/max row-group skipping
    # on the distance column).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Quieter local runs.
    "spark.ui.showConsoleProgress": "false",
    # Long-lived sessions: superseded localCheckpoint/cache blocks are only
    # dropped by the ContextCleaner AFTER a driver JVM GC collects their RDD
    # objects, and Spark's safety-net periodic GC fires every 30 MINUTES by
    # default -- a session running many iterative queries (components, k-hop,
    # pagerank) accumulates dead blocks until storage memory churns (measured:
    # the same headline query degrading 1.4s -> 10.7s within one session).
    # A 5-minute periodic GC bounds the accumulation.
    "spark.cleaner.periodicGC.interval": "5min",
}


def get_spark(
    app_name: str = "phageclouds-graphdatabase-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``$SPARK_GRAFT_CPUS`` threads locally, or
    ``local[*]``; on a cluster, leave it None and let spark-submit decide.
    """
    # before the JVM launches: workers inherit PYTHONPATH from it, and
    # transformWithStateInPandas workers need google.protobuf (protomini
    # fallback when the real distribution is absent)
    from phageclouds_graphdatabase_spark.vendor import ensure_protobuf

    ensure_protobuf()
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master is not None:
        builder = builder.master(master)
    conf = dict(_DEFAULT_CONF)
    if master is not None and master.startswith("local"):
        # PySpark's self-launched JVM defaults to -Xmx1g regardless of
        # machine size; in local mode that one heap carries the driver,
        # every executor thread, broadcasts AND the block-manager cache --
        # broadcast builds OOM at reference-full-scale (640k-node graph)
        # under the default. Only effective at JVM launch (first session).
        conf.setdefault(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
