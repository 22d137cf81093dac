"""Scans / sources (SURVEY.md §2.1).

Replaces the reference's bolt connection + Cypher executor
(``/root/reference/phageclouds_gdb.py:9-42``, S1-S3) with Parquet/CSV scans:
the graph lives at rest in columnar Parquet, so predicate pushdown and column
pruning reach the file scan for free (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark import schemas

# Driver testdata tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata Parquet table.

    The events table stores TIMESTAMP(NANOS) which Spark's Parquet reader
    rejects by default; read nanos as long (legacy conf, set defensively at
    runtime so this works under any caller-provided session) and convert to
    a microsecond timestamp -- the same truncation DuckDB applies when it
    coerces TIMESTAMP_NS to TIMESTAMP."""
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql plans)."""
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_phage_nodes(spark: SparkSession, path: str) -> DataFrame:
    """Node table scan (S1). Declared schema validates on ingest -- an upgrade
    over Neo4j's implicit schema (SURVEY.md §1.2)."""
    return spark.read.schema(schemas.PHAGE_NODES).parquet(path)


def read_shares_dna(spark: SparkSession, path: str) -> DataFrame:
    """Edge table scan. At the 100 TB tier this table is written sorted by
    ``distance`` within files so every ``distance <= t`` predicate prunes
    row groups via Parquet min/max stats (SURVEY.md §4), and bucketed by
    ``src`` so expand joins co-locate."""
    return spark.read.schema(schemas.SHARES_DNA).parquet(path)


def read_infects(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(schemas.INFECTS).parquet(path)


def read_lineages_csv(spark: SparkSession, path: str) -> DataFrame:
    """Taxonomy dimension (S4/S5): the committed lineages CSV *is* the dim
    table that replaces per-row ete3 sqlite lookups
    (``/root/reference/phageclouds_gdb_family.py:48-54,69-76``). Small enough
    to broadcast in every join."""
    return spark.read.csv(path, header=True, schema=schemas.LINEAGES)


def read_acc_taxid(spark: SparkSession, path: str) -> DataFrame:
    """accession->taxid mapping (headerless CSV), the broadcast equivalent of
    the dict at ``/root/reference/phageclouds_gdb_family.py:101-102`` (J6)."""
    return spark.read.csv(path, header=False, schema=schemas.ACC_TAXID)
