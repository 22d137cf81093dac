"""Declared schemas for the property-graph and dimension tables.

The reference's Neo4j schema is implicit/dynamic; this engine declares it
(SURVEY.md §1.2). Every property below is one the reference's Cypher queries
actually touch (citations inline).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Node label PhageGenome -- properties per /root/reference/phageclouds_gdb.py:56-73,
# phageclouds_gdb_host.py:57-75 (accession key, source enum, taxonomy blob,
# genome_size numeric, genus string).
PHAGE_NODES = StructType(
    [
        StructField("accession", StringType(), nullable=False),
        StructField("source", StringType(), nullable=True),
        StructField("taxonomy", StringType(), nullable=True),
        StructField("genome_size", LongType(), nullable=True),
        StructField("genus", StringType(), nullable=True),
    ]
)

# Relationship sharesDNA(distance) -- stored once per unordered pair with an
# arbitrary direction (0 reciprocal pairs / 0 self-loops across the 8 golden
# HTMLs; see SURVEY.md §1.1). distance range-filtered everywhere
# (/root/reference/phageclouds_gdb.py:57,67).
SHARES_DNA = StructType(
    [
        StructField("src", StringType(), nullable=False),
        StructField("dst", StringType(), nullable=False),
        StructField("distance", DoubleType(), nullable=False),
    ]
)

# Relationship infects: PhageGenome -> Host(genus)
# (/root/reference/phageclouds_gdb_host.py:57,61-62).
INFECTS = StructType(
    [
        StructField("src", StringType(), nullable=False),
        StructField("host_genus", StringType(), nullable=False),
    ]
)

HOSTS = StructType([StructField("genus", StringType(), nullable=False)])

# Taxonomy dimension = header of /root/reference/phages.accessions.lineages.csv:1;
# replaces all per-row ete3/sqlite lookups with a broadcast join
# (SURVEY.md §1.2, S5).
LINEAGES = StructType(
    [
        StructField("accession", StringType(), nullable=False),
        StructField("taxid", LongType(), nullable=True),
        StructField("superkingdom", StringType(), nullable=True),
        StructField("phylum", StringType(), nullable=True),
        StructField("class", StringType(), nullable=True),
        StructField("order", StringType(), nullable=True),
        StructField("family", StringType(), nullable=True),
        StructField("subfamily", StringType(), nullable=True),
        StructField("genus", StringType(), nullable=True),
        StructField("species", StringType(), nullable=True),
    ]
)

# Format of /root/reference/phages.accessions.txt.taxid (headerless CSV),
# loaded as a dict at phageclouds_gdb_family.py:101-102 -> broadcast dim here.
ACC_TAXID = StructType(
    [
        StructField("accession", StringType(), nullable=False),
        StructField("taxid", LongType(), nullable=True),
    ]
)

# Extension-surface tables (TESTDATA.md / FIXTURES.md §B).
EVENTS = StructType(
    [
        StructField("event_id", LongType(), nullable=False),
        StructField("ts", TimestampType(), nullable=False),
        StructField("user_id", LongType(), nullable=True),
        StructField("event_type", StringType(), nullable=True),
        StructField("value", DoubleType(), nullable=True),
        StructField("props", StringType(), nullable=True),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), nullable=False),
        StructField("text", StringType(), nullable=True),
        StructField("lang", StringType(), nullable=True),
        StructField("source", StringType(), nullable=True),
        StructField("n_chars", LongType(), nullable=True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), nullable=False),
        StructField("embedding", ArrayType(FloatType()), nullable=True),
        StructField("label", IntegerType(), nullable=True),
    ]
)

# Multimodal extension: opaque binary payload + typed metadata (the decode
# step is stubbed -- image/audio libs are not in the runtime -- but the Spark
# plumbing is real; see operators/multimodal.py).
MEDIA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("kind", StringType(), nullable=False),  # image|audio|video
        StructField("payload", StringType(), nullable=True),  # binary in prod
        StructField("mime", StringType(), nullable=True),
        StructField("width", IntegerType(), nullable=True),
        StructField("height", IntegerType(), nullable=True),
        StructField("duration_ms", LongType(), nullable=True),
    ]
)
