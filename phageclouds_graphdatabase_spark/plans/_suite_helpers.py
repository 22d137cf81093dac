"""Shared helpers for the oracle-checked query suite.

Cross-engine exactness rules (Spark result must hash-equal the DuckDB oracle
value-for-value, so every expression is designed to be bit-identical in both
engines):

- **Money/double sums**: floating sums are order-dependent, so never sum raw
  doubles that aren't integer-valued. Quantize per-row to integer cents with
  ``FLOOR(x * 100.0 + 0.5)`` (IEEE multiply + floor are deterministic in both
  engines), sum exactly as BIGINT.
- **Averages/ratios**: exact integer (or integer-valued-double) numerator and
  denominator, single IEEE division written identically on both sides.
- **Hashing**: ``md5`` only -- both engines produce identical lowercase hex.
  (Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` are different
  algorithms.)
- **Counts**: DuckDB ``SUM(int)`` returns HUGEINT -- oracle SQL always wraps
  in ``CAST(... AS BIGINT)``; Spark side casts window ranks int->long.
- **Top-k**: every LIMIT/rank carries a unique tie-break key.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.sources.readers import read_table


@dataclass(frozen=True)
class SuiteEntry:
    """One oracle-checked query: Spark implementation + equivalent DuckDB SQL
    (None => non-SQL-expressible; driver does a weaker rows-only check) +
    the SURVEY.md §2 rows this query covers."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_rows: tuple[str, ...] = field(default_factory=tuple)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def cents(col: Column) -> Column:
    """Quantize a double to integer cents, deterministically in IEEE terms.
    Oracle equivalent: CAST(FLOOR((<expr>) * 100.0 + 0.5) AS BIGINT)."""
    return F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("long")


def quant(col: Column, scale: float = 10000.0) -> Column:
    """Quantize to integer at the given scale (embeddings -> exact integer
    dot products). Oracle: CAST(FLOOR(CAST(x AS DOUBLE) * <scale> + 0.5) AS BIGINT)."""
    return F.floor(col.cast("double") * F.lit(scale) + F.lit(0.5)).cast("long")


def epoch_us(col: Column) -> Column:
    """Microseconds since 1970-01-01 for a TIMESTAMP_NTZ column,
    SESSION-TIMEZONE-INDEPENDENT (pure wall-clock arithmetic): the driver
    runs the suite in its own plain SparkSession whose timeZone we don't
    control, and ``unix_micros(cast(ntz AS timestamp))`` shifts by the
    session offset. Oracle equivalent: DuckDB ``epoch_us(ts)`` (naive
    timestamps treated as UTC)."""
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        col.cast("timestamp_ntz"),
    )


def arr_str(col: Column | str) -> Column:
    """Serialize an array column to a ``'->'``-joined string, NULL-preserving.

    The driver's canonicalizer sorts result rows with pandas ``sort_values``,
    which cannot factorize list cells — so every suite entry that emits an
    array to the driver serializes it identically on both sides. Oracle
    equivalent: ``array_to_string(<list>, '->')`` (also NULL-for-NULL;
    empty arrays never occur in the suite — DuckDB maps them to NULL while
    Spark's concat_ws yields '', so keep them out)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat_ws("->", c.cast("array<string>"))
    )


def tokens(col: Column) -> Column:
    """Whitespace tokenization, empty-safe; oracle equivalent:
    list_filter(regexp_split_to_array(trim(x), '\\s+'), t -> t <> '')."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda x: x != F.lit(""))


# Derived graph over the driver testdata (the phage tables don't exist in
# /root/testdata, so graph-operator oracle checks run on a graph derived from
# lineitem: part nodes 'P<key>' --(distance = min l_discount)--> supplier
# nodes 'S<key>'. Semantics identical to the sharesDNA edge table.)
GRAPH_EDGES_SQL = """
    SELECT 'P' || l_partkey AS src, 'S' || l_suppkey AS dst,
           MIN(l_discount) AS distance
    FROM lineitem GROUP BY 1, 2
"""

GRAPH_SEEDS_SQL = """
    SELECT DISTINCT 'P' || p_partkey AS id FROM part WHERE p_type = 'ECONOMY'
"""

GRAPH_THRESHOLD = 0.02


def graph_edges(
    spark: SparkSession, sf_dir: str, threshold: float | None = None
) -> DataFrame:
    """The derived edge table; pass ``threshold`` when every downstream use
    filters ``distance <= threshold`` (all the graph suite queries do).

    Filter-through-min rewrite: a group qualifies iff it has a row with
    ``l_discount <= t``, and MIN over that subset equals MIN over the full
    group whenever the subset is non-empty -- so the row-level filter is
    EXACTLY equivalent and, unlike the post-aggregation filter, pushes down
    to the Parquet scan (4x fewer rows into the shuffle at sf0.1; verified
    result-identical). Catalyst can't derive this itself (it's an algebraic
    property of MIN, not a generic rewrite)."""
    li = t(spark, sf_dir, "lineitem")
    if threshold is not None:
        li = li.filter(F.col("l_discount") <= F.lit(threshold))
    return li.groupBy(
        F.concat(F.lit("P"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
    ).agg(F.min("l_discount").alias("distance"))


def graph_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type") == "ECONOMY")
        .select(F.concat(F.lit("P"), F.col("p_partkey")).alias("id"))
        .distinct()
    )
