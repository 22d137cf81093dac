"""Skew-mitigation operators (SURVEY.md §4 "skew handling", SCALE.md).

AQE's skew-join splitting handles most hub-key skew automatically (enabled
in session.py). These helpers cover the cases AQE can't: aggregations over a
hot key, and shuffled joins where one side must be replicated. Hub
accessions are real in the reference data -- goldens contain near-cliques
(264 nodes / 23k edges in Tequatrovirus_025), so a handful of accessions
carry orders of magnitude more edges than the median.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Add a uniform salt column in [0, n_salts). Deterministic per row when
    the row carries a stable key -- use salt_from() for that; this variant
    uses a per-partition counter and is for aggregate pre-splitting where
    placement doesn't matter, only uniformity."""
    return df.withColumn(
        col_name, (F.spark_partition_id() + F.monotonically_increasing_id()) % n_salts
    )


def salt_from(key: Column, n_salts: int) -> Column:
    """Deterministic salt derived from a key expression (stable across
    retries -- required for exactly-once semantics under task re-execution)."""
    return F.pmod(F.hash(key), F.lit(n_salts))


def two_phase_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Skew-safe groupBy-count: pre-aggregate on (key, salt), then final
    aggregate on key. The hot key's rows split across n_salts reducers in
    phase 1 instead of landing on one. (Spark's hash aggregate already does
    map-side partials; this additionally splits the REDUCE side, which
    partials can't -- the classic two-phase fix for a single dominant key.)

    Equivalent to ``df.groupBy(key).count()`` for any input.
    """
    salted = df.withColumn("_salt", salt_from(F.monotonically_increasing_id(), n_salts))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").cast("long").alias("count"))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed-side salted equi-join: the skewed side gets a deterministic
    per-row salt, the other side is replicated n_salts times, and the join
    key becomes (on, salt) -- the hot key's rows spread over n_salts
    reducers. Use when the small side is too big to broadcast but the big
    side has dominant keys and AQE's split isn't available (e.g. inside
    cached/checkpointed subplans).

    Result is row-identical to ``skewed.join(other, on, how)`` for inner and
    left joins (other-side rows replicate then de-collide via the salt).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    s = skewed.withColumn("_salt", salt_from(F.monotonically_increasing_id(), n_salts))
    replicas = other.crossJoin(
        F.broadcast(
            other.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    joined = s.join(replicas, [on, "_salt"], how)
    return joined.drop("_salt")
