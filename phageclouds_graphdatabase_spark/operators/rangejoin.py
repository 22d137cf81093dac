"""Binned range joins (J7 at scale): large x large non-equi joins as
shuffle equi-joins.

Spark has no range-join optimization: a join whose only condition is
``lo <= p AND p < hi`` (or interval overlap) compiles to
BroadcastNestedLoopJoin when one side fits in memory and a cartesian
product otherwise -- O(|L| x |R|) comparisons, a non-starter when both
sides are large. (The tiny-dimension case is fine as BNLJ and stays so:
``plans/suite_relational.py`` ``range_join_price_bands``.)

The standard fix -- what Databricks' range-join hint does under the hood,
re-expressed here with public DataFrame ops only -- is *binning*:

- pick a bin width ``w`` on the range dimension,
- a point belongs to exactly ONE bin (``floor(p / w)``),
- an interval is exploded to EVERY bin it covers (``sequence`` of bins),
- equi-join on ``(partition keys..., bin)`` -- a plain shuffled
  hash/sort-merge join that partitions across executors -- then
- re-check the exact predicate to drop same-bin false positives.

Exactness: a qualifying (point, interval) pair shares exactly the point's
bin, and an interval contributes each covered bin once, so no duplicate
pairs arise and no ``distinct`` is needed. For interval x interval, a
qualifying pair is seen once per SHARED bin; keeping only the first shared
bin (``bin == greatest(lo_bins)``) restores exactly-once without a
shuffle-side dedup.

Scale notes (100 TB):

- Shuffle volume is ``|L| + sum(interval_len / w + 1)`` rows -- choose
  ``w`` near the typical interval length so each interval explodes into
  O(1) bins. Width is a caller decision because it is data-layout
  knowledge (session length, SLA window), exactly like choosing a
  bucketing column.
- The bin key is high-cardinality (time axis / partition keys x bins), so
  the shuffle spreads; a hot bin (everyone's intervals cover rush hour)
  is an AQE skew-join case, same as any hot join key.
- ``max_bins_per_interval`` fail-fasts when a pathological interval would
  explode into an unbounded row count (the equivalent of a runaway
  ``sequence``), rather than silently materializing it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["point_in_interval_join", "interval_overlap_join"]


def _bin(col: Column, width: int) -> Column:
    # Floor division on an integral axis. Subtracting pmod first makes the
    # numerator an exact multiple of width, so the (double-mediated) divide
    # is exact for |col| < 2^53 -- epoch MICROS sit near 2^50; callers on a
    # nanosecond axis must down-convert first (documented in the join fns).
    return ((col - F.pmod(col, F.lit(width))) / F.lit(width)).cast("long")


def _covered_bins(lo: Column, hi: Column, width: int, cap: int) -> Column:
    """All bins intersecting the half-open interval [lo, hi)."""
    lob = _bin(lo, width).cast("long")
    # hi is exclusive: an interval ending exactly on a bin edge does not
    # reach into that bin.
    hib = _bin(hi - F.lit(1), width).cast("long")
    n = hib - lob + F.lit(1)
    guarded = F.when(
        n > F.lit(cap),
        F.raise_error(
            F.concat(
                F.lit(
                    "binned range join: interval explodes into more than "
                    f"{cap} bins (width too small for this interval): lo="
                ),
                lo.cast("string"),
                F.lit(" hi="),
                hi.cast("string"),
            )
        ).cast("long"),
    ).otherwise(hib)
    # Empty/degenerate intervals (hi <= lo) cover no bins -- without the
    # guard, sequence(lob, hib) with hib < lob would emit a DESCENDING
    # bogus bin list.
    return F.when(hi > lo, F.sequence(lob, guarded)).otherwise(
        F.array().cast("array<long>")
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    partition_keys: Sequence[str] = (),
    max_bins_per_interval: int = 1024,
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``lo <= point < hi`` (half-open), optionally also equi-matching
    ``partition_keys`` present on both sides.

    ``point_col``/``lo_col``/``hi_col`` must be integer-valued (cast
    timestamps to ``unix_micros`` first -- keeping the axis integral is
    what makes the bin arithmetic exact). Output columns: all of
    ``points``'s columns plus ``intervals``'s non-key columns.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be a positive integer")
    keys = list(partition_keys)
    p = points.withColumn("__bin", _bin(F.col(point_col), bin_width).cast("long"))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            _covered_bins(
                F.col(lo_col), F.col(hi_col), bin_width, max_bins_per_interval
            )
        ),
    )
    joined = p.join(iv, keys + ["__bin"], "inner").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("__bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: int,
    partition_keys: Sequence[str] = (),
    max_bins_per_interval: int = 1024,
) -> DataFrame:
    """Inner-join interval pairs whose half-open intersection is NON-EMPTY
    (``greatest(lo) < least(hi)``), binned on both sides.

    For non-empty intervals this equals the textbook
    ``l.lo < r.hi AND r.lo < l.hi``; a degenerate interval (``hi <= lo``)
    matches nothing -- it has no extent to intersect.

    A qualifying pair shares every bin their intersection covers; the
    ``bin == greatest(first bins)`` filter keeps exactly the first shared
    bin, so each pair emerges exactly once with no ``distinct``.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be a positive integer")
    keys = list(partition_keys)
    lb = left.withColumn(
        "__bin",
        F.explode(
            _covered_bins(
                F.col(left_lo), F.col(left_hi), bin_width, max_bins_per_interval
            )
        ),
    )
    rb = right.withColumn(
        "__bin",
        F.explode(
            _covered_bins(
                F.col(right_lo), F.col(right_hi), bin_width, max_bins_per_interval
            )
        ),
    )
    joined = (
        lb.join(rb, keys + ["__bin"], "inner")
        .filter(
            F.greatest(F.col(left_lo), F.col(right_lo))
            < F.least(F.col(left_hi), F.col(right_hi))
        )
        .filter(
            F.col("__bin")
            == F.greatest(
                _bin(F.col(left_lo), bin_width).cast("long"),
                _bin(F.col(right_lo), bin_width).cast("long"),
            )
        )
    )
    return joined.drop("__bin")
