"""Z-order (Morton-curve) clustered parquet layout — multi-dimensional
data skipping at rest.

Bucketing (sources/readers.py write_graph_bucketed) co-locates ONE key;
range-partitioning sorts ONE column. When queries filter on TWO columns
(``x BETWEEN .. AND y BETWEEN ..`` — the range-join / spatial / time+key
shape), neither helps the second dimension. Interleaving the bits of both
columns' bucket ids into a single Morton code and range-partitioning on it
gives every output file a tight bounding box in BOTH dimensions, so the
parquet min/max footer stats let the scan skip most files/row-groups for
any 2-D box predicate. This is the layout technique behind Delta Lake's
OPTIMIZE ZORDER BY; implemented here from first principles on open parquet
(no table format required).

At 100 TB: the z-value is a pure JVM expression (no UDF), the clustering
is one repartitionByRange + sortWithinPartitions (a single shuffle at
write time, amortized over every subsequent scan), and skipping happens in
the ordinary parquet reader via pushed-down min/max — no index service.

Skew note: buckets here are equi-width (``width_bucket``) for expression-
only purity; heavily skewed columns should be pre-ranked (any monotone
int transform preserves the curve's locality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def z_value(bx: Column, by: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int columns
    into a Morton code (x in even positions, y in odd). Pure JVM bit
    arithmetic — whole-stage-codegen friendly, no Python."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(
                F.shiftleft(F.shiftright(bx.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
            ).bitwiseOR(
                F.shiftleft(
                    F.shiftright(by.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
                )
            )
        )
    return z


def _bucket(c: Column, lo: float, hi: float, n: int) -> Column:
    """Equi-width bucket id in [0, n) with clamped edges (width_bucket
    returns 0 / n+1 for out-of-range; clamp keeps the Morton domain tight)."""
    b = F.width_bucket(c.cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(n))
    return F.greatest(F.lit(1), F.least(b, F.lit(n))) - F.lit(1)


def write_zordered(
    df: DataFrame,
    path: str,
    colx: str,
    coly: str,
    n_files: int = 16,
    bits: int = 8,
    stats: tuple | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the (colx, coly) Morton curve:
    ``n_files`` range partitions of the z-value, sorted within each, so
    every file covers a compact 2-D tile. ``stats`` = (xmin, xmax, ymin,
    ymax) skips the min/max pre-scan when the caller already knows them."""
    if stats is None:
        row = df.agg(
            F.min(colx), F.max(colx), F.min(coly), F.max(coly)
        ).collect()[0]
        stats = (row[0], row[1], row[2], row[3])
    xmin, xmax, ymin, ymax = (float(v) for v in stats)
    n = 1 << bits
    z = z_value(
        _bucket(F.col(colx), xmin, xmax, n),
        _bucket(F.col(coly), ymin, ymax, n),
        bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_boxes(path: str, colx: str, coly: str) -> list[dict]:
    """Per-file (min, max) bounding boxes from the parquet footers — the
    exact statistics a min/max-pruning scan consults. Driver-side metadata
    read only (no data pages)."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        sch = {md.schema.column(i).name: i for i in range(md.num_columns)}
        box = {"file": os.path.basename(f), "rows": md.num_rows}
        for col, tag in ((colx, "x"), (coly, "y")):
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(sch[col]).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            box[f"{tag}min"], box[f"{tag}max"] = lo, hi
        out.append(box)
    return out


def files_intersecting(
    boxes: list[dict], x_lo, x_hi, y_lo, y_hi
) -> list[dict]:
    """Files a min/max pruner must read for the 2-D box predicate
    ``colx BETWEEN x_lo AND x_hi AND coly BETWEEN y_lo AND y_hi``."""
    return [
        b
        for b in boxes
        if b["xmin"] is not None
        and not (b["xmax"] < x_lo or b["xmin"] > x_hi)
        and not (b["ymax"] < y_lo or b["ymin"] > y_hi)
    ]
