"""The at-rest edge layout must actually deliver min/max skipping: files are
range-partitioned + sorted on distance, so their Parquet column stats form
tight, (near-)disjoint intervals and a threshold scan can prune."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.sources import sinks


def test_edges_at_rest_stats_are_disjoint_and_prunable(spark, tmp_path):
    edges = spark.range(10_000).select(
        F.concat(F.lit("P"), F.col("id")).alias("src"),
        F.concat(F.lit("S"), (F.col("id") * 7 % 997)).alias("dst"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1000)) / 1000.0).alias("distance"),
    )
    out = str(tmp_path / "edges")
    sinks.write_edges_at_rest(edges, out, num_files=8)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= 4
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(len(md.schema))
            if md.schema.column(i).name == "distance"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # Disjoint (range partitioner): each file's max <= next file's min.
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # A threshold at the first file's max would prune every other file.
    t = ranges[0][1]
    prunable = sum(1 for lo, hi in ranges if lo > t)
    assert prunable == len(ranges) - 1

    # Round-trip integrity under the layout.
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert back.filter(F.col("distance") <= t).count() == edges.filter(
        F.col("distance") <= t
    ).count()
