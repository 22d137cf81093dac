"""IVF index at rest: the embedding corpus partitioned by coarse-quantizer
cell, so an nprobe probe is a PARTITION-PRUNED SCAN instead of a join.

Why this module exists — a measured result, not a guess
(tools/ann_rehearsal.py, SCALE.md "ANN rehearsal"): expressing the IVF
probe as `corpus JOIN probed_cells` shuffles every candidate row WITH its
vector (8M × 32d, 1000 queries: ~250M candidate rows, the probe ran 86 s
against 23 s for brute-force GEMM over the cached corpus). The join is the
wrong physical shape. With the corpus written `partitionBy("cell")`, the
same probe becomes `read.parquet(index).filter(cell IN probed)` — Spark
prunes to the probed directories at PLANNING time (the scan's
PartitionFilters; tests pin this), reads nprobe/k of the bytes, and the
only shuffle left is the final per-query top-k of k·nprobe candidate rows.
That is the 100-TB shape: at a billion vectors per cell-partition set, a
probe touches only the probed partitions' files.

The reference has no vector search (it is a Neo4j bolt client,
/root/reference/phageclouds_gdb.py); this is LLM-pipeline extension
surface (SURVEY.md §2 W5), sharing its design with the bucketed graph
layout (sources/readers.write_graph_bucketed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_ivf_index(
    assigned: DataFrame, path: str, max_files_per_cell: int = 1
) -> None:
    """Persist a (vec_id, cell, vec) corpus partitioned by cell.

    ``repartition(cell)`` first: without it every input partition writes a
    file into every cell directory (files = partitions × cells, the
    classic small-files explosion); with it each cell's rows co-locate and
    each cell directory holds ``max_files_per_cell`` files. At the 100-TB
    tier raise ``max_files_per_cell`` so single files stay ~128-512 MB."""
    (
        assigned.repartition(max_files_per_cell, "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def read_ivf_cells(
    spark: SparkSession, path: str, cells: list[int]
) -> DataFrame:
    """Scan ONLY the probed cell partitions. The `isin` filter on the
    partition column resolves at planning time — the non-probed
    directories are never listed into the scan (PartitionFilters in the
    physical plan, 0 PushedFilters needed)."""
    df = spark.read.parquet(path)
    return df.filter(F.col("cell").isin([int(c) for c in cells]))


def probe_topk(
    spark: SparkSession,
    path: str,
    query_cells: list[tuple[int, list[int]]],
    queries: "list[tuple[int, list[float]]]",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k within each query's probed cells, over the
    pruned scan. ``query_cells`` = [(qid, [cell, ...])], ``queries`` =
    [(qid, vec)] — both driver-small (that is what makes them the probe
    side; they broadcast). The heavy side is only ever scanned, never
    shuffled with vectors: the per-query candidate set is scored in place
    and reduced to k rows before the final per-query top-k shuffle."""
    all_cells = sorted({c for _, cs in query_cells for c in cs})
    scan = read_ivf_cells(spark, path, all_cells)

    qc = spark.createDataFrame(
        [(q, c) for q, cs in query_cells for c in cs], "qid long, cell int"
    )
    qv = spark.createDataFrame(queries, "qid long, qvec array<double>")
    probe = qc.join(qv, "qid")

    dot = F.aggregate(
        F.zip_with("vec", "qvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = (
        scan.join(F.broadcast(probe), "cell")
        .select(
            "qid",
            "vec_id",
            (dot / (norm(F.col("vec")) * norm(F.col("qvec")))).alias("sim"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
