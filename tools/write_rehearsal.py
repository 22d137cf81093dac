"""Scale rehearsal for the Cypher write surface (cypher/writes.py): bulk
MERGE (create branch and match branch), SET, and DETACH DELETE driven
through the Cypher frontend against a multi-million-node catalog.

The write plans are single joins against the target table (full-outer SMJ
for MERGE — the same shape a Delta/Iceberg MERGE INTO lowers to — and
broadcast-update joins for SET/DELETE when the match frame is small, SMJ
when it is not). This probe measures them at a tier where the target no
longer fits a broadcast, i.e. where the plan shape actually matters.

Run: python tools/write_rehearsal.py --nodes 10000000
Prints one JSON line; record the row in SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from phageclouds_graphdatabase_spark.cypher import (  # noqa: E402
    CypherEngine,
    phage_catalog,
)
from phageclouds_graphdatabase_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=10_000_000)
    ap.add_argument("--avg-degree", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(
        "write-rehearsal", shuffle_partitions=max(32, args.nodes // 100_000)
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = args.nodes
    nodes = (
        spark.range(n)
        .select(
            F.concat(F.lit("A"), F.col("id")).alias("accession"),
            F.lit("GEN").alias("source"),
            F.lit(None).cast("string").alias("taxonomy"),
            F.col("id").cast("long").alias("genome_size"),
            F.lit(None).cast("string").alias("genus"),
        )
        .repartition(64)
        .cache()
    )
    nodes.count()
    m = n * args.avg_degree // 2
    edges = (
        spark.range(m)
        .select(
            F.concat(
                F.lit("A"), F.pmod(F.xxhash64("id", F.lit("s")), F.lit(n))
            ).alias("src"),
            F.concat(
                F.lit("A"), F.pmod(F.xxhash64("id", F.lit("d")), F.lit(n))
            ).alias("dst"),
            (F.pmod(F.xxhash64("id", F.lit("w")), F.lit(1000)) / 1000.0).alias(
                "distance"
            ),
        )
        .repartition(64)
        .cache()
    )
    edges.count()
    infects = spark.createDataFrame(
        [], "src string, host_genus string"
    )
    eng = CypherEngine(phage_catalog(nodes, edges, infects), spark)
    half = n // 2
    out = {"n_nodes": n, "n_edges": m}

    # MERGE create branch: half the keys are fresh (full-outer SMJ; the
    # driving frame itself is n/2 rows — nothing is broadcastable)
    t0 = time.time()
    cat = eng.apply(
        f"MATCH (mm:PhageGenome) WHERE mm.genome_size < {half} "
        "WITH mm.accession + '_v2' AS acc "
        "MERGE (nn:PhageGenome {accession: acc}) "
        "ON CREATE SET nn.source = 'NEW'"
    )
    out["merge_create_rows"] = cat.node("PhageGenome").df.count()
    out["merge_create_sec"] = round(time.time() - t0, 2)

    # MERGE match branch: same keys again -> pure update path
    eng2 = CypherEngine(cat, spark)
    t0 = time.time()
    cat2 = eng2.apply(
        f"MATCH (mm:PhageGenome) WHERE mm.genome_size < {half} "
        "WITH mm.accession + '_v2' AS acc "
        "MERGE (nn:PhageGenome {accession: acc}) "
        "ON MATCH SET nn.source = 'SEEN'"
    )
    out["merge_match_rows"] = cat2.node("PhageGenome").df.where(
        "source = 'SEEN'"
    ).count()
    out["merge_match_sec"] = round(time.time() - t0, 2)

    # SET over half the table (the update frame is n/2 — SMJ, not broadcast)
    t0 = time.time()
    cat3 = eng.apply(
        f"MATCH (mm:PhageGenome) WHERE mm.genome_size < {half} "
        "SET mm.genus = 'EVEN'"
    )
    out["set_rows"] = cat3.node("PhageGenome").df.where(
        "genus = 'EVEN'"
    ).count()
    out["set_sec"] = round(time.time() - t0, 2)

    # DETACH DELETE 10% of nodes: anti-join on nodes + cascade over edges
    t0 = time.time()
    cat4 = eng.apply(
        f"MATCH (mm:PhageGenome) WHERE mm.genome_size < {n // 10} "
        "DETACH DELETE mm"
    )
    out["delete_nodes_left"] = cat4.node("PhageGenome").df.count()
    out["delete_edges_left"] = cat4.rel("sharesDNA").df.count()
    out["detach_delete_sec"] = round(time.time() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
