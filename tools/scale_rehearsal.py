#!/usr/bin/env python
"""Scale rehearsal: run the cloud pipelines at the reference's FULL graph
scale (the paper's ~640k genomes, README.md:3 of the reference) instead of
the sf0.1 bench tables, and print one JSON line of timings.

Generates a deterministic synthetic phage graph (power-law degree skew, near-
clique clusters -- the golden-profile shape) under /tmp, writes it in the
at-rest layout (distance-sorted Parquet), then times:
  - taxon cloud extraction (seed -> expand -> induced -> attrs)
  - connected components over the full thresholded graph
  - degree table

Usage: python tools/scale_rehearsal.py [--nodes 640000] [--avg-degree 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phageclouds_graphdatabase_spark.operators import graph as G
from phageclouds_graphdatabase_spark.plans import clouds
from phageclouds_graphdatabase_spark.session import get_spark
from phageclouds_graphdatabase_spark.sources import sinks

SOURCES = np.array(
    ["NCBI", "Tara", "GPD_Isolate", "GPD_Metagenome", "GTDB_predicted_prophages"]
)
TAXA = np.array(
    ["Tequatrovirus", "Lambdavirus", "Bastillevirus", "Okubovirus", "Pahexavirus"]
)


def generate(
    out_dir: str,
    n_nodes: int,
    avg_degree: int,
    seed: int = 42,
    skew: bool = False,
) -> None:
    rng = np.random.default_rng(seed)
    acc = np.array([f"ACC{i:07d}" for i in range(n_nodes)])
    source = SOURCES[rng.choice(len(SOURCES), n_nodes, p=[0.75, 0.05, 0.08, 0.07, 0.05])]
    taxon = TAXA[rng.integers(0, len(TAXA), n_nodes)]
    genome_size = rng.integers(12_000, 372_000, n_nodes)

    # Cluster structure: nodes assigned to power-law-sized clusters; edges
    # mostly intra-cluster (near-cliques, like the goldens) + random
    # inter-cluster background. Stored once per pair, arbitrary direction.
    n_clusters = max(n_nodes // 200, 1)
    cluster = rng.zipf(1.5, n_nodes) % n_clusters
    n_edges = n_nodes * avg_degree // 2

    intra = int(n_edges * 0.8)
    order = np.argsort(cluster, kind="stable")
    sorted_nodes = order
    # intra-cluster edges: pick a node, partner with a near neighbor in the
    # cluster-sorted order (same cluster with high probability)
    i1 = rng.integers(0, n_nodes, intra)
    off = rng.integers(1, 50, intra)
    j1 = np.minimum(i1 + off, n_nodes - 1)
    src_i = sorted_nodes[i1]
    dst_i = sorted_nodes[j1]
    # inter-cluster background
    inter = n_edges - intra
    src_x = rng.integers(0, n_nodes, inter)
    dst_x = rng.integers(0, n_nodes, inter)

    src = np.concatenate([src_i, src_x])
    dst = np.concatenate([dst_i, dst_x])

    if skew:
        # Worst-case skew (VERDICT r1 next #8): ONE near-clique cloud with
        # the Tequatrovirus_025 golden's density profile at 1000x the node
        # count (264 nodes / 23,247 edges -> avg degree ~176 kept, node
        # count x1000), plus 5 mega-hub nodes of ~100k degree each — the
        # hot join keys that break a naive shuffle without AQE skew
        # splitting. All skew edges pass the 0.15 threshold so the dense
        # component IS the workload, not filtered noise.
        C = min(264_000, n_nodes // 2)
        m = C * 176 // 2
        src_c = rng.integers(0, C, m)
        dst_c = rng.integers(0, C, m)
        hubs = rng.choice(C, 5, replace=False)
        hub_deg = min(100_000, n_nodes // 4)
        src_h = np.repeat(hubs, hub_deg)
        dst_h = rng.integers(0, n_nodes, 5 * hub_deg)
        src = np.concatenate([src, src_c, src_h])
        dst = np.concatenate([dst, dst_c, dst_h])

    keep = src != dst
    src, dst = src[keep], dst[keep]
    # one direction per unordered pair (golden invariant)
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    pair = lo.astype(np.int64) * n_nodes + hi
    _, first = np.unique(pair, return_index=True)
    src, dst = src[first], dst[first]
    distance = np.round(rng.beta(2, 5, len(src)) * 0.5, 6)
    if skew:
        # skew-injected pairs (they sort AFTER the base pairs' first
        # occurrences is not guaranteed, so mark by membership): any pair
        # touching the clique range or a hub gets a passing distance
        in_skew = (np.minimum(src, dst) < C) | np.isin(src, hubs) | np.isin(dst, hubs)
        distance = np.where(in_skew, np.round(rng.uniform(0.0, 0.15, len(src)), 6), distance)

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "accession": acc,
                "source": source,
                "taxonomy": np.char.add("Viruses;Duplodnaviria;", taxon.astype(str)),
                "genome_size": genome_size,
                "genus": taxon,
            }
        ),
        os.path.join(out_dir, "nodes_raw.parquet"),
    )
    pq.write_table(
        pa.table({"src": acc[src], "dst": acc[dst], "distance": distance}),
        os.path.join(out_dir, "edges_raw.parquet"),
    )


def generate_big(out_dir: str, n_nodes: int, avg_degree: int, seed: int = 42) -> None:
    """Low-memory generator for the 150M+ tiers: the standard generate()
    materializes every node STRING three times over in numpy/Python
    (observed OOM-kill at 200M: ~130 GB RSS building 800M accession
    strings), so the big tier writes INTEGER node ids + dictionary-encoded
    categoricals in chunks, and main() derives the same-shape string keys
    in SPARK (format_string is distributed and memory-safe). Same RNG
    draws and edge topology as generate(); only the materialization
    differs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    src_codes = rng.choice(
        len(SOURCES), n_nodes, p=[0.75, 0.05, 0.08, 0.07, 0.05]
    ).astype(np.int8)
    tax_codes = rng.integers(0, len(TAXA), n_nodes).astype(np.int8)
    genome_size = rng.integers(12_000, 372_000, n_nodes).astype(np.int32)
    node_tbl = pa.table({
        "id": pa.array(np.arange(n_nodes, dtype=np.int64)),
        "source": pa.DictionaryArray.from_arrays(
            pa.array(src_codes), pa.array(SOURCES)
        ),
        "taxon": pa.DictionaryArray.from_arrays(
            pa.array(tax_codes), pa.array(TAXA)
        ),
        "genome_size": pa.array(genome_size),
    })
    pq.write_table(node_tbl, os.path.join(out_dir, "nodes_raw.parquet"))
    del src_codes, tax_codes, genome_size, node_tbl

    n_clusters = max(n_nodes // 200, 1)
    cluster = (rng.zipf(1.5, n_nodes) % n_clusters).astype(np.int64)
    n_edges = n_nodes * avg_degree // 2
    intra = int(n_edges * 0.8)
    order = np.argsort(cluster, kind="stable")
    del cluster
    i1 = rng.integers(0, n_nodes, intra)
    off = rng.integers(1, 50, intra)
    j1 = np.minimum(i1 + off, n_nodes - 1)
    src = np.concatenate([order[i1], rng.integers(0, n_nodes, n_edges - intra)])
    del i1, off
    dst = np.concatenate([order[j1], rng.integers(0, n_nodes, n_edges - intra)])
    del j1, order
    keep = src != dst
    src, dst = src[keep], dst[keep]
    del keep
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    del src, dst
    pair = lo * np.int64(n_nodes) + hi
    _, first = np.unique(pair, return_index=True)
    del pair
    lo, hi = lo[first], hi[first]
    del first
    distance = np.round(rng.beta(2, 5, len(lo)) * 0.5, 6)
    writer = pq.ParquetWriter(
        os.path.join(out_dir, "edges_raw.parquet"),
        pa.schema([
            ("src", pa.int64()), ("dst", pa.int64()),
            ("distance", pa.float64()),
        ]),
    )
    step = 100_000_000
    for i in range(0, len(lo), step):
        writer.write_table(pa.table({
            "src": lo[i:i + step],
            "dst": hi[i:i + step],
            "distance": distance[i:i + step],
        }))
    writer.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=640_000)
    ap.add_argument("--avg-degree", type=int, default=8)
    ap.add_argument("--work-dir", default="/tmp/phageclouds_scale")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--skew",
        action="store_true",
        help="inject the worst-case single near-clique cloud "
        "(Tequatrovirus_025 x1000) + 5 mega-hub nodes",
    )
    ap.add_argument(
        "--scc-only",
        action="store_true",
        help="skip the batch ladder (taxon/degrees/components/paths) and "
        "probe ONLY the directed-SCC operator at this tier",
    )
    ap.add_argument(
        "--centrality-only",
        action="store_true",
        help="probe ONLY the round-3 centrality ops at this tier: "
        "multi-source BFS levels (sampled roots, k=3 -> harmonic "
        "centrality agg) and 2-iteration personalized PageRank",
    )
    ap.add_argument("--roots", type=int, default=100,
                    help="sampled root count for --centrality-only")
    ap.add_argument(
        "--nodesim-only",
        action="store_true",
        help="probe ONLY node similarity (top-10 out-neighbor Jaccard) at "
        "this tier",
    )
    ap.add_argument(
        "--nodesim-cap",
        type=int,
        default=None,
        help="freq_cap for --nodesim-only (None = the exact single-pass "
        "join; the capped form is the 100-TB shape — candidates from the "
        "hub-pruned index, values from exact verification)",
    )
    ap.add_argument(
        "--nodesim-cutoff",
        type=int,
        default=None,
        help="upper_degree_cutoff for --nodesim-only (the GDS "
        "upperDegreeCutoff knob): excludes hub pair-members, bounding "
        "the verification join",
    )
    ap.add_argument(
        "--nodesim-auto",
        action="store_true",
        help="freq_cap='auto' for --nodesim-only: the round-6 df-histogram "
        "skew gate — cap+verify only when max_df > 4x median_df, else the "
        "uncapped single pass (measures the eliminated insurance premium)",
    )
    ap.add_argument(
        "--lp-only",
        action="store_true",
        help="probe ONLY deterministic synchronous label propagation at "
        "this tier (per round: one edges-labels join + per-node "
        "most-frequent-label window)",
    )
    ap.add_argument("--lp-iters", type=int, default=2,
                    help="rounds for --lp-only")
    ap.add_argument(
        "--dijkstra-only",
        action="store_true",
        help="probe ONLY hop-bounded multi-source weighted SSSP "
        "(cheapest_path_costs, maxDepth 3 — the gds dijkstra surface) "
        "from --roots sampled sources at this tier",
    )
    ap.add_argument(
        "--bellman-only",
        action="store_true",
        help="probe ONLY multi-source Bellman-Ford (negative-capable "
        "weighted fixpoint, round 8) from --roots sampled seeds at this "
        "tier — the open question is the reached-pair state under hubs "
        "(state O(seeds x reached))",
    )
    ap.add_argument(
        "--bellman-rounds", type=int, default=None,
        help="round budget for --bellman-only (default: fixpoint with "
        "cycle detection)",
    )
    ap.add_argument(
        "--daglongest-only",
        action="store_true",
        help="probe ONLY DAG longest path (round 8) at this tier, on the "
        "id-ordered orientation of the thresholded graph (src < dst "
        "makes it a DAG by construction, preserving the skew profile)",
    )
    ap.add_argument(
        "--coredec-only",
        action="store_true",
        help="probe ONLY the full k-core decomposition (h-index iteration "
        "to the fixpoint) at this tier",
    )
    ap.add_argument(
        "--coredec-pack",
        action="store_true",
        help="with --coredec-only: pack_ids=True (dense-long dictionary "
        "encoding around the loop — the string-key shuffle-width lever)",
    )
    ap.add_argument(
        "--coredec-auto",
        action="store_true",
        help="with --coredec-only: pack_ids='auto' (round-8 degree-"
        "histogram probe); also runs the standalone probe first to "
        "record its decision + cost in the artifact",
    )
    ap.add_argument(
        "--bc-directed",
        action="store_true",
        help="run --bc-only in the DIRECTED form (second reversed-edge "
        "sigma-BFS + ordered pairs — round 6)",
    )
    ap.add_argument(
        "--triangles-only",
        action="store_true",
        help="probe ONLY per-node triangle counts + local clustering "
        "coefficient at this tier (the round-5 shared gated enumeration "
        "core; above 48M thresholded edges the closing join runs the "
        "shuffle-hash branch)",
    )
    ap.add_argument(
        "--bc-only",
        action="store_true",
        help="probe ONLY betweenness at this tier (skips "
        "harmonic/PPR/fastRP/Katz — for the root-placement A/B)",
    )
    ap.add_argument(
        "--bc-sampler",
        choices=("hub", "degree"),
        default="hub",
        help="betweenness root placement: 'hub' = the measured worst "
        "case (neighbors of the top hub — inside the dense core under "
        "--skew); 'degree' = operators/graph.sample_roots, the "
        "degree-aware default the GDS procs use (VERDICT r4 ask #2)",
    )
    ap.add_argument(
        "--truss-only",
        action="store_true",
        help="probe ONLY k-truss peeling (k=4) on the thresholded graph "
        "at this tier — the near-clique clusters give it real triangle "
        "density",
    )
    ap.add_argument(
        "--truss-rounds", type=int, default=None,
        help="peel-round budget for --truss-only (default: fixpoint)",
    )
    ap.add_argument(
        "--truss-hash-cap", type=int, default=None,
        help="override k-truss's hash_broadcast_cap_edges (pass 1 to "
        "force the above-cap shuffle-hash closing join at this tier and "
        "measure the fallback branch end-to-end)",
    )
    ap.add_argument(
        "--truss-no-delta", action="store_true",
        help="with --truss-only: force delta=False (full per-round "
        "re-enumeration) — the A/B leg against --truss-delta; neither "
        "flag = the shipped 'auto' per-round gate",
    )
    ap.add_argument(
        "--truss-delta", action="store_true",
        help="with --truss-only: delta peeling (round 8 — rounds > 1 "
        "decrement supports from frontier-seeded triangle enumeration "
        "instead of re-enumerating the live set)",
    )
    ap.add_argument(
        "--truss-reliable", action="store_true",
        help="run k-truss with RELIABLE per-round checkpoints (the "
        "cluster configuration: survives executor loss) instead of "
        "localCheckpoint",
    )
    ap.add_argument(
        "--components-only",
        action="store_true",
        help="probe ONLY degrees + connected components at this tier "
        "(the 200M+ ladder: the full batch ladder's paths/SCC stages "
        "would dominate the wall-clock)",
    )
    args = ap.parse_args()

    work = args.work_dir
    shutil.rmtree(work, ignore_errors=True)
    t0 = time.time()
    if args.nodes >= 150_000_000:
        if args.skew:
            raise SystemExit("--skew is not supported at the 150M+ tier")
        generate_big(work, args.nodes, args.avg_degree)
    else:
        generate(work, args.nodes, args.avg_degree, skew=args.skew)
    t_gen = time.time() - t0

    # Size the session to the graph, the way a cluster submit would:
    # initial shuffle partitions scale with the data (AQE only coalesces
    # DOWN, so the static number is the upper bound on sort size per task --
    # 32 partitions at 20M nodes puts ~2.4M edge rows in one in-memory sort
    # and dies with UNABLE_TO_ACQUIRE_MEMORY), and the local heap grows past
    # the 16g default for 10M+ nodes.
    # round 8: the heap tier is keyed on EDGES, not nodes — the 40M-node
    # avg-degree-8 coredec rung (156M edges) blew the 48g tier with a
    # read-ahead OOM mid-iteration; 150M+ edges needs the 80g tier
    # regardless of node count.
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_MEM",
        "80g"
        if args.nodes >= 80_000_000
        or args.nodes * args.avg_degree >= 150_000_000
        else (
            "48g"
            # the --skew graph carries a 23M-edge near-clique whose SCC
            # checkpoint blocks overflow the 16g tier (observed OOM)
            if args.nodes >= 10_000_000 or args.skew
            else "16g"
        ),
    )
    spark = get_spark(
        "scale-rehearsal",
        shuffle_partitions=max(32, args.nodes // 100_000),
        # 200M-tier disk bound: reliable per-round checkpoints accumulate
        # ~5 GB each; let the ContextCleaner delete checkpoints whose RDD
        # reference is gone (off by default)
        extra_conf={"spark.cleaner.referenceTracking.cleanCheckpoints": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ingest into the at-rest layout (distance-sorted edge Parquet)
    from pyspark.sql import functions as _F

    t0 = time.time()
    edges_raw = spark.read.parquet(os.path.join(work, "edges_raw.parquet"))
    nodes_raw = spark.read.parquet(os.path.join(work, "nodes_raw.parquet"))
    if "id" in nodes_raw.columns:
        # big-tier integer layout: derive the string keys in Spark
        nodes_raw = nodes_raw.select(
            _F.format_string("ACC%09d", "id").alias("accession"),
            _F.col("source").cast("string").alias("source"),
            _F.concat(
                _F.lit("Viruses;Duplodnaviria;"), _F.col("taxon")
            ).alias("taxonomy"),
            _F.col("genome_size").cast("long").alias("genome_size"),
            _F.col("taxon").cast("string").alias("genus"),
        )
        edges_raw = edges_raw.select(
            _F.format_string("ACC%09d", "src").alias("src"),
            _F.format_string("ACC%09d", "dst").alias("dst"),
            "distance",
        )
    sinks.write_edges_at_rest(edges_raw, os.path.join(work, "edges"), num_files=32)
    nodes_raw.write.mode("overwrite").parquet(os.path.join(work, "nodes"))
    t_ingest = time.time() - t0

    nodes = spark.read.parquet(os.path.join(work, "nodes"))
    edges = spark.read.parquet(os.path.join(work, "edges"))
    n_edges = edges.count()
    if args.components_only:
        # the raw pre-ingest copies are dead weight from here on — at the
        # 200M tier they are ~20 GB the checkpoints need
        for raw in ("edges_raw.parquet", "nodes_raw.parquet"):
            rp = os.path.join(work, raw)
            if os.path.isdir(rp):
                shutil.rmtree(rp, ignore_errors=True)
            elif os.path.exists(rp):
                os.remove(rp)

    timings: dict[str, float] = {}

    from pyspark.sql import functions as F

    if args.triangles_only:
        fe = edges.filter(F.col("distance") <= 0.15).select("src", "dst")
        t0 = time.time()
        tc = G.triangle_counts(fe)
        n_tri_nodes = tc.count()
        t_tri = round(time.time() - t0, 2)
        t0 = time.time()
        lcc = G.local_clustering_coefficient(fe)
        n_lcc = lcc.count()
        print(
            json.dumps(
                {
                    "n_nodes": args.nodes,
                    "n_edges": n_edges,
                    "skew": args.skew,
                    "n_triangle_nodes": n_tri_nodes,
                    "triangles_sec": t_tri,
                    "n_lcc_nodes": n_lcc,
                    "lcc_sec": round(time.time() - t0, 2),
                }
            )
        )
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        return

    if args.nodesim_only:
        fe = edges.filter(F.col("distance") <= 0.15).select("src", "dst")
        cap = "auto" if args.nodesim_auto else args.nodesim_cap
        t0 = time.time()
        sim = G.node_similarity_topk_capped(
            fe,
            k=10,
            freq_cap=cap,
            upper_degree_cutoff=args.nodesim_cutoff,
        )
        n_pairs = sim.count()
        print(
            json.dumps(
                {
                    "n_nodes": args.nodes,
                    "n_edges": n_edges,
                    "skew": args.skew,
                    "nodesim_cap": cap,
                    "nodesim_cutoff": args.nodesim_cutoff,
                    "n_sim_pairs": n_pairs,
                    "nodesim_sec": round(time.time() - t0, 2),
                }
            )
        )
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        return

    if args.lp_only:
        from phageclouds_graphdatabase_spark.graphframe import GraphFrame

        fe = edges.filter(F.col("distance") <= 0.15).select("src", "dst")
        v = (
            fe.select(F.col("src").alias("id"))
            .unionByName(fe.select(F.col("dst").alias("id")))
            .distinct()
        )
        t0 = time.time()
        lp = GraphFrame(v, fe).labelPropagation(args.lp_iters)
        n_labeled = lp.count()
        t_lp = round(time.time() - t0, 2)
        n_comm = lp.select("label").distinct().count()
        print(
            json.dumps(
                {
                    "n_nodes": args.nodes,
                    "n_edges": n_edges,
                    "skew": args.skew,
                    "lp_iters": args.lp_iters,
                    "n_labeled": n_labeled,
                    "n_communities": n_comm,
                    "labelprop_sec": t_lp,
                }
            )
        )
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        return

    if args.dijkstra_only:
        fe = edges.filter(F.col("distance") <= 0.15).select(
            "src", "dst", "distance"
        )
        roots = (
            nodes.select(F.col("accession").alias("id"))
            .orderBy(F.xxhash64("id"))
            .limit(args.roots)
            .localCheckpoint()
        )
        t0 = time.time()
        costs = G.cheapest_path_costs(roots, fe, max_hops=3, directed=False)
        n_costs = costs.count()
        print(
            json.dumps(
                {
                    "n_nodes": args.nodes,
                    "n_edges": n_edges,
                    "skew": args.skew,
                    "roots": args.roots,
                    "n_cost_pairs": n_costs,
                    "dijkstra_sec": round(time.time() - t0, 2),
                }
            )
        )
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        return

    if args.bellman_only:
        # quantized long weights (the bellman_ford_costs convention);
        # the beta distances are non-negative — negativity is a
        # correctness property (unit-tested), state growth is the scale
        # question and it is weight-sign-independent
        fe = edges.filter(F.col("distance") <= 0.15).select(
            "src",
            "dst",
            F.floor(F.col("distance") * 1_000_000 + 0.5)
            .cast("long")
            .alias("w"),
        )
        seeds = (
            nodes.select(F.col("accession").alias("id"))
            .orderBy(F.xxhash64("id"))
            .limit(args.roots)
            .localCheckpoint()
        )
        t0 = time.time()
        costs = G.bellman_ford_costs(
            seeds, fe, max_rounds=args.bellman_rounds
        )
        n_pairs = costs.count()
        print(
            json.dumps(
                {
                    "n_nodes": args.nodes,
                    "n_edges": n_edges,
                    "skew": args.skew,
                    "seeds": args.roots,
                    "bellman_rounds": args.bellman_rounds,
                    "n_reached_pairs": n_pairs,
                    "bellman_sec": round(time.time() - t0, 2),
                }
            )
        )
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        return

    if args.daglongest_only:
        # orient by id order: src < dst is acyclic by construction while
        # keeping the degree/skew profile of the thresholded graph
        fe = (
            edges.filter(F.col("distance") <= 0.15)
            .select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                F.floor(F.col("distance") * 1_000_000 + 0.5)
                .cast("long")
                .alias("w"),
            )
            .filter(F.col("src") != F.col("dst"))
        )
        t0 = time.time()
        lp_ = G.dag_longest_paths(fe)
        n_rows = lp_.count()
        print(
            json.dumps(
                {
                    "n_nodes": args.nodes,
                    "n_edges": n_edges,
                    "skew": args.skew,
                    "n_dag_rows": n_rows,
                    "daglongest_sec": round(time.time() - t0, 2),
                }
            )
        )
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        return

    if args.coredec_only:
        fe = edges.filter(F.col("distance") <= 0.15).select("src", "dst")
        # 150M+ edges: reliable on-disk checkpoints for und + per-round h
        # (the 100M-components lesson applied to coredec — found by this
        # rung's first attempt OOMing the 48g heap on executor-local
        # blocks)
        # round 10: cutover LOWERED 150M -> 100M stored-edge units — the
        # 5M x 28 rung (140M, just under the old bound) died in a
        # broadcast-build executor thread on local-checkpoint blocks,
        # the exact round-8 heap mode the reliable path exists for; the
        # same tier re-run over reliable checkpoints completed
        reliable = args.nodes * args.avg_degree >= 100_000_000
        if reliable:
            spark.sparkContext.setCheckpointDir(os.path.join(work, "ckpt"))
        probe = None
        if args.coredec_auto:
            tp = time.time()
            decision = G._coredec_auto_pack(fe)
            probe = {
                "auto_probe_packs": decision,
                "auto_probe_sec": round(time.time() - tp, 2),
            }
        t0 = time.time()
        cd = G.core_decomposition(
            fe,
            pack_ids="auto" if args.coredec_auto else args.coredec_pack,
            reliable_checkpoint=reliable,
        ).localCheckpoint()
        n_cored = cd.count()
        t_cd = round(time.time() - t0, 2)
        mx = cd.agg(F.max("core")).collect()[0][0]
        print(
            json.dumps(
                {
                    "n_nodes": args.nodes,
                    "n_edges": n_edges,
                    "skew": args.skew,
                    "n_cored": n_cored,
                    "max_core": mx,
                    "coredec_sec": t_cd,
                    **(probe or {}),
                }
            )
        )
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        return

    if args.bc_only:
        # betweenness root-placement A/B (VERDICT r4 ask #2): 'hub' roots
        # reproduce the measured dense-core cliff; 'degree' roots are
        # sample_roots, the degree-aware GDS default that must close it
        fe = edges.filter(F.col("distance") <= 0.15).select("src", "dst")
        if args.bc_sampler == "degree":
            t0 = time.time()
            broots = G.sample_roots(fe, args.roots).localCheckpoint()
            t_sample = round(time.time() - t0, 2)
        else:
            hub = (
                fe.groupBy("src")
                .count()
                .orderBy(F.desc("count"), "src")
                .limit(1)
                .select("src")
            )
            t0 = time.time()
            broots = (
                fe.join(hub, "src")
                .select(F.col("dst").alias("id"))
                .limit(args.roots)
                .localCheckpoint()
            )
            t_sample = round(time.time() - t0, 2)
        t0 = time.time()
        bc = G.betweenness_centrality_scaled(
            fe, broots, max_depth=3, directed=args.bc_directed
        )
        n_bc = bc.count()
        print(
            json.dumps(
                {
                    "n_nodes": args.nodes,
                    "n_edges": n_edges,
                    "roots": args.roots,
                    "skew": args.skew,
                    "bc_directed": args.bc_directed,
                    "bc_sampler": args.bc_sampler,
                    "sample_sec": t_sample,
                    "n_betweenness": n_bc,
                    "betweenness_sec": round(time.time() - t0, 2),
                }
            )
        )
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        return

    if args.centrality_only:
        fe = edges.filter(F.col("distance") <= 0.15).select("src", "dst")
        roots = (
            nodes.select(F.col("accession").alias("id"))
            .orderBy(F.xxhash64("id"))
            .limit(args.roots)
            .localCheckpoint()
        )
        t0 = time.time()
        lev = G.multi_source_bfs_levels(roots, fe, k=3, directed=False)
        harm = lev.groupBy("id").agg(
            F.sum(
                F.when(F.col("d") == 1, 6).when(F.col("d") == 2, 3).otherwise(2)
            ).alias("h6")
        )
        n_harm = harm.count()
        timings["harmonic_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        ppr = G.personalized_pagerank_scaled(fe, roots, iterations=2)
        n_ppr = ppr.filter(F.col("pr_scaled") > 0).count()
        timings["ppr_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        emb = G.fastrp_embeddings(fe, dims=8, iters=2)
        n_emb = emb.count()
        timings["fastrp_sec"] = round(time.time() - t0, 2)
        timings["n_embedded"] = n_emb
        t0 = time.time()
        katz = G.katz_centrality_scaled(fe, iterations=2)
        timings["n_katz"] = katz.count()
        timings["katz_sec"] = round(time.time() - t0, 2)
        # betweenness roots must be mutually REACHABLE within the hop
        # bound to exercise the pair/midpoint joins (uniform random roots
        # in a sparse graph are never <=3 hops apart): sample the
        # neighborhood of the highest-degree hub
        hub = (
            fe.groupBy("src")
            .count()
            .orderBy(F.desc("count"), "src")
            .limit(1)
            .select("src")
        )
        broots = (
            fe.join(hub, "src")
            .select(F.col("dst").alias("id"))
            .limit(args.roots)
            .localCheckpoint()
        )
        t0 = time.time()
        bc = G.betweenness_centrality_scaled(fe, broots, max_depth=3)
        timings["n_betweenness"] = bc.count()
        timings["betweenness_sec"] = round(time.time() - t0, 2)
        print(
            json.dumps(
                {
                    "n_nodes": args.nodes,
                    "n_edges": n_edges,
                    "roots": args.roots,
                    "skew": args.skew,
                    "gen_sec": round(t_gen, 2),
                    "ingest_sec": round(t_ingest, 2),
                    "n_harmonic_nodes": n_harm,
                    "n_ppr_reached": n_ppr,
                    **timings,
                }
            )
        )
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        return

    if args.truss_only:
        fe = edges.filter(F.col("distance") <= 0.15).select("src", "dst")
        t0 = time.time()
        tkw = {}
        if args.truss_hash_cap is not None:
            tkw["hash_broadcast_cap_edges"] = args.truss_hash_cap
        if args.truss_reliable:
            spark.sparkContext.setCheckpointDir(work + "/truss_ckpt")
            tkw["reliable_checkpoint"] = True
        if args.truss_delta:
            tkw["delta"] = True
        elif args.truss_no_delta:
            tkw["delta"] = False
        blog: list = []
        truss = G.k_truss(
            fe, 4, rounds=args.truss_rounds, branch_log=blog, **tkw
        )
        n_truss = truss.count()
        timings["ktruss_sec"] = round(time.time() - t0, 2)
        print(
            json.dumps(
                {
                    "n_nodes": args.nodes,
                    "n_edges": n_edges,
                    "skew": args.skew,
                    "gen_sec": round(t_gen, 2),
                    "ingest_sec": round(t_ingest, 2),
                    "n_truss_edges": n_truss,
                    "truss_hash_cap": args.truss_hash_cap,
                    "truss_delta": args.truss_delta,
                    "branch_log": blog,
                    **timings,
                }
            )
        )
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        return

    if args.scc_only:
        fe = edges.filter(F.col("distance") <= 0.15)
        scc_ckpt = os.path.join(work, "scc_ckpt")
        t0 = time.time()
        scc = G.strongly_connected_components(
            fe.select("src", "dst"), checkpoint_dir=scc_ckpt
        )
        n_scc = scc.select("scc").distinct().count()
        timings["scc_sec"] = round(time.time() - t0, 2)
        print(
            json.dumps(
                {
                    "n_nodes": args.nodes,
                    "n_scc": n_scc,
                    "skew": args.skew,
                    "n_edges": n_edges,
                    "gen_sec": round(t_gen, 2),
                    "ingest_sec": round(t_ingest, 2),
                    **timings,
                }
            )
        )
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        return

    t0 = time.time()
    res = clouds.clouds_by_taxon(nodes, edges, "Tequatrovirus", 0.15)
    cloud_nodes = res.nodes.count()
    cloud_edges = res.edges.count()
    timings["taxon_cloud_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    deg = G.degrees(edges.filter("distance <= 0.15"))
    deg.write.format("noop").mode("overwrite").save()
    timings["degrees_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    # 80M+ nodes: in-memory localCheckpoint lineage blocks overflow the
    # heap mid-iteration (OOM observed at 100M/48g); reliable disk
    # checkpoints bound memory at the cost of checkpoint I/O.
    ckpt = os.path.join(work, "ckpt") if args.nodes >= 80_000_000 else None
    comp = G.cloud_membership(edges, 0.15, checkpoint_dir=ckpt)
    n_clouds = comp.select("component").distinct().count()
    timings["components_sec"] = round(time.time() - t0, 2)

    if args.components_only:
        print(
            json.dumps(
                {
                    "n_nodes": args.nodes,
                    "n_edges": n_edges,
                    "skew": args.skew,
                    "gen_sec": round(t_gen, 2),
                    "ingest_sec": round(t_ingest, 2),
                    **timings,
                }
            )
        )
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        return

    # Incremental component maintenance: fold a 1% edge batch into the
    # 99% membership and compare against the full recompute time above --
    # the streaming-ingestion story in numbers.
    from pyspark.sql import functions as F

    fe = edges.filter(F.col("distance") <= 0.15)
    is_new = (F.abs(F.xxhash64("src", "dst")) % 100) == 0
    m0 = G.connected_components(fe.filter(~is_new)).localCheckpoint()
    t0 = time.time()
    inc = G.merge_components(m0, fe.filter(is_new))
    n_inc = inc.count()
    timings["incremental_merge_sec"] = round(time.time() - t0, 2)

    # Path-semantics operators (per-path var-length, BFS shortest, weighted
    # cheapest): seeded from a ~0.1% node sample -- per-path output is
    # combinatorial by definition, so the rehearsal measures throughput per
    # seed cohort, not an all-pairs sweep (which nobody runs).

    n_sample = n_paths = n_sp = n_cp = 0
    if not args.skew:
        # per-path enumeration on a near-clique is combinatorial by
        # definition (176-degree clique -> ~176^3 paths per seed); the
        # skew rehearsal measures the set-oriented operators instead
        sample = (
            nodes.select(F.col("accession").alias("id"))
            .filter(F.abs(F.xxhash64("id")) % 1000 == 0)
            .localCheckpoint()
        )
        n_sample = sample.count()

        t0 = time.time()
        vlp = G.var_length_paths(sample, edges, 2, 3, threshold=0.15, directed=False)
        n_paths = vlp.count()
        timings["var_length_paths_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        sp = G.shortest_paths(
            sample, edges, 3, threshold=0.15, directed=False, mode="one"
        )
        n_sp = sp.count()
        timings["shortest_paths_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        cp = G.cheapest_path_costs(
            sample, edges, 3, threshold=0.15, directed=False
        )
        n_cp = cp.count()
        timings["cheapest_paths_sec"] = round(time.time() - t0, 2)

    # Strongly connected components over the DIRECTED thresholded graph
    # (stored direction = edge direction). Random orientations make this
    # mostly-acyclic with scattered directed cycles — the trim fixpoint
    # carries most of the work, the color/backward rounds resolve the
    # cyclic cores; worst case for outer rounds is nested-cycle depth.
    t0 = time.time()
    # production-adaptive shape: distributed trim/color/sweep while the
    # residual exceeds local_threshold, Tarjan cutover once it fits.
    # Reliable disk checkpoints (not localCheckpoint blocks) whenever the
    # dense skew core is present — same memory-bounding lesson as the
    # 100M components run.
    scc_ckpt = os.path.join(work, "scc_ckpt")
    scc = G.strongly_connected_components(
        fe.select("src", "dst"), checkpoint_dir=scc_ckpt
    )
    n_scc = scc.select("scc").distinct().count()
    timings["scc_sec"] = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "n_nodes": args.nodes,
                "n_scc": n_scc,
                "skew": args.skew,
                "n_path_seeds": n_sample,
                "n_var_length_paths": n_paths,
                "n_shortest_pairs": n_sp,
                "n_cheapest_pairs": n_cp,
                "n_edges": n_edges,
                "gen_sec": round(t_gen, 2),
                "ingest_sec": round(t_ingest, 2),
                "cloud_nodes": cloud_nodes,
                "cloud_edges": cloud_edges,
                "n_clouds": n_clouds,
                **timings,
            }
        )
    )
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
