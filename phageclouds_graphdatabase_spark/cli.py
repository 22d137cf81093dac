"""Command-line surface mirroring the reference's three scripts, so a user
of the reference can switch by replacing `python phageclouds_gdb*.py ...`
with `python -m phageclouds_graphdatabase_spark.cli {taxon,family,host} ...`.

Flags, defaults and output filename templates match the reference exactly:
  taxon  : -t/--tax, -d/--dist (0.25)       /root/reference/phageclouds_gdb.py:45-47,120
  family : -f/--fam, -t/--tax, -d (0.15)    /root/reference/phageclouds_gdb_family.py:81-84,123
  host   : -g/--genus, -t/--thres (0.25),
           --harsh                          /root/reference/phageclouds_gdb_host.py:45-48,89-92

The graph location replaces the reference's hardwired bolt URI
(phageclouds_gdb.py:10): --data-dir must contain nodes/, edges/, infects/
Parquet (plus lineages.csv for the family pipeline).
"""

from __future__ import annotations

import argparse
import os
import sys

from phageclouds_graphdatabase_spark.plans import clouds
from phageclouds_graphdatabase_spark.session import get_spark
from phageclouds_graphdatabase_spark.sources import readers, sinks


def _load_graph(spark, data_dir: str):
    nodes = readers.read_phage_nodes(spark, os.path.join(data_dir, "nodes"))
    edges = readers.read_shares_dna(spark, os.path.join(data_dir, "edges"))
    return nodes, edges


def main(argv: list[str] | None = None) -> str:
    parser = argparse.ArgumentParser(
        prog="phageclouds",
        description="Extract and draw phage clouds (PySpark engine)",
    )
    parser.add_argument("--data-dir", default=os.environ.get("PHAGECLOUDS_DATA", "."),
                        help="directory with nodes/ edges/ infects/ Parquet")
    parser.add_argument("--out-dir", default=".")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_tax = sub.add_parser("taxon", help="clouds for a phage taxon")
    p_tax.add_argument("-t", "--tax", dest="taxon", required=True,
                       help="Phage taxon to search")
    p_tax.add_argument("-d", "--dist", dest="dist", type=float, default=0.25,
                       help="Distance threshold (default: 0.25)")

    p_fam = sub.add_parser("family", help="clouds for a phage family")
    p_fam.add_argument("-f", "--fam", dest="family", required=True,
                       help="Phage family to search")
    p_fam.add_argument("-t", "--tax", dest="taxon", required=True,
                       choices=("genus", "subfamily"),
                       help='Color nodes by "subfamily" or "genus" membership')
    p_fam.add_argument("-d", "--dist", dest="dist", type=float, default=0.15,
                       help="Distance threshold (default: 0.15)")
    p_fam.add_argument("--lineages", default=None,
                       help="lineages CSV (default: <data-dir>/lineages.csv)")

    p_q = sub.add_parser("query", help="run a Cypher query against the graph")
    p_q.add_argument("cypher", help="Cypher query text (the reference's "
                     "query language, compiled to a Spark plan)")
    p_q.add_argument("--limit", type=int, default=50,
                     help="max rows to print (default: 50; 0 = all)")
    p_q.add_argument("--out", default=None,
                     help="write the full result as Parquet instead of printing")
    p_q.add_argument("--explain", action="store_true",
                     help="print the Catalyst physical plan instead of rows")

    p_host = sub.add_parser("host", help="clouds for a bacterial host genus")
    p_host.add_argument("-g", "--genus", dest="host", required=True,
                        help="host genus used for searching phage clouds")
    p_host.add_argument("-t", "--thres", dest="dist", type=float, default=0.25,
                        help="intergenomic distance threshold (default: 0.25)")
    p_host.add_argument("--harsh", action="store_true",
                        help="exclude GTDB_predicted_prophages")

    args = parser.parse_args(argv)
    spark = get_spark("phageclouds-cli")
    nodes, edges = _load_graph(spark, args.data_dir)

    if args.cmd == "query":
        from phageclouds_graphdatabase_spark.cypher import CypherEngine, phage_catalog

        infects_path = os.path.join(args.data_dir, "infects")
        infects = (
            readers.read_infects(spark, infects_path)
            if os.path.exists(infects_path)
            else None
        )
        df = CypherEngine(phage_catalog(nodes, edges, infects)).run(args.cypher)
        if args.explain:
            df.explain("formatted")
            return ""
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(args.out)
            return args.out
        df.show(args.limit or df.count(), truncate=False)
        return ""

    slug = sinks.threshold_slug(args.dist)

    if args.cmd == "taxon":
        res = clouds.clouds_by_taxon(nodes, edges, args.taxon, args.dist)
        out = f"{args.taxon}_{slug}_clouds.html"
    elif args.cmd == "family":
        lineages = readers.read_lineages_csv(
            spark, args.lineages or os.path.join(args.data_dir, "lineages.csv")
        )
        res = clouds.clouds_by_family(
            nodes, edges, lineages, args.family, args.taxon, args.dist
        )
        out = f"{args.family}_{slug}_{args.taxon}_clouds.html"
    else:
        infects = readers.read_infects(spark, os.path.join(args.data_dir, "infects"))
        res = clouds.clouds_by_host(
            nodes, edges, infects, args.host, args.dist, harsh=args.harsh
        )
        suffix = "_harsh" if args.harsh else ""
        out = f"{args.host}_{slug}_clouds_v2{suffix}.html"

    path = os.path.join(args.out_dir, out)
    sinks.write_vis_html(res.nodes, res.edges, path)
    print(path)
    return path


if __name__ == "__main__":
    main(sys.argv[1:])
