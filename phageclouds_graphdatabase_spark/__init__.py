"""PySpark-native analytics engine with the query and data-processing
capabilities of guille0387/PhageClouds_GraphDatabase.

The reference (read-only at /root/reference/) is a thin Cypher client over a
Neo4j property graph of phage genomes plus pandas/pyvis post-processing. This
package re-expresses every capability Spark-first:

- the property graph is two DataFrames (``nodes`` + ``edges``) in Parquet,
- Cypher pattern matching becomes DataFrame joins (semi-joins for node sets,
  never driver-side IN-lists),
- per-row pandas ``df.apply`` derivations become native column expressions
  inside whole-stage codegen,
- the ete3/sqlite taxonomy side-channel becomes a broadcast dimension table,
- "phage clouds" (connected components) get a DataFrame-native hash-min
  label propagation with pointer jumping (FastSV-style, O(log diameter)
  rounds),
- plus the LLM-data-pipeline extension surface: dedup (exact/MinHash-LSH/
  SimHash/Jaccard), similarity search over embeddings, text analysis, and
  Structured Streaming over event tables.

Layout (per SURVEY.md §7):
- ``sources/``   scans & sinks (Parquet/CSV/JSON readers, golden-HTML parser,
                 vis.js HTML sink)
- ``operators/`` relational + graph + dedup + similarity operators
- ``functions/`` scalar/derived-column function surface (colors, sizes,
                 titles, text analysis)
- ``plans/``     end-to-end query pipelines (taxon/family/host clouds,
                 oracle-checked relational plans)
- ``streaming/`` Structured Streaming over the events table
"""

from phageclouds_graphdatabase_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
