"""Python DataSource for vis.js network HTML (Spark 4 DataSource API).

The reference's only persistent artifacts are vis.js HTML networks
(/root/reference/*.html, written by pyvis at phageclouds_gdb.py:102-120).
This registers ``format("vis_html")`` so those files are first-class scan
targets -- the idiomatic Spark shape for a custom format: schema declared up
front, one InputPartition per file so a directory of networks parallelizes
across executors, rows yielded as tuples (Arrow-batched by the runtime).

Usage::

    from phageclouds_graphdatabase_spark.sources.vis_datasource import register
    register(spark)
    nodes = spark.read.format("vis_html").option("kind", "nodes").load(path)
    edges = spark.read.format("vis_html").option("kind", "edges").load(path)

``path`` may be one file, a comma-separated list, or a directory (every
``*.html`` inside). Each row carries ``_file`` so multi-network scans stay
attributable -- the engine-side equivalent of a per-run golden.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

NODES_SCHEMA = (
    "id string, color_background string, color_border string, "
    "size int, title string, _file string"
)
EDGES_SCHEMA = (
    "src string, dst string, weight double, value double, "
    "color string, title string, _file string"
)


def _expand_paths(path: str) -> list[str]:
    out: list[str] = []
    for p in path.split(","):
        p = p.strip()
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".html")
            )
        elif p:
            out.append(p)
    return out


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class VisHTMLReader(DataSourceReader):
    def __init__(self, options: dict):
        self.kind = options.get("kind", "nodes")
        if self.kind not in ("nodes", "edges"):
            raise ValueError(f"kind must be nodes|edges, got {self.kind!r}")
        self.paths = _expand_paths(options.get("path", ""))
        if not self.paths:
            raise ValueError("vis_html requires a load(path) of .html file(s)")

    def partitions(self) -> list[InputPartition]:
        return [_FilePartition(p) for p in self.paths]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        # imported inside read(): runs on executors, keeps pickled reader thin
        from phageclouds_graphdatabase_spark.sources.golden import parse_vis_html

        nodes, edges = parse_vis_html(partition.path)
        fname = os.path.basename(partition.path)
        if self.kind == "nodes":
            for n in nodes:
                yield (
                    n["id"],
                    n["color"]["background"],
                    n["color"]["border"],
                    int(n["size"]),
                    n.get("title"),
                    fname,
                )
        else:
            for e in edges:
                yield (
                    e["from"],
                    e["to"],
                    float(e["weight"]),
                    float(e["value"]),
                    e["color"],
                    e.get("title"),
                    fname,
                )


class VisHTMLDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "vis_html"

    def schema(self) -> str:
        return NODES_SCHEMA if self.options.get("kind", "nodes") == "nodes" else EDGES_SCHEMA

    def reader(self, schema) -> VisHTMLReader:
        return VisHTMLReader(dict(self.options))


def register(spark: SparkSession) -> None:
    spark.dataSource.register(VisHTMLDataSource)
