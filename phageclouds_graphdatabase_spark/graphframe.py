"""GraphFrames-compatible facade: motif finding + algorithm wrappers.

GraphFrames (graphframes.github.io) is the canonical DataFrame graph API on
Spark; the reference's users coming from Spark-land expect
``GraphFrame(v, e).find("(a)-[e]->(b); (b)-[e2]->(c)")`` to work. This
module implements that public API surface (the motif subset plus the
algorithm entry points) on the engine's own operators — no external
package, one Catalyst plan per motif.

Contract (same as GraphFrames): ``vertices`` has an ``id`` column;
``edges`` has ``src`` and ``dst``. Motif terms are ``(a)-[e]->(b)``
separated by ``;``; element names are optional (anonymous ``()`` / ``[]``);
``!(a)-[]->(b)`` negates — no edge from a to b (compiled to an anti-join;
named elements in a negated term must be bound by positive terms, and
negated edges cannot be named — GraphFrames' own rules).

Result columns: one struct per NAMED element — vertex structs carry the
vertex row, edge structs the edge row. Shared names across terms become
join constraints (the GraphFrames semantics).

Scale: each positive term is one equi-join (Catalyst picks
broadcast/sort-merge; AQE handles skew); negated terms are anti-joins on
(src id, dst id) pairs. Motifs with no shared name between terms produce a
cartesian plan — same as GraphFrames; keep motifs connected.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.operators import graph as G

_TERM_RE = re.compile(r"(!?)\s*\((\w*)\)\s*-\s*\[(\w*)\]\s*->\s*\((\w*)\)")


class MotifError(ValueError):
    pass


def _struct(df: DataFrame, alias: str):
    return F.struct(*[F.col(c) for c in df.columns]).alias(alias)


class GraphFrame:
    def __init__(self, vertices: DataFrame, edges: DataFrame):
        if "id" not in vertices.columns:
            raise MotifError("vertices need an 'id' column")
        if "src" not in edges.columns or "dst" not in edges.columns:
            raise MotifError("edges need 'src' and 'dst' columns")
        self.vertices = vertices
        self.edges = edges

    # -- motif finding ------------------------------------------------------

    def find(self, motif: str) -> DataFrame:
        terms = [t.strip() for t in motif.split(";") if t.strip()]
        if not terms:
            raise MotifError("empty motif")
        df: DataFrame | None = None
        bound: set[str] = set()
        anon = [0]
        negated: list[tuple[str, str]] = []

        def fresh() -> str:
            anon[0] += 1
            return f"__anon{anon[0]}"

        for term in terms:
            m = _TERM_RE.fullmatch(term)
            if m is None:
                raise MotifError(
                    f"bad motif term {term!r} (expected '(a)-[e]->(b)')"
                )
            neg, a, e, b = m.groups()
            if neg:
                if e:
                    raise MotifError("negated terms cannot name the edge")
                if not a or not b:
                    raise MotifError(
                        "negated terms need named endpoints bound by "
                        "positive terms"
                    )
                negated.append((a, b))
                continue
            a = a or fresh()
            e = e or fresh()
            b = b or fresh()
            if e in bound:
                raise MotifError(f"edge name {e} used twice")
            estruct = self.edges.select(_struct(self.edges, e))
            conds = []
            if a in bound:
                conds.append(F.col(e)["src"] == F.col(a)["id"])
            if b in bound:
                conds.append(F.col(e)["dst"] == F.col(b)["id"])
            if df is None:
                df = estruct
            elif conds:
                cond = conds[0]
                for c in conds[1:]:
                    cond = cond & c
                df = df.join(estruct, cond)
            else:  # disconnected term -- same cartesian semantics as
                df = df.crossJoin(estruct)  # GraphFrames; keep motifs connected
            bound.add(e)
            joined_here: set[str] = set()
            for vname, key in ((a, "src"), (b, "dst")):
                if vname not in bound:
                    vstruct = self.vertices.select(_struct(self.vertices, vname))
                    df = df.join(
                        vstruct,
                        F.col(e)[key] == F.col(vname)["id"],
                    )
                    bound.add(vname)
                    joined_here.add(vname)
                elif vname in joined_here:
                    # self-loop motif (a)-[e]->(a): the dst constraint
                    # wasn't part of the edge join -- apply it now
                    df = df.filter(F.col(e)[key] == F.col(vname)["id"])
        assert df is not None
        for a, b in negated:
            if a not in bound or b not in bound:
                raise MotifError(
                    f"negated term !({a})-[]->({b}) references unbound names"
                )
            pair = self.edges.select(
                F.col("src").alias("__nsrc"), F.col("dst").alias("__ndst")
            )
            df = df.join(
                pair,
                (F.col(a)["id"] == F.col("__nsrc"))
                & (F.col(b)["id"] == F.col("__ndst")),
                "left_anti",
            )
        named = [c for c in df.columns if not c.startswith("__anon")]
        return df.select(*named)

    # -- GraphFrames-style property accessors -------------------------------

    @property
    def degrees(self) -> DataFrame:
        return G.degrees(self.edges).select("id", "degree")

    @property
    def inDegrees(self) -> DataFrame:
        return G.degrees(self.edges).select(
            "id", F.col("in_degree").alias("inDegree")
        )

    @property
    def outDegrees(self) -> DataFrame:
        return G.degrees(self.edges).select(
            "id", F.col("out_degree").alias("outDegree")
        )

    # -- algorithms (wrappers over operators/graph.py) ----------------------

    def filterVertices(self, condition) -> "GraphFrame":
        v = self.vertices.filter(condition)
        ids = v.select("id")
        e = (
            self.edges.join(
                F.broadcast(ids), self.edges["src"] == ids["id"], "left_semi"
            ).join(F.broadcast(ids), F.col("dst") == ids["id"], "left_semi")
        )
        return GraphFrame(v, e)

    def filterEdges(self, condition) -> "GraphFrame":
        return GraphFrame(self.vertices, self.edges.filter(condition))

    def dropIsolatedVertices(self) -> "GraphFrame":
        touched = (
            self.edges.select(F.col("src").alias("id"))
            .unionByName(self.edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        return GraphFrame(self.vertices.join(touched, "id", "left_semi"), self.edges)

    def connectedComponents(self, **kw) -> DataFrame:
        return G.connected_components(
            self.edges.select("src", "dst"),
            nodes=self.vertices.select("id"),
            **kw,
        )

    def shortestPaths(self, landmarks: DataFrame, max_hops: int = 10) -> DataFrame:
        """BFS hop distances TO the landmark set (GraphFrames semantics are
        per-landmark distances; here: (src=landmark, dst, path, hops))."""
        return G.shortest_paths(landmarks, self.edges, max_hops, mode="one")
