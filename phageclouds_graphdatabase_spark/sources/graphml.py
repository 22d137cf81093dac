"""GraphML export sink (S7 breadth): the standard XML graph interchange
format (graphml.graphdrawing.org) that Gephi / yEd / NetworkX read — the
"take my phage cloud into a desktop graph tool" path the reference's
vis.js HTML can't serve.

Deterministic output: nodes sorted by id, edges by (src, dst), attribute
keys sorted — byte-stable for golden diffing, like the vis sink. The write
is a driver-side sink over ``toPandas()`` (same boundary policy as S6:
sinks are the one sanctioned collect; a cloud's nodes/edges are
visualization-sized by the time they reach an export)."""

from __future__ import annotations

from xml.sax.saxutils import escape


def _attr(v: str) -> str:
    """Escape for ATTRIBUTE position (double-quoted): &<> AND the quote
    itself -- plain escape() leaves '"' alone, which malforms the XML when
    an id or column name contains one (ADVICE r1, graphml.py:85)."""
    return escape(v, {'"': "&quot;"})

from pyspark.sql import DataFrame

_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
)

_TYPES = {
    "int": "int", "bigint": "long", "long": "long", "float": "float",
    "double": "double", "boolean": "boolean",
}


def _attr_type(spark_type: str) -> str:
    return _TYPES.get(spark_type, "string")


def write_graphml(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    node_id: str = "id",
    edge_src: str = "src",
    edge_dst: str = "dst",
    directed: bool = True,
) -> str:
    """Write ``nodes`` / ``edges`` as a GraphML document. Every non-key
    column becomes a typed ``<key>`` declaration + per-element ``<data>``;
    NULLs are omitted (GraphML's absent-attribute convention)."""
    n_attrs = [
        (f.name, _attr_type(f.dataType.simpleString()))
        for f in nodes.schema.fields
        if f.name != node_id
    ]
    e_attrs = [
        (f.name, _attr_type(f.dataType.simpleString()))
        for f in edges.schema.fields
        if f.name not in (edge_src, edge_dst)
    ]
    npd = nodes.toPandas().sort_values(node_id)
    epd = edges.toPandas().sort_values([edge_src, edge_dst])

    out = [_HEADER]
    for name, typ in sorted(n_attrs):
        out.append(
            f'  <key id="n_{_attr(name)}" for="node" '
            f'attr.name="{_attr(name)}" attr.type="{typ}"/>\n'
        )
    for name, typ in sorted(e_attrs):
        out.append(
            f'  <key id="e_{_attr(name)}" for="edge" '
            f'attr.name="{_attr(name)}" attr.type="{typ}"/>\n'
        )
    kind = "directed" if directed else "undirected"
    out.append(f'  <graph id="G" edgedefault="{kind}">\n')
    for row in npd.itertuples(index=False):
        d = row._asdict()
        out.append(f'    <node id="{_attr(str(d[node_id]))}">\n')
        for name, _ in sorted(n_attrs):
            v = d[name]
            if v is not None and v == v:  # skip None and NaN
                out.append(
                    f'      <data key="n_{_attr(name)}">'
                    f"{escape(str(v))}</data>\n"
                )
        out.append("    </node>\n")
    for i, row in enumerate(epd.itertuples(index=False)):
        d = row._asdict()
        out.append(
            f'    <edge id="e{i}" source="{_attr(str(d[edge_src]))}" '
            f'target="{_attr(str(d[edge_dst]))}">\n'
        )
        for name, _ in sorted(e_attrs):
            v = d[name]
            if v is not None and v == v:
                out.append(
                    f'      <data key="e_{_attr(name)}">'
                    f"{escape(str(v))}</data>\n"
                )
        out.append("    </edge>\n")
    out.append("  </graph>\n</graphml>\n")
    with open(path, "w") as f:
        f.write("".join(out))
    return path
