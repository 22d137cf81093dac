"""GraphML export sink (sources/graphml.py): well-formed XML, typed key
declarations, deterministic ordering, NULL omission — parsed back with the
stdlib ElementTree as the round-trip check."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from phageclouds_graphdatabase_spark.sources.graphml import write_graphml

NS = {"g": "http://graphml.graphdrawing.org/xmlns"}


def test_graphml_round_trip(spark, tmp_path):
    nodes = spark.createDataFrame(
        [("b", "NCBI", 170), ("a", None, 120)],
        "id string, source string, genome_size int",
    )
    edges = spark.createDataFrame(
        [("a", "b", 0.25)], "src string, dst string, distance double"
    )
    p = str(tmp_path / "g.graphml")
    write_graphml(nodes, edges, p)
    root = ET.parse(p).getroot()

    keys = {
        k.attrib["id"]: (k.attrib["attr.name"], k.attrib["attr.type"])
        for k in root.findall("g:key", NS)
    }
    assert keys["n_genome_size"] == ("genome_size", "int")
    assert keys["n_source"] == ("source", "string")
    assert keys["e_distance"] == ("distance", "double")

    graph = root.find("g:graph", NS)
    assert graph.attrib["edgedefault"] == "directed"
    node_ids = [n.attrib["id"] for n in graph.findall("g:node", NS)]
    assert node_ids == ["a", "b"]  # sorted, deterministic

    a = graph.findall("g:node", NS)[0]
    a_data = {d.attrib["key"]: d.text for d in a.findall("g:data", NS)}
    assert a_data == {"n_genome_size": "120"}  # NULL source omitted

    e = graph.find("g:edge", NS)
    assert (e.attrib["source"], e.attrib["target"]) == ("a", "b")
    e_data = {d.attrib["key"]: d.text for d in e.findall("g:data", NS)}
    assert e_data == {"e_distance": "0.25"}


def test_graphml_escapes_xml(spark, tmp_path):
    nodes = spark.createDataFrame(
        [("x<&>", 'quo"te')], "id string, label string"
    )
    edges = spark.createDataFrame([], "src string, dst string")
    p = str(tmp_path / "esc.graphml")
    write_graphml(nodes, edges, p)
    root = ET.parse(p).getroot()  # must parse despite specials
    n = root.find("g:graph", NS).find("g:node", NS)
    assert n.attrib["id"] == "x<&>"
    assert n.find("g:data", NS).text == 'quo"te'


def test_graphml_quote_in_attribute_position(spark, tmp_path):
    """ADVICE r1: a double quote inside an id (attribute position) used to
    produce malformed XML — escape() leaves '"' alone. Must parse and
    round-trip the quote now."""
    nodes = spark.createDataFrame(
        [('id"with"quotes', "v")], "id string, label string"
    )
    edges = spark.createDataFrame(
        [('id"with"quotes', 'id"with"quotes', 0.1)],
        "src string, dst string, distance double",
    )
    p = str(tmp_path / "quo.graphml")
    write_graphml(nodes, edges, p)
    root = ET.parse(p).getroot()  # malformed XML would raise here
    g = root.find("g:graph", NS)
    assert g.find("g:node", NS).attrib["id"] == 'id"with"quotes'
    e = g.find("g:edge", NS)
    assert e.attrib["source"] == 'id"with"quotes'
    assert e.attrib["target"] == 'id"with"quotes'


def test_graphml_deterministic_bytes(spark, tmp_path):
    nodes = spark.createDataFrame(
        [("a", 1), ("b", 2)], "id string, v int"
    ).repartition(4)
    edges = spark.createDataFrame(
        [("a", "b", 0.1), ("b", "a", 0.2)],
        "src string, dst string, distance double",
    ).repartition(3)
    p1 = str(tmp_path / "one.graphml")
    p2 = str(tmp_path / "two.graphml")
    write_graphml(nodes, edges, p1)
    write_graphml(nodes, edges, p2)
    assert open(p1).read() == open(p2).read()
