"""format("vis_html") Python DataSource: golden HTML files scanned as
DataFrames, one partition per file, agreeing with the direct parser."""

from __future__ import annotations

import os

import pytest

from phageclouds_graphdatabase_spark.sources import golden, vis_datasource

REF = "/root/reference"
GOLDEN = os.path.join(REF, "Tequatrovirus_025_clouds.html")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference goldens absent"
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    vis_datasource.register(spark)


def test_nodes_match_parser(spark):
    df = spark.read.format("vis_html").option("kind", "nodes").load(GOLDEN)
    want, _ = golden.golden_frames(spark, GOLDEN)
    got = {(r.id, r.color_background, r.size) for r in df.collect()}
    assert got == {(r.id, r.color_background, r.size) for r in want.collect()}
    assert df.select("_file").distinct().collect()[0][0] == os.path.basename(GOLDEN)


def test_edges_match_parser(spark):
    df = spark.read.format("vis_html").option("kind", "edges").load(GOLDEN)
    _, want = golden.golden_frames(spark, GOLDEN)
    assert {(r.src, r.dst, r.weight) for r in df.collect()} == {
        (r.src, r.dst, r.weight) for r in want.collect()
    }


def test_multi_file_scan_parallelizes_per_file(spark):
    two = ",".join(
        [GOLDEN, os.path.join(REF, "Tequatrovirus_015_clouds.html")]
    )
    df = spark.read.format("vis_html").option("kind", "nodes").load(two)
    assert df.rdd.getNumPartitions() == 2
    assert df.select("_file").distinct().count() == 2


def test_directory_scan_reads_all_html(spark):
    df = spark.read.format("vis_html").option("kind", "nodes").load(REF)
    n_html = len([f for f in os.listdir(REF) if f.endswith(".html")])
    assert df.select("_file").distinct().count() == n_html
