"""Z-order clustered layout (sources/zorder.py): Morton-code correctness
against a hand-rolled Python reference, and the data-skipping property the
layout exists for — a 2-D box predicate must touch a small fraction of the
z-ordered files while the same predicate over a hash-random layout touches
essentially all of them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.sources import zorder


def _py_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 127, 255) for y in (0, 2, 9, 200, 255)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder.z_value(F.col("x"), F.col("y"), 8).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_morton(x, y, 8), (x, y)


def test_z_value_locality_monotone_blocks(spark):
    # the defining curve property: the 2x2 block (0,0),(1,0),(0,1),(1,1)
    # maps to the contiguous codes 0,1,2,3
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (1, 1)], "x int, y int")
    got = sorted(
        r.z
        for r in df.select(zorder.z_value(F.col("x"), F.col("y"), 8).alias("z")).collect()
    )
    assert got == [0, 1, 2, 3]


@pytest.fixture(scope="module")
def xy_corpus(spark):
    # 200k uniform points in [0, 10000)^2, deterministic hash coordinates
    return (
        spark.range(200_000)
        .select(
            F.col("id"),
            F.pmod(F.xxhash64("id", F.lit("x")), F.lit(10_000)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit("y")), F.lit(10_000)).alias("y"),
        )
        .cache()
    )


def test_zordered_layout_skips_most_files(spark, xy_corpus, tmp_path):
    zpath = str(tmp_path / "zo")
    rpath = str(tmp_path / "rand")
    zorder.write_zordered(xy_corpus, zpath, "x", "y", n_files=64, bits=8)
    # control: same data hash-scattered across the same file count
    xy_corpus.repartition(64, "id").write.mode("overwrite").parquet(rpath)

    zboxes = zorder.file_boxes(zpath, "x", "y")
    rboxes = zorder.file_boxes(rpath, "x", "y")
    assert len(zboxes) == 64 and len(rboxes) == 64

    # a 10% x 10% box predicate
    zhit = zorder.files_intersecting(zboxes, 4000, 5000, 4000, 5000)
    rhit = zorder.files_intersecting(rboxes, 4000, 5000, 4000, 5000)
    # random layout: every file spans ~the full domain -> no skipping
    assert len(rhit) == 64
    # z-order: a min/max pruner reads at most a quarter of the files
    # (range boundaries aren't quadrant-aligned, so a curve segment can
    # straddle tiles — locality still prunes >= 75%)
    assert len(zhit) <= 16, [b["file"] for b in zhit]

    # and the layout changes nothing about results: parity on the predicate
    want = xy_corpus.filter(
        F.col("x").between(4000, 5000) & F.col("y").between(4000, 5000)
    ).count()
    got = (
        spark.read.parquet(zpath)
        .filter(F.col("x").between(4000, 5000) & F.col("y").between(4000, 5000))
        .count()
    )
    assert got == want


def test_zordered_roundtrip_preserves_rows(spark, xy_corpus, tmp_path):
    p = str(tmp_path / "zo2")
    zorder.write_zordered(xy_corpus, p, "x", "y", n_files=8, bits=6)
    back = spark.read.parquet(p)
    assert back.count() == xy_corpus.count()
    assert sorted(back.columns) == sorted(xy_corpus.columns)
    # checksum parity (order-insensitive)
    a = xy_corpus.agg(F.sum(F.col("x") * F.col("y"))).collect()[0][0]
    b = back.agg(F.sum(F.col("x") * F.col("y"))).collect()[0][0]
    assert a == b
