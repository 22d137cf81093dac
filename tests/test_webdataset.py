"""WebDataset tar-shard source/sink (sources/webdataset.py).

Covers: round-trip fidelity (text + binary + sparse NULL members),
byte-determinism of the written shards across runs, explicit shard
placement, and the reader's extension selection.
"""

from __future__ import annotations

import os
import tarfile

import pytest
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.sources import webdataset as wds


@pytest.fixture(scope="module")
def sample(spark):
    rows = [
        (0, "alpha text", bytes([0, 1, 2, 255]), '{"a": 1}'),
        (1, "beta", None, '{"a": 2}'),
        (2, None, b"\x00" * 17, None),
        (3, "delta", b"xyz", '{"a": 4}'),
        (10, "k ten", b"ten", '{"a": 10}'),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, txt string, bin binary, json string"
    )


def _write(df, out, n_shards=2):
    return wds.write_webdataset(
        df, str(out), "doc_id", F.pmod(F.col("doc_id"), F.lit(n_shards)), n_shards
    )


def test_roundtrip_all_fields(spark, sample, tmp_path):
    out = tmp_path / "w1"
    n = _write(sample, out)
    assert n == 2
    wds.register(spark)
    back = (
        spark.read.format("webdataset")
        .option("exts", "txt,bin,json")
        .load(str(out))
        .orderBy(F.col("key").cast("long"))
    )
    got = [tuple(r) for r in back.collect()]
    assert got == [
        ("0", "alpha text", bytearray([0, 1, 2, 255]), '{"a": 1}', "shard-000000.tar"),
        ("1", "beta", None, '{"a": 2}', "shard-000001.tar"),
        ("2", None, bytearray(b"\x00" * 17), None, "shard-000000.tar"),
        ("3", "delta", bytearray(b"xyz"), '{"a": 4}', "shard-000001.tar"),
        ("10", "k ten", bytearray(b"ten"), '{"a": 10}', "shard-000000.tar"),
    ]


def test_written_shards_are_byte_deterministic(spark, sample, tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    _write(sample, a)
    _write(sample.orderBy(F.desc("doc_id")).repartition(5), b)
    for name in sorted(os.listdir(a)):
        with open(a / name, "rb") as fa, open(b / name, "rb") as fb:
            assert fa.read() == fb.read(), name


def test_members_sorted_and_metadata_zeroed(spark, sample, tmp_path):
    out = tmp_path / "w2"
    _write(sample, out)
    with tarfile.open(out / "shard-000000.tar") as tf:
        names = [m.name for m in tf.getmembers()]
        # sorted by string key: "0" < "10" < "2"; NULL members skipped
        assert names == ["0.txt", "0.bin", "0.json", "10.txt", "10.bin", "10.json", "2.bin"]
        for m in tf.getmembers():
            assert (m.mtime, m.uid, m.gid, m.uname, m.gname) == (0, 0, 0, "", "")


def test_reader_ext_subset_and_missing_ext(spark, sample, tmp_path):
    out = tmp_path / "w3"
    _write(sample, out)
    wds.register(spark)
    back = (
        spark.read.format("webdataset")
        .option("exts", "txt,nope")
        .load(str(out))
    )
    assert back.columns == ["key", "txt", "nope", "_shard"]
    rows = {r["key"]: (r["txt"], r["nope"]) for r in back.collect()}
    assert rows["0"] == ("alpha text", None)
    assert rows["2"] == (None, None)


def test_single_shard_many_partitions(spark, sample, tmp_path):
    out = tmp_path / "w4"
    n = wds.write_webdataset(sample, str(out), "doc_id", F.lit(0), 1)
    assert n == 1
    wds.register(spark)
    back = spark.read.format("webdataset").option("exts", "txt").load(str(out))
    assert back.count() == 5


def test_stream_incremental_shard_ingestion(spark, sample, tmp_path):
    """Streaming reader: offset = consumed-shard count. First run drains
    the existing shards; shards appended afterwards are picked up by a
    restart over the SAME checkpoint without re-reading the old ones —
    exactly-once shard ingestion."""
    src = tmp_path / "grow"
    ckpt = str(tmp_path / "ckpt")
    _write(sample, src)  # shards 0 and 1
    wds.register(spark)

    seen: list[tuple] = []

    def drain():
        q = (
            spark.readStream.format("webdataset")
            .option("exts", "txt")
            .load(str(src))
            .writeStream.foreachBatch(
                lambda df, _eid: seen.extend(
                    (r["key"], r["txt"], r["_shard"]) for r in df.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert sorted(k for k, _, _ in seen) == ["0", "1", "10", "2", "3"]

    # producer drops two more immutable shards (names sort after existing)
    more = spark.createDataFrame(
        [(20, "late twenty"), (21, "late twenty-one")], "doc_id long, txt string"
    )
    wds.write_webdataset(
        more, str(src), "doc_id", F.pmod(F.col("doc_id"), F.lit(2)) + F.lit(2), 2
    )
    before = len(seen)
    drain()
    new = seen[before:]
    assert sorted(k for k, _, _ in new) == ["20", "21"]
    assert {s for _, _, s in new} == {"shard-000002.tar", "shard-000003.tar"}
