"""WebDataset tar-shard source + sink (training-corpus at-rest layout).

WebDataset is the de-facto sharded layout for multimodal LLM training data:
a corpus is a directory of POSIX tar files (``shard-000000.tar``, ...), each
sample is a group of adjacent members sharing a basename key and differing
in extension (``0017.txt``, ``0017.json``, ``0017.bin``). Loaders stream
whole shards sequentially — the layout IS the partitioning, which is exactly
Spark's InputPartition model: one shard per partition, no small-file
problem, sequential I/O at 100 TB.

Everything here is stdlib ``tarfile`` — no external dependency.

Write side
    :func:`write_webdataset` shards a DataFrame by an explicit deterministic
    shard expression (caller controls placement — e.g. ``pmod(doc_id, 64)``
    — so reruns are byte-stable and an oracle can re-derive the assignment).
    Each executor task writes the tar(s) for the shard ids it holds; nothing
    is collected to the driver. Tar metadata (mtime/uid/gid) is zeroed and
    members are emitted in sorted-key order, so shard bytes are reproducible.

Read side
    ``spark.read.format("webdataset").load(dir_or_glob)`` (Spark 4 Python
    DataSource API, same shape as sources/vis_datasource.py): one
    InputPartition per shard, members regrouped into samples by basename,
    rows yielded Arrow-batched. Columns: ``key``, one column per requested
    extension (``txt``/``json`` as string, anything else binary), plus
    ``_shard`` for provenance.

Streaming side
    ``spark.readStream.format("webdataset").load(dir)`` ingests a GROWING
    shard directory micro-batch by micro-batch: offset = consumed-shard
    count over the sorted listing, one shard per InputPartition, replayable
    offset ranges -> exactly-once shard ingestion under checkpointed
    queries (proven by restart test).

At 100 TB: shard size is the unit of parallelism — write with
``shards = ceil(bytes / 512 MiB)`` and reading 200k shards across 1000
executors is embarrassingly parallel with zero shuffle. The writer's single
shuffle is the explicit repartition on shard id; the reader has none.

Reference scope note: the reference persists pyvis HTML only
(phageclouds_gdb.py:102-120); this module is part of the training-pipeline
extension surface (SURVEY.md §2 W4/W5 family), not reference parity.
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_TEXT_EXTS = {"txt", "json", "html", "xml", "csv", "md"}


def shard_name(shard_id: int) -> str:
    return f"shard-{shard_id:06d}.tar"


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    shard_col: Column,
    n_shards: int,
) -> int:
    """Write ``df`` as WebDataset tar shards under ``out_dir``.

    Every non-key column becomes one member per sample, named
    ``<key>.<column name>`` (so a column literally called ``txt`` produces
    the conventional ``.txt`` member). String columns are UTF-8 encoded;
    binary columns are written as-is; anything else is stringified. NULL
    cells skip the member (WebDataset's sparse-field convention).

    ``shard_col`` must be a deterministic integer expression in
    ``[0, n_shards)`` — the caller owns placement. Samples land in
    ``shard-<id>.tar`` sorted by key; tar headers are zeroed, so the same
    input produces byte-identical shards on every run.

    Returns the number of shard files written. Executes distributed: one
    shuffle (repartition by shard id), then each task writes the shards it
    holds locally. No driver-side materialization of sample data.
    """
    os.makedirs(out_dir, exist_ok=True)
    data_cols = [c for c in df.columns if c != key_col]
    staged = df.select(
        F.col(key_col).cast("string").alias("__key"),
        shard_col.cast("int").alias("__shard"),
        *data_cols,
    ).repartition(n_shards, "__shard")

    def _write_partition(batches) -> Iterator:
        # Runs on executors (Arrow-batched). A hash partition may hold
        # several shard ids (or none) — concat the partition's batches,
        # group by shard id, one tar per id present.
        import pandas as pd

        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        for sid, spdf in pdf.groupby("__shard", sort=True):
            spdf = spdf.sort_values("__key")
            path = os.path.join(out_dir, shard_name(int(sid)))
            with tarfile.open(path, "w") as tf:
                # dict records, not itertuples: pandas mangles the leading-
                # underscore staging names in namedtuple fields
                for r in spdf.to_dict("records"):
                    key = r["__key"]
                    for c in data_cols:
                        v = r[c]
                        if v is None or (v != v if isinstance(v, float) else False):
                            continue
                        if isinstance(v, (bytes, bytearray)):
                            payload = bytes(v)
                        else:
                            payload = str(v).encode("utf-8")
                        info = tarfile.TarInfo(name=f"{key}.{c}")
                        info.size = len(payload)
                        info.mtime = 0
                        info.uid = info.gid = 0
                        info.uname = info.gname = ""
                        tf.addfile(info, io.BytesIO(payload))
            yield pd.DataFrame({"shard": [int(sid)], "n": [len(spdf)]})

    out = staged.mapInPandas(_write_partition, "shard int, n long")
    return out.count()


def _expand_shards(path: str) -> list[str]:
    out: list[str] = []
    for p in path.split(","):
        p = p.strip()
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".tar")
            )
        elif p:
            out.append(p)
    return out


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _make_row(key: str, fields: dict[str, bytes], shard: str, exts) -> tuple:
    vals: list = [key]
    for ext in exts:
        raw = fields.get(ext)
        if raw is None:
            vals.append(None)
        elif ext in _TEXT_EXTS:
            vals.append(raw.decode("utf-8"))
        else:
            vals.append(raw)
    vals.append(shard)
    return tuple(vals)


def _read_shard(path: str, exts) -> Iterator[tuple]:
    """Stream one tar shard: regroup adjacent same-basename members into
    samples, one output row per sample. Sequential I/O, constant memory."""
    shard = os.path.basename(path)
    with tarfile.open(path, "r") as tf:
        cur_key: str | None = None
        fields: dict[str, bytes] = {}
        for member in tf:
            if not member.isfile():
                continue
            base, dot, ext = member.name.rpartition(".")
            if not dot:
                base, ext = member.name, ""
            if base != cur_key:
                if cur_key is not None:
                    yield _make_row(cur_key, fields, shard, exts)
                cur_key, fields = base, {}
            if ext in exts:
                f = tf.extractfile(member)
                fields[ext] = f.read() if f is not None else b""
        if cur_key is not None:
            yield _make_row(cur_key, fields, shard, exts)


def _opt_exts(options: dict) -> list[str]:
    return [
        e.strip()
        for e in options.get("exts", "txt,json").split(",")
        if e.strip()
    ]


class WebDatasetReader(DataSourceReader):
    def __init__(self, options: dict):
        self.exts = _opt_exts(options)
        self.paths = _expand_shards(options.get("path", ""))
        if not self.paths:
            raise ValueError("webdataset requires a load(path) of .tar shard(s)")

    def partitions(self) -> list[InputPartition]:
        return [_ShardPartition(p) for p in self.paths]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        yield from _read_shard(partition.path, self.exts)


class WebDatasetStreamReader(DataSourceStreamReader):
    """Micro-batch ingestion of a GROWING shard directory — the arrival
    pattern of a training corpus under construction (each producer drop is
    one immutable tar shard; shard files are never rewritten).

    Offset = ``{"index": n}``, the count of shards consumed from the
    sorted listing. Each micro-batch reads the newly-arrived suffix, one
    shard per InputPartition (shard-parallel, shuffle-free), and replaying
    any (start, end] offset range re-reads exactly those shards — which
    with a checkpointed query gives exactly-once shard ingestion. The
    writer's zero-padded ``shard-NNNNNN.tar`` names sort appended shards
    after consumed ones; any naming scheme with that property works."""

    def __init__(self, options: dict):
        self.exts = _opt_exts(options)
        self.path = options.get("path", "")
        if not self.path:
            raise ValueError("webdataset stream requires a load(path) directory")

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(_expand_shards(self.path))}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        shards = _expand_shards(self.path)[start["index"] : end["index"]]
        return [_ShardPartition(p) for p in shards]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        yield from _read_shard(partition.path, self.exts)

    def commit(self, end: dict) -> None:
        pass  # consumed shards stay in place; offset tracking is the state


class WebDatasetDataSource(DataSource):
    """``format("webdataset")`` — one tar shard per InputPartition."""

    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self) -> str:
        exts = [e.strip() for e in self.options.get("exts", "txt,json").split(",") if e.strip()]
        cols = ["key string"]
        for ext in exts:
            kind = "string" if ext in _TEXT_EXTS else "binary"
            cols.append(f"{ext} {kind}")
        cols.append("_shard string")
        return ", ".join(cols)

    def reader(self, schema) -> WebDatasetReader:
        return WebDatasetReader(dict(self.options))

    def streamReader(self, schema) -> WebDatasetStreamReader:
        return WebDatasetStreamReader(dict(self.options))


def register(spark: SparkSession) -> None:
    spark.dataSource.register(WebDatasetDataSource)
