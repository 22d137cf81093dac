"""Multimodal column operators (north-star extension; SURVEY.md §2.6 W4/W5).

Media lives in DataFrames as an opaque ``binary`` payload column plus typed
metadata -- the standard large-scale layout (payload stays columnar/Parquet,
never round-trips through the driver). All per-item compute runs as
Arrow-batched ``mapInPandas`` so the Spark-side plumbing (schema, batch
shape, partitioning) is the production path.

The actual codecs (image resize, audio decode, video frame extraction) are
NOT in this runtime, so the decode kernels are stubbed: ``decode_media``
raises ``NotImplementedError`` per unsupported kind unless
``deterministic_fake=True``, which produces seeded fake features with the
exact schema/shape real decoders would emit. Everything around the stub --
batching, schema, fan-out of frame samples -- is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Typed-metadata schema for a media table (payload: binary, not parsed here).
MEDIA_COLUMNS = "media_id bigint, kind string, payload binary"

FEATURE_DIM = 16

DECODED_SCHEMA = (
    "media_id bigint, kind string, payload_bytes bigint, checksum string, "
    f"feature array<float>"
)

FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_checksum string"


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real embedding model: seed an RNG from
    the payload digest. Same payload -> same vector, any executor."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    return np.random.default_rng(seed).random(dim, dtype=np.float32)


def decode_media(
    media: DataFrame,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode/feature-extract each payload via mapInPandas (Arrow batches).

    With ``deterministic_fake`` the stub emits seeded features; otherwise it
    raises NotImplementedError naming the missing codec -- the marker that a
    real decoder (Pillow/ffmpeg/torchaudio) plugs in here with zero changes
    to the Spark plan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                kinds = sorted(set(pdf["kind"]))
                raise NotImplementedError(
                    f"media codecs not available in this runtime (kinds: {kinds}); "
                    "install decoders or pass deterministic_fake=True"
                )
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": [len(p) for p in payloads],
                    "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                    "feature": [_fake_feature(p).tolist() for p in payloads],
                }
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def sample_frames(
    media: DataFrame,
    n_frames: int = 4,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Frame-sampling fan-out (video -> N frame rows). The stub derives each
    frame checksum from (payload digest, frame index); a real implementation
    swaps the kernel, the 1->N Arrow fan-out shape stays."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "video frame extraction needs ffmpeg; pass deterministic_fake=True"
                )
            ids, idxs, sums = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                digest = hashlib.md5(bytes(payload)).hexdigest()
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    sums.append(hashlib.md5(f"{digest}:{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(run, schema=FRAME_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stub: the Spark plan (filter to images, mapInPandas,
    binary-out schema) is real; the kernel raises until Pillow exists."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            f"image resize to {width}x{height} needs Pillow in the executors"
        )
        yield  # pragma: no cover -- keeps this a generator

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema="media_id bigint, payload binary"
    )


def docs_as_media(documents: DataFrame) -> DataFrame:
    """Adapter used by tests/bench: documents stand in for media payloads
    (text bytes as the opaque binary column, kind assigned round-robin)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
