"""Multimodal column operators (north-star extension; SURVEY.md §2.6 W4/W5).

Media lives in DataFrames as an opaque ``binary`` payload column plus typed
metadata -- the standard large-scale layout (payload stays columnar/Parquet,
never round-trips through the driver). All per-item compute runs as
Arrow-batched ``mapInPandas`` so the Spark-side plumbing (schema, batch
shape, partitioning) is the production path.

Codec status: uncompressed raster images (PPM ``P6`` and 24-bit
uncompressed BMP) decode, resize, and feature-extract FOR REAL in pure
numpy -- no external libraries -- via ``image_stats`` / ``resize_images``.
Compressed formats (PNG/JPEG) and audio/video kernels are NOT decodable in
this runtime and stay stubbed: ``decode_media`` raises
``NotImplementedError`` per unsupported kind unless
``deterministic_fake=True``, which produces seeded fake features with the
exact schema/shape real decoders would emit. Everything around the stubs --
batching, schema, fan-out of frame samples -- is the production path.
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


# --------------------------------------------------------------------------
# Real pure-numpy codecs for uncompressed raster formats. PPM P6 and 24-bit
# BMP need no compression library, so decode/resize/stats are fully real;
# anything else raises the codec-missing marker.
# --------------------------------------------------------------------------


def _decode_ppm(data: bytes) -> np.ndarray:
    """PPM ``P6`` -> HxWx3 uint8 (maxval <= 255; comments supported)."""
    if not data.startswith(b"P6"):
        raise NotImplementedError("not a P6 PPM payload")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    return np.frombuffer(data, np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


def _decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> HxWx3 uint8 RGB (handles bottom-up rows,
    row padding, and BGR channel order)."""
    if not data.startswith(b"BM"):
        raise NotImplementedError("not a BMP payload")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (got bpp={bpp}, compression={comp})")
    stride = (w * 3 + 3) // 4 * 4
    hh = abs(h)
    rows = np.frombuffer(data, np.uint8, count=stride * hh, offset=off).reshape(hh, stride)
    arr = rows[:, : w * 3].reshape(hh, w, 3)[..., ::-1]  # BGR -> RGB
    return np.ascontiguousarray(arr[::-1] if h > 0 else arr)


def decode_image_array(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes; NotImplementedError marks the compressed
    formats a real Pillow install would add."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "compressed image codecs (PNG/JPEG) not available in this runtime; "
        "only PPM P6 / 24-bit BMP decode natively"
    )


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(arr, np.uint8).tobytes()


def _resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    h, w = arr.shape[:2]
    ri = np.arange(height, dtype=np.int64) * h // height
    ci = np.arange(width, dtype=np.int64) * w // width
    return arr[ri][:, ci]


IMAGE_STATS_SCHEMA = (
    "media_id bigint, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def image_stats(media: DataFrame) -> DataFrame:
    """REAL image decode + per-channel statistics (pure numpy, Arrow
    batches): width/height and exact float64 channel means for every
    PPM/BMP payload. The Spark shape (filter to images, mapInPandas) is the
    same one a Pillow-backed decoder would use."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image_array(bytes(payload))
                means = arr.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                out["media_id"].append(mid)
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["mean_r"].append(float(means[0]))
                out["mean_g"].append(float(means[1]))
                out["mean_b"].append(float(means[2]))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=IMAGE_STATS_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize for uncompressed rasters: decode (PPM/BMP),
    nearest-neighbor index in numpy, re-encode as PPM. Compressed payloads
    raise the codec-missing marker; the Spark plan is final either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image_array(bytes(payload))
                ids.append(mid)
                payloads.append(encode_ppm(_resize_nearest(arr, width, height)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

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
