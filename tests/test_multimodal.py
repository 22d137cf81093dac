"""Multimodal operator tests (W4): the Arrow plumbing is real, the codec
kernels are stubbed -- decode raises NotImplementedError unless the
deterministic fake is requested (container has no image/audio libs)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql.utils import PythonException

from phageclouds_graphdatabase_spark.operators import multimodal as mm
from phageclouds_graphdatabase_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return mm.docs_as_media(read_table(spark, sf_dir, "documents").limit(30)).cache()


def test_decode_stub_raises_without_fake(media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        mm.decode_media(media).collect()


def test_decode_fake_deterministic_schema_and_values(spark, media):
    out = mm.decode_media(media, deterministic_fake=True)
    assert dict(out.dtypes) == {
        "media_id": "bigint",
        "kind": "string",
        "payload_bytes": "bigint",
        "checksum": "string",
        "feature": "array<float>",
    }
    rows = {r.media_id: r for r in out.collect()}
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert set(rows) == set(src)
    for mid, payload in src.items():
        assert rows[mid].checksum == hashlib.md5(payload).hexdigest()
        assert len(rows[mid].feature) == mm.FEATURE_DIM
    # Determinism across runs (seeded RNG from payload digest).
    again = {r.media_id: r.feature for r in mm.decode_media(media, deterministic_fake=True).collect()}
    assert all(again[m] == rows[m].feature for m in rows)


def test_frame_sampling_fanout(media):
    frames = mm.sample_frames(media, n_frames=3, deterministic_fake=True)
    rows = frames.collect()
    videos = media.filter("kind = 'video'").count()
    assert len(rows) == videos * 3
    per = {}
    for r in rows:
        per.setdefault(r.media_id, set()).add(r.frame_idx)
    assert all(v == {0, 1, 2} for v in per.values())


def test_resize_stub_raises(media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        mm.resize_images(media, 64, 64).collect()


# ---------------------------------------------------------------------------
# Real pure-numpy raster codecs: PPM P6 and 24-bit BMP decode/resize/stats.
# ---------------------------------------------------------------------------

import numpy as np


def _ppm_bytes(arr):
    return mm.encode_ppm(arr)


def _bmp_bytes(arr):
    """Minimal 24-bit bottom-up BMP writer (the layout real files use)."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pix = rows.tobytes()
    header = (
        b"BM"
        + (54 + len(pix)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pix).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + pix


@pytest.fixture(scope="module")
def raster_media(spark):
    rng = np.random.default_rng(7)
    imgs = {
        0: rng.integers(0, 256, (5, 7, 3), dtype=np.uint8),   # PPM
        1: rng.integers(0, 256, (6, 6, 3), dtype=np.uint8),   # BMP (no pad)
        2: rng.integers(0, 256, (4, 5, 3), dtype=np.uint8),   # BMP (padded rows)
    }
    rows = [
        (0, "image", _ppm_bytes(imgs[0])),
        (1, "image", _bmp_bytes(imgs[1])),
        (2, "image", _bmp_bytes(imgs[2])),
        (3, "audio", b"not an image"),
    ]
    return imgs, spark.createDataFrame(rows, mm.MEDIA_COLUMNS)


def test_codec_roundtrip_exact(raster_media):
    imgs, _ = raster_media
    for mid, arr in imgs.items():
        payload = _ppm_bytes(arr) if mid == 0 else _bmp_bytes(arr)
        np.testing.assert_array_equal(mm.decode_image_array(payload), arr)


def test_image_stats_real_decode(raster_media):
    imgs, media = raster_media
    rows = {r.media_id: r for r in mm.image_stats(media).collect()}
    assert set(rows) == set(imgs)  # audio row filtered out
    for mid, arr in imgs.items():
        r = rows[mid]
        assert (r.width, r.height) == (arr.shape[1], arr.shape[0])
        means = arr.reshape(-1, 3).mean(axis=0, dtype=np.float64)
        assert (r.mean_r, r.mean_g, r.mean_b) == tuple(float(m) for m in means)


def test_resize_real_nearest_neighbor(raster_media):
    imgs, media = raster_media
    out = {r.media_id: bytes(r.payload) for r in mm.resize_images(media, 3, 2).collect()}
    assert set(out) == set(imgs)
    for mid, arr in imgs.items():
        got = mm.decode_image_array(out[mid])
        np.testing.assert_array_equal(got, mm._resize_nearest(arr, 3, 2))
        assert got.shape == (2, 3, 3)


def test_compressed_magic_still_raises(spark):
    png = spark.createDataFrame(
        [(9, "image", b"\x89PNG\r\n\x1a\nrest")], mm.MEDIA_COLUMNS
    )
    with pytest.raises(PythonException, match="NotImplementedError"):
        mm.image_stats(png).collect()
