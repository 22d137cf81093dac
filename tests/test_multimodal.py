"""Multimodal operator tests (W4). Native codecs are REAL for PPM/BMP/PNG/
GIF/JPEG images, PCM WAV audio, and AVI video (raw DIB and Motion-JPEG
frames; JPEG itself is covered in tests/test_jpeg.py); payloads no native
codec handles (MP3, inter-frame video, ...) raise NotImplementedError from
decode unless the deterministic fake is requested (container has no
image/audio libs)."""

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
from hypothesis import given, settings
from hypothesis import strategies as st

_DIMS = st.integers(min_value=1, max_value=12)


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
        4: rng.integers(0, 256, (8, 3, 3), dtype=np.uint8),   # PNG (filter 0)
        5: rng.integers(0, 256, (3, 9, 3), dtype=np.uint8),   # PNG (Paeth)
    }
    rows = [
        (0, "image", _ppm_bytes(imgs[0])),
        (1, "image", _bmp_bytes(imgs[1])),
        (2, "image", _bmp_bytes(imgs[2])),
        (3, "audio", b"not an image"),
        (4, "image", mm.encode_png(imgs[4], filter_type=0)),
        (5, "image", mm.encode_png(imgs[5], filter_type=4)),
    ]
    return imgs, spark.createDataFrame(rows, mm.MEDIA_COLUMNS)


def test_codec_roundtrip_exact(raster_media):
    imgs, _ = raster_media
    for mid, arr in imgs.items():
        payload = (
            _ppm_bytes(arr)
            if mid == 0
            else _bmp_bytes(arr)
            if mid in (1, 2)
            else mm.encode_png(arr)
        )
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
    jpeg = spark.createDataFrame(
        [(9, "image", b"\xff\xd8\xff\xe0rest-of-jpeg")], mm.MEDIA_COLUMNS
    )
    with pytest.raises(PythonException, match="NotImplementedError"):
        mm.image_stats(jpeg).collect()


# ---------------------------------------------------------------------------
# Real PNG codec: stdlib zlib + numpy unfiltering; all filters and the
# gray/palette/alpha color types, verified against hand-built byte vectors
# (no external PNG library exists in this runtime to cross-check against).
# ---------------------------------------------------------------------------

import struct
import zlib


def _png_chunk(typ, payload):
    return (
        len(payload).to_bytes(4, "big")
        + typ
        + payload
        + zlib.crc32(typ + payload).to_bytes(4, "big")
    )


def _hand_png(w, h, color, scanlines, plte=None):
    """Assemble a PNG from pre-filtered scanline bytes (each prefixed with
    its filter type), independent of the encoder under test."""
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    )
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(scanlines)) + _png_chunk(b"IEND", b"")


def test_png_roundtrip_every_filter():
    rng = np.random.default_rng(11)
    for shape in [(1, 1, 3), (4, 4, 3), (7, 13, 3)]:
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in range(5):
            got = mm.decode_image_array(mm.encode_png(arr, filter_type=ft))
            np.testing.assert_array_equal(got, arr)


def test_png_grayscale_replicates_channels():
    g = np.arange(6, dtype=np.uint8).reshape(2, 3)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(2))
    got = mm.decode_image_array(_hand_png(3, 2, 0, raw))
    np.testing.assert_array_equal(got, np.repeat(g[..., None], 3, axis=2))


def test_png_palette_lookup():
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]], np.uint8)
    idx = np.array([[0, 3], [2, 1]], np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    got = mm.decode_image_array(_hand_png(2, 2, 3, raw, plte=pal.tobytes()))
    np.testing.assert_array_equal(got, pal[idx])


def test_png_rgba_drops_alpha():
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (3, 3, 4), dtype=np.uint8)
    flat = rgba.reshape(3, 12)
    prev = np.zeros(12, np.uint8)
    parts = []
    for y in range(3):  # Up filter on every row
        parts.append(b"\x02" + (flat[y] - prev).tobytes())
        prev = flat[y]
    got = mm.decode_image_array(_hand_png(3, 3, 6, b"".join(parts)))
    np.testing.assert_array_equal(got, rgba[..., :3])


# ---------------------------------------------------------------------------
# Real GIF codec: pure-Python LZW + palette lookup.
# ---------------------------------------------------------------------------


def test_gif_known_byte_vector():
    # Canonical minimal GIF (1x1 white pixel, global color table, the
    # widely-published smallest-GIF example) -- proves interop with bytes
    # produced by real-world encoders, not just our own.
    gif = bytes.fromhex(
        "474946383961010001008000"
        "00ffffff000000"
        "2c00000000010001000002024401003b"
    )
    got = mm.decode_image_array(gif)
    np.testing.assert_array_equal(got, np.full((1, 1, 3), 255, np.uint8))


def test_gif_roundtrip_paths():
    rng = np.random.default_rng(37)
    # growth + cScSc corner via long runs; full-dictionary reset via noise
    pal3 = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    runs = pal3[np.repeat(np.arange(3), 500)[:1200].reshape(30, 40) % 3]
    pal256 = np.unique(rng.integers(0, 256, (256, 3), dtype=np.uint8), axis=0)
    noise = pal256[rng.integers(0, len(pal256), (120, 120))]
    for arr in (runs, noise):
        np.testing.assert_array_equal(
            mm.decode_image_array(mm.encode_gif(arr)), arr
        )


@settings(max_examples=20, deadline=None)
@given(w=_DIMS, h=_DIMS, ncol=st.integers(1, 16), seed=st.integers(0, 2**31 - 1))
def test_prop_gif_roundtrip(w, h, ncol, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    arr = pal[rng.integers(0, ncol, (h, w))]
    np.testing.assert_array_equal(mm.decode_image_array(mm.encode_gif(arr)), arr)


def test_gif_interlace_raises_codec_marker():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    gif = bytearray(mm.encode_gif(arr))
    # image descriptor packed byte: header(6) + screen(7) + GCT + 0x2c + 8
    gct = 2 << ((gif[10] & 0x07))
    ipacked_at = 6 + 7 + gct * 3 + 9
    assert gif[ipacked_at - 9] == 0x2C
    gif[ipacked_at] |= 0x40  # set interlace flag
    with pytest.raises(NotImplementedError, match="interlaced"):
        mm.decode_image_array(bytes(gif))


# ---------------------------------------------------------------------------
# Real WAV codec: RIFF PCM parse in struct/numpy; 8/16-bit, mono/stereo,
# word-aligned chunk skipping; exact integer stats through audio_stats.
# ---------------------------------------------------------------------------


def test_wav_roundtrip_mono_stereo():
    rng = np.random.default_rng(13)
    for shape in [(10,), (7, 2), (64, 1)]:
        arr = rng.integers(-32768, 32768, shape, dtype=np.int16)
        rate, back = mm._decode_wav(mm.encode_wav(arr, 44100))
        want = arr.reshape(-1, 1) if arr.ndim == 1 else arr
        assert rate == 44100
        np.testing.assert_array_equal(back, want)


def test_wav_8bit_and_chunk_padding():
    pcm = bytes(range(0, 200, 10))  # 20 unsigned 8-bit samples, 2 channels
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 16000, 2, 8)
    odd = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"  # padded chunk
    body = (
        b"WAVE" + odd
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    rate, arr = mm._decode_wav(b"RIFF" + len(body).to_bytes(4, "little") + body)
    assert (rate, arr.shape) == (8000, (10, 2))
    np.testing.assert_array_equal(
        arr.reshape(-1), np.array(range(0, 200, 10), np.int16) - 128
    )


def test_wav_compressed_raises_codec_marker():
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # 85 = MP3
    body = (
        b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + (0).to_bytes(4, "little")
    )
    with pytest.raises(NotImplementedError, match="PCM"):
        mm._decode_wav(b"RIFF" + len(body).to_bytes(4, "little") + body)


def test_audio_stats_exact(spark):
    rng = np.random.default_rng(17)
    clips = {
        10: rng.integers(-32768, 32768, (32, 1), dtype=np.int16),
        11: rng.integers(-32768, 32768, (16, 2), dtype=np.int16),
    }
    rows = [(mid, "audio", mm.encode_wav(a, 22050)) for mid, a in clips.items()]
    rows.append((12, "image", b"P6\n1 1\n255\n\x00\x00\x00"))  # filtered out
    media = spark.createDataFrame(rows, mm.MEDIA_COLUMNS)
    got = {r.media_id: r for r in mm.audio_stats(media).collect()}
    assert set(got) == set(clips)
    for mid, a in clips.items():
        r = got[mid]
        a64 = a.astype(np.int64)
        assert r.sample_rate == 22050
        assert (r.n_frames, r.n_channels) == a.shape
        assert r.sum_sq == int((a64 * a64).sum())
        assert r.peak == int(np.abs(a64).max())


def test_decode_media_real_features(spark):
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    clip = rng.integers(-32768, 32768, (16, 1), dtype=np.int16)
    vid = [rng.integers(0, 256, (2, 2, 3), dtype=np.uint8) for _ in range(3)]
    media = spark.createDataFrame(
        [
            (30, "image", mm.encode_png(img)),
            (31, "audio", mm.encode_wav(clip, 8000)),
            (32, "video", mm.encode_avi(vid)),
        ],
        mm.MEDIA_COLUMNS,
    )
    # no deterministic_fake needed: every payload has a native codec
    rows = {r.media_id: r for r in mm.decode_media(media).collect()}
    assert set(rows) == {30, 31, 32}
    px = img.astype(np.float32).reshape(-1, 3)
    assert rows[30].feature[:3] == pytest.approx(px.mean(0).tolist())
    s = clip.astype(np.float32)
    assert rows[31].feature[0] == pytest.approx(float(s.mean()))
    assert rows[31].feature[4:6] == [16.0, 1.0]  # frames, channels
    assert rows[32].feature[9:12] == [2.0, 2.0, 3.0]  # w, h, n_frames


# ---------------------------------------------------------------------------
# Real AVI video container: RIFF walk, avih dimensions, raw DIB frames.
# ---------------------------------------------------------------------------


def test_avi_roundtrip_and_frame_stats(spark):
    rng = np.random.default_rng(19)
    frames = [rng.integers(0, 256, (4, 5, 3), dtype=np.uint8) for _ in range(4)]
    avi = mm.encode_avi(frames)
    w, h, raw = mm._parse_avi(avi)
    assert (w, h, len(raw)) == (5, 4, 4)
    for f, r in zip(frames, raw):
        np.testing.assert_array_equal(mm.decode_dib_frame(r, w, h), f)

    media = spark.createDataFrame(
        [(20, "video", avi), (21, "audio", b"not video")], mm.MEDIA_COLUMNS
    )
    rows = mm.video_frame_stats(media, n_frames=2).collect()
    assert [(r.media_id, r.frame_idx) for r in rows] == [(20, 0), (20, 2)]
    for r in rows:
        want = frames[r.frame_idx].astype(np.int64).reshape(-1, 3).sum(axis=0)
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(int(x) for x in want)
        assert (r.width, r.height) == (5, 4)


def test_avi_malformed_raises_codec_marker():
    with pytest.raises(NotImplementedError, match="AVI"):
        mm._parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(NotImplementedError, match="avih"):
        mm._parse_avi(b"RIFF\x04\x00\x00\x00AVI ")


# ---------------------------------------------------------------------------
# Property-based codec round-trips (hypothesis): arbitrary pixel/sample
# content through encode -> decode must be the identity, for every PNG
# scanline filter and for mono/stereo WAV and multi-frame AVI.
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(w=_DIMS, h=_DIMS, ft=st.integers(0, 4), seed=st.integers(0, 2**31 - 1))
def test_prop_png_roundtrip(w, h, ft, seed):
    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        mm.decode_image_array(mm.encode_png(arr, filter_type=ft)), arr
    )


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 64),
    ch=st.integers(1, 3),
    rate=st.sampled_from([8000, 22050, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_prop_wav_roundtrip(n, ch, rate, seed):
    arr = np.random.default_rng(seed).integers(-32768, 32768, (n, ch), dtype=np.int16)
    got_rate, got = mm._decode_wav(mm.encode_wav(arr, rate))
    assert got_rate == rate
    np.testing.assert_array_equal(got, arr)


@settings(max_examples=25, deadline=None)
@given(w=_DIMS, h=_DIMS, nf=st.integers(1, 5), seed=st.integers(0, 2**31 - 1))
def test_prop_avi_roundtrip(w, h, nf, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(nf)]
    gw, gh, raw = mm._parse_avi(mm.encode_avi(frames))
    assert (gw, gh, len(raw)) == (w, h, nf)
    for f, r in zip(frames, raw):
        np.testing.assert_array_equal(mm.decode_dib_frame(r, gw, gh), f)


def test_png_malformed_raises_codec_marker():
    with pytest.raises(NotImplementedError, match="IHDR"):
        mm.decode_image_array(b"\x89PNG\r\n\x1a\nrest")
    with pytest.raises(NotImplementedError, match="non-interlaced"):
        raw = b"\x00" + bytes(3)
        mm.decode_image_array(_hand_png(1, 1, 2, raw)[:16] +
                              struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1) +
                              _hand_png(1, 1, 2, raw)[29:])


# --- TIFF (baseline 6.0, round 2) ------------------------------------------

def test_packbits_spec_vector():
    """The canonical TIFF 6.0 §9 PackBits example: encoded
    FE AA | 02 80 00 2A | FD AA | 03 80 00 2A 22 | F7 AA decodes to
    3xAA 80 00 2A 4xAA 80 00 2A 22 10xAA."""
    enc = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    want = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22" + "AA" * 10)
    assert mm._packbits_decode(enc) == want
    # our encoder round-trips the same payload (byte-identical output is
    # not required by the spec; decodability is)
    assert mm._packbits_decode(mm._packbits_encode(want)) == want


def test_packbits_noop_128_skipped():
    assert mm._packbits_decode(b"\x80\x00A") == b"A"


@settings(max_examples=30, deadline=None)
@given(w=_DIMS, h=_DIMS, seed=st.integers(0, 2**31 - 1),
       comp=st.sampled_from(["none", "packbits"]))
def test_prop_tiff_roundtrip(w, h, seed, comp):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(mm._decode_tiff(mm.encode_tiff(a, comp)), a)


def test_tiff_gray_replicates_channels():
    g = np.arange(48, dtype=np.uint8).reshape(6, 8)
    got = mm._decode_tiff(mm.encode_tiff(g, "packbits"))
    np.testing.assert_array_equal(got, np.repeat(g[:, :, None], 3, axis=2))


def test_tiff_big_endian_decodes():
    """Hand-build a minimal MM (big-endian) uncompressed 2x1 RGB TIFF."""
    pix = bytes([1, 2, 3, 4, 5, 6])
    entries = [
        (256, 3, 1, 2), (257, 3, 1, 1), (259, 3, 1, 1), (262, 3, 1, 2),
        (273, 4, 1, 8), (277, 3, 1, 3), (278, 4, 1, 1), (279, 4, 1, 6),
    ]
    ifd = struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:
            ifd += struct.pack(">HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += struct.pack(">HHII", tag, typ, cnt, val)
    ifd += struct.pack(">I", 0)
    data = b"MM\x00*" + struct.pack(">I", 8 + len(pix)) + pix + ifd
    got = mm._decode_tiff(data)
    np.testing.assert_array_equal(got, np.array([[[1, 2, 3], [4, 5, 6]]]))


def test_tiff_unsupported_compression_fail_closed():
    a = np.zeros((2, 2, 3), np.uint8)
    payload = bytearray(mm.encode_tiff(a, "none"))
    # patch compression tag value to 5 (LZW) in the IFD
    idx = payload.find(struct.pack("<HH", 259, 3))
    payload[idx + 8:idx + 10] = struct.pack("<H", 5)
    with pytest.raises(NotImplementedError, match="compression"):
        mm._decode_tiff(bytes(payload))


def test_tiff_dispatches_from_decode_image_array():
    a = np.full((3, 3, 3), 7, np.uint8)
    np.testing.assert_array_equal(
        mm.decode_image_array(mm.encode_tiff(a)), a
    )
