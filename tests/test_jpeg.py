"""JPEG codec tests (operators/jpeg.py): T.81 lossless (SOF3) bit-exact
round-trips across all seven predictors, baseline (SOF0) with exactness on
DC-only blocks and bounded error elsewhere, restart intervals, chroma
subsampling, and the Motion-JPEG AVI path."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from phageclouds_graphdatabase_spark.operators import jpeg as J
from phageclouds_graphdatabase_spark.operators import multimodal as mm

_DIMS = st.integers(min_value=1, max_value=12)


def _gray3(g: np.ndarray) -> np.ndarray:
    return np.repeat(np.asarray(g, np.uint8)[..., None], 3, -1)


def _blocky_gray(levels, bw=2, bh=2) -> np.ndarray:
    """bw x bh grid of flat 8x8 blocks -> (8*bh, 8*bw) grayscale."""
    img = np.zeros((8 * bh, 8 * bw), np.uint8)
    for i, v in enumerate(levels):
        r, c = divmod(i, bw)
        img[8 * r : 8 * r + 8, 8 * c : 8 * c + 8] = v
    return img


# ---------------------------------------------------------------------------
# Lossless (SOF3): exact by construction
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("psel", range(1, 8))
def test_lossless_roundtrip_every_predictor(psel):
    rng = np.random.default_rng(psel)
    arr = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_lossless(arr, psel)), arr
    )


def test_lossless_gray_replicates_channels():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (5, 13), dtype=np.uint8)
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_lossless(g, 2)), _gray3(g)
    )


def test_lossless_extremes_exact():
    # full-range steps stress the larger difference categories
    arr = np.zeros((4, 4, 3), np.uint8)
    arr[::2, ::2] = 255
    arr[1::2, 1::2] = 254
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_lossless(arr, 4)), arr
    )


@settings(max_examples=20, deadline=None)
@given(w=_DIMS, h=_DIMS, psel=st.integers(1, 7), seed=st.integers(0, 2**31 - 1))
def test_prop_lossless_roundtrip(w, h, psel, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_lossless(arr, psel)), arr
    )


# ---------------------------------------------------------------------------
# Baseline (SOF0)
# ---------------------------------------------------------------------------


def test_baseline_flat_blocks_exact_at_q100():
    # every 8x8 block is flat -> DC-only coefficients; quality 100 makes the
    # quant table all ones, so decode is bit-exact
    img = _blocky_gray([32, 200, 127, 255])
    got = J.decode_jpeg(J.encode_jpeg_baseline(img, quality=100))
    np.testing.assert_array_equal(got, _gray3(img))


def test_baseline_flat_blocks_exact_under_subsampling():
    # flat chroma (=128 for gray) survives 4:2:0 box-averaging exactly
    img = np.repeat(_blocky_gray([90, 30, 250, 64])[..., None], 3, -1)
    got = J.decode_jpeg(J.encode_jpeg_baseline(img, quality=100, subsample=(2, 2)))
    np.testing.assert_array_equal(got, img)


def _smooth(h: int, w: int, seed: int) -> np.ndarray:
    """Smooth gradient content: chroma subsampling loses little, so tight
    per-pixel error bounds are meaningful (noise chroma is unrecoverable
    under 4:2:0 by design, not by codec defect)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    chans = [
        (a * x + b * y) % 256 for a, b in rng.integers(1, 5, (3, 2))
    ]
    return np.stack(chans, -1).astype(np.uint8)


def test_baseline_noise_bounded_error_444():
    rng = np.random.default_rng(90)
    arr = rng.integers(0, 256, (24, 20, 3), dtype=np.uint8)
    got = J.decode_jpeg(J.encode_jpeg_baseline(arr, quality=90))
    assert got.shape == arr.shape
    # worst-case random noise at 4:4:4 q>=90: small error, never garbage
    assert np.abs(got.astype(int) - arr.astype(int)).max() <= 32


@pytest.mark.parametrize("sub", [(1, 1), (2, 1), (2, 2)])
@pytest.mark.parametrize("quality", [90, 100])
def test_baseline_lossy_bounded_error(sub, quality):
    arr = _smooth(24, 20, quality + sub[0] * 10 + sub[1])
    got = J.decode_jpeg(J.encode_jpeg_baseline(arr, quality=quality, subsample=sub))
    assert got.shape == arr.shape
    assert np.abs(got.astype(int) - arr.astype(int)).max() <= 48


def test_baseline_odd_dimensions():
    arr = _smooth(17, 11, 5)
    got = J.decode_jpeg(J.encode_jpeg_baseline(arr, quality=100, subsample=(2, 2)))
    assert got.shape == (17, 11, 3)
    assert np.abs(got.astype(int) - arr.astype(int)).max() <= 48


def test_baseline_grayscale_single_component_scan():
    rng = np.random.default_rng(6)
    g = rng.integers(0, 256, (12, 18), dtype=np.uint8)
    got = J.decode_jpeg(J.encode_jpeg_baseline(g, quality=100))
    assert got.shape == (12, 18, 3)
    assert np.abs(got[..., 0].astype(int) - g.astype(int)).max() <= 16
    np.testing.assert_array_equal(got[..., 0], got[..., 1])


@pytest.mark.parametrize("interval", [1, 3, 7])
def test_baseline_restart_interval_decode_matches(interval):
    rng = np.random.default_rng(interval)
    arr = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    with_rst = J.encode_jpeg_baseline(arr, quality=100, restart_interval=interval)
    without = J.encode_jpeg_baseline(arr, quality=100)
    assert any(bytes([0xFF, 0xD0 + m]) in with_rst for m in range(8))
    np.testing.assert_array_equal(J.decode_jpeg(with_rst), J.decode_jpeg(without))


# ---------------------------------------------------------------------------
# Progressive (SOF2): spectral selection + successive approximation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sub", [(1, 1), (2, 1), (2, 2)])
@pytest.mark.parametrize("quality", [50, 90, 100])
def test_progressive_decodes_identically_to_baseline(sub, quality):
    # same quantized coefficients -> bitwise-identical pixels; this pins
    # the whole scan machinery (DC/AC first scans, EOB runs, both
    # refinement passes) against the already-proven baseline path
    rng = np.random.default_rng(quality + sub[0])
    arr = rng.integers(0, 256, (24, 20, 3), dtype=np.uint8)
    base = J.decode_jpeg(J.encode_jpeg_baseline(arr, quality=quality, subsample=sub))
    prog = J.decode_jpeg(J.encode_jpeg_progressive(arr, quality=quality, subsample=sub))
    np.testing.assert_array_equal(prog, base)


def test_progressive_flat_blocks_exact_at_q100():
    img = _blocky_gray([40, 90, 200, 255])
    got = J.decode_jpeg(J.encode_jpeg_progressive(img, quality=100))
    np.testing.assert_array_equal(got, _gray3(img))


def test_progressive_grayscale_and_odd_dims():
    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, (13, 19), dtype=np.uint8)
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_progressive(g, quality=90)),
        J.decode_jpeg(J.encode_jpeg_baseline(g, quality=90)),
    )


@settings(max_examples=15, deadline=None)
@given(w=_DIMS, h=_DIMS, q=st.integers(50, 100), seed=st.integers(0, 2**31 - 1))
@example(
    w=1,
    h=3,
    q=50,
    seed=0,
).via('discovered failure')
@example(
    w=9,
    h=7,
    q=51,
    seed=74,
).via('discovered failure')
@example(
    w=3,
    h=1,
    q=50,
    seed=0,
).via('discovered failure')
def test_prop_progressive_equals_baseline(w, h, q, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_progressive(arr, quality=q)),
        J.decode_jpeg(J.encode_jpeg_baseline(arr, quality=q)),
    )


def test_progressive_sparse_spikes_exercise_zrl_refine():
    # isolated high-frequency spikes force long zero-history runs (ZRL) in
    # both the first and the refinement AC scans
    img = np.full((16, 16, 3), 128, np.uint8)
    img[0, 15] = 255
    img[15, 0] = 0
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_progressive(img, quality=50)),
        J.decode_jpeg(J.encode_jpeg_baseline(img, quality=50)),
    )


def test_huffman_tables_are_canonical_annex_k():
    # first codes of the T.81 Annex K DC luminance table: category 0 -> 00,
    # 1 -> 010, ..., 6 -> 1110 (canonical assignment interop check)
    enc = J._build_encode(J._DC_BITS, J._DC_VALS)
    assert enc[0] == (0b00, 2)
    assert enc[1] == (0b010, 3)
    assert enc[5] == (0b110, 3)
    assert enc[6] == (0b1110, 4)
    dec = J._build_decode(J._DC_BITS, J._DC_VALS)
    assert dec[(2, 0b00)] == 0 and dec[(4, 0b1110)] == 6


def test_unsupported_process_raises_codec_marker():
    arr = np.zeros((8, 8), np.uint8)
    enc = bytearray(J.encode_jpeg_baseline(arr, quality=100))
    sof_at = enc.find(b"\xff\xc0")
    enc[sof_at + 1] = 0xC5  # differential sequential: genuinely unsupported
    with pytest.raises(NotImplementedError, match="JPEG"):
        J.decode_jpeg(bytes(enc))


def test_not_jpeg_raises():
    with pytest.raises(NotImplementedError, match="JPEG"):
        J.decode_jpeg(b"\x89PNG\r\n\x1a\n")


# ---------------------------------------------------------------------------
# Integration with the multimodal operators: dispatch + Motion JPEG AVI
# ---------------------------------------------------------------------------


def test_decode_image_array_dispatches_jpeg():
    img = _blocky_gray([10, 60, 110, 160])
    payload = J.encode_jpeg_baseline(img, quality=100)
    np.testing.assert_array_equal(mm.decode_image_array(payload), _gray3(img))


def test_mjpeg_avi_flat_blocks_exact():
    rng = np.random.default_rng(3)
    frames = [
        np.repeat(_blocky_gray(rng.integers(32, 127, 4))[..., None], 3, -1)
        for _ in range(3)
    ]
    avi = mm.encode_avi(frames, codec="mjpg", quality=100)
    w, h, raw = mm._parse_avi(avi)
    assert (w, h, len(raw)) == (16, 16, 3)
    assert all(f[:2] == b"\xff\xd8" for f in raw)
    for f, orig in zip(raw, frames):
        np.testing.assert_array_equal(mm.decode_video_frame(f, w, h), orig)


def test_mjpeg_video_frame_stats_spark(spark):
    levels = [[40, 80, 120, 160], [200, 10, 90, 55]]
    frames = [np.repeat(_blocky_gray(lv)[..., None], 3, -1) for lv in levels]
    avi = mm.encode_avi(frames, codec="mjpg", quality=100)
    media = spark.createDataFrame([(7, "video", avi)], mm.MEDIA_COLUMNS)
    rows = {r.frame_idx: r for r in mm.video_frame_stats(media, n_frames=2).collect()}
    assert set(rows) == {0, 1}
    for idx, lv in enumerate(levels):
        expect = 64 * sum(lv)
        assert (rows[idx].sum_r, rows[idx].sum_g, rows[idx].sum_b) == (
            expect, expect, expect
        )
        assert (rows[idx].width, rows[idx].height) == (16, 16)


def test_unknown_avi_codec_raises():
    with pytest.raises(NotImplementedError, match="codec"):
        mm.encode_avi([np.zeros((8, 8, 3), np.uint8)], codec="h264")
