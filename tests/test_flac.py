"""FLAC codec tests (operators/flac.py): bit-exact round-trips (lossless by
spec) across subframe types, block sizes, channel modes and stereo
decorrelation, plus CRC/MD5 integrity failure paths and the audio_stats
dispatch."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from phageclouds_graphdatabase_spark.operators import flac as FL
from phageclouds_graphdatabase_spark.operators import multimodal as mm


def _roundtrip(sig, **kw):
    rate, dec = FL.decode_flac(FL.encode_flac(sig, **kw))
    return rate, dec


@pytest.mark.parametrize(
    "name,sig",
    [
        ("noise", np.random.default_rng(1).integers(-32768, 32768, 5000).astype(np.int16)),
        ("ramp", (np.arange(5000) % 3000 - 1500).astype(np.int16)),
        ("constant", np.full(5000, -123, np.int16)),
        ("sine", (3000 * np.sin(np.arange(5000) / 20)).astype(np.int16)),
        ("tiny", np.array([5, -5, 7], np.int16)),
    ],
)
def test_mono_roundtrip_exact(name, sig):
    rate, dec = _roundtrip(sig, rate=8000, block_size=1024)
    assert rate == 8000
    np.testing.assert_array_equal(dec[:, 0], sig)


def test_compression_actually_compresses():
    ramp = (np.arange(8000) % 2000 - 1000).astype(np.int16)
    enc = FL.encode_flac(ramp)
    assert len(enc) < len(ramp) * 2 // 4  # fixed predictors beat raw PCM 4x+


@pytest.mark.parametrize("force", [None, "mid_side", "verbatim", "lpc"])
def test_stereo_roundtrip_all_paths(force):
    rng = np.random.default_rng(3)
    st_sig = np.stack(
        [
            (2000 * np.sin(np.arange(4000) / 15)).astype(np.int16),
            rng.integers(-2000, 2000, 4000).astype(np.int16),
        ],
        -1,
    )
    rate, dec = _roundtrip(st_sig, rate=44100, block_size=777, force=force)
    assert rate == 44100
    np.testing.assert_array_equal(dec, st_sig)


def test_multi_frame_partial_tail():
    sig = np.arange(100, dtype=np.int16)
    enc = FL.encode_flac(sig, block_size=8)  # 12 full frames + tail of 4
    rate, dec = FL.decode_flac(enc)
    np.testing.assert_array_equal(dec[:, 0], sig)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 300),
    bs=st.integers(4, 64),
    ch=st.integers(1, 2),
    seed=st.integers(0, 2**31 - 1),
)
def test_prop_roundtrip(n, bs, ch, seed):
    rng = np.random.default_rng(seed)
    sig = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
    _, dec = _roundtrip(sig, block_size=bs)
    np.testing.assert_array_equal(dec, sig)


def test_extreme_amplitudes_exact():
    sig = np.array([-32768, 32767, -32768, 32767, 0, 1, -1], np.int16)
    _, dec = _roundtrip(sig)
    np.testing.assert_array_equal(dec[:, 0], sig)


def test_frame_crc_corruption_raises():
    enc = bytearray(FL.encode_flac(np.arange(500, dtype=np.int16), block_size=128))
    enc[-3] ^= 0xFF  # flip a bit inside the last frame's payload
    with pytest.raises(NotImplementedError, match="CRC"):
        FL.decode_flac(bytes(enc))


def test_not_flac_raises():
    with pytest.raises(NotImplementedError, match="FLAC"):
        FL.decode_flac(b"RIFF....WAVE")


def test_utf8_frame_numbers_multibyte():
    # >127 frames forces the multi-byte frame-number coding
    sig = np.arange(600, dtype=np.int16)
    enc = FL.encode_flac(sig, block_size=4)  # 150 frames
    _, dec = FL.decode_flac(enc)
    np.testing.assert_array_equal(dec[:, 0], sig)


def test_audio_stats_dispatches_flac(spark):
    sig = np.frombuffer(b"ab" * 32, "<i2")  # 32 positive samples
    payload = FL.encode_flac(sig, rate=8000, block_size=8)
    media = spark.createDataFrame([(9, "audio", payload)], mm.MEDIA_COLUMNS)
    row = mm.audio_stats(media).collect()[0]
    a64 = sig.astype(np.int64)
    assert (row.sample_rate, row.n_frames, row.n_channels) == (8000, 32, 1)
    assert row.sum_sq == int((a64 * a64).sum())
    assert row.peak == int(np.abs(a64).max())
