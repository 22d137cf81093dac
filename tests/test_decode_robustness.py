"""Corrupt-payload robustness (the 100 TB reality: some fraction of scraped
media is always malformed). Two guarantees under test: every native codec
fails CLOSED on garbage (raises from mm.DECODE_ERRORS, never hangs or
returns silently), and the stats operators' on_error="skip" drops bad
payloads without losing good ones or leaving partial rows."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from phageclouds_graphdatabase_spark.operators import flac as FL
from phageclouds_graphdatabase_spark.operators import jpeg as J
from phageclouds_graphdatabase_spark.operators import multimodal as mm


def _good_image():
    rng = np.random.default_rng(1)
    return mm.encode_png(rng.integers(0, 256, (6, 5, 3), dtype=np.uint8))


def _good_audio():
    return FL.encode_flac(np.arange(64, dtype=np.int16), block_size=16)


def _good_video():
    rng = np.random.default_rng(2)
    return mm.encode_avi([rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)])


@settings(max_examples=50, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_random_bytes_fail_closed_everywhere(data):
    for decoder in (
        mm.decode_image_array,
        mm.decode_audio,
        mm._parse_avi,
        FL.decode_flac,
        J.decode_jpeg,
    ):
        try:
            decoder(data)
        except mm.DECODE_ERRORS:
            pass  # the contract: a typed decode error, nothing else


@settings(max_examples=30, deadline=None)
@given(pos=st.integers(0, 10_000), bit=st.integers(0, 7), which=st.integers(0, 2))
def test_bitflipped_valid_payloads_fail_closed_or_decode(pos, bit, which):
    payload = bytearray([_good_image, _good_audio, _good_video][which]())
    payload[pos % len(payload)] ^= 1 << bit
    decoder = [mm.decode_image_array, mm.decode_audio, mm._parse_avi][which]
    try:
        decoder(bytes(payload))
    except mm.DECODE_ERRORS:
        pass  # typed failure is fine; silent wrong-shape output is not


def test_image_stats_skip_drops_only_bad(spark):
    rows = [
        (1, "image", _good_image()),
        (2, "image", b"\x89PNG but actually garbage"),
        (3, "image", _good_image()),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_COLUMNS)
    got = {r.media_id for r in mm.image_stats(media, on_error="skip").collect()}
    assert got == {1, 3}


def test_audio_stats_skip_drops_only_bad(spark):
    rows = [
        (1, "audio", _good_audio()),
        (2, "audio", b"fLaC truncated"),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_COLUMNS)
    got = {r.media_id for r in mm.audio_stats(media, on_error="skip").collect()}
    assert got == {1}


def test_video_stats_skip_is_atomic_per_clip(spark):
    # second clip parses as AVI but its frame payload is truncated: under
    # "skip" it must contribute ZERO rows, not a partial frame set
    good = _good_video()
    bad = bytearray(_good_video())
    cut = bad.rindex(b"00db") + 8
    bad = bytes(bad[: cut + 3])  # truncate inside the frame bytes
    media = spark.createDataFrame(
        [(1, "video", good), (2, "video", bad)], mm.MEDIA_COLUMNS
    )
    rows = mm.video_frame_stats(media, n_frames=2, on_error="skip").collect()
    assert {r.media_id for r in rows} == {1}


def test_default_still_raises(spark):
    media = spark.createDataFrame([(7, "image", b"junk")], mm.MEDIA_COLUMNS)
    from pyspark.sql.utils import PythonException

    with pytest.raises(PythonException):
        mm.image_stats(media).collect()


def test_on_error_validated():
    with pytest.raises(ValueError, match="on_error"):
        mm.image_stats(None, on_error="ignore")
