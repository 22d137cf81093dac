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
