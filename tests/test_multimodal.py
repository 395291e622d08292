"""Multimodal plumbing: binary payload columns through mapInPandas —
schema, batch shape, row expansion, and the explicit stub boundary."""

import pytest
from pyspark.sql import Row

from pig_spark.functions import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(id=1, modality="image", payload=MM.encode_fake_payload(640, 480, 0, b"abcabc"), meta=None),
        Row(id=2, modality="image", payload=MM.encode_fake_payload(100, 2000, 0, b"zzz"), meta=None),
        Row(id=3, modality="video", payload=MM.encode_fake_payload(1920, 1080, 2500, b"vv"), meta=None),
    ]
    return spark.createDataFrame(rows, schema=MM.MEDIA_SCHEMA)


def test_extract_metadata(media):
    out = {r["id"]: r["meta"] for r in MM.extract_metadata(media).collect()}
    assert out[1]["width"] == 640 and out[1]["height"] == 480
    assert out[3]["duration_ms"] == 2500


def test_resize_preserves_aspect(media):
    resized = MM.extract_metadata(MM.resize_images(media, max_dim=320))
    metas = {r["id"]: r["meta"] for r in resized.collect()}
    assert (metas[1]["width"], metas[1]["height"]) == (320, 240)
    assert metas[2]["height"] == 320  # tall image clamps height
    assert metas[2]["width"] == 16


def test_extract_features_shape(media):
    feats = MM.extract_features(media).collect()
    assert all(len(r["features"]) == MM.FEATURE_DIM for r in feats)
    f1 = next(r["features"] for r in feats if r["id"] == 1)
    assert abs(sum(f1) - 1.0) < 1e-6  # normalized histogram


def test_sample_frames_expands_rows(media):
    frames = MM.sample_frames(media, every_ms=1000).collect()
    vid = [r for r in frames if r["id"] == 3]
    assert [r["frame_ms"] for r in sorted(vid, key=lambda r: r["frame_ms"])] == [0, 1000, 2000]
    # images (duration 0) produce exactly one frame stub
    assert len([r for r in frames if r["id"] == 1]) == 1


def test_stub_boundary_is_explicit(spark):
    bogus = spark.createDataFrame(
        [Row(id=9, modality="image", payload=b"JPEGnotreally", meta=None)], schema=MM.MEDIA_SCHEMA
    )
    with pytest.raises(Exception) as e:
        MM.extract_metadata(bogus).collect()
    assert "NotImplementedError" in str(e.value) or "codec" in str(e.value)
