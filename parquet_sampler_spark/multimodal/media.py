"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery here is real and tested — schema contracts,
partition-preserving batch iteration, UDF signatures, deterministic fake
decode for tests. The actual codec calls are STUBBED (`_decode_image_*`)
because image/audio libraries are not available in this environment;
swapping in PIL/ffmpeg is a one-function change that does not alter the
distributed plan.

Scale notes: media blobs ride *with* the rows (no driver collection);
``mapInPandas`` streams Arrow batches per partition, so memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` × blob
size — tune that down for large media. Feature extraction is a pure map:
no shuffle at any size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),     # image|audio|video
    T.StructField("payload", T.BinaryType(), True),   # opaque encoded bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),    # typed metadata
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])

_FEATURE_DIM = 8


def _decode_image_real(payload: bytes) -> "np.ndarray":
    """Real decode hook — requires an image codec library, which this
    environment does not ship. Swap the body for PIL/torchvision when
    available; the surrounding Spark plan is unchanged."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use deterministic_fake=True or install a codec and patch here"
    )


def _decode_fake(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: derives a fixed-dim feature from the
    byte content (first/last bytes + length). Stands in for a real
    embedding so the distributed plumbing is testable end to end."""
    if payload is None or len(payload) == 0:
        return np.zeros(_FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr, _FEATURE_DIM)
    return np.array(
        [float(c.sum() % 997) / 997.0 if len(c) else 0.0 for c in chunks],
        dtype=np.float32,
    )


def extract_features(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """Per-blob feature extraction over Arrow batches (``mapInPandas``).

    Batch shape contract: each pandas batch holds ``payload`` as Python
    ``bytes``; output rows align 1:1 with input rows (pure map — Spark
    can pipeline it with scans and pushdown around it)."""

    decode = _decode_fake if deterministic_fake else _decode_image_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [
                    0 if p is None else len(p) for p in pdf["payload"]
                ],
                "feature": feats,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (JVM-side sequence explode — the expensive decode of each
    frame would hang off this skeleton as a mapInPandas like
    :func:`extract_features`). Non-video rows pass through with a single
    NULL frame_ts."""
    frames = F.when(
        (F.col("kind") == "video") & F.col("duration_ms").isNotNull(),
        F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms)),
    ).otherwise(F.array(F.lit(None).cast("long")))
    return media.select(
        "media_id", "kind",
        F.explode(frames).alias("frame_ts"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic synthetic media table for tests (binary payloads
    generated from the seed — no external files)."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(64 + i))
        rows.append((
            i, kind, payload, f"application/x-{kind}",
            64 if kind == "image" else None,
            48 if kind == "image" else None,
            5000 if kind == "video" else None,
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])


def resize_images(
    media: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Image resize over Arrow batches: decode → resample → re-encode.
    With ``deterministic_fake`` the "resample" is a deterministic byte
    subsample to ``target_w·target_h`` bytes (the real decode/resample
    hooks are the same swap point as :func:`extract_features`). Non-image
    rows pass through unchanged. Pure map — pipelines with the scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = target_w * target_h
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for kind, p, w, h in zip(
                pdf["kind"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                if kind != "image" or p is None:
                    payloads.append(p)
                    widths.append(w)
                    heights.append(h)
                    continue
                if not deterministic_fake:
                    _decode_image_real(p)  # raises: codec unavailable
                arr = np.frombuffer(p, dtype=np.uint8)
                idx = (np.arange(size) * max(len(arr), 1) // size) % max(
                    len(arr), 1
                )
                payloads.append(bytes(arr[idx]) if len(arr) else b"")
                widths.append(target_w)
                heights.append(target_h)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload": payloads,
                "width": pd.array(widths, dtype="Int32"),
                "height": pd.array(heights, dtype="Int32"),
            })

    return media.select(
        "media_id", "kind", "payload", "width", "height"
    ).mapInPandas(run, schema=RESIZED_SCHEMA)

