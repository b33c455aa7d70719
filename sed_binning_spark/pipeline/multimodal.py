"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side architecture is real and tested — schema contract, Arrow
batch shape, mapInPandas partition-parallel decode, metadata projection.
The codecs themselves are STUBBED: this environment has no image/audio
libraries, so ``decode_stub=True`` (the default) runs a deterministic fake
decoder (shape/stats derived from the bytes), and ``decode_stub=False``
raises NotImplementedError where a real codec (Pillow/ffmpeg/soundfile)
would be called. Swapping in the real codec changes ONE function — the
distributed plan is identical.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Contract schema for a media table: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("payload", BinaryType(), True),
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("feat", ArrayType(FloatType()), True),
])


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a codec+featurizer: md5-seeded floats.
    NOT a real decoder — replace with e.g. Pillow + a vision model."""
    h = hashlib.md5(payload or b"").digest()
    vals = []
    for i in range(dim):
        b = h[(2 * i) % 16], h[(2 * i + 1) % 16]
        vals.append(((b[0] << 8 | b[1]) / 65535.0) * 2.0 - 1.0)
    return vals


def extract_features(
    df: DataFrame,
    feature_dim: int = 8,
    payload_column: str = "payload",
    id_column: str = "media_id",
    decode_stub: bool = True,
    batch_hint: int = 256,
) -> DataFrame:
    """Decode + featurize media payloads with ``mapInPandas``.

    The Arrow batches stream binary payloads into Python partition-locally
    (no shuffle, no driver collect); the returned frame follows
    FEATURE_SCHEMA. ``batch_hint`` documents the intended
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` sizing for large
    payloads (binary columns dominate batch memory).
    """
    import pandas as pd

    if not decode_stub:
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "run with decode_stub=True or plug a codec into _fake_decode",
        )

    def _decode_batches(batches):
        for pdf in batches:
            feats = [
                _fake_decode(p if p is not None else b"", feature_dim)
                for p in pdf[payload_column]
            ]
            yield pd.DataFrame({
                "media_id": pdf[id_column],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf[payload_column]],
                "feat": feats,
            })

    return df.select(id_column, payload_column).mapInPandas(
        _decode_batches, schema=FEATURE_SCHEMA,
    )


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    duration_column: str = "duration_ms",
    id_column: str = "media_id",
) -> DataFrame:
    """Video frame-sampling plan: one row per (media, frame timestamp)
    via sequence+explode — the pure-expression half of frame extraction
    (the decode of each frame goes through :func:`extract_features`)."""
    return df.select(
        F.col(id_column),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(duration_column) - 1, F.lit(0)), F.lit(every_ms)),
        ).alias("frame_ms"),
    )


def synthesize_media_from_text(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> DataFrame:
    """Test fixture builder: wrap a text table into the MEDIA_SCHEMA
    contract (payload = utf-8 bytes). Lets the multimodal plumbing be
    exercised without real media files."""
    return df.select(
        F.col(id_column).cast("long").alias("media_id"),
        F.encode(F.col(text_column), "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.length(text_column) * 10).cast("int").alias("duration_ms"),
    )
