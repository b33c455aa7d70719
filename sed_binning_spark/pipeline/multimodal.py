"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side architecture — schema contract, Arrow batch shape,
mapInPandas partition-parallel decode, metadata projection — is shared by
two decode modes:

- ``decode_stub=False`` (real): pure-NumPy codecs for PPM (P6) images,
  uncompressed 24-bit BMP images, and PCM-16 WAV audio, dispatched by
  payload magic bytes; any other payload gets honest byte-statistics
  features. No image/audio libraries exist in this environment, so these
  formats were chosen because their containers are fully decodable with
  struct/NumPy alone; a Pillow/soundfile codec drops into
  :func:`decode_payload` without touching the distributed plan.
- ``decode_stub=True`` (fixture): a deterministic md5-seeded fake
  featurizer, kept for plumbing tests and the SQL-oracle query (the fake
  is reproducible in any engine with md5; real pixel stats are not).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
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


# ------------------------------------------------------------- real codecs

def decode_image_ppm(data: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval <= 255) into an (h, w, 3) uint8 RGB
    array. Pure header-token parse + one frombuffer — no image library."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated tokens,
    # with '#' comments allowed between tokens
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval, then raw samples
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    pix = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    if pix.size != n:
        raise ValueError("truncated PPM pixel data")
    return pix.reshape(h, w, 3)


def decode_image_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP into an (h, w, 3) uint8 RGB array
    (handles the 4-byte row padding and bottom-up row order)."""
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pixel_offset)
    if rows.size != stride * h:
        raise ValueError("truncated BMP pixel data")
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        img = img[::-1]
    return img[..., ::-1]  # BGR -> RGB


def decode_audio_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM-16 RIFF/WAVE payload into ((n_samples, n_channels)
    int16 array, sample_rate). Walks the chunk list properly (fmt/data can
    be preceded by LIST etc.; chunk sizes pad to even)."""
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError("only PCM-16 WAV supported")
    if n_channels < 1:
        raise ValueError("WAV fmt chunk declares zero channels")
    samples = np.frombuffer(raw, dtype="<i2")
    n = samples.size // n_channels * n_channels
    return samples[:n].reshape(-1, n_channels), sample_rate


def encode_image_ppm(img: np.ndarray) -> bytes:
    """Inverse of :func:`decode_image_ppm` (test fixtures / sink side)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def encode_audio_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Inverse of :func:`decode_audio_wav`: minimal PCM-16 WAV container."""
    s = np.ascontiguousarray(np.atleast_2d(samples.T).T, dtype="<i2")
    n_channels = s.shape[1] if s.ndim == 2 else 1
    raw = s.tobytes()
    byte_rate = sample_rate * n_channels * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_channels, sample_rate,
                                 byte_rate, n_channels * 2, 16)
    hdr += b"data" + struct.pack("<I", len(raw))
    return hdr + raw


# feature-vector kind codes (element 0 of the real feature vector)
KIND_OTHER, KIND_IMAGE, KIND_AUDIO = 0.0, 1.0, 2.0


def decode_payload(payload: bytes, dim: int) -> list[float]:
    """Real featurizer: sniff the container by magic bytes, decode, emit
    ``[kind, d1, d2, d3, mean, std, min, max]`` (normalized stats) padded/
    truncated to ``dim``.

    - image (PPM/BMP): kind=1, dims=(w, h, channels), pixel stats / 255
    - audio (WAV):     kind=2, dims=(n_samples, rate, channels), stats / 32768
    - anything else:   kind=0, dims=(n_bytes, 0, 0), byte stats / 255
    """
    payload = payload or b""
    vec = None
    try:
        if payload.startswith(b"P6") or payload.startswith(b"BM"):
            img = (decode_image_ppm(payload) if payload.startswith(b"P6")
                   else decode_image_bmp(payload))
            h, w, ch = img.shape
            vec = [KIND_IMAGE, float(w), float(h), float(ch), *_norm_stats(img, 255.0)]
        elif payload.startswith(b"RIFF"):
            samples, rate = decode_audio_wav(payload)
            vec = [KIND_AUDIO, float(samples.shape[0]), float(rate),
                   float(samples.shape[1]), *_norm_stats(samples, 32768.0)]
    except (ValueError, ZeroDivisionError, struct.error):
        # magic matched but the container is truncated/unsupported (16-bit
        # PPM, 8/32-bpp BMP, float WAV, RIFF-but-AVI, zero channels...):
        # ONE bad payload must not kill a corpus-wide mapInPandas job —
        # fall through to honest byte statistics, as documented
        vec = None
    if vec is None:
        arr = np.frombuffer(payload, dtype=np.uint8)
        vec = [KIND_OTHER, float(arr.size), 0.0, 0.0, *_norm_stats(arr, 255.0)]
    vec = vec[:dim]
    return vec + [0.0] * (dim - len(vec))


def _norm_stats(x: np.ndarray, scale: float) -> list[float]:
    if x.size == 0:
        return [0.0, 0.0, 0.0, 0.0]
    x = x.astype(np.float64)
    return [float(x.mean() / scale), float(x.std() / scale),
            float(x.min() / scale), float(x.max() / scale)]


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
    decode_stub: bool = False,
    batch_hint: int = 256,
) -> DataFrame:
    """Decode + featurize media payloads with ``mapInPandas``.

    The Arrow batches stream binary payloads into Python partition-locally
    (no shuffle, no driver collect); the returned frame follows
    FEATURE_SCHEMA. ``batch_hint`` documents the intended
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` sizing for large
    payloads (binary columns dominate batch memory).

    ``decode_stub=False`` (the default) runs the real pure-NumPy codecs
    (:func:`decode_payload`: PPM/BMP images, PCM-16 WAV audio, byte stats
    otherwise); ``decode_stub=True`` opts into the deterministic md5 fake
    featurizer, kept only for plumbing fixtures that need an
    engine-agnostic reproducible vector.
    """
    import pandas as pd

    featurize = _fake_decode if decode_stub else decode_payload

    def _decode_batches(batches):
        for pdf in batches:
            feats = [
                featurize(p if p is not None else b"", feature_dim)
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


def resize_image(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest-neighbor resize (pure NumPy, any channel count)."""
    h, w = img.shape[:2]
    ri = np.minimum((np.arange(height) * (h / height)).astype(np.int64), h - 1)
    ci = np.minimum((np.arange(width) * (w / width)).astype(np.int64), w - 1)
    return img[ri][:, ci]


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("payload", BinaryType(), True),
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])


def resize_images(
    df: DataFrame,
    height: int,
    width: int,
    payload_column: str = "payload",
    id_column: str = "media_id",
) -> DataFrame:
    """Resize image payloads to (height, width) with ``mapInPandas``.

    Same partition-local Arrow-batch shape as :func:`extract_features`:
    payloads never shuffle and never reach the driver. PPM (P6) and
    uncompressed 24-bit BMP inputs decode with the pure-NumPy codecs,
    resize nearest-neighbor, and re-encode as PPM (the canonical interop
    output of this module); non-image or undecodable payloads pass
    through as NULL with NULL dimensions — one corrupt file must not
    abort a 100 TB batch.
    """
    import pandas as pd

    def _resize_batches(batches):
        for pdf in batches:
            out_payload, out_w, out_h = [], [], []
            for p in pdf[payload_column]:
                img = None
                if p is not None:
                    try:
                        if bytes(p[:2]) == b"P6":
                            img = decode_image_ppm(bytes(p))
                        elif bytes(p[:2]) == b"BM":
                            img = decode_image_bmp(bytes(p))
                    except (ValueError, struct.error):
                        # same catch set as decode_payload: a truncated BMP
                        # header raises struct.error, not ValueError — ONE
                        # corrupt payload must not abort the batch
                        img = None
                if img is not None and img.size == 0:
                    # a syntactically valid 0x0 image has nothing to
                    # resample (the nearest-neighbor index math would
                    # index an empty axis) — treat as undecodable
                    img = None
                if img is None:
                    out_payload.append(None)
                    out_w.append(None)
                    out_h.append(None)
                else:
                    out_payload.append(encode_image_ppm(
                        resize_image(img, height, width),
                    ))
                    out_w.append(width)
                    out_h.append(height)
            yield pd.DataFrame({
                "media_id": pdf[id_column],
                "payload": out_payload,
                "mime": ["image/x-portable-pixmap" if p is not None else None
                         for p in out_payload],
                "width": pd.array(out_w, dtype="Int32"),
                "height": pd.array(out_h, dtype="Int32"),
            })

    return df.select(id_column, payload_column).mapInPandas(
        _resize_batches, schema=RESIZED_SCHEMA,
    )


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    duration_column: str = "duration_ms",
    id_column: str = "media_id",
) -> DataFrame:
    """Video frame-sampling plan: one row per (media, frame timestamp)
    via sequence+explode — the pure-expression half of frame extraction
    (the decode of each frame goes through :func:`extract_features`).

    Media with NULL duration are dropped (``greatest`` skips NULLs, so
    without the explicit filter an unknown-duration row would fabricate a
    single frame at t=0) — and so are zero/negative durations: a 0 ms
    video contains no frames, and a corrupt negative duration must not
    sample a frame that does not exist."""
    return df.filter(F.col(duration_column) > 0).select(
        F.col(id_column),
        F.explode(
            F.sequence(F.lit(0), F.col(duration_column) - 1, F.lit(every_ms)),
        ).alias("frame_ms"),
    )


def synthesize_ppm_media_from_text(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    width: int = 4,
    height: int = 2,
) -> DataFrame:
    """Fixture builder with REAL image payloads: wrap a text table into the
    MEDIA_SCHEMA contract where each payload is a valid binary PPM (P6)
    whose pixel bytes are the md5 digest of the text, cycled to fill
    ``width * height * 3`` samples.

    Entirely expression-level (md5 → unhex → concat), so the payloads are
    reproducible in any engine that has md5 — which is what lets the
    cross-engine oracle regenerate the exact pixel statistics the real
    :func:`decode_payload` codec emits. NULL text maps to a NULL payload.
    """
    n = width * height * 3
    header = b"P6\n%d %d\n255\n" % (width, height)
    hexd = F.md5(F.col(text_column))
    parts = [F.lit(header)] + [F.unhex(hexd)] * (n // 16)
    if n % 16:
        parts.append(F.unhex(F.substring(hexd, 1, 2 * (n % 16))))
    payload = F.when(F.col(text_column).isNotNull(), F.concat(*parts))
    return df.select(
        F.col(id_column).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.when(F.col(text_column).isNotNull(),
               F.lit("image/x-portable-pixmap")).alias("mime"),
        F.when(F.col(text_column).isNotNull(), F.lit(width)).cast("int").alias("width"),
        F.when(F.col(text_column).isNotNull(), F.lit(height)).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
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
