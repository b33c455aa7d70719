"""Perceptual image hashing + near-duplicate pairs — the image-side
twin of the text tier's SimHash/MinHash machinery, the LAION-style
dedup pass a multimodal corpus runs before training.

``image_dhash`` computes the classic difference hash: decode, collapse
to integer grayscale ((r+g+b)//3 — exact integer math, engine
reproducible), nearest-neighbor resample to ``hash_size`` rows ×
``hash_size + 1`` columns with the SAME index arithmetic as
:func:`~sed_binning_spark.pipeline.multimodal.resize_images`
(``src = dst_index * src_dim // dst_dim``), then one bit per
horizontal gradient (left < right), packed MSB-first row-major into a
signed 64-bit value. Every step is integer-exact, so two engines (or
two runs) agree bit-for-bit — which is what lets the driver oracle
regenerate hashes symbolically from the fixture construction.

``dhash_pairs`` finds near-duplicates WITHOUT an all-pairs product:
the 64-bit hash splits into ``bands`` fixed-width sub-keys, candidates
equi-join on (band index, band value) — identical twins collide in
every band, hashes within Hamming distance d collide in at least one
band whenever d < bands (pigeonhole) — and one XOR+popcount verifies
the true distance. The same bucket-join discipline as the text LSH:
nothing quadratic, one shuffle on band keys.

No counterpart exists in the reference repo (photoemission binning,
no media code); dHash itself is public (widely documented; e.g. the
original Hacker Factor description and every imagehash library).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def dhash_int(img: np.ndarray, hash_size: int = 8) -> int:
    """The dHash of one decoded image array ((h, w) gray or (h, w, c))
    as a SIGNED 64-bit integer (hash_size 8). Integer-exact: grayscale
    is (sum of channels) // n_channels, the resample picks source
    pixels by ``dst * src // n_dst``."""
    if hash_size < 1:
        raise ValueError("hash_size must be a positive bit-grid size")
    if hash_size * hash_size > 64:
        raise ValueError("dhash wider than 64 bits — lower hash_size")
    if img.ndim == 3:
        gray = (img.astype(np.int64).sum(axis=2)
                // img.shape[2])
    elif img.ndim == 2:
        gray = img.astype(np.int64)
    else:
        raise ValueError("dhash wants an (h, w[, c]) image array")
    h, w = gray.shape
    if h == 0 or w == 0:
        raise ValueError("dhash of an empty raster")
    rows = (np.arange(hash_size) * h) // hash_size
    cols = (np.arange(hash_size + 1) * w) // (hash_size + 1)
    g = gray[np.ix_(rows, cols)]
    bits = (g[:, :-1] < g[:, 1:]).ravel()
    out = np.uint64(0)
    for b in bits:
        out = (out << np.uint64(1)) | np.uint64(bool(b))
    out <<= np.uint64(64 - bits.size)
    return int(out.view(np.int64))


def image_dhash(
    df: DataFrame,
    payload_column: str = "payload",
    id_column: str = "media_id",
    hash_size: int = 8,
) -> DataFrame:
    """``(media_id, dhash)`` per image payload — every container the
    multimodal tier decodes (PPM/BMP/PNG/GIF/JPEG). One
    ``mapInPandas`` stage, Arrow-batched, no shuffle; a payload that
    fails to decode (or is non-image, e.g. WebP's header-only sniff)
    degrades to zero rows, keeping the batch alive."""
    import pandas as pd

    from sed_binning_spark.pipeline.multimodal import (
        _DECODE_ERRORS,
        _decode_image_payload,
        FEATURIZER_MAX_PIXELS,
    )

    schema = f"{id_column} long, dhash long"

    def _batches(batches):
        for pdf in batches:
            rows = []
            # hash each DISTINCT payload once per batch: the dhash is a
            # pure function of the bytes (dedup-before-decode; the memo
            # dies with the batch, so memory stays bounded)
            memo: dict = {}
            for mid, payload in zip(pdf[id_column], pdf[payload_column]):
                if payload is None:
                    continue
                b = bytes(payload)
                if b in memo:
                    h = memo[b]
                else:
                    try:
                        img = _decode_image_payload(
                            b, FEATURIZER_MAX_PIXELS, None,
                        )
                        h = None if img is None else dhash_int(img, hash_size)
                    except _DECODE_ERRORS:
                        h = None  # not an image / undecodable: zero rows
                    memo[b] = h
                if h is not None:
                    rows.append((mid, h))
            yield pd.DataFrame(rows, columns=[id_column, "dhash"])

    return df.mapInPandas(_batches, schema=schema)


def dhash_pairs(
    hashes: DataFrame,
    max_distance: int = 4,
    bands: int = 8,
    id_column: str = "media_id",
    hash_column: str = "dhash",
) -> DataFrame:
    """``(id_a, id_b, distance)`` pairs with Hamming distance ≤
    ``max_distance``, id_a < id_b — candidates from a banded
    equi-join (any shared 64/bands-bit band), verified by one
    XOR+popcount. Complete for ``max_distance < bands`` (pigeonhole:
    d bit flips cannot touch all bands) — the defaults (4, 8)
    satisfy it; passing fewer bands than ``max_distance + 1`` trades
    recall for wider band keys (fewer random collisions), exactly
    like the text LSH. Everything is built-in expressions — the only
    shuffle is the band-key join."""
    if not 1 <= bands <= 64 or 64 % bands:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    # width 64 (bands=1) needs the all-ones SIGNED literal: -1
    mask = (1 << width) - 1 if width < 64 else -1
    exploded = hashes.select(
        F.col(id_column).alias("_id"),
        F.col(hash_column).alias("_h"),
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(
                    F.col(hash_column), i * width,
                ).bitwiseAND(F.lit(mask)).alias("key"),
            )
            for i in range(bands)
        ])).alias("bk"),
    ).select("_id", "_h", "bk.band", "bk.key")
    left = exploded.alias("l")
    right = exploded.alias("r")
    cand = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.key") == F.col("r.key"),
                F.col("l._id") < F.col("r._id"),
            ],
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._h").alias("ha"),
            F.col("r._h").alias("hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn(
            "distance",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))),
        )
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )
