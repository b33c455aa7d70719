"""Perceptual image hashing (pipeline.imagehash): the integer-exact
dHash kernel, the Spark operator's degrade posture, the banded
near-dup pair join (with a DuckDB cross-engine parity check on the
banding arithmetic), and the pigeonhole recall guarantee. No
counterpart in the reference repo (photoemission binning, no media
code)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from sed_binning_spark.pipeline.imagehash import (
    dhash_int,
    dhash_pairs,
    image_dhash,
)
from sed_binning_spark.pipeline.multimodal import encode_image_png


def test_dhash_gradient_extremes():
    img = np.tile(np.arange(9, dtype=np.uint8) * 10, (8, 1))
    assert dhash_int(img) == int(
        np.uint64(0xFFFFFFFFFFFFFFFF).view(np.int64))
    assert dhash_int(img[:, ::-1]) == 0


def test_dhash_inversion_is_complement():
    rng = np.random.default_rng(11)
    # an 8x9 all-distinct raster: the resample is the identity and no
    # a == b tie breaks the strict-comparison flip
    img = (rng.permutation(72).astype(np.uint8).reshape(8, 9) * 3)
    h = dhash_int(img)
    assert dhash_int(255 - img) == ~h


def test_dhash_matches_fixture_closed_form():
    # the 4x2 md5-pixel fixture reduces to 6 comparisons with
    # closed-form bit weights — the arithmetic the driver oracle uses
    text = b"alpha words"
    d = hashlib.md5(text).digest()
    img = np.frombuffer(
        bytes(d[i % 16] for i in range(24)), np.uint8,
    ).reshape(2, 4, 3)
    g = [(d[(3 * p) % 16] + d[(3 * p + 1) % 16]
          + d[(3 * p + 2) % 16]) // 3 for p in range(8)]
    weights = [
        ((0, 1), (61, 53, 45, 37)), ((1, 2), (59, 51, 43, 35)),
        ((2, 3), (57, 49, 41, 33)), ((4, 5), (29, 21, 13, 5)),
        ((5, 6), (27, 19, 11, 3)), ((6, 7), (25, 17, 9, 1)),
    ]
    expect = sum(
        sum(1 << k for k in bits)
        for (a, b), bits in weights if g[a] < g[b]
    )
    assert dhash_int(img) == expect


def test_dhash_rejects_bad_shapes():
    with pytest.raises(ValueError, match="empty raster"):
        dhash_int(np.zeros((0, 4), np.uint8))
    with pytest.raises(ValueError, match="lower hash_size"):
        dhash_int(np.zeros((8, 8), np.uint8), hash_size=9)


def test_operator_hashes_and_degrades(spark):
    base = np.random.default_rng(7).integers(
        0, 255, (32, 32, 3)).astype(np.uint8)
    near = base.copy()
    near[0, 0] = 255 - near[0, 0]
    df = spark.createDataFrame(
        [(0, bytearray(encode_image_png(base))),
         (1, bytearray(encode_image_png(near))),
         (2, bytearray(encode_image_png(255 - base))),
         (3, bytearray(b"not an image")),
         (4, None)],
        "media_id long, payload binary",
    )
    hs = image_dhash(df)
    rows = {r.media_id: r.dhash for r in hs.collect()}
    assert set(rows) == {0, 1, 2}  # non-image and NULL degrade
    pairs = dhash_pairs(hs, max_distance=4).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(0, 1)]
    assert pairs[0].distance <= 4


def test_pairs_pigeonhole_recall(spark):
    # any hash within distance < bands MUST be found: flip d bits in
    # every position pattern and assert the pair always survives
    base = int(np.uint64(0x0123456789ABCDEF).view(np.int64))
    rows = [(0, base)]
    k = 1
    for positions in [(0,), (63,), (0, 63), (15, 16, 17)]:
        h = np.uint64(base & 0xFFFFFFFFFFFFFFFF)
        for p in positions:
            h ^= np.uint64(1) << np.uint64(p)
        rows.append((k, int(h.view(np.int64))))
        k += 1
    df = spark.createDataFrame(rows, "media_id long, dhash long")
    got = dhash_pairs(df, max_distance=3, bands=4)
    found = {(p.id_a, p.id_b): p.distance for p in got.collect()
             if p.id_a == 0}
    assert {(0, 1): 1, (0, 2): 1, (0, 3): 2, (0, 4): 3}.items() \
        <= found.items()


def test_pairs_banding_matches_duckdb(spark):
    # cross-engine parity of the banding arithmetic: DuckDB replays
    # the band extraction + hamming verify over the same hashes
    import duckdb

    rng = np.random.default_rng(3)
    hashes = [int(np.uint64(v).view(np.int64))
              for v in rng.integers(0, 2**64, 24, dtype=np.uint64)]
    # plant two near pairs
    hashes.append(hashes[0] ^ 0b11)
    hashes.append(hashes[5] ^ (1 << 40))
    rows = list(enumerate(hashes))
    df = spark.createDataFrame(rows, "media_id long, dhash long")
    got = sorted(
        (p.id_a, p.id_b, p.distance)
        for p in dhash_pairs(df, max_distance=6, bands=4).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE h(id BIGINT, v BIGINT)",
    )
    con.executemany("INSERT INTO h VALUES (?, ?)", rows)
    oracle = con.execute("""
        WITH bands AS (
          SELECT id, v, b, (v >> (b * 16)) & 65535 AS key
          FROM h, range(0, 4) t(b)
        )
        SELECT DISTINCT l.id, r.id,
               bit_count(CAST(xor(l.v, r.v) AS BIGINT)) AS d
        FROM bands l JOIN bands r
          ON l.b = r.b AND l.key = r.key AND l.id < r.id
        WHERE bit_count(CAST(xor(l.v, r.v) AS BIGINT)) <= 6
        ORDER BY 1, 2
    """).fetchall()
    assert got == [tuple(r) for r in oracle]


def test_default_settings_find_distance_4_spread_across_bands(spark):
    # the defaults (max_distance=4, bands=8) satisfy the pigeonhole
    # completeness bound — four flips one-per-16-bit-quadrant must
    # still collide in at least one 8-bit band
    base = int(np.uint64(0x0123456789ABCDEF).view(np.int64))
    spread = np.uint64(base & 0xFFFFFFFFFFFFFFFF)
    for p in (0, 16, 32, 48):
        spread ^= np.uint64(1) << np.uint64(p)
    df = spark.createDataFrame(
        [(0, base), (1, int(spread.view(np.int64)))],
        "media_id long, dhash long",
    )
    got = dhash_pairs(df).collect()
    assert [(p.id_a, p.id_b, p.distance) for p in got] == [(0, 1, 4)]


def test_single_band_degenerates_to_exact_match(spark):
    df = spark.createDataFrame(
        [(0, 7), (1, 7), (2, 8)], "media_id long, dhash long",
    )
    got = dhash_pairs(df, max_distance=0, bands=1).collect()
    assert [(p.id_a, p.id_b) for p in got] == [(0, 1)]


def test_dhash_hash_size_bounds():
    with pytest.raises(ValueError, match="positive"):
        dhash_int(np.zeros((4, 4), np.uint8), hash_size=0)
