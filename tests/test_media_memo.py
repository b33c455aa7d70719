"""Duplicate payloads must decode to the same rows a fresh decode gives.

The media operators memoize decode work per Arrow batch keyed on the raw
payload bytes (dedup-before-decode).  These tests pin the semantics: a
frame where a payload occurs many times, interleaved with distinct and
NULL payloads, must yield row-for-row the results of the all-distinct
frame — the memo is a pure cache, never a behavior change.
"""

from __future__ import annotations

import numpy as np
import pytest

from sed_binning_spark.pipeline.imagehash import image_dhash
from sed_binning_spark.pipeline.manifest import media_manifest
from sed_binning_spark.pipeline.multimodal import (
    encode_image_png,
    encode_image_ppm,
    extract_features,
)
from sed_binning_spark.pipeline.subtitles import extract_subtitle_cues
from sed_binning_spark.pipeline.tags import extract_media_tags


def _imgs():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    b = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    return a, b


def _media_df(spark, payloads):
    rows = [
        (i, None if p is None else bytearray(p))
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def _dup_matches_distinct(spark, op, payloads, key_cols):
    """op(frame with dups) row-multiset == dup expansion of op(distinct)."""
    distinct = {i: p for i, p in enumerate(payloads)}
    base = op(_media_df(spark, payloads)).toPandas()
    # id layout: 100+i and 200+i are byte-identical re-uploads of i
    dup_ids = {100 + i: i for i in distinct} | {200 + i: i for i in distinct}
    rows = [(i, None if p is None else bytearray(p))
            for i, p in distinct.items()]
    rows += [(mid, None if distinct[src] is None else bytearray(distinct[src]))
             for mid, src in dup_ids.items()]
    dup = op(
        spark.createDataFrame(rows, "media_id long, payload binary"),
    ).toPandas()

    def keyset(pdf, mid_map):
        out = set()
        for _, r in pdf.iterrows():
            src = mid_map.get(int(r["media_id"]), int(r["media_id"]))
            out.add((src,) + tuple(str(r[c]) for c in key_cols))
        return out

    base_keys = keyset(base, {})
    # every duplicate id must reproduce its source's rows exactly
    got = keyset(dup, dup_ids)
    assert got == base_keys
    # and the dup frame carries 3x the non-null-source rows
    n_per_src = base.groupby("media_id").size().to_dict()
    for mid, src in dup_ids.items():
        assert (dup["media_id"] == mid).sum() == n_per_src.get(src, 0)


def test_extract_features_memo_matches_fresh(spark):
    a, b = _imgs()
    payloads = [
        encode_image_ppm(a), encode_image_png(b), b"not media", None,
    ]
    _dup_matches_distinct(
        spark, lambda df: extract_features(df, feature_dim=8),
        payloads, ["n_bytes", "feat"],
    )


def test_image_dhash_memo_matches_fresh(spark):
    a, b = _imgs()
    payloads = [
        encode_image_ppm(a), encode_image_png(b), b"junk", None,
        encode_image_ppm(255 - a),
    ]
    _dup_matches_distinct(spark, image_dhash, payloads, ["dhash"])


def test_media_manifest_memo_matches_fresh(spark):
    a, _ = _imgs()
    payloads = [encode_image_ppm(a), b"\x00\x01junk", None]
    _dup_matches_distinct(
        spark, media_manifest, payloads,
        ["container", "mime", "n_bytes", "width", "height", "error"],
    )


def test_extract_media_tags_memo_matches_fresh(spark):
    id3 = (b"ID3\x03\x00\x00\x00\x00\x00\x2b"
           b"TIT2\x00\x00\x00\x21\x00\x00\x00"
           + b"0123456789abcdef0123456789abcdef")
    payloads = [id3, b"no tags here", None]
    _dup_matches_distinct(
        spark, extract_media_tags, payloads, ["container", "key", "value"],
    )


def test_extract_subtitle_cues_memo_matches_fresh(spark):
    srt = (b"1\n00:00:01,000 --> 00:00:02,000\nhello\n\n"
           b"2\n00:00:03,000 --> 00:00:04,500\nworld\n")
    vtt = b"WEBVTT\n\n00:00.000 --> 00:01.000\nhi there\n"
    payloads = [srt, vtt, b"not subs \x00", None]
    _dup_matches_distinct(
        spark, extract_subtitle_cues, payloads,
        ["format", "cue_index", "start_ms", "end_ms", "text"],
    )
