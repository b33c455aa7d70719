"""Pipeline operator tests: dedup, text analysis, similarity, multimodal."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sed_binning_spark.pipeline.dedup import (
    exact_dedup,
    exact_dedup_keep_rows,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard,
    simhash,
)
from sed_binning_spark.pipeline.multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_media_from_text,
)
from sed_binning_spark.pipeline.similarity import (
    cosine_pairs_brute,
    cosine_topk,
    lsh_bucket_pairs,
)
from sed_binning_spark.pipeline.text import (
    document_fingerprint,
    language_id,
    quality_score,
    rolling_hashes,
    text_stats,
)


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
        (2, "the quick brown fox jumps over the very lazy dog"),     # near dup
        (3, "der schnelle braune fuchs springt und ist nicht faul"),
        (4, "le renard brun est dans la foret pour une promenade"),
        (5, "completely different content about spark query engines"),
        (6, "THE  Quick   Brown fox jumps over the lazy dog"),       # case/ws variant
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(4)
    base = rng.standard_normal(8)
    rows = []
    for i in range(20):
        if i < 3:  # 3 vectors nearly parallel to base
            v = base + rng.standard_normal(8) * 0.01
        else:
            v = rng.standard_normal(8)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# ------------------------------------------------------------------- dedup
def test_exact_dedup(docs_df):
    out = exact_dedup(docs_df).toPandas()
    assert len(out) == 6  # 7 docs, one exact dup
    dup = out[out.n_dups == 2]
    assert len(dup) == 1 and dup.kept_id.iloc[0] == 0


def test_exact_dedup_keep_rows(docs_df):
    kept = exact_dedup_keep_rows(docs_df).toPandas()
    assert sorted(kept.doc_id) == [0, 2, 3, 4, 5, 6]


def test_exact_dedup_keep_max(docs_df):
    out = exact_dedup(docs_df, keep="max").toPandas()
    assert 1 in set(out.kept_id)
    with pytest.raises(ValueError, match="min"):
        exact_dedup(docs_df, keep="median")


def test_minhash_identical_signatures(docs_df):
    sigs = minhash_signatures(docs_df, num_hashes=4).toPandas().set_index("doc_id")
    for c in ["mh_0", "mh_1", "mh_2", "mh_3"]:
        assert sigs.loc[0, c] == sigs.loc[1, c]  # exact dups → equal sigs
    # near-dup shares most hashes with 0; unrelated doc shares none
    share_near = sum(sigs.loc[0, c] == sigs.loc[2, c] for c in sigs.columns)
    share_far = sum(sigs.loc[0, c] == sigs.loc[5, c] for c in sigs.columns)
    assert share_far == 0 and share_near >= 1


def test_minhash_lsh_finds_duplicates(docs_df):
    pairs = minhash_lsh_pairs(docs_df, num_hashes=8, bands=8).toPandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (0, 1) in got          # exact dup always collides
    assert (0, 5) not in got      # unrelated never
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_pairs(docs_df, num_hashes=7, bands=3)


def test_ngram_jaccard_verification(spark, docs_df):
    pairs = spark.createDataFrame([(0, 1), (0, 5)], "id_a long, id_b long")
    out = ngram_jaccard(pairs, docs_df).toPandas().set_index(["id_a", "id_b"])
    assert out.loc[(0, 1), "jaccard"] == 1.0
    assert out.loc[(0, 5), "jaccard"] == 0.0


def test_simhash_neardup_bits(docs_df):
    out = simhash(docs_df, bits=16).toPandas().set_index("doc_id")
    assert out.loc[0, "simhash"] == out.loc[1, "simhash"]
    ham_near = sum(a != b for a, b in zip(out.loc[0, "simhash"], out.loc[2, "simhash"]))
    ham_far = sum(a != b for a, b in zip(out.loc[0, "simhash"], out.loc[5, "simhash"]))
    assert ham_near < ham_far
    with pytest.raises(ValueError, match="bits"):
        simhash(docs_df, bits=64)


# ------------------------------------------------------------------- text
def test_text_stats(docs_df):
    out = text_stats(docs_df).toPandas().set_index("doc_id")
    r = out.loc[0]
    assert r.n_chars == len("the quick brown fox jumps over the lazy dog")
    assert r.n_ws_tokens == 9
    assert r.stopword_ratio == pytest.approx(2 / 9)  # "the" twice
    assert 0 <= r.punct_ratio < 0.05
    assert r.uniq_token_ratio == pytest.approx(8 / 9)


def test_quality_score_rules(docs_df):
    out = quality_score(docs_df).toPandas().set_index("doc_id")
    # doc 0: 9 tokens (fails the >=20 window), mean_token_len 4.0,
    # no punctuation, stopwords present, 8/9 unique -> 4/5 rules pass
    assert out.loc[0, "quality"] == pytest.approx(0.8)
    assert bool(out.loc[0, "keep"])
    assert ((out["quality"] >= 0) & (out["quality"] <= 1)).all()


def test_quality_score_degenerate_docs(spark):
    """NULL/blank/repetitive documents must be scored low, never NULL —
    an empty doc must not sneak past a keep-flag filter."""
    df = spark.createDataFrame(
        [(0, None), (1, "   "), (2, "spam " * 50), (3, "!!! ??? ... ;;; :::")],
        "doc_id long, text string",
    )
    out = quality_score(df).toPandas().set_index("doc_id")
    assert out["quality"].notna().all()
    assert out.loc[0, "quality"] == 0.0 and not bool(out.loc[0, "keep"])
    # whitespace-only: every token-based rule fails (only the punctuation
    # rule can pass on its 3 blank chars) — never kept
    assert out.loc[1, "quality"] <= 0.2 and not bool(out.loc[1, "keep"])
    # 50x-repeated token: uniq ratio 1/50 fails the repetition rule
    assert not bool(out.loc[2, "keep"])
    # pure punctuation: punct_ratio ~0.75 and no stopwords
    assert not bool(out.loc[3, "keep"])
    # thresholds are parameters: relax everything and the spam doc passes
    lax = quality_score(
        df, min_tokens=1, min_uniq_token_ratio=0.0, min_stopword_ratio=0.0,
        mean_token_len_range=(1.0, 100.0),
    ).toPandas().set_index("doc_id")
    assert bool(lax.loc[2, "keep"])


def test_language_id(docs_df):
    out = language_id(docs_df).toPandas().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[3, "lang_pred"] == "de"
    assert out.loc[4, "lang_pred"] == "fr"


def test_fingerprint_normalization(docs_df):
    out = document_fingerprint(docs_df).toPandas().set_index("doc_id")
    assert out.loc[0, "fingerprint"] == out.loc[6, "fingerprint"]  # ws/case variant
    raw = document_fingerprint(docs_df, normalized=False).toPandas().set_index("doc_id")
    assert raw.loc[0, "fingerprint"] != raw.loc[6, "fingerprint"]


@pytest.mark.parametrize("hf", ["md5", "rolling"])
def test_rolling_hashes(docs_df, hf):
    out = (
        rolling_hashes(docs_df, window=5, hash_function=hf)
        .toPandas().set_index("doc_id")
    )
    assert len(out.loc[0, "rolling_hashes"]) == 9 - 5 + 1
    assert out.loc[0, "rolling_hashes"][0] == out.loc[1, "rolling_hashes"][0]


def test_rolling_hashes_partial_and_null_semantics(spark):
    """Both hash forms share the winnow-family edge contract: one partial
    whole-document window below the window width, NULL for token-less
    documents (never a shared hash that would collide every blank doc)."""
    df = spark.createDataFrame(
        [(0, "just three tokens"), (1, ""), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    for hf in ("md5", "rolling"):
        out = (
            rolling_hashes(df, window=5, hash_function=hf)
            .toPandas().set_index("doc_id")
        )
        assert len(out.loc[0, "rolling_hashes"]) == 1
        for i in (1, 2, 3):
            assert out.loc[i, "rolling_hashes"] is None
    with pytest.raises(ValueError, match="hash_function"):
        rolling_hashes(df, hash_function="sha1")


@pytest.mark.parametrize("hf", ["md5", "rolling"])
def test_winnow_fingerprints(docs_df, hf):
    """Winnowing guarantee: a shared token run of length >= shingle_window
    + winnow_window - 1 must produce at least one common fingerprint, and
    the winnowed set is a (deduplicated) subset of the rolling hashes.
    Hash-value-agnostic — both the md5 and Rabin-Karp forms must satisfy
    it."""
    from sed_binning_spark.pipeline.text import winnow_fingerprints

    out = (
        winnow_fingerprints(
            docs_df, shingle_window=5, winnow_window=2, hash_function=hf,
        )
        .toPandas().set_index("doc_id")
    )
    rh = (
        rolling_hashes(docs_df, window=5, hash_function=hf)
        .toPandas().set_index("doc_id")
    )
    for i in (0, 2, 5):
        assert set(out.loc[i, "winnowed"]) <= set(rh.loc[i, "rolling_hashes"])
        assert len(out.loc[i, "winnowed"]) <= len(rh.loc[i, "rolling_hashes"])
    # docs 0/1 identical -> identical fingerprint sets; doc 2 shares the
    # long "the quick brown fox jumps over the" prefix run with doc 0
    assert list(out.loc[0, "winnowed"]) == list(out.loc[1, "winnowed"])
    assert set(out.loc[0, "winnowed"]) & set(out.loc[2, "winnowed"])
    assert not set(out.loc[0, "winnowed"]) & set(out.loc[5, "winnowed"])


# --------------------------------------------------------------- similarity
def test_cosine_topk(emb_df):
    rng = np.random.default_rng(4)
    base = rng.standard_normal(8)
    out = cosine_topk(emb_df, base, k=3).toPandas()
    assert set(out.vec_id) == {0, 1, 2}  # the 3 near-parallel vectors
    assert (out.score > 0.99).all()
    assert list(out.score) == sorted(out.score, reverse=True)


def test_cosine_pairs_brute_and_lsh_agree(emb_df):
    brute = cosine_pairs_brute(emb_df, 0.99).toPandas()
    got = {tuple(r) for r in brute[["id_a", "id_b"]].itertuples(index=False)}
    assert got == {(0, 1), (0, 2), (1, 2)}
    lsh = lsh_bucket_pairs(emb_df, 0.99, num_planes=6, num_tables=8).toPandas()
    got_lsh = {tuple(r) for r in lsh[["id_a", "id_b"]].itertuples(index=False)}
    # LSH is approximate: must find a subset, should find most with 8 tables
    assert got_lsh <= got
    assert len(got_lsh) >= 2


# --------------------------------------------------------------- multimodal
def test_multimodal_plumbing(docs_df):
    media = synthesize_media_from_text(docs_df)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_features(media, feature_dim=8).toPandas().set_index("media_id")
    assert len(feats) == 7
    assert all(len(f) == 8 for f in feats.feat)
    # deterministic: same payload -> same features
    assert list(feats.loc[0, "feat"]) == list(feats.loc[1, "feat"])
    assert feats.loc[0, "n_bytes"] == len("the quick brown fox jumps over the lazy dog")


def test_multimodal_real_codecs_known_stats():
    """Pure-NumPy codec round-trips on known content: decode(encode(x))
    recovers x exactly, and the feature stats match hand-computed values."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        decode_audio_wav,
        decode_image_bmp,
        decode_image_ppm,
        decode_payload,
        encode_audio_wav,
        encode_image_ppm,
    )

    # PPM round-trip + known stats: 2x2 image, R=10 G=20 B=30 everywhere
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 10, 20, 30
    ppm = encode_image_ppm(img)
    assert np.array_equal(decode_image_ppm(ppm), img)
    vec = decode_payload(ppm, 8)
    assert vec[0] == 1.0 and vec[1] == 2.0 and vec[2] == 2.0 and vec[3] == 3.0
    assert vec[4] == pytest.approx(20.0 / 255.0)          # mean
    assert vec[6] == pytest.approx(10.0 / 255.0)          # min
    assert vec[7] == pytest.approx(30.0 / 255.0)          # max

    # PPM with comments in the header still parses
    commented = b"P6\n# a comment\n2 2\n# another\n255\n" + img.tobytes()
    assert np.array_equal(decode_image_ppm(commented), img)

    # BMP: hand-built 24-bit bottom-up file with row padding (w=2 -> stride 8)
    bmp_rows = bytes([30, 20, 10] * 2 + [0, 0]) * 2          # BGR + 2 pad bytes
    bmp = (b"BM" + struct.pack("<IHHI", 54 + len(bmp_rows), 0, 0, 54)
           + struct.pack("<iiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(bmp_rows), 0, 0, 0, 0))
    bmp += bmp_rows
    assert np.array_equal(decode_image_bmp(bmp), img)

    # WAV round-trip + known stats: stereo ramp at 8 kHz
    samples = np.stack([np.arange(4, dtype=np.int16) * 1000,
                        -np.arange(4, dtype=np.int16) * 1000], axis=1)
    wav = encode_audio_wav(samples, 8000)
    dec, rate = decode_audio_wav(wav)
    assert rate == 8000
    assert np.array_equal(dec, samples)
    vec = decode_payload(wav, 8)
    assert vec[0] == 2.0 and vec[1] == 4.0 and vec[2] == 8000.0 and vec[3] == 2.0
    assert vec[6] == pytest.approx(-3000.0 / 32768.0)     # min
    assert vec[7] == pytest.approx(3000.0 / 32768.0)      # max


def test_multimodal_real_decode_end_to_end(spark):
    """extract_features(decode_stub=False) over a generated mixed corpus:
    the mapInPandas plan decodes real PPM/WAV payloads and falls back to
    byte stats for plain text."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import encode_audio_wav, encode_image_ppm

    from sed_binning_spark.pipeline.jpeg import (
        encode_image_jpeg, encode_image_jpeg_progressive,
    )
    from sed_binning_spark.pipeline.multimodal import (
        encode_image_gif, encode_image_png,
    )

    img = np.full((4, 6, 3), 128, dtype=np.uint8)
    wav = encode_audio_wav(np.zeros(100, dtype=np.int16), 16000)
    rows = [
        (1, bytearray(encode_image_ppm(img)), "image/x-portable-pixmap"),
        (2, bytearray(wav), "audio/wav"),
        (3, bytearray(b"just some text"), "text/plain"),
        (4, bytearray(encode_image_jpeg(img)), "image/jpeg"),
        (5, bytearray(encode_image_png(img)), "image/png"),
        (6, bytearray(encode_image_jpeg_progressive(img)), "image/jpeg"),
        (7, bytearray(encode_image_gif(img)), "image/gif"),
        (8, bytearray(encode_image_gif(img, interlace=True)), "image/gif"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    feats = (
        extract_features(media, feature_dim=8, decode_stub=False)
        .toPandas().set_index("media_id")
    )
    assert feats.loc[1, "feat"][0] == 1.0 and feats.loc[1, "feat"][1] == 6.0
    assert feats.loc[2, "feat"][0] == 2.0 and feats.loc[2, "feat"][2] == 16000.0
    assert feats.loc[3, "feat"][0] == 0.0 and feats.loc[3, "feat"][1] == 14.0
    # all seven image containers agree on dims; flat-block jpeg decode
    # (baseline AND progressive) and the lossless gif legs are exact so
    # the stats match the ppm leg
    for mid in (4, 5, 6, 7, 8):
        assert list(feats.loc[mid, "feat"]) == list(feats.loc[1, "feat"]), mid


def test_frame_sample_plan(docs_df):
    media = synthesize_media_from_text(docs_df)
    frames = frame_sample_plan(media, every_ms=100).toPandas()
    d0 = media.toPandas().set_index("media_id").loc[0, "duration_ms"]
    assert (frames[frames.media_id == 0].frame_ms.max()
            == ((d0 - 1) // 100) * 100)


def test_lsh_skew_guard_degenerate_corpus(spark):
    """1000 identical documents share every band key — the bucket cap must
    prevent the O(n²) expansion but still emit O(n) STAR pairs (around the
    smallest id), so the cluster stays one connected component instead of
    silently vanishing; exact dedup still collapses the class cheaper (the
    documented division of labor)."""
    rows = [(i, "same boilerplate text repeated everywhere") for i in range(1000)]
    rows += [(2000, "a genuinely unique document about spark"),
             (2001, "a genuinely unique document about spark engines")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, num_hashes=8, bands=4, max_bucket_size=100).toPandas()
    # star fallback: every degenerate member pairs with rep id 0, nothing else
    degen = pairs[(pairs.id_a < 1000) & (pairs.id_b < 1000)]
    assert len(degen) == 999
    assert (degen.id_a == 0).all()
    # old skip behavior still available explicitly
    dropped = minhash_lsh_pairs(
        df, num_hashes=8, bands=4, max_bucket_size=100, oversized="drop",
    ).toPandas()
    assert not ((dropped.id_a < 1000) & (dropped.id_b < 1000)).any()
    dups = exact_dedup(df).toPandas()
    assert int(dups.n_dups.max()) == 1000
    # raising the cap recovers full pair expansion (opt-in, small data)
    some = minhash_lsh_pairs(
        df.where(F.col("doc_id") < 5), num_hashes=8, bands=4, max_bucket_size=100,
    ).toPandas()
    assert len(some) == 10  # C(5,2): all pairs of the 5 identical docs


def test_oversized_bucket_stats(spark):
    from sed_binning_spark.pipeline.dedup import (
        minhash_lsh_bucket_stats,
        oversized_bucket_stats,
    )

    rows = [(i, "k1") for i in range(10)] + [(100, "k2"), (101, "k2")]
    df = spark.createDataFrame(rows, "doc_id long, key string")
    stats = oversized_bucket_stats(df, ["key"], "doc_id", max_bucket_size=5).collect()[0]
    assert stats.n_buckets == 2
    assert stats.n_oversized_buckets == 1
    assert stats.n_oversized_members == 10
    assert stats.max_bucket_size_seen == 10

    # public corpus-surface form: same params as minhash_lsh_pairs
    docs = spark.createDataFrame(
        [(i, "same boilerplate text repeated everywhere") for i in range(50)]
        + [(99, "something else entirely here")],
        "doc_id long, text string",
    )
    s = minhash_lsh_bucket_stats(docs, max_bucket_size=10).collect()[0]
    assert s.n_oversized_buckets >= 1
    assert s.max_bucket_size_seen == 50


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/testdata/sf0.01/embeddings.parquet"),
    reason="driver testdata not present",
)
def test_ann_lsh_recall_vs_brute(spark):
    """Quantified quality for the approximate path: at sf0.01 the tuned
    banding (4 planes x 12 tables for the 0.45 threshold) must recover
    >= 0.9 of the brute-force pairs. LSH never reports false positives
    (candidates are exact-cosine verified), so precision is 1 by
    construction — recall is the figure of merit."""
    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    brute = {(r.id_a, r.id_b) for r in cosine_pairs_brute(df, 0.45).collect()}
    lsh = {(r.id_a, r.id_b) for r in
           lsh_bucket_pairs(df, 0.45, num_planes=4, num_tables=12).collect()}
    assert lsh <= brute  # verified candidates: no false positives
    assert len(brute) > 0
    assert len(lsh & brute) / len(brute) >= 0.9


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/testdata/sf0.01/embeddings.parquet"),
    reason="driver testdata not present",
)
def test_ann_ivf_recall_vs_brute(spark):
    """IVF tier: probing 6 of 8 lists must recover >= 0.9 of the exact
    top-10 (random-ish embeddings scatter neighbors across lists, so the
    curve reaches 1.0 only near full probing — measured 0.2/0.6/1.0 at
    1/4/6 probes), and scores for returned ids are exact (IVF only
    restricts the candidate set; the cosine itself is not approximated).
    Probing ALL lists must equal brute force exactly."""
    from sed_binning_spark.pipeline.similarity import (
        cosine_topk,
        ivf_topk,
        ivf_train_centroids,
    )

    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = [float(np.sin(i * 0.37) + 0.2) for i in range(64)]
    cents = ivf_train_centroids(df, n_lists=8, sample_size=512, seed=7)
    assert cents.shape == (8, 64)
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-9)

    brute = cosine_topk(df, q, k=10).toPandas()
    ivf = ivf_topk(df, cents, q, k=10, n_probes=6).toPandas()
    recall = len(set(ivf.vec_id) & set(brute.vec_id)) / 10
    assert recall >= 0.9
    exact = brute.set_index("vec_id").score
    for _, row in ivf.iterrows():
        if row.vec_id in exact.index:
            assert row.score == pytest.approx(exact[row.vec_id], abs=1e-9)

    full = ivf_topk(df, cents, q, k=10, n_probes=8).toPandas()
    assert list(full.vec_id) == list(brute.vec_id)


def test_blank_documents_count_zero_tokens(spark):
    from sed_binning_spark.pipeline.text import text_stats as _ts

    df = spark.createDataFrame([(0, ""), (1, "   "), (2, "two words")],
                               "doc_id long, text string")
    out = _ts(df).toPandas().set_index("doc_id")
    assert out.loc[0, "n_ws_tokens"] == 0
    assert out.loc[1, "n_ws_tokens"] == 0
    assert out.loc[2, "n_ws_tokens"] == 2


def test_null_and_blank_text_never_forms_lsh_pairs(spark):
    """Missing text is not duplicate text: NULL/blank docs must not collide
    into a degenerate bucket and dedup each other away."""
    df = spark.createDataFrame(
        [(0, None), (1, None), (2, ""), (3, "   "), (4, "real content here"),
         (5, "real content here"), (6, "\n"), (7, "\t\t"), (8, "\r\n \t")],
        "doc_id long, text string",
    )
    got = {(r["id_a"], r["id_b"]) for r in
           minhash_lsh_pairs(df, num_hashes=8, bands=4).collect()}
    assert got == {(4, 5)}


def test_similarity_survives_dirty_embeddings(spark):
    """NULL, ragged, and zero-norm embeddings are routine dirty data: every
    similarity path must skip them, not abort the job (Spark 4 ANSI mode
    turns /0 and out-of-range element_at into job-killing errors)."""
    from sed_binning_spark.pipeline.similarity import (
        cosine_pairs_brute,
        cosine_topk,
        ivf_topk,
        ivf_train_centroids,
        lsh_bucket_pairs,
    )

    rows = [(0, [1.0, 2.0]), (1, [1.0, 2.1]), (2, None), (3, [0.5]),
            (4, [0.0, 0.0]), (5, [2.0, 4.0]), (6, [float("nan"), 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    top = cosine_topk(df, [1.0, 2.0], k=10).toPandas()
    assert set(top["vec_id"]) == {0, 5, 1}          # dirty rows excluded, not padded

    pairs = cosine_pairs_brute(df, threshold=0.99).toPandas()
    assert {(r.id_a, r.id_b) for r in pairs.itertuples()} >= {(0, 5)}
    assert 6 not in set(pairs["id_a"]) | set(pairs["id_b"])  # NaN never "similar"

    lsh = lsh_bucket_pairs(df, threshold=0.99, num_planes=4, num_tables=2)
    got = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    assert all(a not in (2, 3, 4, 6) and b not in (2, 3, 4, 6) for a, b in got)

    cents = ivf_train_centroids(df, n_lists=2, sample_size=4)
    top_ivf = ivf_topk(df, cents, [1.0, 2.0], k=2, n_probes=2).toPandas()
    assert len(top_ivf) == 2 and set(top_ivf["vec_id"]) <= {0, 1, 5}


def test_exact_dedup_null_text_not_duplicate(spark):
    """Missing text is not duplicate text: NULL-text rows never form a
    duplicate class, and keep-rows preserves them all."""
    from sed_binning_spark.pipeline.dedup import exact_dedup, exact_dedup_keep_rows

    df = spark.createDataFrame(
        [(0, None), (1, None), (2, "x"), (3, "x")], "doc_id long, text string",
    )
    classes = exact_dedup(df).toPandas()
    assert len(classes) == 1 and int(classes["n_dups"][0]) == 2
    kept = sorted(r["doc_id"] for r in exact_dedup_keep_rows(df).collect())
    assert kept == [0, 1, 2]


def test_whitespace_variant_docs_have_identical_signatures(spark):
    """Leading '\\n' (trim strips spaces only) must not change the shingle
    set: whitespace-variant exact duplicates keep identical signatures."""
    from sed_binning_spark.pipeline.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "\nalpha beta gamma delta\t")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(df, num_hashes=4).toPandas().set_index("doc_id")
    for i in range(4):
        assert sigs.loc[0, f"mh_{i}"] == sigs.loc[1, f"mh_{i}"]


def test_dim_probe_uses_mode_not_first_row(spark):
    """A truncated embedding at the head of the corpus must not dictate the
    inferred dimensionality for everyone else."""
    from sed_binning_spark.pipeline.similarity import _dim

    rows = [(0, [1.0])] + [(i, [float(i), 1.0, 2.0]) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(1)
    assert _dim(df, "embedding") == 3


def test_resize_images_distributed(spark):
    """resize_images: decode -> nearest-neighbor resize -> PPM re-encode via
    mapInPandas; non-image and corrupt payloads pass through as NULL rows
    instead of aborting the batch."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        decode_image_ppm,
        encode_image_ppm,
        resize_image,
        resize_images,
    )

    # pure-numpy kernel: 4x4 gradient -> 2x2 picks the top-left of each block
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    small = resize_image(img, 2, 2)
    np.testing.assert_array_equal(small, img[::2, ::2])
    # upscale repeats pixels
    big = resize_image(small, 4, 4)
    assert big.shape == (4, 4, 3)

    from sed_binning_spark.pipeline.jpeg import encode_image_jpeg
    from sed_binning_spark.pipeline.multimodal import (
        encode_image_gif, encode_image_png,
    )

    flat = np.full((4, 4, 3), 99, dtype=np.uint8)  # lossless through JPEG
    rows = [
        (0, bytearray(encode_image_ppm(img))),
        (1, bytearray(b"not an image")),
        (2, None),
        (3, bytearray(b"P6 corrupt header")),
        (4, bytearray(encode_image_png(img))),
        (5, bytearray(encode_image_gif(img))),
        (6, bytearray(encode_image_jpeg(flat))),
        (7, bytearray(encode_image_png(img[..., 0]))),  # grayscale PNG
        (8, bytearray(encode_image_gif(img, transparent_color=(0, 1, 2)))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = resize_images(df, 2, 2).toPandas().set_index("media_id")
    # every container decodes to the same raster, so every resized PPM of
    # the gradient image is identical (alpha drops, grayscale replicates)
    expect = img[::2, ::2]
    for mid in (0, 4, 5, 8):
        got = decode_image_ppm(bytes(out.loc[mid, "payload"]))
        np.testing.assert_array_equal(got, expect, err_msg=str(mid))
    np.testing.assert_array_equal(
        decode_image_ppm(bytes(out.loc[6, "payload"])), flat[::2, ::2],
    )
    np.testing.assert_array_equal(
        decode_image_ppm(bytes(out.loc[7, "payload"])),
        np.repeat(img[::2, ::2, :1], 3, axis=2),
    )
    assert out.loc[0, "width"] == 2 and out.loc[0, "height"] == 2
    assert out.loc[0, "mime"] == "image/x-portable-pixmap"
    for bad in (1, 2, 3):
        assert out.loc[bad, "payload"] is None


def test_minhash_xxhash64_production_mode(docs_df):
    """The xxhash64 hash_function (cheap 100 TB production path) finds the
    same near-duplicate pairs as the engine-portable md5 default on this
    corpus, and rejects unknown hash names loudly."""
    md5_pairs = {(r["id_a"], r["id_b"]) for r in
                 minhash_lsh_pairs(docs_df, num_hashes=8, bands=4).collect()}
    xx_pairs = {(r["id_a"], r["id_b"]) for r in
                minhash_lsh_pairs(docs_df, num_hashes=8, bands=4,
                                  hash_function="xxhash64").collect()}
    # exact duplicates share every band key under ANY hash
    assert (0, 1) in xx_pairs and (0, 6) in xx_pairs
    assert (0, 1) in md5_pairs
    with pytest.raises(ValueError, match="xxhash64"):
        minhash_signatures(docs_df, hash_function="fnv")


# ----------------------------------------------------------- PII / dup lines
def test_pii_stats_and_scrub(spark):
    from sed_binning_spark.pipeline.text import pii_stats, scrub_pii

    df = spark.createDataFrame(
        [
            (0, "mail me at bob@host.org or visit https://h.io/x?q=1 now"),
            (1, "server 192.168.0.1 phone +49 30-1234-5678 done"),
            (2, "plain text with no sensitive spans at all"),
            (3, None),
            # URL with userinfo: must be masked ONCE as a URL, the
            # embedded address must not leak a second <EMAIL> mask
            (4, "ftp-ish https://user@pw.example.com/path end"),
        ],
        "doc_id int, text string",
    )
    out = scrub_pii(pii_stats(df), ).orderBy("doc_id").toPandas()
    assert list(out["n_url"].fillna(-1)) == [1, 0, 0, -1, 1]
    assert list(out["n_email"].fillna(-1)) == [1, 0, 0, -1, 1]  # raw counts both
    assert list(out["n_ip"].fillna(-1)) == [0, 1, 0, -1, 0]
    assert list(out["n_phone"].fillna(-1)) == [0, 1, 0, -1, 0]
    s = list(out["text_scrubbed"])
    assert s[0] == "mail me at <EMAIL> or visit <URL> now"
    assert s[1] == "server <IP> phone <PHONE> done"
    assert s[2] == "plain text with no sensitive spans at all"
    assert s[3] is None
    assert s[4] == "ftp-ish <URL> end"  # scrub order: url before email


def test_dup_line_stats(spark):
    from sed_binning_spark.pipeline.text import dup_line_stats

    df = spark.createDataFrame(
        [
            (0, "a\nb\na\n\n  \n"),   # blanks ignored; 3 lines, 2 distinct
            (1, "single line"),        # <2 lines -> 0.0, not NULL
            (2, "x\nx\nx"),            # all repeats
            (3, None),
            # CRLF: the '\r' carrier lines between paragraphs are BLANK,
            # not repeated content — 3 distinct lines, ratio 0.0 (a trim-
            # based blank test would score 0.4 and flunk clean documents)
            (4, "p1\r\n\r\np2\r\n\r\np3"),
        ],
        "doc_id int, text string",
    )
    out = dup_line_stats(df).orderBy("doc_id").toPandas()
    r = list(out["dup_line_ratio"])
    assert abs(r[0] - (1 - 2 / 3)) < 1e-12
    assert r[1] == 0.0
    assert abs(r[2] - (1 - 1 / 3)) < 1e-12
    assert pd.isna(r[3])
    assert r[4] == 0.0


def test_resize_images_survives_truncated_and_empty_payloads(spark):
    """A truncated BMP header (struct.error, not ValueError) and a valid
    0x0 PPM must both degrade to NULL — never abort the mapInPandas job."""
    from sed_binning_spark.pipeline.multimodal import encode_image_ppm, resize_images

    good = encode_image_ppm(np.full((4, 4, 3), 7, dtype=np.uint8))
    rows = [
        (0, bytearray(good)),
        (1, bytearray(b"BM" + b"\x00" * 8)),      # truncated header
        (2, bytearray(b"P6\n0 0\n255\n")),        # zero-size image
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = resize_images(df, 2, 2).orderBy("media_id").toPandas()
    assert out.loc[0, "payload"] is not None and out.loc[0, "width"] == 2
    assert out.loc[1, "payload"] is None
    assert out.loc[2, "payload"] is None
    assert out.loc[3, "payload"] is None


def test_winnow_blank_docs_have_no_fingerprints(spark):
    """NULL/blank documents must fingerprint as NULL — a shared [md5('')]
    would pair every empty document with every other in any
    fingerprint-overlap similarity join (the rolling_hashes guard)."""
    from sed_binning_spark.pipeline.text import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, " \t "), (4, "real text content here now")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.winnowed
        for r in winnow_fingerprints(df, shingle_window=3, winnow_window=2).collect()
    }
    assert got[1] is None and got[2] is None and got[3] is None
    assert got[4]


# --------------------------------------------------------------------- png
def test_png_roundtrip_all_filters_and_colortypes():
    """decode(encode(x)) recovers the exact raster for every channel
    count (gray / gray+alpha / RGB / RGBA) under every scanline filter
    (0-4, plus a mixed cycle) at both stored and compressed deflate."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        decode_image_png,
        encode_image_png,
    )

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, (5, 7, ch), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            for level in (0, 6):
                got = decode_image_png(
                    encode_image_png(img, filters=filters, level=level),
                )
                assert np.array_equal(got, img), (ch, filters, level)


def test_png_palette_and_known_raster():
    """A hand-built palette (color type 3) PNG resolves through PLTE, and
    the decode-parity raster matches the known-good pixels byte for
    byte."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_image_png,
        decode_payload,
    )

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    raw = b"".join(bytes([0]) + idx[r].tobytes() for r in range(2))
    png = (PNG_SIG + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + _png_chunk(b"PLTE", pal.tobytes())
           + _png_chunk(b"IDAT", zlib.compress(raw))
           + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_image_png(png), pal[idx])
    vec = decode_payload(png, 8)
    assert vec[:4] == [1.0, 2.0, 2.0, 3.0]
    assert vec[7] == pytest.approx(1.0)  # max pixel 255


def test_png_refusals_degrade_to_byte_stats():
    """Unsupported/corrupt PNGs raise loudly from the codec and fall back
    to byte statistics through decode_payload — one bad payload must not
    kill a corpus-wide mapInPandas job."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_image_png,
        decode_payload,
        encode_image_png,
    )

    img = np.zeros((2, 2, 3), np.uint8)
    good = encode_image_png(img)
    # an IHDR relabeled Adam7 over a sequential IDAT layout is CORRUPT
    # (pass geometry disagrees with the stream length) — interlace itself
    # decodes now, so this pins the mismatch detection, not a refusal
    mislabeled = good.replace(
        _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)),
        _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)),
    )
    for bad in (PNG_SIG + b"garbage", good[:30], mislabeled,
                good.replace(b"IDAT", b"IDAX")):
        with pytest.raises((ValueError, zlib.error)):
            decode_image_png(bad)
        assert decode_payload(bad, 8)[0] == 0.0


def test_png_fixture_synthesis_matches_ppm(spark):
    """The expression-built PNG fixture (stored deflate, plan-time adler,
    F.crc32 chunk CRC) is a VALID container: the pure-Python codec decodes
    it to the exact raster the PPM fixture wraps, the payload length is
    the closed form, and the end-to-end mapInPandas features agree."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        decode_image_png,
        decode_image_ppm,
        decode_payload,
        png_fixture_n_bytes,
        synthesize_png_media_from_text,
        synthesize_ppm_media_from_text,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "another document"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    png = {r.media_id: r.payload for r in synthesize_png_media_from_text(df).collect()}
    ppm = {r.media_id: r.payload for r in synthesize_ppm_media_from_text(df).collect()}
    assert png[3] is None
    for mid in (1, 2, 4):
        assert len(png[mid]) == png_fixture_n_bytes(4, 2)
        assert np.array_equal(
            decode_image_png(bytes(png[mid])), decode_image_ppm(bytes(ppm[mid])),
        )
        assert decode_payload(bytes(png[mid]), 8) == decode_payload(bytes(ppm[mid]), 8)


# -------------------------------------------------------------------- jpeg
def test_jpeg_roundtrip_within_quantization_error():
    """Baseline JPEG decode(encode(x)) reconstructs within the lossy
    bound: exact for flat blocks (DC-only spectra), small mean error for
    smooth gradients, bounded error for noise — across 4:4:4, 4:2:0,
    grayscale, non-multiple-of-8 dims, and restart intervals."""
    import numpy as np

    from sed_binning_spark.pipeline.jpeg import (
        decode_image_jpeg,
        encode_image_jpeg,
    )

    rng = np.random.default_rng(3)
    flat = np.zeros((24, 40, 3), np.uint8)
    flat[..., 0], flat[..., 1], flat[..., 2] = 180, 90, 30
    assert np.array_equal(
        decode_image_jpeg(encode_image_jpeg(flat, quality=100)), flat,
    )

    yy, xx = np.meshgrid(np.arange(64), np.arange(48), indexing="ij")
    grad = np.stack([yy * 2, xx * 2, yy + xx], -1).astype(np.uint8)
    for kwds in ({}, {"subsampling": "420"}, {"restart_interval": 3},
                 {"subsampling": "420", "restart_interval": 2}):
        out = decode_image_jpeg(encode_image_jpeg(grad, quality=95, **kwds))
        assert out.shape == grad.shape
        assert np.abs(out.astype(int) - grad.astype(int)).mean() < 2.0, kwds

    noise = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    out = decode_image_jpeg(encode_image_jpeg(noise, quality=90))
    assert out.shape == noise.shape
    assert np.abs(out.astype(int) - noise.astype(int)).mean() < 12.0

    gray = rng.integers(0, 256, (17, 19), dtype=np.uint8)
    out = decode_image_jpeg(encode_image_jpeg(gray, quality=95))
    assert out.shape == (17, 19, 1)
    assert np.abs(out[..., 0].astype(int) - gray.astype(int)).mean() < 8.0


def test_jpeg_restart_stream_equals_plain():
    """DRI/RSTn predictor resets must not change the decoded pixels."""
    import numpy as np

    from sed_binning_spark.pipeline.jpeg import (
        decode_image_jpeg,
        encode_image_jpeg,
    )

    yy, xx = np.meshgrid(np.arange(64), np.arange(48), indexing="ij")
    grad = np.stack([yy * 2, xx * 2, yy + xx], -1).astype(np.uint8)
    plain = decode_image_jpeg(encode_image_jpeg(grad, quality=95))
    with_rst = decode_image_jpeg(
        encode_image_jpeg(grad, quality=95, restart_interval=3),
    )
    assert np.array_equal(plain, with_rst)


def test_jpeg_refusals_and_dispatch():
    """Non-baseline profiles raise ValueError; decode_payload dispatches
    JPEG magic to the codec and degrades corrupt streams to byte stats."""
    import numpy as np

    from sed_binning_spark.pipeline.jpeg import (
        decode_image_jpeg,
        encode_image_jpeg,
    )
    from sed_binning_spark.pipeline.multimodal import decode_payload

    img = np.full((16, 24, 3), 128, np.uint8)
    good = encode_image_jpeg(img)
    vec = decode_payload(good, 8)
    assert vec[:4] == [1.0, 24.0, 16.0, 3.0]
    assert vec[4] == pytest.approx(128.0 / 255.0, abs=1e-2)

    arithmetic = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(ValueError, match="unsupported JPEG profile"):
        decode_image_jpeg(arithmetic)
    # a baseline stream relabeled SOF2 is MALFORMED progressive (its scan
    # header mixes DC and AC bands) — typed refusal, then degradation
    mislabeled = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="mixes DC and AC"):
        decode_image_jpeg(mislabeled)
    for bad in (arithmetic, mislabeled, good[:40], b"\xff\xd8\xff" + b"junk"):
        assert decode_payload(bad, 8)[0] == 0.0


def test_jpeg_12bit_extended_sequential():
    """12-bit JPEG (T.81 extended sequential, SOF1): the encoder emits
    16-bit DQT entries + full-range flat Huffman tables, the decoder
    level-shifts at 2048 and rescales to the uint8 output contract.
    Flat samples at multiples of 273 land on EXACT uint8 values
    (273·k·255/4095 = 17·k); random rasters round-trip within
    quantization error of the rescaled reference; SOF0-relabeled 12-bit
    and 12-bit progressive refuse loudly; dispatch degrades them."""
    import numpy as np

    from sed_binning_spark.pipeline.jpeg import (
        decode_image_jpeg,
        encode_image_jpeg,
    )
    from sed_binning_spark.pipeline.multimodal import decode_payload

    for v12 in (0, 273, 2457, 4095):
        blob = encode_image_jpeg(np.full((16, 16), v12, np.uint16),
                                 precision=12)
        out = decode_image_jpeg(blob)
        assert out.shape == (16, 16, 1)
        assert (out == round(v12 * 255 / 4095)).all()

    rng = np.random.default_rng(5)
    img = rng.integers(0, 4096, (24, 24, 3)).astype(np.uint16)
    blob = encode_image_jpeg(img, precision=12, quality=95)
    ref = np.round(img * (255.0 / 4095.0))
    assert np.abs(decode_image_jpeg(blob).astype(float) - ref).max() <= 2
    # the multimodal featurizer consumes 12-bit JPEGs like any other
    vec = decode_payload(blob, 8)
    assert vec[:4] == [1.0, 24.0, 24.0, 3.0]

    # SOF0 is 8-bit only per T.81; 12-bit progressive is refused until a
    # real fixture exercises that path
    as_sof0 = blob.replace(b"\xff\xc1", b"\xff\xc0", 1)
    with pytest.raises(ValueError, match="12-bit JPEG not supported"):
        decode_image_jpeg(as_sof0)
    as_prog = blob.replace(b"\xff\xc1", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="12-bit JPEG not supported"):
        decode_image_jpeg(as_prog)
    assert decode_payload(as_sof0, 8)[0] == 0.0  # degrades to byte stats
    with pytest.raises(ValueError, match="must lie in"):
        encode_image_jpeg(np.full((8, 8), 4096, np.uint16), precision=12)
    # the range check must run BEFORE the uint16 cast (65536 wraps to 0)
    with pytest.raises(ValueError, match="must lie in"):
        encode_image_jpeg(np.full((8, 8), 65536, np.int64), precision=12)
    with pytest.raises(ValueError, match="must lie in"):
        encode_image_jpeg(np.full((8, 8), -1, np.int64), precision=12)
    # NaN fails BOTH < 0 and > 4095 — the all-in-range phrasing refuses it
    # instead of letting an undefined NaN->uint16 cast through
    with pytest.raises(ValueError, match="must lie in"):
        encode_image_jpeg(np.full((8, 8), np.nan), precision=12)
    # T.81 B.2.4.1: a 16-bit DQT on an 8-BIT frame is spec-invalid — it
    # must refuse, not dequantize 65535-scale entries into a plausible
    # raster. Build it by pairing the 12-bit stream's DQT with an 8-bit
    # SOF0 relabel (prec byte flipped back to 8).
    mixed = bytearray(as_sof0)
    mixed[bytes(as_sof0).index(b"\xff\xc0") + 4] = 8
    with pytest.raises(ValueError, match="16-bit quantization table"):
        decode_image_jpeg(bytes(mixed))
    # a lying DQT precision field names the defect
    bad_pq = bytearray(blob)
    bad_pq[blob.index(b"\xff\xdb") + 4] = 0x20 | 0
    with pytest.raises(ValueError, match="DQT precision"):
        decode_image_jpeg(bytes(bad_pq))


def test_png_decode_budget_refuses_before_allocation():
    """A crafted IHDR declaring a huge raster is refused from the header
    alone (IHDR precedes IDAT), and a deflate bomb whose stream inflates
    past the declared geometry stops at the cap instead of materializing
    its full expansion — both degrade to byte stats via decode_payload."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        _png_chunk,
        PNG_SIG,
        decode_image_png,
        decode_payload,
        encode_image_png,
    )

    # 65535 x 65535 declared: > MAX_PIXELS, refused before any inflate
    huge = (PNG_SIG
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 65535, 65535, 8, 2, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 16))
            + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="decode budget"):
        decode_image_png(huge)
    assert decode_payload(huge, 8)[0] == 0.0

    # declared 2x2 gray but the IDAT stream inflates to ~1 MB: the
    # bounded decompressobj stops at the expected scanline total
    bomb = (PNG_SIG
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 20)))
            + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="inflates past"):
        decode_image_png(bomb)
    assert decode_payload(bomb, 8)[0] == 0.0

    # per-call budget: a valid 4x4 image refuses under max_pixels=8 with
    # the same typed error the featurizer catches
    small = encode_image_png(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="decode budget"):
        decode_image_png(small, max_pixels=8)
    assert decode_image_png(small).shape == (4, 4, 3)


def test_jpeg_sampling_factor_and_budget_validation():
    """Zero SOF sampling factors raise a typed ValueError (not
    ZeroDivisionError deep in MCU geometry), and the per-call pixel
    budget bounds CPU for the featurizer context."""
    import numpy as np

    from sed_binning_spark.pipeline.jpeg import (
        decode_image_jpeg,
        encode_image_jpeg,
    )
    from sed_binning_spark.pipeline import multimodal
    from sed_binning_spark.pipeline.multimodal import decode_payload

    img = np.full((16, 16, 3), 90, np.uint8)
    good = encode_image_jpeg(img)

    # corrupt the SOF component sampling byte to 0x00 (h=v=0)
    sof_at = good.index(b"\xff\xc0")
    body_at = sof_at + 4  # marker + length
    comp0_hv = body_at + 6 + 1  # precision,h16,w16,nc then id
    assert good[comp0_hv] in (0x11, 0x21, 0x22), "fixture layout changed"
    corrupt = good[:comp0_hv] + b"\x00" + good[comp0_hv + 1:]
    with pytest.raises(ValueError, match="sampling factors"):
        decode_image_jpeg(corrupt)
    assert decode_payload(corrupt, 8)[0] == 0.0

    # per-call budget refusal on a valid-but-oversized raster
    with pytest.raises(ValueError, match="decode budget"):
        decode_image_jpeg(good, max_pixels=64)
    assert decode_image_jpeg(good).shape == (16, 16, 3)

    # the featurizer context uses the tight budget: shrink it and the
    # same valid JPEG degrades to byte statistics instead of stalling
    orig = multimodal.FEATURIZER_MAX_PIXELS
    try:
        multimodal.FEATURIZER_MAX_PIXELS = 64
        assert decode_payload(good, 8)[0] == 0.0
    finally:
        multimodal.FEATURIZER_MAX_PIXELS = orig
    assert decode_payload(good, 8)[0] == 1.0


def test_ann_ivf_low_probe_recall_on_clustered_data(spark):
    """The low-probe regime IVF exists for: on clustered embeddings
    (Gaussian blobs — the realistic shape; the embeddings.parquet fixture
    is near-uniform, where low-probe recall is structurally poor), probing
    2 of 8 lists must recover >= 0.9 of the exact top-10 for a query near
    a blob center. This pins centroid training AND probe routing: a
    regression in either (bad seeding, unnormalized centroids, wrong
    argsort direction) collapses recall long before the full-probe
    hash-equality test notices."""
    from sed_binning_spark.pipeline.similarity import (
        cosine_topk,
        ivf_topk,
        ivf_train_centroids,
    )

    rng = np.random.default_rng(1234)
    dim, per = 16, 250
    centers = rng.normal(size=(8, dim)) * 4.0
    rows = []
    for b, c in enumerate(centers):
        pts = c + rng.normal(size=(per, dim)) * 0.3
        rows += [(b * per + i, pts[i].tolist()) for i in range(per)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = ivf_train_centroids(df, n_lists=8, sample_size=1024, seed=5)
    # a query just off the third blob's center
    q = (centers[3] + rng.normal(size=dim) * 0.1).tolist()
    brute = cosine_topk(df, q, k=10).toPandas()
    for n_probes, floor in ((1, 0.9), (2, 0.9)):
        ivf = ivf_topk(df, cents, q, k=10, n_probes=n_probes).toPandas()
        recall = len(set(ivf.vec_id) & set(brute.vec_id)) / 10
        assert recall >= floor, (n_probes, recall)


def test_ivf_pq_composition_recall_and_plan(spark):
    """ivf_pq_topk — the production IVF routing × PQ scoring composition —
    on the clustered fixture under the documented COSINE posture (corpus
    L2-normalized before encoding, so PQ's L2 order is exactly reversed
    cosine order): probing 2 of 8 lists with byte codes must still
    recover >= 0.9 of the exact top-10 (a wider k=50 re-rank pool, the
    documented PQ-resolution posture). Plan pin: with the list and code
    columns PRECOMPUTED, the probe is a plain column predicate — the
    physical plan contains exactly ONE Python stage (the pq_topk scorer)
    and the ivf_list filter sits below it, so a 1-of-N probe never
    scores the unprobed corpus."""
    from sed_binning_spark.pipeline.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_pq_topk,
        ivf_train_centroids,
        pq_encode,
        pq_topk,
        pq_train,
    )

    rng = np.random.default_rng(1234)
    dim, per = 16, 250
    centers = rng.normal(size=(8, dim)) * 4.0
    rows = []
    for b, c in enumerate(centers):
        pts = c + rng.normal(size=(per, dim)) * 0.3
        pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        rows += [(b * per + i, pts[i].tolist()) for i in range(per)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = ivf_train_centroids(df, n_lists=8, sample_size=1024, seed=5)
    model = pq_train(df, m=4, codes=16, sample_size=1024, seed=5)
    qv = centers[3] + rng.normal(size=dim) * 0.1
    q = (qv / np.linalg.norm(qv)).tolist()
    brute = cosine_topk(df, q, k=10).toPandas()

    # the persisted layout: list + code columns materialized up front
    stored = pq_encode(ivf_assign(df, cents), model).cache()

    # composition exactness: probing EVERY list must reproduce the
    # full-corpus PQ ranking row-for-row (same distances, same vec_id
    # tie-break) — the routing/filter machinery adds nothing and loses
    # nothing at full probe
    full_probe = ivf_pq_topk(stored, cents, model, q, k=50, n_probes=8)
    full_pq = pq_topk(stored, model, q, k=50)
    assert [tuple(r) for r in full_probe.collect()] \
        == [tuple(r) for r in full_pq.collect()]

    # low-probe recall, the documented posture: a 16-code codebook cannot
    # separate points INSIDE one tight blob (they share a code and tie on
    # vec_id), so take a candidate pool wide enough to hold the tie class
    # and exact-re-rank the survivors' float vectors — the pool is cheap
    # (byte lookups over ~2/8 of the corpus), the re-rank touches only
    # pool-sized data
    cand = ivf_pq_topk(stored, cents, model, q, k=250, n_probes=2) \
        .select("vec_id")
    rerank = cosine_topk(df.join(cand, "vec_id"), q, k=10).toPandas()
    recall = len(set(rerank.vec_id) & set(brute.vec_id)) / 10
    assert recall >= 0.9, recall

    plan = ivf_pq_topk(
        stored, cents, model, q, k=50, n_probes=2,
    )._jdf.queryExecution().executedPlan().toString()
    # only the query-time subtree counts: the cached corpus's own build
    # plan (assign+encode, below InMemoryRelation) prints nested in it
    query_plan = plan.split("InMemoryRelation")[0]
    assert query_plan.count("ArrowEvalPython") \
        + query_plan.count("BatchEvalPython") == 1, plan
    # the probe predicate is pushed INTO the cached-relation scan, below
    # the single scoring UDF stage (plan trees print top-down)
    scan_at = query_plan.index("InMemoryTableScan")
    assert "ivf_list" in query_plan[scan_at:], plan
    udf_at = query_plan.index("ArrowEvalPython") \
        if "ArrowEvalPython" in query_plan \
        else query_plan.index("BatchEvalPython")
    assert udf_at < scan_at, plan
    stored.unpersist()


def test_jpeg_progressive_exact_parity_with_baseline():
    """Progressive (SOF2) and baseline encodings of the same image at the
    same quality carry IDENTICAL quantized coefficients, so their decodes
    must agree byte-for-byte — across subsampling layouts (non-interleaved
    scans walk each component's own block grid), restart intervals (DC
    predictor and EOB-run resets), spectral bands, both successive-
    approximation refinement levels, and the cross-block EOB-run path
    (flat images collapse whole AC bands to zero)."""
    import numpy as np

    from sed_binning_spark.pipeline.jpeg import (
        decode_image_jpeg,
        encode_image_jpeg,
        encode_image_jpeg_progressive,
    )

    rng = np.random.default_rng(42)
    cases = [
        ((np.clip(rng.normal(128, 50, (24, 33, 3)), 0, 255)).astype(np.uint8),
         75, "444", 0),
        ((np.clip(rng.normal(128, 50, (17, 16, 3)), 0, 255)).astype(np.uint8),
         30, "420", 0),
        ((np.clip(rng.normal(128, 50, (40, 56, 3)), 0, 255)).astype(np.uint8),
         95, "420", 3),
        ((rng.integers(0, 256, (7, 9, 3))).astype(np.uint8), 60, "420", 2),
        (np.full((32, 48), 130, np.uint8), 85, "444", 0),   # EOB runs > 1
        (np.full((32, 48), 130, np.uint8), 85, "444", 4),   # ...across RSTs
        (np.array([[[200, 10, 30]]], np.uint8), 90, "444", 0),
    ]
    for img, q, sub, ri in cases:
        base = decode_image_jpeg(encode_image_jpeg(
            img, quality=q, subsampling=sub, restart_interval=ri,
        ))
        prog = decode_image_jpeg(encode_image_jpeg_progressive(
            img, quality=q, subsampling=sub, restart_interval=ri,
        ))
        assert np.array_equal(base, prog), (img.shape, q, sub, ri)


def test_jpeg_progressive_malformed_degrades():
    """Corrupt progressive payloads raise typed errors from the codec and
    degrade to byte statistics through decode_payload — same posture as
    the baseline and PNG paths."""
    import numpy as np

    from sed_binning_spark.pipeline.jpeg import (
        decode_image_jpeg, encode_image_jpeg_progressive,
    )
    from sed_binning_spark.pipeline.multimodal import decode_payload

    img = (np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3))
    good = encode_image_jpeg_progressive(img, quality=80)
    assert decode_payload(good, 8)[0] == 1.0

    # truncate mid-scan: the bit reader pads past the end, producing
    # either garbage Huffman codes or a short coefficient store — both
    # typed failures, never a crash
    for cut in (len(good) // 3, len(good) // 2, len(good) - 10):
        assert decode_payload(good[:cut], 8)[0] in (0.0, 1.0)

    # a scan header mixing DC and AC bands (Ss=0, Se=63) refuses loudly
    sos_at = good.index(b"\xff\xda")
    (slen,) = struct.unpack_from(">H", good, sos_at + 2)
    hdr = bytearray(good[sos_at : sos_at + 2 + slen])
    hdr[-3], hdr[-2] = 0, 63
    bad = good[:sos_at] + bytes(hdr) + good[sos_at + 2 + slen:]
    with pytest.raises(ValueError, match="mixes DC and AC"):
        decode_image_jpeg(bad)
    assert decode_payload(bad, 8)[0] == 0.0


def test_png_interlaced_and_16bit_roundtrip():
    """Adam7 passes round-trip exactly for every color type, filter, and
    raster small enough to empty some passes; 16-bit samples reduce to
    their high byte (values of the form v*257 survive exactly), plain and
    interlaced."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        decode_image_png, encode_image_png,
    )

    rng = np.random.default_rng(3)
    for shape in ((1, 1, 1), (2, 2, 3), (3, 3, 4), (5, 7, 2), (9, 13, 1),
                  (16, 17, 4)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for filt in ([0], [4], [0, 1, 2, 3, 4]):
            got = decode_image_png(
                encode_image_png(img, filters=filt, interlace=True),
            )
            assert np.array_equal(got, img), (shape, filt)
        im16 = img.astype(np.uint16) * 257
        for inter in (False, True):
            got = decode_image_png(
                encode_image_png(im16, filters=[0, 4], interlace=inter),
            )
            assert np.array_equal(got, img), (shape, inter)
    # interlaced parity with the sequential container on the same raster
    img = rng.integers(0, 256, (24, 31, 3)).astype(np.uint8)
    a = decode_image_png(encode_image_png(img))
    b = decode_image_png(encode_image_png(img, interlace=True))
    assert np.array_equal(a, b)
    # 16-bit high-byte reduction is truncation: low-byte noise vanishes
    noisy = (img.astype(np.uint16) << 8) | rng.integers(0, 256, img.shape)
    assert np.array_equal(
        decode_image_png(encode_image_png(noisy.astype(np.uint16))), img,
    )
    # sub-byte depths are legal ONLY for grayscale/palette: a crafted
    # 4-bit TRUECOLOR header refuses loudly (16-bit palette likewise)
    from sed_binning_spark.pipeline.multimodal import _png_chunk, PNG_SIG
    bad = (PNG_SIG
           + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0))
           + _png_chunk(b"IDAT", zlib.compress(b"\x00\x11" * 2))
           + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="only legal for grayscale"):
        decode_image_png(bad)


def test_png_low_bit_depth_roundtrip():
    """1/2/4-bit grayscale rescales exactly (255/(2^d - 1) is integral)
    and 1/2/4/8-bit palette resolves through PLTE — sequential and Adam7,
    every filter, including rasters whose pass rows pack to partial
    bytes. This closes the PNG bit-depth matrix: every legal
    depth x color-type combination now decodes."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        decode_image_png, encode_image_png,
    )

    rng = np.random.default_rng(9)
    for depth in (1, 2, 4):
        scale = 255 // ((1 << depth) - 1)
        for shape in ((1, 1), (2, 3), (9, 13)):
            v = rng.integers(0, 1 << depth, shape).astype(np.uint8)
            for inter in (False, True):
                got = decode_image_png(encode_image_png(
                    v, filters=[0, 1, 2, 3, 4], interlace=inter,
                    bit_depth=depth,
                ))
                assert np.array_equal(got, (v * scale)[..., None]), \
                    (depth, shape, inter)
    for depth in (1, 2, 4, 8):
        npal = 1 << depth
        pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
        idx = rng.integers(0, npal, (9, 13)).astype(np.uint8)
        for inter in (False, True):
            got = decode_image_png(encode_image_png(
                idx, palette=pal, bit_depth=depth, interlace=inter,
                filters=[0, 2],
            ))
            assert np.array_equal(got, pal[idx]), (depth, inter)
    # auto bit depth picks the smallest that fits the palette
    auto = encode_image_png(np.array([[0, 3]], np.uint8),
                            palette=pal[:4])
    assert auto[24] == 2  # IHDR bit-depth byte
    # out-of-range samples refuse at encode time
    with pytest.raises(ValueError, match="out of range"):
        encode_image_png(np.array([[4]], np.uint8), bit_depth=2)


def test_jpeg_adversarial_tables_and_scan_floods_stay_typed():
    """Regression (round-10 review): a Huffman table mapping a code to an
    out-of-range magnitude category must raise ValueError — not build a
    2^200 Python int whose int32 store raises OverflowError past the
    featurizer's degrade tuple — and a payload packing hundreds of
    ~20-byte EOB-only scans must refuse rather than stall a task (the
    pixel budget alone does not bound progressive CPU)."""
    import numpy as np

    from sed_binning_spark.pipeline.jpeg import (
        decode_image_jpeg,
        encode_image_jpeg,
        encode_image_jpeg_progressive,
    )
    from sed_binning_spark.pipeline.multimodal import decode_payload

    img = np.full((16, 16, 3), 90, np.uint8)
    for enc in (encode_image_jpeg, encode_image_jpeg_progressive):
        good = enc(img)
        i = good.index(b"\xff\xc4")
        bad = bytearray(good)
        bad[i + 4 + 17] = 200  # DC values[0]: what category-0 codes map to
        with pytest.raises(ValueError, match="category 200"):
            decode_image_jpeg(bytes(bad))
        assert decode_payload(bytes(bad), 8)[0] == 0.0

    good = encode_image_jpeg_progressive(img)
    sos, eoi = good.index(b"\xff\xda"), good.rindex(b"\xff\xd9")
    flood = good[:eoi] + good[sos:eoi] * 200 + b"\xff\xd9"
    with pytest.raises(ValueError, match="progressive scans"):
        decode_image_jpeg(flood)
    assert decode_payload(flood, 8)[0] == 0.0

    # repeating the whole SOF+scan block must not reset the scan cap
    # (T.81 allows one frame per image; a second SOF refuses)
    sof = good.index(b"\xff\xc2")
    (slen,) = struct.unpack_from(">H", good, sof + 2)
    sof_flood = (good[:eoi]
                 + (good[sof : sof + 2 + slen] + good[sos:eoi]) * 40
                 + b"\xff\xd9")
    with pytest.raises(ValueError, match="multiple SOF"):
        decode_image_jpeg(sof_flood)
    assert decode_payload(sof_flood, 8)[0] == 0.0


def test_wav_format_matrix_roundtrips():
    """decode_audio_wav covers the real audio-corpus container matrix —
    8/16/24/32-bit PCM, float32/float64, WAVE_FORMAT_EXTENSIBLE — all
    rescaled to the int16 featurizer contract; float specials (NaN/inf)
    clamp instead of poisoning the stats; unknown codes degrade."""
    import struct as st

    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        decode_audio_wav, decode_payload, encode_audio_wav,
    )

    rng = np.random.default_rng(6)
    # -32767 floor, NOT -32768: the float fixtures encode s/32767, so
    # full-scale-negative would land at -1.0000305, clip, and decode to
    # -32767 — a seed-dependent off-by-one trap for the exact set
    base = rng.integers(-32767, 32768, (400, 2)).astype(np.int16)
    exact = {"pcm16", "ext-pcm16", "pcm24", "pcm32", "float64"}
    for fmt in ("pcm16", "ext-pcm16", "pcm24", "pcm32", "pcm8",
                "float32", "float64"):
        got, rate = decode_audio_wav(encode_audio_wav(base, 22050, fmt=fmt))
        assert rate == 22050 and got.shape == base.shape, fmt
        err = np.abs(got.astype(int) - base.astype(int)).max()
        assert err == 0 if fmt in exact else err <= 256, (fmt, err)
        vec = decode_payload(encode_audio_wav(base, 22050, fmt=fmt), 8)
        assert vec[0] == 2.0 and vec[1] == 400.0 and vec[2] == 22050.0, fmt

    f = bytearray(encode_audio_wav(base[:4], 8000, fmt="float32"))
    f[-16:-12] = st.pack("<f", float("nan"))
    got, _ = decode_audio_wav(bytes(f))
    assert got.ravel()[-4] == 0  # NaN -> silence, not a poisoned mean

    bad = bytearray(encode_audio_wav(base, 8000))
    st.pack_into("<H", bad, bad.index(b"fmt ") + 8 + 14, 12)  # 12-bit PCM
    with pytest.raises(ValueError, match="bit depth"):
        decode_audio_wav(bytes(bad))
    assert decode_payload(bytes(bad), 8)[0] == 0.0


def test_g711_telephony_wav():
    """ITU-T G.711 μ-law/A-law (WAV format tags 7/6): the 256-entry
    expansion tables hit the canonical endpoint values, match the
    inlined audioop-derived literals bit-for-bit, values in the decode
    image survive compress→expand exactly, arbitrary int16 compands
    within half the widest quantization step, and the full WAV container
    path (encode_audio_wav → decode_audio_wav → decode_payload) treats
    both laws as first-class audio. Non-8-bit G.711 refuses."""
    import struct as st

    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.multimodal import (
        _g711_compress, _g711_table, decode_audio_wav, decode_payload,
        encode_audio_wav,
    )

    u, a = _g711_table(7), _g711_table(6)
    # canonical pins straight from the public reference arithmetic
    assert (u[0x00], u[0x7F], u[0xFF], u[0x80]) == (-32124, 0, 0, 32124)
    assert (a[0x55], a[0xD5], a[0x2A], a[0xAA]) == (-8, 8, -32256, 32256)
    # the full 256-entry expansion tables, inlined as literals: these
    # were generated once from the stdlib's audioop (ulaw2lin/alaw2lin,
    # removed in Python 3.13) and are the deterministic ITU-T G.711
    # expansion values — an interpreter upgrade cannot silently drop
    # this cross-check the way a guarded `import audioop` would
    _ULAW_REF = [
        -32124, -31100, -30076, -29052, -28028, -27004, -25980,
        -24956, -23932, -22908, -21884, -20860, -19836, -18812,
        -17788, -16764, -15996, -15484, -14972, -14460, -13948,
        -13436, -12924, -12412, -11900, -11388, -10876, -10364,
        -9852, -9340, -8828, -8316, -7932, -7676, -7420, -7164,
        -6908, -6652, -6396, -6140, -5884, -5628, -5372, -5116,
        -4860, -4604, -4348, -4092, -3900, -3772, -3644, -3516,
        -3388, -3260, -3132, -3004, -2876, -2748, -2620, -2492,
        -2364, -2236, -2108, -1980, -1884, -1820, -1756, -1692,
        -1628, -1564, -1500, -1436, -1372, -1308, -1244, -1180,
        -1116, -1052, -988, -924, -876, -844, -812, -780, -748,
        -716, -684, -652, -620, -588, -556, -524, -492, -460, -428,
        -396, -372, -356, -340, -324, -308, -292, -276, -260, -244,
        -228, -212, -196, -180, -164, -148, -132, -120, -112, -104,
        -96, -88, -80, -72, -64, -56, -48, -40, -32, -24, -16, -8,
        0, 32124, 31100, 30076, 29052, 28028, 27004, 25980, 24956,
        23932, 22908, 21884, 20860, 19836, 18812, 17788, 16764,
        15996, 15484, 14972, 14460, 13948, 13436, 12924, 12412,
        11900, 11388, 10876, 10364, 9852, 9340, 8828, 8316, 7932,
        7676, 7420, 7164, 6908, 6652, 6396, 6140, 5884, 5628, 5372,
        5116, 4860, 4604, 4348, 4092, 3900, 3772, 3644, 3516, 3388,
        3260, 3132, 3004, 2876, 2748, 2620, 2492, 2364, 2236, 2108,
        1980, 1884, 1820, 1756, 1692, 1628, 1564, 1500, 1436, 1372,
        1308, 1244, 1180, 1116, 1052, 988, 924, 876, 844, 812, 780,
        748, 716, 684, 652, 620, 588, 556, 524, 492, 460, 428, 396,
        372, 356, 340, 324, 308, 292, 276, 260, 244, 228, 212, 196,
        180, 164, 148, 132, 120, 112, 104, 96, 88, 80, 72, 64, 56,
        48, 40, 32, 24, 16, 8, 0,
    ]
    _ALAW_REF = [
        -5504, -5248, -6016, -5760, -4480, -4224, -4992, -4736,
        -7552, -7296, -8064, -7808, -6528, -6272, -7040, -6784,
        -2752, -2624, -3008, -2880, -2240, -2112, -2496, -2368,
        -3776, -3648, -4032, -3904, -3264, -3136, -3520, -3392,
        -22016, -20992, -24064, -23040, -17920, -16896, -19968,
        -18944, -30208, -29184, -32256, -31232, -26112, -25088,
        -28160, -27136, -11008, -10496, -12032, -11520, -8960,
        -8448, -9984, -9472, -15104, -14592, -16128, -15616, -13056,
        -12544, -14080, -13568, -344, -328, -376, -360, -280, -264,
        -312, -296, -472, -456, -504, -488, -408, -392, -440, -424,
        -88, -72, -120, -104, -24, -8, -56, -40, -216, -200, -248,
        -232, -152, -136, -184, -168, -1376, -1312, -1504, -1440,
        -1120, -1056, -1248, -1184, -1888, -1824, -2016, -1952,
        -1632, -1568, -1760, -1696, -688, -656, -752, -720, -560,
        -528, -624, -592, -944, -912, -1008, -976, -816, -784, -880,
        -848, 5504, 5248, 6016, 5760, 4480, 4224, 4992, 4736, 7552,
        7296, 8064, 7808, 6528, 6272, 7040, 6784, 2752, 2624, 3008,
        2880, 2240, 2112, 2496, 2368, 3776, 3648, 4032, 3904, 3264,
        3136, 3520, 3392, 22016, 20992, 24064, 23040, 17920, 16896,
        19968, 18944, 30208, 29184, 32256, 31232, 26112, 25088,
        28160, 27136, 11008, 10496, 12032, 11520, 8960, 8448, 9984,
        9472, 15104, 14592, 16128, 15616, 13056, 12544, 14080,
        13568, 344, 328, 376, 360, 280, 264, 312, 296, 472, 456,
        504, 488, 408, 392, 440, 424, 88, 72, 120, 104, 24, 8, 56,
        40, 216, 200, 248, 232, 152, 136, 184, 168, 1376, 1312,
        1504, 1440, 1120, 1056, 1248, 1184, 1888, 1824, 2016, 1952,
        1632, 1568, 1760, 1696, 688, 656, 752, 720, 560, 528, 624,
        592, 944, 912, 1008, 976, 816, 784, 880, 848,
    ]
    np.testing.assert_array_equal(u, _ULAW_REF)
    np.testing.assert_array_equal(a, _ALAW_REF)

    rng = np.random.default_rng(11)
    base = rng.integers(-32767, 32768, (300, 2)).astype(np.int16)
    for law, fmt, tab in ((7, "ulaw", u), (6, "alaw", a)):
        # exact round-trip on the decode image
        np.testing.assert_array_equal(
            tab[_g711_compress(tab.astype(np.int16), law)], tab)
        blob = encode_audio_wav(base, 8000, fmt=fmt)
        got, rate = decode_audio_wav(blob)
        assert rate == 8000 and got.shape == base.shape
        # nearest-code companding: error <= max(half the widest step
        # (1024/2), the clamp past the top code — 32767-32124=643 for
        # μ-law, 32767-32256=511 for A-law)
        assert np.abs(got.astype(int) - base.astype(int)).max() <= 643
        vec = decode_payload(blob, 8)
        assert vec[0] == 2.0 and vec[1] == 300.0 and vec[2] == 8000.0

    bad = bytearray(encode_audio_wav(base, 8000, fmt="ulaw"))
    st.pack_into("<H", bad, bad.index(b"fmt ") + 8 + 14, 16)
    with pytest.raises(ValueError, match="codes are 8-bit"):
        decode_audio_wav(bytes(bad))
    assert decode_payload(bytes(bad), 8)[0] == 0.0  # degrades, not dies


def test_ima_adpcm_wav():
    """IMA/DVI ADPCM (WAV format tag 0x11): the block-parallel decoder's
    nibble recursion matches audioop's DVI implementation bit-for-bit on
    a known state, encode→decode tracks smooth signals within the 4-bit
    slope limit, the fact chunk trims final-block padding to the exact
    input length, stereo interleaves 4-byte channel groups, a trailing
    partial block yields its partial sample count, and malformed
    geometry refuses loudly (then degrades to byte stats)."""
    import struct as st

    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.multimodal import (
        _ima_adpcm_decode, decode_audio_wav, decode_payload,
        encode_audio_wav,
    )

    # one mono block with a known header state and 16 known codes,
    # cross-checked against audioop.adpcm2lin (same IMA recursion,
    # high-nibble-first packing) while the stdlib still ships it
    codes = [3, 8, 15, 0, 7, 12, 1, 9, 4, 11, 2, 14, 5, 10, 6, 13]
    block = st.pack("<hBB", 100, 20, 0) + bytes(
        codes[i] | (codes[i + 1] << 4) for i in range(0, 16, 2))
    got = _ima_adpcm_decode(block, 1, len(block), 17).ravel()
    assert got[0] == 100  # header predictor IS sample 0
    expected = [143, 138, 62, 73, 223, 29, 107, 37, 231, 49, 167, -113,
                308, 28, 691, -304]
    np.testing.assert_array_equal(got[1:], expected)
    # (the `expected` literals above were cross-checked once against
    # audioop.adpcm2lin — removed in Python 3.13, so the literals ARE
    # the independent pin now, not a guarded import)

    t = np.arange(5000)
    mono = (3000 * np.sin(t / 20) + 500 * np.sin(t / 3)).astype(np.int16)
    blob = encode_audio_wav(mono, 8000, fmt="ima4")
    dec, rate = decode_audio_wav(blob)
    assert rate == 8000
    assert dec.shape == (5000, 1)  # fact trims the final-block pad
    assert np.abs(dec.ravel().astype(int) - mono.astype(int)).max() < 2000
    vec = decode_payload(blob, 8)
    assert vec[0] == 2.0 and vec[1] == 5000.0 and vec[2] == 8000.0

    stereo = np.stack(
        [mono, (2000 * np.cos(t / 15)).astype(np.int16)], axis=1)
    dec2, _ = decode_audio_wav(encode_audio_wav(stereo, 22050, fmt="ima4"))
    assert dec2.shape == (5000, 2)
    assert np.abs(dec2.astype(int) - stereo.astype(int)).max() < 2000

    # no fact chunk + trailing partial block: the partial byte count
    # alone determines the sample count ((12-4)*2+1 = 17 extra samples)
    full = _ima_adpcm_decode(block + block[:12], 1, len(block), 17)
    assert full.shape == (34, 1)

    with pytest.raises(ValueError, match="block align"):
        _ima_adpcm_decode(block, 1, 6, 5)  # header + no whole group
    with pytest.raises(ValueError, match="at most"):
        _ima_adpcm_decode(block, 1, len(block), 99)
    bad = bytearray(blob)
    st.pack_into("<H", bad, bad.index(b"fmt ") + 8 + 14, 8)  # 8-bit codes
    with pytest.raises(ValueError, match="codes are 4-bit"):
        decode_audio_wav(bytes(bad))
    assert decode_payload(bytes(bad), 8)[0] == 0.0


def test_transcode_audio(spark):
    """transcode_audio — the normalize-everything corpus step: stereo
    44.1 kHz float input comes out mono 16 kHz PCM16; an integral-ratio
    downsample with aligned phase picks EXACT source samples (linear
    interpolation at integer positions); a G.711 input re-encodes
    through the int16 contract; NULL/non-audio/undecodable payloads
    yield NULL-payload rows with the id preserved; an unknown target
    format fails PLAN construction, not per-row."""
    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.multimodal import (
        decode_audio_wav, encode_audio_wav, transcode_audio,
    )

    t = np.arange(44100)
    stereo = np.stack([(3000 * np.sin(t / 30)).astype(np.int16),
                       (1000 * np.cos(t / 7)).astype(np.int16)], axis=1)
    rows = [
        (1, bytearray(encode_audio_wav(stereo, 44100, fmt="float32"))),
        (2, None),
        (3, bytearray(b"not audio at all")),
        (4, bytearray(encode_audio_wav(
            stereo[:8000, 0], 8000, fmt="ulaw"))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in
           transcode_audio(df, target_rate=16000, mono=True).collect()}
    assert got[2].payload is None and got[3].payload is None
    assert (got[1].sample_rate, got[1].n_samples, got[1].n_channels) \
        == (16000, 16000, 1)
    dec, rate = decode_audio_wav(bytes(got[1].payload))
    assert rate == 16000 and dec.shape == (16000, 1)
    # mono downmix then resample ~ the mean signal within interp error
    ref = np.round(stereo.astype(np.float64).mean(axis=1))
    assert abs(float(dec[0, 0]) - ref[0]) <= 1
    g = got[4]
    assert (g.sample_rate, g.n_channels) == (16000, 1)

    # integral-ratio phase-aligned downsample = exact source picks
    sig = np.arange(-4000, 4000, 500, dtype=np.int16)  # 16 samples
    df2 = spark.createDataFrame(
        [(7, bytearray(encode_audio_wav(sig, 1000, fmt="pcm16")))],
        "media_id long, payload binary",
    )
    out = transcode_audio(df2, target_rate=500).collect()[0]
    dec2, rate2 = decode_audio_wav(bytes(out.payload))
    assert rate2 == 500
    np.testing.assert_array_equal(dec2.ravel(), sig[::2])

    with pytest.raises(ValueError, match="unknown WAV fixture format"):
        transcode_audio(df, fmt="opus")
    with pytest.raises(ValueError, match="target_rate"):
        transcode_audio(df, target_rate=0)


def test_ms_adpcm_wav():
    """Microsoft ADPCM (WAV format tag 2): the block-parallel decoder
    matches an independent scalar transcription of the published
    recursion (two-tap predictor, C-style truncating /256, delta
    adaptation with the 16 floor) nibble for nibble, the header's
    iSamp2/iSamp1 are the first two output samples verbatim, stereo
    alternates channels per nibble, encode→decode tracks smooth
    signals, out-of-range predictor indexes refuse, and malformed
    geometry degrades to byte stats."""
    import struct as st

    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.multimodal import (
        _MS_ADAPT, _MS_COEFS, _ms_adpcm_decode, decode_audio_wav,
        decode_payload, encode_audio_wav,
    )

    # one mono block, predictor 1 (coeffs 512, -256), known state, the
    # scalar reference below is written directly from the spec text
    codes = [1, 15, 7, 8, 0, 12, 3, 10, 5, 14, 2, 9, 6, 11, 4, 13]
    block = st.pack("<Bhhh", 1, 40, 150, -60) + bytes(
        (codes[i] << 4) | codes[i + 1] for i in range(0, 16, 2))
    got = _ms_adpcm_decode(block, 1, len(block), 18).ravel()
    assert got[0] == -60 and got[1] == 150  # iSamp2 then iSamp1

    def trunc256(x):
        return int(abs(x)) // 256 * (1 if x >= 0 else -1)

    s2, s1, delta = -60, 150, 40
    ref = []
    for c in codes:
        signed = c - 16 if c >= 8 else c
        pred = trunc256(s1 * 512 + s2 * (-256)) + signed * delta
        pred = max(-32768, min(32767, pred))
        ref.append(pred)
        s2, s1 = s1, pred
        delta = max(16, int(_MS_ADAPT[c]) * delta // 256)
    np.testing.assert_array_equal(got[2:], ref)

    t = np.arange(5000)
    mono = (3000 * np.sin(t / 20) + 500 * np.sin(t / 3)).astype(np.int16)
    blob = encode_audio_wav(mono, 8000, fmt="ms2")
    dec, rate = decode_audio_wav(blob)
    assert rate == 8000 and dec.shape == (5000, 1)  # fact-trimmed
    assert np.abs(dec.ravel().astype(int) - mono.astype(int)).max() < 500
    vec = decode_payload(blob, 8)
    assert vec[0] == 2.0 and vec[1] == 5000.0

    stereo = np.stack(
        [mono, (2000 * np.cos(t / 15)).astype(np.int16)], axis=1)
    dec2, _ = decode_audio_wav(encode_audio_wav(stereo, 22050, fmt="ms2"))
    assert dec2.shape == (5000, 2)
    assert np.abs(dec2.astype(int) - stereo.astype(int)).max() < 500

    bad_pred = st.pack("<Bhhh", 9, 40, 150, -60) + b"\x00" * 8
    with pytest.raises(ValueError, match="predictor index"):
        _ms_adpcm_decode(bad_pred, 1, len(bad_pred), 18)
    with pytest.raises(ValueError, match="block align"):
        _ms_adpcm_decode(block, 1, 7, 2)
    with pytest.raises(ValueError, match="at most"):
        _ms_adpcm_decode(block, 1, len(block), 99)
    assert len(_MS_COEFS) == 7  # the fmt extension writes all seven


def test_gif_known_raster_and_composition():
    """Pointwise GIF pins: a hand-checkable raster round-trips, a frame
    smaller than the logical screen composes over the global background
    color, local palettes override the global one, and transparency
    produces an alpha channel with 0 only at the transparent index."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        decode_image_gif, encode_image_gif,
    )

    red, blue = (255, 0, 0), (0, 0, 255)
    img = np.zeros((2, 3, 3), np.uint8)
    img[0] = red
    img[1] = blue
    got = decode_image_gif(encode_image_gif(img))
    np.testing.assert_array_equal(got, img)

    # offset frame on a larger screen: outside the frame = background,
    # which is palette entry 0 — np.unique sorts rows, so blue (0,0,255)
    # sorts before red (255,0,0)
    blob = encode_image_gif(img, frame_offset=(2, 1), screen_size=(6, 4))
    got = decode_image_gif(blob)
    assert got.shape == (4, 6, 3)
    np.testing.assert_array_equal(got[1:3, 2:5], img)
    np.testing.assert_array_equal(got[0, 0], np.array(blue, np.uint8))
    np.testing.assert_array_equal(got[3, :], np.tile(blue, (6, 1)))

    # local palette: colors still reconstruct exactly
    got = decode_image_gif(encode_image_gif(img, local_palette=True))
    np.testing.assert_array_equal(got, img)

    # transparency: RGBA out, alpha 0 exactly on the transparent color
    got = decode_image_gif(encode_image_gif(img, transparent_color=red))
    assert got.shape == (2, 3, 4)
    assert (got[0, :, 3] == 0).all() and (got[1, :, 3] == 255).all()
    np.testing.assert_array_equal(got[..., :3], img)


def test_gif_refusals_degrade_to_byte_stats():
    """Malformed/oversized GIFs raise typed ValueError at the codec and
    degrade to kind-0 byte statistics through decode_payload — a crafted
    payload cannot kill the featurizer job."""
    import struct

    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.multimodal import (
        decode_image_gif, decode_payload, encode_image_gif,
    )

    img = np.full((3, 3, 3), 7, np.uint8)
    good = encode_image_gif(img)

    oversized = b"GIF89a" + struct.pack("<HHBBB", 60000, 60000, 0, 0, 0)
    with pytest.raises(ValueError, match="decode budget"):
        decode_image_gif(oversized)
    truncated = good[: len(good) // 2]
    with pytest.raises(ValueError):
        decode_image_gif(truncated)
    no_palette = bytearray(good)
    # clear the GCT flag but keep the table bytes: frame then has no palette
    no_palette[10] &= 0x7F
    zero_size = b"GIF89a" + struct.pack("<HHBBB", 0, 5, 0, 0, 0)
    for bad in (oversized, truncated, bytes(no_palette), zero_size,
                b"GIF89a", good[:13]):
        vec = decode_payload(bad, 8)
        assert vec[0] == 0.0, bad[:16]
    # the good payload still classifies as an image after all that
    assert decode_payload(good, 8)[0] == 1.0


def test_gif_animation_timeline_and_compositing():
    """decode_gif_frames walks the WHOLE animation with GIF89a §23
    semantics: cumulative start times from GCE delays, transparency
    showing the previous canvas through, disposal 2 restoring the frame
    rect to background and disposal 3 restoring the pre-frame canvas;
    single-frame output equals decode_image_gif's RGB composition."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        decode_gif_frames, decode_image_gif, encode_gif_animation,
        encode_image_gif,
    )

    f0 = np.full((4, 6, 3), 10, np.uint8)
    f1 = np.full((2, 3, 3), 200, np.uint8)
    f1[0, 0] = (1, 2, 3)
    f2 = np.full((4, 6, 3), 77, np.uint8)
    data = encode_gif_animation([
        dict(img=f0, delay_ms=20),
        dict(img=f1, left=2, top=1, delay_ms=30, disposal=2,
             transparent_color=(1, 2, 3)),
        dict(img=f2, delay_ms=40, disposal=1),
    ], screen_size=(6, 4), background=(9, 9, 9))
    frames = decode_gif_frames(data)
    assert [f[0] for f in frames] == [0, 20, 50]      # cumulative starts
    assert [f[1] for f in frames] == [20, 30, 40]     # per-frame delays
    c0, c1, c2 = (f[2] for f in frames)
    assert (c0 == 10).all()
    # transparent pixel shows frame 0's canvas; opaque pixels paint over
    assert (c1[1, 2] == 10).all() and (c1[1, 3] == 200).all()
    assert (c1[0, 0] == 10).all()
    assert (c2 == 77).all()

    # disposal 2: the SMALL third frame leaves the restored-to-background
    # rectangle visible where frame 1 had painted
    small = np.full((1, 1, 3), 55, np.uint8)
    fr = decode_gif_frames(encode_gif_animation([
        dict(img=f0, delay_ms=10),
        dict(img=f1, left=2, top=1, delay_ms=10, disposal=2),
        dict(img=small, delay_ms=10),
    ], screen_size=(6, 4), background=(9, 9, 9)))
    c = fr[2][2]
    assert (c[1, 2] == 9).all() and (c[0, 0] == 55).all() \
        and (c[3, 0] == 10).all()

    # disposal 3: frame 1's full-screen paint is reverted before frame 2
    fr = decode_gif_frames(encode_gif_animation([
        dict(img=f0, delay_ms=10),
        dict(img=f1, left=0, top=0, delay_ms=10, disposal=3),
        dict(img=small, left=5, top=3, delay_ms=10),
    ], screen_size=(6, 4)))
    c = fr[2][2]
    assert (c[0, 0] == 10).all() and (c[3, 5] == 55).all()

    # single still frame: parity with decode_image_gif, and max_frames
    img = (np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3) * 3) % 251
    one = decode_gif_frames(encode_image_gif(img))
    assert len(one) == 1
    np.testing.assert_array_equal(
        one[0][2], decode_image_gif(encode_image_gif(img)),
    )
    assert len(decode_gif_frames(data, max_frames=2)) == 2


def test_sample_frames_operator(spark):
    """sample_frames: one row per decoded frame with container timing and
    canvas stats; non-GIF, NULL, and corrupt payloads contribute no rows
    (and must not kill the batch); the expression-built animated fixture
    matches its closed-form timeline, byte size, and driver replica."""
    import hashlib

    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        animated_gif_fixture_n_bytes,
        decode_gif_frames,
        encode_gif_animation,
        sample_frames,
        synthesize_animated_gif_media_from_text,
    )

    a = np.full((2, 3, 3), 10, np.uint8)
    b = np.full((2, 3, 3), 40, np.uint8)
    anim = encode_gif_animation(
        [dict(img=a, delay_ms=20), dict(img=b, delay_ms=50)],
        screen_size=(3, 2),
    )
    media = spark.createDataFrame(
        [(1, bytearray(anim)), (2, bytearray(b"P6\n1 1\n255\nabc")),
         (3, None), (4, bytearray(anim[: len(anim) // 2]))],
        "media_id long, payload binary",
    )
    rows = {(r["media_id"], r["frame_index"]): r
            for r in sample_frames(media).collect()}
    assert set(rows) == {(1, 0), (1, 1)}
    assert rows[(1, 0)]["frame_ms"] == 0 and rows[(1, 1)]["frame_ms"] == 20
    assert rows[(1, 1)]["delay_ms"] == 50
    assert rows[(1, 0)]["mean"] == 10 / 255 and rows[(1, 1)]["mean"] == 40 / 255
    assert rows[(1, 0)]["width"] == 3 and rows[(1, 0)]["height"] == 2

    docs = spark.createDataFrame(
        [(7, "some document text"), (8, None)], "doc_id long, text string",
    )
    fixture = synthesize_animated_gif_media_from_text(docs, frames=3)
    got = {r["media_id"]: r for r in fixture.collect()}
    assert got[8]["payload"] is None and got[8]["duration_ms"] is None
    payload = bytes(got[7]["payload"])
    assert len(payload) == animated_gif_fixture_n_bytes(4, 2, 3)
    assert got[7]["duration_ms"] == 90
    decoded = decode_gif_frames(payload)
    dig = hashlib.md5(b"some document text").digest()
    for f, (start_ms, delay_ms, canvas) in enumerate(decoded):
        assert (start_ms, delay_ms) == (5 * f * (f + 3), (2 + f) * 10)
        expect = np.array([dig[(j + f) % 16] for j in range(24)], np.uint8)
        np.testing.assert_array_equal(canvas[0, :, 0], expect)
        assert (canvas == canvas[..., :1]).all()  # grayscale triplication

    # GIF delays are centisecond-grained: a 25 ms delay cannot be stored
    # and the fixture writer refuses instead of silently flooring to 20
    import pytest
    with pytest.raises(ValueError, match="centisecond"):
        encode_gif_animation([dict(img=a, delay_ms=25)], screen_size=(3, 2))


def test_mjpeg_frame_split_and_sampling(spark):
    """Raw Motion-JPEG: split_mjpeg_frames walks the marker STRUCTURE —
    an APP4 segment embedding a whole JPEG (the EXIF-thumbnail shape
    that defeats naive FFD9 search) does not end the frame early — and
    sample_frames decodes each frame independently: a corrupt middle
    frame is skipped while the rest of the stream survives, with the
    caller-declared frame interval as the timeline."""
    import numpy as np

    from sed_binning_spark.pipeline.jpeg import encode_image_jpeg
    from sed_binning_spark.pipeline.multimodal import (
        sample_frames, split_mjpeg_frames,
    )

    imgs = [np.full((16, 16, 3), v, np.uint8) for v in (30, 120, 210)]
    frames = [encode_image_jpeg(im) for im in imgs]
    # embed a whole tiny JPEG inside an APP4 segment of frame 0 — a
    # naive FFD9 scan would cut frame 0 at the thumbnail's EOI
    thumb = encode_image_jpeg(np.full((8, 8, 3), 7, np.uint8))
    app4 = b"\xff\xe4" + (len(thumb) + 2).to_bytes(2, "big") + thumb
    f0 = frames[0][:2] + app4 + frames[0][2:]
    stream = f0 + frames[1] + frames[2]

    got = split_mjpeg_frames(stream)
    assert len(got) == 3
    assert got[0] == f0 and got[1] == frames[1] and got[2] == frames[2]
    assert split_mjpeg_frames(stream, max_frames=2) == got[:2]
    # truncated tail frame drops; complete prefix survives
    assert len(split_mjpeg_frames(stream[:-10])) == 2
    # a frame that LOST its EOI: the next frame's SOI ends the broken
    # walk and the splitter resyncs there — frameB must come out intact,
    # never merged into an undecodable A+B blob
    headless = frames[0][:-2]  # frame A without its EOI
    rec = split_mjpeg_frames(headless + frames[1] + frames[2])
    assert rec == [frames[1], frames[2]]

    # corrupt frame 1's entropy data (flip bits mid-scan, keeping the
    # framing): its decode fails, frames 0 and 2 still sample
    c1 = bytearray(frames[1])
    sos = bytes(c1).index(b"\xff\xda")
    c1[sos + 20 : sos + 24] = b"\xff\xc7\xff\xc7"  # invalid marker run
    corrupt_stream = f0 + bytes(c1) + frames[2]
    media = spark.createDataFrame(
        [(1, bytearray(corrupt_stream))], "media_id long, payload binary",
    )
    rows = sample_frames(media, mjpeg_frame_ms=40).collect()
    means = sorted(round(r["mean"], 2) for r in rows)
    assert len(rows) == 2 and means == [round(30 / 255, 2), round(210 / 255, 2)]
    assert {r["delay_ms"] for r in rows} == {40}


def test_mp4_mjpeg_demux_and_sampling(spark):
    """MP4 (ISO BMFF) Motion-JPEG: the demuxer walks ftyp/mdat/moov,
    rebuilds the sample layout from stsc/stco/stsz across multi-sample
    chunks, and converts stts deltas through the mdhd timescale into the
    frame timeline; sample_frames decodes the samples with the JPEG
    codec. Non-MP4 bytes, missing moov, and non-JPEG codecs (no H.264
    decoder ships here) refuse loudly; a corrupt sample mid-track is
    skipped while the rest of the track survives."""
    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.jpeg import encode_image_jpeg
    from sed_binning_spark.pipeline.mp4 import (
        encode_mp4_mjpeg, parse_mp4_samples,
    )
    from sed_binning_spark.pipeline.multimodal import sample_frames

    vals = (20, 90, 160, 230, 250)
    frames = [encode_image_jpeg(np.full((16, 16, 3), v, np.uint8)) for v in vals]
    blob = encode_mp4_mjpeg(frames, [40, 40, 30, 30, 50], width=16, height=16)
    got = parse_mp4_samples(blob)
    assert [g[0] for g in got] == [0, 40, 80, 110, 140]
    assert [g[1] for g in got] == [40, 40, 30, 30, 50]
    assert [g[2] for g in got] == frames
    assert len(parse_mp4_samples(blob, max_frames=3)) == 3

    with pytest.raises(ValueError, match="ISO BMFF"):
        parse_mp4_samples(b"certainly not an mp4")
    with pytest.raises(ValueError, match="no moov"):
        parse_mp4_samples(blob[: blob.index(b"moov") - 4])
    avc = bytearray(blob)
    at = bytes(avc).rindex(b"jpeg")  # the stsd entry type, inside moov
    avc[at : at + 4] = b"avc1"
    with pytest.raises(ValueError, match="avc1.*unsupported"):
        parse_mp4_samples(bytes(avc))

    # corrupt ONE sample decisively (zero its SOI — entropy bit flips
    # can decode to garbage without raising): its decode fails, the
    # other four frames still sample with container timing intact
    corrupt = bytearray(blob)
    sample1_at = bytes(blob).index(frames[1])
    corrupt[sample1_at : sample1_at + 2] = b"\x00\x00"
    media = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytes(corrupt)), (3, None)],
        "media_id long, payload binary",
    )
    rows = sample_frames(media).toPandas()
    ok = rows[rows.media_id == 1].sort_values("frame_index")
    assert list(ok.frame_ms) == [0, 40, 80, 110, 140]
    assert [round(m, 2) for m in ok["mean"]] == [
        round(v / 255, 2) for v in vals
    ]
    bad = rows[rows.media_id == 2]
    assert len(bad) == 4 and 40 not in set(bad.frame_ms.iloc[1:2])
    assert set(bad.frame_ms) == {0, 80, 110, 140}


def test_mp4_metadata_only_timeline_for_real_codecs(spark):
    """A real-codec MP4 track (avc1 — no H.264 decoder ships here) is no
    longer refused wholesale: parse_mp4_timeline reads the container's
    own sample tables into (start, delay, byte extent, keyframe) rows
    plus the sample-entry dimensions, and sample_frames emits those as
    timeline rows with NULL pixel statistics — while parse_mp4_samples
    keeps its decode-or-refuse contract, and lying stss tables still
    raise."""
    import pytest

    from sed_binning_spark.pipeline.mp4 import (
        encode_mp4_mjpeg, parse_mp4_samples, parse_mp4_timeline,
    )
    from sed_binning_spark.pipeline.multimodal import sample_frames

    # opaque "H.264" payloads: sizes are what the tables index, content
    # is never touched by the metadata path
    payloads = [b"\x00\x00\x01A" * k for k in (3, 5, 2, 4)]
    blob = encode_mp4_mjpeg(
        payloads, [40, 40, 30, 50], width=320, height=240,
        sample_type=b"avc1", sync_samples=[1, 3],
    )
    info = parse_mp4_timeline(blob)
    assert (info["codec"], info["width"], info["height"]) == ("avc1", 320, 240)
    assert [(s[0], s[1], s[3], s[4]) for s in info["samples"]] == [
        (0, 40, 12, True), (40, 40, 20, False),
        (80, 30, 8, True), (110, 50, 16, False),
    ]
    # byte extents point INTO the mdat at the real payloads
    assert all(
        blob[pos : pos + size] == payloads[i]
        for i, (_, _, pos, size, _) in enumerate(info["samples"])
    )
    assert len(parse_mp4_timeline(blob, max_frames=2)["samples"]) == 2
    # absent stss = every sample is sync (ISO 14496-12 §8.6.2)
    nostss = encode_mp4_mjpeg(payloads, [40, 40, 30, 50], sample_type=b"hev1")
    assert [s[4] for s in parse_mp4_timeline(nostss)["samples"]] == [True] * 4
    # the payload demuxer's contract is unchanged
    with pytest.raises(ValueError, match="avc1.*unsupported"):
        parse_mp4_samples(blob)
    # a lying stss entry count must raise, not read neighbors' bytes
    lie = bytearray(blob)
    at = bytes(blob).index(b"stss") + 4 + 4  # full-box header, then count
    lie[at : at + 4] = (999).to_bytes(4, "big")
    with pytest.raises(ValueError, match="stss declares"):
        parse_mp4_timeline(bytes(lie))

    media = spark.createDataFrame(
        [(1, bytearray(blob)), (2, None)], "media_id long, payload binary",
    )
    rows = sample_frames(media).toPandas().sort_values("frame_index")
    assert list(rows.media_id) == [1] * 4
    assert list(rows.frame_ms) == [0, 40, 80, 110]
    assert list(rows.n_bytes) == [12, 20, 8, 16]
    assert list(rows.keyframe) == [True, False, True, False]
    assert list(rows.width) == [320] * 4 and list(rows.height) == [240] * 4
    assert rows["mean"].isna().all() and rows["std"].isna().all()
    assert rows["min"].isna().all() and rows["max"].isna().all()

    # keyframes_only prunes to the stss samples, keeping the CONTAINER
    # frame index (0 and 2, not a re-enumeration)
    kf = sample_frames(media, keyframes_only=True).toPandas().sort_values(
        "frame_index",
    )
    assert list(kf.frame_index) == [0, 2]
    assert list(kf.frame_ms) == [0, 80]
    assert list(kf.keyframe) == [True, True]

    # a non-ASCII sample 4CC (4CCs are arbitrary bytes) must yield its
    # metadata-only timeline, not vanish on a codec-string re-encode
    exotic = bytearray(blob)
    at = bytes(blob).rindex(b"avc1")
    exotic[at : at + 4] = b"\xffv01"
    info = parse_mp4_timeline(bytes(exotic))
    assert not info["decodable"] and len(info["samples"]) == 4
    got = sample_frames(spark.createDataFrame(
        [(9, bytes(exotic))], "media_id long, payload binary",
    )).toPandas()
    assert len(got) == 4 and got["mean"].isna().all()
    # an stss too short for even its header names the defect
    short = bytearray(blob)
    sat = bytes(blob).index(b"stss") - 4
    short[sat : sat + 4] = (8).to_bytes(4, "big")
    with pytest.raises(ValueError, match="stss"):
        parse_mp4_timeline(bytes(short))


def test_mp4_multi_track_prefers_decodable(spark):
    """A multi-track MP4 whose moov lists an avc1 trak BEFORE a
    Motion-JPEG trak must still decode the JPEG track to pixel
    statistics (parse_mp4_samples always scanned all tracks; the
    timeline's default prefer= keeps that behavior), while prefer=()
    surfaces the file-order first track."""
    import numpy as np
    import struct

    from sed_binning_spark.pipeline.jpeg import encode_image_jpeg
    from sed_binning_spark.pipeline.mp4 import (
        _find, _iter_boxes, encode_mp4_mjpeg, parse_mp4_timeline,
    )
    from sed_binning_spark.pipeline.multimodal import sample_frames

    frames = [encode_image_jpeg(np.full((8, 8, 3), v, np.uint8))
              for v in (64, 192)]
    blob_j = encode_mp4_mjpeg(frames, [30, 30], width=8, height=8)
    # same payload layout, avc1-typed trak: its chunk offsets stay valid
    blob_a = encode_mp4_mjpeg(frames, [30, 30], width=8, height=8,
                              sample_type=b"avc1")
    mj = _find(blob_j, 0, len(blob_j), b"moov")
    ma = _find(blob_a, 0, len(blob_a), b"moov")
    mvhd = trak_j = trak_a = None
    for t, s, e in _iter_boxes(blob_j, mj[0], mj[1]):
        if t == b"mvhd":
            mvhd = blob_j[s - 8 : e]
        elif t == b"trak":
            trak_j = blob_j[s - 8 : e]
    for t, s, e in _iter_boxes(blob_a, ma[0], ma[1]):
        if t == b"trak":
            trak_a = blob_a[s - 8 : e]
    payload = mvhd + trak_a + trak_j  # avc1 FIRST in file order
    moov = struct.pack(">I4s", 8 + len(payload), b"moov") + payload
    two = blob_j[: mj[0] - 8] + moov

    assert parse_mp4_timeline(two)["codec"] == "jpeg"
    assert parse_mp4_timeline(two, prefer=())["codec"] == "avc1"
    rows = sample_frames(spark.createDataFrame(
        [(1, two)], "media_id long, payload binary",
    )).toPandas().sort_values("frame_index")
    assert [round(m, 2) for m in rows["mean"]] == [
        round(64 / 255, 2), round(192 / 255, 2),
    ]


def test_sample_audio_windows(spark):
    """Audio window sampling: windows cut on the container's own sample
    rate with true start/duration, a trailing partial window kept with
    its actual extent, hop overlap honored, channels pooled into the
    stats, max_windows bounding rows, and the sample_frames row
    contract (NULL payloads / non-audio / corrupt payloads contribute
    no rows, one Python stage)."""
    import hashlib

    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        encode_audio_wav,
        sample_audio_windows,
        synthesize_wav_media_from_text,
        wav_fixture_n_bytes,
    )

    # 10 mono int16 samples at 1000 Hz: windows of 4 -> 4+4+2(partial)
    vals = np.array([16384] * 4 + [-8192, -8192, 8192, 8192]
                    + [32767, -32767], dtype="<i2")
    wav = encode_audio_wav(vals, sample_rate=1000)
    # stereo: channels pool into one window's stats
    st = encode_audio_wav(
        np.stack([np.full(4, 16384, "<i2"), np.full(4, -16384, "<i2")],
                 axis=1),
        sample_rate=1000,
    )
    media = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(st)), (3, None),
         (4, bytearray(b"not audio at all")),
         (5, bytearray(b"RIFF" + wav[4:20]))],  # truncated: no data chunk
        "media_id long, payload binary",
    )
    rows = {(r["media_id"], r["window_index"]): r
            for r in sample_audio_windows(media, window_ms=4).collect()}
    assert {m for m, _ in rows} == {1, 2}
    assert [(rows[(1, w)]["start_ms"], rows[(1, w)]["duration_ms"],
             rows[(1, w)]["n_samples"]) for w in range(3)] == [
        (0, 4, 4), (4, 4, 4), (8, 2, 2)]
    w0 = rows[(1, 0)]
    assert w0["mean"] == 0.5 and w0["std"] == 0.0 and w0["rms"] == 0.5
    tail = rows[(1, 2)]
    assert tail["mean"] == 0.0 and tail["max"] == 32767 / 32768
    s0 = rows[(2, 0)]
    assert s0["mean"] == 0.0 and s0["rms"] == 0.5

    # hop overlap: windows of 4 every 2 samples over 10 -> starts 0..8
    hop = sample_audio_windows(
        media.where(F.col("media_id") == 1), window_ms=4, hop_ms=2,
    ).collect()
    assert [r["start_ms"] for r in sorted(hop, key=lambda r: r["window_index"])] \
        == [0, 2, 4, 6, 8]
    assert len(sample_audio_windows(
        media, window_ms=4, max_windows=1,
    ).collect()) == 2  # one row per decodable payload

    # the expression-built fixture round-trips through the real decoder
    docs = spark.createDataFrame(
        [(7, "some document text"), (8, None)], "doc_id long, text string",
    )
    fx = synthesize_wav_media_from_text(docs)
    got = {r["media_id"]: r for r in fx.collect()}
    assert got[8]["payload"] is None
    assert len(bytes(got[7]["payload"])) == wav_fixture_n_bytes(16)
    dig = hashlib.md5(b"some document text").digest()
    win = {r["window_index"]: r for r in sample_audio_windows(
        fx, window_ms=4,
    ).collect()}
    assert len(win) == 4
    for w in range(4):
        bs = dig[4 * w : 4 * w + 4]
        assert win[w]["mean"] == (sum(bs) - 512) / 512
        assert win[w]["min"] == (min(bs) - 128) / 128
        assert win[w]["max"] == (max(bs) - 128) / 128


def test_gif_animation_first_frame_only():
    """Multi-frame GIFs decode their first frame; trailing frames and
    inter-frame extensions are ignored by design."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        decode_image_gif, encode_image_gif,
    )

    a = np.full((4, 4, 3), 10, np.uint8)
    b = np.full((4, 4, 3), 200, np.uint8)
    blob_a, blob_b = encode_image_gif(a), encode_image_gif(b)
    # splice frame B's descriptor+data (everything past the 13-byte header
    # and 12-byte global table, before the trailer) after frame A's data
    tail_b = blob_b[13 + 12 : -1]
    multi = blob_a[:-1] + tail_b + b"\x3B"
    got = decode_image_gif(multi)
    np.testing.assert_array_equal(got, a)


def test_gif_fixture_synthesis_matches_ppm(spark):
    """The expression-built GIF fixture (9-bit LZW groups byte-aligned by
    a CLEAR per 7 literals, constant grayscale palette) is a VALID
    container: the pure-Python codec decodes it to the PPM fixture's
    samples triplicated across a 24x1 strip, the payload length is the
    closed form, and the normalized statistics agree with the PPM leg
    element-for-element (dims differ by construction)."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        decode_image_gif,
        decode_image_ppm,
        decode_payload,
        gif_fixture_n_bytes,
        synthesize_gif_media_from_text,
        synthesize_ppm_media_from_text,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "another document"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    gif = {r.media_id: r.payload for r in synthesize_gif_media_from_text(df).collect()}
    ppm = {r.media_id: r.payload for r in synthesize_ppm_media_from_text(df).collect()}
    assert gif[3] is None
    for mid in (1, 2, 4):
        assert len(gif[mid]) == gif_fixture_n_bytes(4, 2)
        raster = decode_image_gif(bytes(gif[mid]))
        samples = decode_image_ppm(bytes(ppm[mid])).reshape(-1)
        assert raster.shape == (1, 24, 3)
        # grayscale palette: every channel carries the sample value
        for ch in range(3):
            assert np.array_equal(raster[0, :, ch], samples)
        g, p = (decode_payload(bytes(x[mid]), 8) for x in (gif, ppm))
        assert g[0] == p[0] == 1.0
        assert (g[1], g[2]) == (24.0, 1.0) and (p[1], p[2]) == (4.0, 2.0)
        assert g[3:] == p[3:]  # normalized stats identical


def test_bmp_palette_and_32bit_decode():
    """BMP depth matrix beyond the classic 24-bit: 8-bit palette rows
    resolve through the BGRX color table, 32-bit BGRX drops its padding
    byte, top-down (negative height) rows stay in order, and the typed
    refusals (budget, out-of-table index, RLE) degrade to byte stats in
    decode_payload."""
    import struct

    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.multimodal import (
        decode_image_bmp, decode_payload,
    )

    def make_bmp(img, bpp, bottom_up=True, palette=None, compression=0):
        h, w = img.shape[:2]
        if bpp == 8:
            stride = (w + 3) // 4 * 4
            table = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
            rows = np.zeros((h, stride), np.uint8)
            rows[:, :w] = img
        elif bpp == 24:
            stride = (w * 3 + 3) // 4 * 4
            table = b""
            rows = np.zeros((h, stride), np.uint8)
            rows[:, : w * 3] = img[..., ::-1].reshape(h, w * 3)
        else:
            stride = w * 4
            table = b""
            rgba = np.concatenate(
                [img[..., ::-1], np.full((h, w, 1), 7, np.uint8)], axis=2,
            )
            rows = rgba.reshape(h, stride)
        if bottom_up:
            rows = rows[::-1]
        off = 14 + 40 + len(table)
        hdr = b"BM" + struct.pack("<IHHI", off + rows.size, 0, 0, off)
        hdr += struct.pack(
            "<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, bpp,
            compression, rows.size, 2835, 2835, len(table) // 4, 0,
        )
        return hdr + table + rows.tobytes()

    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (13, 7, 3)).astype(np.uint8)
    for bu in (True, False):
        np.testing.assert_array_equal(
            decode_image_bmp(make_bmp(rgb, 24, bu)), rgb)
        np.testing.assert_array_equal(
            decode_image_bmp(make_bmp(rgb, 32, bu)), rgb)
    pal = rng.integers(0, 256, (200, 3)).astype(np.uint8)
    idx = rng.integers(0, 200, (13, 7)).astype(np.uint8)
    np.testing.assert_array_equal(
        decode_image_bmp(make_bmp(idx, 8, palette=pal)), pal[idx])
    vec = decode_payload(make_bmp(idx, 8, palette=pal), 8)
    assert vec[0] == 1.0 and (vec[1], vec[2]) == (7.0, 13.0)

    with pytest.raises(ValueError, match="decode budget"):
        decode_image_bmp(
            b"BM" + b"\x00" * 12 + struct.pack("<Iii", 40, 60000, 60000)
            + b"\x00" * 28)
    with pytest.raises(ValueError, match="truncated BMP header"):
        decode_image_bmp(b"BM" + b"\x00" * 20)
    with pytest.raises(ValueError, match="beyond its color table"):
        decode_image_bmp(make_bmp(np.full((4, 4), 201, np.uint8), 8,
                                  palette=pal))
    with pytest.raises(ValueError, match="compression"):
        decode_image_bmp(make_bmp(idx, 8, palette=pal, compression=1))
    for bad in (
        make_bmp(np.full((4, 4), 201, np.uint8), 8, palette=pal),
        make_bmp(idx, 8, palette=pal, compression=1),
        make_bmp(rgb, 24)[:-20],
    ):
        assert decode_payload(bad, 8)[0] == 0.0


def test_quality_classifier_fit_apply(spark):
    """Driver-fit / cluster-applied quality classifier: separable
    synthetic corpora (word-like English vs punctuation noise) train to
    >95% accuracy with a JSON-serializable model; apply is one map-only
    expression (no Python in the executed plan), NULL text scores NULL
    with keep=False, and the model is deterministic across fits."""
    import json
    import random

    from pyspark.sql import functions as F

    from sed_binning_spark.pipeline.classifier import (
        quality_classifier_apply,
        quality_classifier_fit,
    )

    random.seed(4)
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dog", "and", "it", "was", "a", "bright", "cold", "day"]
    good = [(i, " ".join(random.choices(words, k=random.randint(30, 120)))
             + ".") for i in range(300)]
    junk = [(i, "".join(random.choices(
        "!@#$%^&*()[]{}<>~|0123456789ab ", k=random.randint(20, 200))))
        for i in range(300)]
    pos = spark.createDataFrame(good, "doc_id long, text string")
    neg = spark.createDataFrame(junk, "doc_id long, text string")
    model = quality_classifier_fit(pos, neg, max_rows_per_class=300)
    assert model["train_accuracy"] > 0.95
    json.loads(json.dumps(model))  # plan-portable
    model2 = quality_classifier_fit(pos, neg, max_rows_per_class=300)
    assert model2 == model  # deterministic end to end

    both = pos.unionByName(neg.withColumn("doc_id", neg.doc_id + 1000))
    scored = quality_classifier_apply(both, model, keep_threshold=0.5)
    assert scored.columns == ["doc_id", "text", "quality_prob", "keep"]
    rates = {
        r["is_good"]: r["rate"] for r in scored.groupBy(
            (F.col("doc_id") < 1000).alias("is_good"),
        ).agg(F.avg(F.col("keep").cast("int")).alias("rate")).collect()
    }
    assert rates[True] > 0.95 and rates[False] < 0.05

    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan

    nulls = spark.createDataFrame([(1, None), (2, "")],
                                  "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           quality_classifier_apply(nulls, model, keep_threshold=0.5)
           .collect()}
    assert got[1]["quality_prob"] is None and got[1]["keep"] is False
    assert got[2]["keep"] is False  # blank doc scores at feature means

    # a model from a different feature build refuses loudly
    import pytest

    bad = dict(model, features=["nope"])
    with pytest.raises(ValueError, match="do not match"):
        quality_classifier_apply(both, bad)


def test_pca_fit_apply(spark):
    """Distributed PCA: the one-pass moment reduction recovers a planted
    dominant axis (cos > 0.99 vs both the ground truth and a numpy eigh
    on the collected data), projection matches the driver-side matmul,
    whitening unit-scales the output variances, the fit is
    layout-independent up to float summation order, and NULL/short
    embeddings skip (fit) or project to NULL (apply)."""
    import numpy as np

    from sed_binning_spark.pipeline.similarity import pca_apply, pca_fit

    rng = np.random.default_rng(0)
    d, n = 16, 3000
    axis = rng.standard_normal(d)
    axis /= np.linalg.norm(axis)
    data = ((rng.standard_normal((n, 1)) * 5.0) @ axis[None, :]
            + rng.standard_normal((n, d)) * 0.3)
    rows = [(i, [float(x) for x in data[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    model = pca_fit(df, k=4)
    c0 = np.asarray(model["components"][0])
    assert abs(float(c0 @ axis)) > 0.99
    assert model["explained_variance_ratio"][0] > 0.8

    x32 = data.astype(np.float32).astype(np.float64)
    ev, evec = np.linalg.eigh(np.cov(x32.T, bias=True))
    assert abs(float(c0 @ evec[:, -1])) > 0.9999

    mean = np.asarray(model["mean"])
    comps = np.asarray(model["components"])
    got = pca_apply(df, model).orderBy("vec_id").limit(5).collect()
    for r in got:
        expect = (x32[r["vec_id"]] - mean) @ comps.T
        np.testing.assert_allclose(
            np.asarray(r["embedding_pca"], np.float64), expect, atol=1e-4,
        )

    m1 = pca_fit(df.repartition(1), k=4)
    np.testing.assert_allclose(m1["components"], model["components"],
                               atol=1e-8)

    wmodel = pca_fit(df, k=2, whiten=True)
    wout = np.asarray(
        [r["embedding_pca"] for r in pca_apply(df, wmodel).collect()],
        dtype=np.float64,
    )
    np.testing.assert_allclose(wout.var(axis=0), [1.0, 1.0], rtol=0.05)

    nd = spark.createDataFrame(
        [(1, None), (2, [1.0] * d), (3, [1.0] * 3)],
        "vec_id long, embedding array<float>",
    )
    by_id = {r["vec_id"]: r["embedding_pca"]
             for r in pca_apply(nd, model).collect()}
    assert by_id[1] is None and by_id[3] is None and len(by_id[2]) == 4

    import pytest

    with pytest.raises(ValueError, match="outside"):
        pca_fit(df, k=0)
    with pytest.raises(ValueError, match="at least 2"):
        pca_fit(nd.where("vec_id = 2"), k=2)  # one usable row


def test_product_quantization(spark):
    """PQ compression + asymmetric-distance search on the real driver
    embeddings table: codes cover every row (m ints in 0..codes-1), the
    direct top-10 recall against exact L2 clears the floor, a widened
    candidate set recovers the exact top-10 entirely (the re-rank
    contract), and training is deterministic for a fixed seed. Degenerate
    geometry and out-of-range codes refuse by name."""
    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.similarity import (
        pq_encode, pq_topk, pq_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    model = pq_train(emb, m=8, codes=32, sample_size=500, iterations=15)
    assert np.asarray(model["codebooks"]).shape == (8, 32, 8)
    model2 = pq_train(emb, m=8, codes=32, sample_size=500, iterations=15)
    assert model2 == model  # seeded end to end

    enc = pq_encode(emb, model)
    codes = enc.select("pq_code").collect()
    assert all(
        r["pq_code"] is not None and len(r["pq_code"]) == 8
        and all(0 <= c < 32 for c in r["pq_code"]) for r in codes
    )

    rows = emb.collect()
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.asarray([r["vec_id"] for r in rows])
    q = X[7] + 0.01
    exact = set(ids[np.argsort(((X - q) ** 2).sum(axis=1))[:10]].tolist())
    got10 = {r["vec_id"]
             for r in pq_topk(enc, model, [float(v) for v in q], k=10)
             .collect()}
    assert len(exact & got10) / 10 >= 0.5
    got100 = {r["vec_id"]
              for r in pq_topk(enc, model, [float(v) for v in q], k=100)
              .collect()}
    assert len(exact & got100) / 10 >= 0.9

    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7)
    with pytest.raises(ValueError, match="cannot seed"):
        pq_train(emb, m=8, codes=256, sample_size=100)
    with pytest.raises(ValueError, match="the model wants"):
        pq_topk(enc, model, [1.0, 2.0], k=5)
    # an over-long query (concatenated / wrong-model) raises too — never
    # silently truncated, unlike CORPUS rows (first-dim-elements contract)
    with pytest.raises(ValueError, match="the model wants"):
        pq_topk(enc, model, [1.0] * 65, k=5)

    # NULL embeddings encode to NULL and are excluded from search
    nd = spark.createDataFrame(
        [(900, None), (901, [0.5] * 64)],
        "vec_id long, embedding array<float>",
    )
    ne = pq_encode(nd, model)
    by_id = {r["vec_id"]: r["pq_code"] for r in ne.collect()}
    assert by_id[900] is None and len(by_id[901]) == 8
    found = {r["vec_id"] for r in pq_topk(ne, model, [0.5] * 64, k=5).collect()}
    assert found == {901}


def test_c4_line_filter(spark):
    """C4 §2.2 line rules: terminal-punctuation + min-words + boilerplate
    phrases judged per line; curly-brace and lorem-ipsum docs drop whole;
    NULL text stays NULL with keep=False; the plan is Python-free — and
    the verdicts match an independent Python reimplementation of the
    published rules over a generated corpus."""
    import random
    import re

    from sed_binning_spark.pipeline.text import (
        C4_BAD_DOC_PHRASES,
        C4_BAD_LINE_PHRASES,
        c4_line_filter,
    )

    rows = [
        (1, "This is a perfectly good sentence with many words in it.\n"
            "short line\n"
            "Another quite long and complete sentence follows right here.\n"
            "Please accept our cookie policy to continue reading this.\n"
            "A third proper sentence keeps this document over the floor."),
        (2, "Enable javascript to view this page properly and fully now.\nno"),
        (3, "function f() { return 1; } A long sentence with many words."),
        (4, "Lorem ipsum dolor sit amet is placeholder text inside this."),
        (5, None),
        (6, 'He said "this quoted sentence should survive the end rule."'),
    ]
    random.seed(9)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    enders = [".", "!", "?", '"', "", " etc", ":"]
    for i in range(7, 80):
        n_lines = random.randint(1, 6)
        text = "\n".join(
            " ".join(random.choices(words, k=random.randint(1, 9)))
            + random.choice(enders)
            for _ in range(n_lines)
        )
        if random.random() < 0.1:
            text += "\ncheck our privacy policy for details and more info."
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_line_filter(df, min_lines=2).collect()}

    def ref(text):
        if text is None:
            return None, False
        kept = []
        for line in text.split("\n"):
            s = line.strip()
            if not re.search(r'[.!?"]$', s):
                continue
            if len(s.split()) < 5:
                continue
            if any(p in s.lower() for p in C4_BAD_LINE_PHRASES):
                continue
            kept.append(s)
        ok = len(kept) >= 2 and "{" not in text and not any(
            p in text.lower() for p in C4_BAD_DOC_PHRASES
        )
        return "\n".join(kept), ok

    for doc_id, text in rows:
        expect_text, expect_keep = ref(text)
        assert got[doc_id]["keep"] is expect_keep, (doc_id, text)
        if text is None:
            assert got[doc_id]["text_clean"] is None
        else:
            assert got[doc_id]["text_clean"] == expect_text, (doc_id, text)

    plan = c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_mp4_lying_sample_tables_refuse():
    """Sample-table counts that lie about their box (or the file) raise
    named ValueErrors instead of reading neighboring boxes' bytes as
    entries — and a fixed-size stsz claiming 2^32 samples must refuse,
    not malloc a 34 GB list."""
    import struct

    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.jpeg import encode_image_jpeg
    from sed_binning_spark.pipeline.mp4 import encode_mp4_mjpeg, parse_mp4_samples

    frames = [encode_image_jpeg(np.full((8, 8, 3), v, np.uint8))
              for v in (10, 120)]
    blob = encode_mp4_mjpeg(frames, [30, 30])

    # fixed-stsz memory bomb: sample_size=1, sample_count=0xFFFFFFFF
    bomb = bytearray(blob)
    at = bytes(blob).rindex(b"stsz") + 4 + 4  # past type + fullbox header
    struct.pack_into(">II", bomb, at, 1, 0xFFFFFFFF)
    with pytest.raises(ValueError, match="stsz declares"):
        parse_mp4_samples(bytes(bomb))

    # per-entry stsz lying long: count inflated past the box
    lie = bytearray(blob)
    struct.pack_into(">I", lie, at + 4, 1000)
    with pytest.raises(ValueError, match="stsz declares"):
        parse_mp4_samples(bytes(lie))

    # stco count lying past its box
    lie2 = bytearray(blob)
    at2 = bytes(blob).rindex(b"stco") + 4 + 4
    struct.pack_into(">I", lie2, at2, 1000)
    with pytest.raises(ValueError, match="stco declares"):
        parse_mp4_samples(bytes(lie2))


def test_mp4_ctts_and_elst_presentation_times():
    """ctts/elst timing (round 13): start_ms is the PRESENTATION time —
    decode time + signed v1 ctts offset, shifted by the edit list's
    −media_time and delayed by leading empty edits — with rows kept in
    decode/container order (B-frame PTS need not be monotonic). v0 ctts
    offsets are unsigned; lying ctts counts, multiple normal edits, and
    non-unity edit rates refuse loudly."""
    import struct

    import pytest

    from sed_binning_spark.pipeline.mp4 import (
        encode_mp4_mjpeg, parse_mp4_timeline,
    )

    pay = [b"\x00" * 10, b"\x01" * 12, b"\x02" * 8, b"\x03" * 9]
    # decode times 0/40/80/120; IPBB-style reorder via signed offsets
    blob = encode_mp4_mjpeg(
        pay, [40] * 4, width=64, height=48, sample_type=b"avc1",
        composition_offsets_ms=[40, 80, -40, 0], sync_samples=[1],
    )
    got = [r[0] for r in parse_mp4_timeline(blob)["samples"]]
    assert got == [40, 120, 40, 120]  # non-monotonic: decode order kept
    assert blob.index(b"ctts") and blob[blob.index(b"ctts") + 4] == 1  # v1

    # one rate-1 edit cancels the initial composition delay
    shifted = encode_mp4_mjpeg(
        pay, [40] * 4, sample_type=b"avc1",
        composition_offsets_ms=[40, 80, -40, 0], elst_media_time_ms=40,
    )
    assert [r[0] for r in parse_mp4_timeline(shifted)["samples"]] \
        == [0, 80, 0, 80]

    # leading empty edit delays the whole track (movie timescale)
    delayed = encode_mp4_mjpeg(
        pay, [40] * 4, sample_type=b"avc1",
        elst_media_time_ms=0, elst_empty_ms=100,
    )
    assert [r[0] for r in parse_mp4_timeline(delayed)["samples"]] \
        == [100, 140, 180, 220]

    # all-positive offsets write v0 (unsigned) and parse back the same
    v0 = encode_mp4_mjpeg(
        pay, [40] * 4, sample_type=b"avc1",
        composition_offsets_ms=[40, 80, 0, 40],
    )
    assert blob.index(b"ctts")
    assert v0[v0.index(b"ctts") + 4] == 0
    assert [r[0] for r in parse_mp4_timeline(v0)["samples"]] \
        == [40, 120, 80, 160]

    # lying ctts count
    lie = bytearray(blob)
    struct.pack_into(">I", lie, bytes(blob).index(b"ctts") + 8, 1000)
    with pytest.raises(ValueError, match="ctts declares"):
        parse_mp4_timeline(bytes(lie))

    # ctts covering fewer samples than stsz
    short = bytearray(blob)
    struct.pack_into(">I", short, bytes(blob).index(b"ctts") + 8, 2)
    with pytest.raises(ValueError, match="ctts covers fewer"):
        parse_mp4_timeline(bytes(short))

    # a second normal edit refuses (splice semantics unimplemented)
    two = bytearray(shifted)
    at = bytes(shifted).index(b"elst") + 8
    struct.pack_into(">I", two, at, 2)
    # the fixture's elst box only HOLDS one entry — the count lie is
    # caught by the box-bounds check first, which is also correct
    with pytest.raises(ValueError, match="elst"):
        parse_mp4_timeline(bytes(two))

    # non-unity rate refuses
    fast = bytearray(shifted)
    struct.pack_into(">hH", fast, at + 4 + 8, 2, 0)
    with pytest.raises(ValueError, match="rate"):
        parse_mp4_timeline(bytes(fast))


def test_mp4_stz2_compact_sizes():
    """stz2 (compact sample sizes, §8.7.3.3): a 16-bit stz2 container
    demuxes identically to its stsz twin; 4-bit packed sizes parse
    (high nibble first); invalid field sizes and lying counts refuse."""
    import struct

    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.jpeg import encode_image_jpeg
    from sed_binning_spark.pipeline.mp4 import (
        _track_layout, encode_mp4_mjpeg, parse_mp4_samples,
        parse_mp4_timeline,
    )

    frames = [encode_image_jpeg(np.full((8, 8, 3), v, np.uint8))
              for v in (10, 120, 240)]
    a = encode_mp4_mjpeg(frames, [30, 30, 40])
    b = encode_mp4_mjpeg(frames, [30, 30, 40], use_stz2=True)
    ra = [(s, d, p) for s, d, p in parse_mp4_samples(a)]
    rb = [(s, d, p) for s, d, p in parse_mp4_samples(b)]
    assert ra == rb  # identical timing AND payload bytes

    # 4-bit packed sizes, high nibble first: hand-build the box over a
    # synthetic table set (sizes 3, 1, 2 inside a 6-byte "file" tail)
    data = bytearray(b"\x00" * 64)
    def fbox(t, payload):
        return struct.pack(">I4s", 8 + len(payload), t) + b"\x00" * 4 + payload
    stz2 = fbox(b"stz2", struct.pack(">3xBI", 4, 3) + bytes([0x31, 0x20]))
    stts = fbox(b"stts", struct.pack(">III", 1, 3, 10))
    stsc = fbox(b"stsc", struct.pack(">IIII", 1, 1, 3, 1))
    stco = fbox(b"stco", struct.pack(">II", 1, 40))
    blob = bytes(data[:40]) + b"\x00" * 24
    tabs = {}
    off = len(blob)
    blob2 = blob
    for box in (stz2, stts, stsc, stco):
        tabs[box[4:8]] = (off + 8, off + len(box))
        blob2 += box
        off += len(box)
    rows = _track_layout(blob2, tabs, 1000, None)
    assert [(sz, p) for _, _, p, sz in rows] == [(3, 40), (1, 43), (2, 44)]

    bad = bytearray(b)
    bad[bytes(b).index(b"stz2") + 4 + 3 + 4] = 12  # field size 12
    with pytest.raises(ValueError, match="field size"):
        parse_mp4_timeline(bytes(bad))
    lie = bytearray(b)
    struct.pack_into(">I", lie, bytes(b).index(b"stz2") + 4 + 4 + 4, 9999)
    with pytest.raises(ValueError, match="stz2 declares"):
        parse_mp4_timeline(bytes(lie))
    with pytest.raises(ValueError, match="65535"):
        encode_mp4_mjpeg([b"\x00" * 70000], [10], sample_type=b"avc1",
                         use_stz2=True)


def test_webm_metadata_timeline(spark):
    """WebM/Matroska (round 13): EBML block timing — cluster Timestamp
    + block relative time at TimestampScale — byte-exact extents,
    SimpleBlock flag keyframes AND BlockGroup ReferenceBlock
    keyframing, BlockDuration/DefaultDuration/NULL delay precedence,
    the track filter, corrupt-lacing refusal, and the sample_frames
    metadata-only rows (NULL stats, container index preserved under
    keyframes_only)."""
    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.multimodal import sample_frames
    from sed_binning_spark.pipeline.webm import (
        encode_webm, parse_webm_timeline,
    )

    pay = [bytes([i]) * (8 + i) for i in range(5)]
    kfs = [True, False, True, False, False]
    blob = encode_webm(pay, [0, 40, 80, 120, 160], keyframes=kfs,
                       width=320, height=180, default_duration_ms=40)
    info = parse_webm_timeline(blob)
    assert info["codec"] == "V_VP9" and not info["decodable"]
    assert (info["width"], info["height"]) == (320, 180)
    assert [(r[0], r[1], r[3], r[4]) for r in info["samples"]] == [
        (0, 40, 8, True), (40, 40, 9, False), (80, 40, 10, True),
        (120, 40, 11, False), (160, 40, 12, False),
    ]
    for (st, d, pos, sz, kf), p in zip(info["samples"], pay):
        assert blob[pos : pos + sz] == p
    assert len(parse_webm_timeline(blob, max_frames=2)["samples"]) == 2

    # BlockGroups: per-block durations from the time deltas, keyframe =
    # no ReferenceBlock, final block has no successor -> NULL duration
    grp = encode_webm(pay, [0, 30, 70, 120, 180],
                      keyframes=[True, False, False, True, False],
                      use_block_groups=True)
    got = [(r[0], r[1], r[4]) for r in parse_webm_timeline(grp)["samples"]]
    assert got == [(0, 30, True), (30, 40, False), (70, 50, False),
                   (120, 60, True), (180, None, False)]

    # no DefaultDuration and no BlockDuration -> NULL delay
    bare = encode_webm(pay[:2], [0, 25])
    assert [r[1] for r in parse_webm_timeline(bare)["samples"]] \
        == [None, None]

    # foreign-track blocks are skipped (the fixture's track filter)
    two = encode_webm(pay[:2], [0, 25], track_number=3)
    assert len(parse_webm_timeline(two)["samples"]) == 2

    # corrupt lacing still refuses loudly: flag the first block as
    # Xiph-laced and declare more size runs than its body holds
    # (lacing itself is implemented — test_webm_lacing)
    laced = bytearray(blob)
    first_flags = blob.index(pay[0]) - 1
    laced[first_flags] |= 0x02
    laced[first_flags + 1] = 10  # count byte: 11 frames, 7 run bytes
    with pytest.raises(ValueError, match="lacing"):
        parse_webm_timeline(bytes(laced))
    with pytest.raises(ValueError, match="not an EBML"):
        parse_webm_timeline(b"\x00" * 16)

    # a nested UNKNOWN-size element must raise ValueError (never a
    # TypeError that would escape _DECODE_ERRORS and kill the batch):
    # stomp the first SimpleBlock's size byte to the 1-byte all-ones
    unk = bytearray(blob)
    unk[blob.index(b"\xa3") + 1] = 0xFF
    with pytest.raises(ValueError):
        parse_webm_timeline(bytes(unk))

    # zero-length elements take their RFC 8794 schema DEFAULTS: build a
    # TrackEntry with empty Channels/SamplingFrequency/TimestampScale
    import struct as st

    from sed_binning_spark.pipeline import webm as W

    entry = (W._uint_elem(W._TRACK_NUMBER, 1)
             + W._uint_elem(W._TRACK_TYPE, 2)
             + W._elem(W._CODEC_ID, b"A_OPUS")
             + W._elem(W._AUDIO, W._elem(W._SAMPLING_FREQUENCY, b"")
                       + W._elem(W._CHANNELS, b"")))
    hand = (W._elem(0x1A45DFA3, W._elem(0x4282, b"webm"))
            + W._elem(W._SEGMENT,
                      W._elem(W._INFO, W._elem(W._TIMESTAMP_SCALE, b""))
                      + W._elem(W._TRACKS, W._elem(W._TRACK_ENTRY, entry))
                      + W._elem(W._CLUSTER,
                                W._uint_elem(W._CLUSTER_TIMESTAMP, 7)
                                + W._elem(W._SIMPLE_BLOCK,
                                          W._vint_size(1)
                                          + st.pack(">h", 0) + b"\x80zz"))))
    got2 = parse_webm_timeline(hand, media="audio")
    assert (got2["channels"], got2["sample_rate"]) == (1, 8000.0)
    assert got2["samples"][0][0] == 7  # empty scale -> default 1 ms tick

    # the Spark path: metadata-only rows, keyframes_only preserves the
    # container index
    df = spark.createDataFrame(
        [(9, bytearray(blob))], "media_id long, payload binary",
    )
    rows = sample_frames(df).orderBy("frame_index").collect()
    assert [r.frame_ms for r in rows] == [0, 40, 80, 120, 160]
    assert all(r.mean is None and r.width == 320 for r in rows)
    assert [r.n_bytes for r in rows] == [8, 9, 10, 11, 12]
    krows = sample_frames(df, keyframes_only=True) \
        .orderBy("frame_index").collect()
    assert [r.frame_index for r in krows] == [0, 2]


def test_audio_track_timelines(spark):
    """media='audio' (round 13): MP4 soun-handler and WebM TrackType-2
    tracks yield metadata-only timelines — AudioSampleEntry channels +
    16.16 sample rate, Matroska Audio element channels + float
    SamplingFrequency — through both parsers AND sample_frames; a
    video-only file refuses the audio query and vice versa; non-
    container payloads contribute no rows in audio mode."""
    import pytest

    from sed_binning_spark.pipeline.mp4 import (
        encode_mp4_mjpeg, parse_mp4_timeline,
    )
    from sed_binning_spark.pipeline.multimodal import sample_frames
    from sed_binning_spark.pipeline.webm import (
        encode_webm, parse_webm_timeline,
    )

    pay = [bytes([i]) * (12 + i) for i in range(4)]
    m4a = encode_mp4_mjpeg(pay, [20] * 4, sample_type=b"mp4a",
                           handler=b"soun", channels=1, sample_rate=16000)
    info = parse_mp4_timeline(m4a, media="audio")
    assert (info["codec"], info["channels"], info["sample_rate"]) \
        == ("mp4a", 1, 16000)
    assert not info["decodable"] and info["width"] == 0
    assert [(r[0], r[3]) for r in info["samples"]] \
        == [(0, 12), (20, 13), (40, 14), (60, 15)]
    with pytest.raises(ValueError, match="no video track"):
        parse_mp4_timeline(m4a)

    wba = encode_webm(pay, [0, 20, 40, 60], track_type=2, channels=2,
                      sample_rate=16000.0, codec_id="A_OPUS",
                      default_duration_ms=20)
    winfo = parse_webm_timeline(wba, media="audio")
    assert (winfo["codec"], winfo["channels"], winfo["sample_rate"]) \
        == ("A_OPUS", 2, 16000.0)
    assert [(r[0], r[1], r[3]) for r in winfo["samples"]] \
        == [(0, 20, 12), (20, 20, 13), (40, 20, 14), (60, 20, 15)]
    with pytest.raises(ValueError, match="video"):
        parse_webm_timeline(wba)
    with pytest.raises(ValueError, match="media must be"):
        parse_webm_timeline(wba, media="subtitles")

    df = spark.createDataFrame(
        [(1, bytearray(m4a)), (2, bytearray(wba)),
         (3, bytearray(b"not a container"))],
        "media_id long, payload binary",
    )
    rows = sample_frames(df, media="audio") \
        .orderBy("media_id", "frame_index").collect()
    assert [r.media_id for r in rows] == [1] * 4 + [2] * 4
    assert [r.frame_ms for r in rows] == [0, 20, 40, 60] * 2
    assert all(r.mean is None and r.width is None for r in rows)

    # the audio gate must sit ABOVE the GIF/MJPEG branches: an animated
    # GIF yields video rows in video mode and ZERO rows in audio mode
    # (it carries no container audio track) — review-2 regression pin
    from sed_binning_spark.pipeline.multimodal import (
        synthesize_animated_gif_media_from_text,
    )

    docs = spark.createDataFrame([(7, "hello")], "doc_id long, text string")
    gif = synthesize_animated_gif_media_from_text(docs, frames=3)
    assert sample_frames(gif).count() == 3
    assert sample_frames(gif, media="audio").count() == 0
    # video mode on the same frame refuses... no — it DEGRADES per the
    # documented contract: audio-only containers yield no video rows
    assert sample_frames(df).count() == 0
    with pytest.raises(ValueError, match="media must be"):
        sample_frames(df, media="both")


def test_ogg_opus_timeline(spark):
    """Ogg Opus (round 13): per-packet durations from the RFC 6716 TOC
    byte (SILK/hybrid/CELT frame-size table × frame-count code, 120 ms
    ceiling), CRC-verified RFC 3533 page walk, OpusHead
    channels/rate/pre-skip, byte-exact packet extents, Vorbis and
    cross-page packets refused loudly, and the sample_frames
    media='audio' path."""
    import pytest

    from sed_binning_spark.pipeline.multimodal import sample_frames
    from sed_binning_spark.pipeline.ogg import (
        encode_ogg_opus, opus_packet_samples, parse_ogg_opus_timeline,
    )

    # the TOC table's corners: SILK WB 20 ms, CELT NB 5 ms, code-3
    # multi-frame, and the exact 120 ms ceiling
    assert opus_packet_samples((9 << 3) | 0) == 960
    assert opus_packet_samples((17 << 3) | 0) == 240
    assert opus_packet_samples((16 << 3) | 3, 4) == 480
    assert opus_packet_samples((11 << 3) | 1) == 5760
    with pytest.raises(ValueError, match="120 ms"):
        opus_packet_samples((11 << 3) | 3, 3)

    def pkt(config, code, extra=b"", count=None):
        b = bytes([(config << 3) | code])
        if code == 3:
            b += bytes([count])
        return b + extra

    pkts = [pkt(9, 0, b"abc"), pkt(17, 0, b"de"),
            pkt(16, 3, b"x" * 5, count=4), pkt(11, 1, b"y" * 7)]
    blob = encode_ogg_opus(pkts, channels=2, sample_rate=48000)
    info = parse_ogg_opus_timeline(blob)
    assert (info["codec"], info["channels"], info["sample_rate"],
            info["pre_skip"]) == ("opus", 2, 48000, 312)
    assert [(r[0], r[1], r[3]) for r in info["samples"]] \
        == [(0, 20, 4), (20, 5, 3), (25, 10, 7), (35, 120, 8)]
    for (st_, d, pos, sz, kf), p in zip(info["samples"], pkts):
        assert blob[pos : pos + sz] == p and kf
    assert len(parse_ogg_opus_timeline(blob, max_frames=2)["samples"]) == 2

    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg_opus_timeline(bytes(bad))
    with pytest.raises(ValueError, match="not an Ogg"):
        parse_ogg_opus_timeline(b"\x00" * 16)
    # review-3 pins: a stream whose first data page is NOT OpusTags
    # refuses (blind skipping would drop real audio), and a zero-length
    # packet refuses instead of being silently dropped
    from sed_binning_spark.pipeline.ogg import _page
    head_page = blob[: blob.index(b"OggS", 4)]
    audio_page = _page(0, 960, 0x1234, 1, [pkt(9, 0, b"zz")])
    with pytest.raises(ValueError, match="OpusTags"):
        parse_ogg_opus_timeline(head_page + audio_page)
    tags_end = blob.index(b"OggS", blob.index(b"OggS", 4) + 4)
    empty_page = _page(0, 960, 0x1234, 2, [b""])
    with pytest.raises(ValueError, match="zero-length"):
        parse_ogg_opus_timeline(blob[:tags_end] + empty_page)
    # a Vorbis BOS refuses by name (page rebuilt with a real CRC)
    vpage = _page(0x02, 0, 0x1234, 0, [b"\x01vorbis" + b"\x00" * 20])
    rest = blob[blob.index(b"OggS", 4):]
    with pytest.raises(ValueError, match="Vorbis"):
        parse_ogg_opus_timeline(vpage + rest)

    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, payload binary",
    )
    rows = sample_frames(df, media="audio").orderBy("frame_index").collect()
    assert [(r.frame_ms, r.delay_ms, r.n_bytes) for r in rows] \
        == [(0, 20, 4), (20, 5, 3), (25, 10, 7), (35, 120, 8)]
    assert sample_frames(df).count() == 0  # no video track in Ogg


def test_mp3_frame_timeline(spark):
    """MPEG audio (round 13): per-frame timing and extents from the
    pure header walk — 32 kHz MPEG-1 Layer III frames are an exact
    36 ms / 432 bytes at 96 kbps; ID3v2 (syncsafe) and ID3v1 tags are
    skipped; free-format bitrate, reserved codes, truncated frames, and
    mid-stream parameter changes refuse loudly; the sample_frames
    media='audio' path carries the rows."""
    import pytest

    from sed_binning_spark.pipeline.mp3 import (
        encode_mp3_frames, parse_mp3_timeline,
    )
    from sed_binning_spark.pipeline.multimodal import sample_frames

    blob = encode_mp3_frames(4, bitrate_kbps=96, sample_rate=32000)
    info = parse_mp3_timeline(blob)
    assert (info["codec"], info["channels"], info["sample_rate"]) \
        == ("mp3", 1, 32000)
    assert info["samples"] == [
        (0, 36, 0, 432, True), (36, 36, 432, 432, True),
        (72, 36, 864, 432, True), (108, 36, 1296, 432, True),
    ]
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
    id3v1 = b"TAG" + b"\x00" * 125
    w = parse_mp3_timeline(id3v2 + blob + id3v1)
    assert len(w["samples"]) == 4 and w["samples"][0][2] == 30
    assert len(parse_mp3_timeline(blob, max_frames=2)["samples"]) == 2

    with pytest.raises(ValueError, match="past the file end"):
        parse_mp3_timeline(blob[:-10])
    with pytest.raises(ValueError, match="sync bits"):
        parse_mp3_timeline(b"\x00" * 64)
    free = bytearray(blob)
    free[2] &= 0x0F
    with pytest.raises(ValueError, match="free-format"):
        parse_mp3_timeline(bytes(free))
    mixed = blob + encode_mp3_frames(1, bitrate_kbps=96,
                                     sample_rate=48000)
    with pytest.raises(ValueError, match="mid-stream"):
        parse_mp3_timeline(mixed)
    with pytest.raises(ValueError, match="syncsafe"):
        parse_mp3_timeline(b"ID3\x04\x00\x00" + bytes([0, 0, 0, 0x80]))
    # review-3 pins: the ID3v2.4 footer flag skips 10 more bytes; a
    # capped parse must SUCCEED even when frames past the cap are
    # damaged; 1-3 trailing garbage bytes refuse instead of passing
    footer_tag = (b"ID3\x04\x00\x10" + bytes([0, 0, 0, 4])
                  + b"\x00" * 4 + b"3DI" + b"\x04\x00\x10"
                  + bytes([0, 0, 0, 4]))
    f = parse_mp3_timeline(footer_tag + blob)
    assert len(f["samples"]) == 4 and f["samples"][0][2] == len(footer_tag)
    capped = parse_mp3_timeline(blob[:-10], max_frames=3)
    assert len(capped["samples"]) == 3
    with pytest.raises(ValueError, match="ends inside"):
        parse_mp3_timeline(blob + b"\x00")
    # padding-needing pairs refuse in the exact-fixture writer
    with pytest.raises(ValueError, match="exact pair"):
        encode_mp3_frames(2, bitrate_kbps=96, sample_rate=44100)

    df = spark.createDataFrame(
        [(1, bytearray(id3v2 + blob + id3v1))],
        "media_id long, payload binary",
    )
    rows = sample_frames(df, media="audio").orderBy("frame_index").collect()
    assert [(r.frame_ms, r.delay_ms, r.n_bytes) for r in rows] \
        == [(0, 36, 432), (36, 36, 432), (72, 36, 432), (108, 36, 432)]
    assert sample_frames(df).count() == 0  # no video in an MP3


def test_mp4_fragmented_movies():
    """Fragmented MP4 (round 13 — the DASH/CMAF shape of web video):
    moof/traf/trun samples carry continuous tfdt-anchored timing across
    fragments, per-sample keyframe flags from the non-sync bit,
    fragment ctts offsets, byte-exact payload extraction for JPEG-typed
    tracks, a max_frames cap spanning fragments, and the same
    lying-count / past-EOF refusals as the moov tables."""
    import struct

    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.jpeg import encode_image_jpeg
    from sed_binning_spark.pipeline.mp4 import (
        encode_mp4_fragmented, parse_mp4_samples, parse_mp4_timeline,
    )

    pay = [bytes([i]) * (10 + i) for i in range(5)]
    blob = encode_mp4_fragmented(
        pay, [40, 40, 30, 30, 20], width=128, height=96,
        frames_per_fragment=2,
    )
    info = parse_mp4_timeline(blob)
    assert info["codec"] == "avc1" and (info["width"], info["height"]) \
        == (128, 96)
    assert [(r[0], r[1], r[3], r[4]) for r in info["samples"]] == [
        (0, 40, 10, True), (40, 40, 11, False), (80, 30, 12, True),
        (110, 30, 13, False), (140, 20, 14, True),
    ]
    # byte extents point into the right mdat
    for (st, d, pos, sz, kf), p in zip(info["samples"], pay):
        assert blob[pos : pos + sz] == p

    # max_frames caps across fragments
    assert len(parse_mp4_timeline(blob, max_frames=3)["samples"]) == 3

    # per-sample ctts offsets inside fragments (v1 signed)
    shifted = encode_mp4_fragmented(
        pay, [40] * 5, composition_offsets_ms=[40, -10, 0, 30, 0],
    )
    assert [r[0] for r in parse_mp4_timeline(shifted)["samples"]] \
        == [40, 30, 80, 150, 160]

    # real decodable payloads: fragmented Motion-JPEG demuxes bit-exact
    jf = [encode_image_jpeg(np.full((8, 8, 3), v, np.uint8))
          for v in (16, 120, 240)]
    rows = parse_mp4_samples(encode_mp4_fragmented(
        jf, [30] * 3, sample_type=b"jpeg", frames_per_fragment=2,
    ))
    assert [b for _, _, b in rows] == jf

    # lying trun sample count refuses (per-sample fields present)
    lie = bytearray(blob)
    at = bytes(blob).index(b"trun") + 8
    struct.pack_into(">I", lie, at, 1000)
    with pytest.raises(ValueError, match="trun declares"):
        parse_mp4_timeline(bytes(lie))

    # a fragment sample extending past the file end refuses
    cut = blob[:-3]
    with pytest.raises(ValueError, match="outside the file|declares"):
        parse_mp4_timeline(cut)

    # a NEGATIVE trun data offset must refuse, not let Python slicing
    # silently wrap to the file's tail
    neg = bytearray(blob)
    at2 = bytes(blob).index(b"trun") + 4 + 8  # fullbox + count
    moof_at = bytes(blob).index(b"moof") - 4
    struct.pack_into(">i", neg, at2, -(moof_at + 50))
    with pytest.raises(ValueError, match="outside the file"):
        parse_mp4_timeline(bytes(neg))

    # tfhd lying about its size: flags declare a default duration the
    # box cannot hold — refuse, don't read the neighbor box's bytes
    short_tfhd = bytearray(blob)
    th = bytes(blob).index(b"tfhd")
    struct.pack_into(">I", short_tfhd, th - 4, 16)   # box size: hdr+v/f+tid
    short_tfhd[th + 4 : th + 8] = (0x08).to_bytes(4, "big")  # v0 + flags
    with pytest.raises(ValueError, match="tfhd too short"):
        parse_mp4_timeline(bytes(short_tfhd))

    # a FLAGLESS tfhd (no base-data-offset, no default-base-is-moof) in
    # the moof's first traf takes the implicit base = moof start — same
    # layout, so timing is unchanged
    fore = bytearray(blob)
    tf = bytes(blob).index(b"tfhd")
    fore[tf + 4 : tf + 8] = (0).to_bytes(4, "big")  # v0, no flags at all
    assert [r[0] for r in parse_mp4_timeline(bytes(fore))["samples"][:2]] \
        == [0, 40]


def test_mp3_tolerant_truncated_tail():
    """Opt-in truncated-tail tolerance (round 14): a FINAL frame cut
    off by a truncated download stops the walk at the last complete
    frame and reports the dropped byte count, instead of refusing the
    whole file — the single most common defect in crawled MP3s. The
    default stays loud, mid-stream garbage stays loud in BOTH modes,
    and a file with zero complete frames still refuses."""
    import pytest

    from sed_binning_spark.pipeline.mp3 import (
        encode_mp3_frames, parse_mp3_timeline,
    )

    blob = encode_mp3_frames(4, bitrate_kbps=96, sample_rate=32000)

    # intact file: tolerance is a no-op and reports zero drops
    info = parse_mp3_timeline(blob, tolerate_truncated_tail=True)
    assert len(info["samples"]) == 4 and info["bytes_dropped"] == 0
    assert parse_mp3_timeline(blob)["bytes_dropped"] == 0

    # final frame cut mid-body: default refuses, tolerant keeps the
    # 3 complete frames and reports the 422 dangling bytes
    cut = blob[:-10]
    with pytest.raises(ValueError, match="past the file end"):
        parse_mp3_timeline(cut)
    got = parse_mp3_timeline(cut, tolerate_truncated_tail=True)
    assert len(got["samples"]) == 3
    assert got["samples"] == parse_mp3_timeline(blob)["samples"][:3]
    assert got["bytes_dropped"] == 432 - 10

    # tail shorter than a header (1-3 bytes): same contract
    got = parse_mp3_timeline(blob + b"\xff", tolerate_truncated_tail=True)
    assert len(got["samples"]) == 4 and got["bytes_dropped"] == 1

    # mid-stream defects are NOT a tail: still loud under tolerance
    free = bytearray(blob)
    free[2] &= 0x0F
    with pytest.raises(ValueError, match="free-format"):
        parse_mp3_timeline(bytes(free), tolerate_truncated_tail=True)

    # a file whose ONLY frame truncates has no timeline to salvage
    with pytest.raises(ValueError, match="no frames"):
        parse_mp3_timeline(blob[:100], tolerate_truncated_tail=True)


def test_mp3_vbr_metadata_frame():
    """Xing/Info/VBRI metadata frames (round 14): nearly every LAME/
    Fraunhofer encode starts with one, and it carries NO audio — the
    walk must exclude it from the timeline (timestamps start at 0 on
    the first real frame) and surface the tag's declared counts.
    Offsets are the spec's: Xing right after the side info (17 bytes
    MPEG-1 mono, 32 stereo), VBRI at a fixed 32 past the header."""
    import pytest

    from sed_binning_spark.pipeline.mp3 import (
        encode_mp3_frames, parse_mp3_timeline,
    )

    plain = parse_mp3_timeline(
        encode_mp3_frames(4, bitrate_kbps=96, sample_rate=32000))
    assert plain["vbr_tag"] is None and plain["vbr_frames"] is None

    for tag, name in ((b"Xing", "xing"), (b"Info", "info"),
                      (b"VBRI", "vbri")):
        for mono in (True, False):
            blob = encode_mp3_frames(
                4, bitrate_kbps=96, sample_rate=32000, mono=mono,
                vbr_tag=tag)
            got = parse_mp3_timeline(blob)
            # the tag frame is excluded: same timeline as the untagged
            # stream — 4 frames, clock starting at 0
            assert got["vbr_tag"] == name, (tag, mono)
            assert got["vbr_frames"] == 4
            assert got["vbr_bytes"] == len(blob)
            base = parse_mp3_timeline(encode_mp3_frames(
                4, bitrate_kbps=96, sample_rate=32000, mono=mono,
            ))["samples"]
            frame_bytes = 144 * 96000 // 32000
            # identical timing/extents; offsets shift past the tag frame
            assert got["samples"] == [
                (t, d, pos + frame_bytes, size, kf)
                for t, d, pos, size, kf in base
            ]

    # a Xing magic whose declared fields run past the FRAME extent is
    # a malformed tag, not audio: loud. The smallest legal frame makes
    # it constructible — MPEG-2 L3 8 kbps / 24 kHz mono is 24 bytes
    # with the tag at 4+9, so a frame-count field would end at byte 25
    tiny = bytearray(24)
    tiny[0:4] = bytes([0xFF, 0xF3, 0x14, 0xC0])
    tiny[13:17] = b"Xing"
    tiny[17:21] = (0x1).to_bytes(4, "big")
    with pytest.raises(ValueError, match="field truncated"):
        parse_mp3_timeline(bytes(tiny))

    # flags with neither count: tag still detected, counts None
    frame = 144 * 96000 // 32000
    tag_at = 4 + 17
    none_flags = bytearray(encode_mp3_frames(
        2, bitrate_kbps=96, sample_rate=32000, vbr_tag=b"Xing"))
    none_flags[tag_at + 4 : tag_at + 16] = (
        (0).to_bytes(4, "big") + b"\x00" * 8)
    got = parse_mp3_timeline(bytes(none_flags))
    assert got["vbr_tag"] == "xing" and got["vbr_frames"] is None
    assert len(got["samples"]) == 2

    # a tag frame with zero audio frames after it has no timeline
    only_tag = encode_mp3_frames(
        3, bitrate_kbps=96, sample_rate=32000, vbr_tag=b"Xing")[:frame]
    with pytest.raises(ValueError, match="no frames"):
        parse_mp3_timeline(only_tag)

    # tolerance composes: tag + 2 complete frames + a cut third
    cut3 = encode_mp3_frames(
        3, bitrate_kbps=96, sample_rate=32000, vbr_tag=b"Xing")[:-7]
    got = parse_mp3_timeline(cut3, tolerate_truncated_tail=True)
    assert got["vbr_tag"] == "xing" and len(got["samples"]) == 2
    assert got["bytes_dropped"] == frame - 7


def test_adts_frame_timeline(spark):
    """ADTS AAC header walk (round 14): frame extents straight from
    the header's 13-bit length field, a 1024-samples-per-block clock
    (64 ms exactly at the 16 kHz fixture rate), ID3 tags skipped,
    truncated-tail tolerance composing, and every refusal loud. The
    layer==00 discriminator keeps ADTS and MPEG audio apart in the
    sample_frames dispatch."""
    import pytest
    from pyspark.sql import functions as F

    from sed_binning_spark.pipeline.aac import (
        encode_adts_frames, looks_like_adts, parse_adts_timeline,
    )
    from sed_binning_spark.pipeline.mp3 import encode_mp3_frames
    from sed_binning_spark.pipeline.multimodal import sample_frames

    blob = encode_adts_frames([10, 20, 30, 40], sample_rate=16000,
                              channels=2)
    info = parse_adts_timeline(blob)
    assert (info["codec"], info["channels"], info["sample_rate"]) \
        == ("aac-lc", 2, 16000)
    assert info["samples"] == [
        (64 * f, 64, sum(17 + 10 * g for g in range(f)), 17 + 10 * f,
         True)
        for f in range(4)
    ]
    assert info["bytes_dropped"] == 0

    # ID3v2 front tag and ID3v1 trailer are skipped, like MP3
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 12]) + b"x" * 12
    id3v1 = b"TAG" + b"\x00" * 125
    w = parse_adts_timeline(id3v2 + blob + id3v1)
    assert [r[3] for r in w["samples"]] == [17, 27, 37, 47]
    assert looks_like_adts(id3v2 + blob)
    assert not looks_like_adts(
        encode_mp3_frames(2, bitrate_kbps=96, sample_rate=32000))
    assert not looks_like_adts(b"\xff\xd8\xffjpeg")

    # max_frames caps; a 48 kHz stream rounds 21.333 ms per frame
    assert len(parse_adts_timeline(blob, max_frames=2)["samples"]) == 2
    hi = parse_adts_timeline(
        encode_adts_frames([8, 8, 8], sample_rate=48000))
    assert [r[0] for r in hi["samples"]] == [0, 21, 43]

    # refusals: truncated tail (loud default / tolerant opt-in),
    # mid-stream parameter change, PCE channels, reserved rate index,
    # zero payload
    cut = blob[:-5]
    with pytest.raises(ValueError, match="past the file end"):
        parse_adts_timeline(cut)
    got = parse_adts_timeline(cut, tolerate_truncated_tail=True)
    assert len(got["samples"]) == 3 and got["bytes_dropped"] == 47 - 5
    mixed = blob + encode_adts_frames([10], sample_rate=8000)
    with pytest.raises(ValueError, match="mid-stream"):
        parse_adts_timeline(mixed)
    bad = bytearray(encode_adts_frames([10]))
    bad[3] &= 0x3F  # channel bits 2..1 → config 0 (mono fixture: cfg 1)
    bad[2] &= 0xFE
    with pytest.raises(ValueError, match="inband PCE"):
        parse_adts_timeline(bytes(bad))
    rate = bytearray(encode_adts_frames([10]))
    rate[2] = (rate[2] & 0xC3) | (15 << 2)
    with pytest.raises(ValueError, match="frequency index"):
        parse_adts_timeline(bytes(rate))
    with pytest.raises(ValueError, match="no room"):
        parse_adts_timeline(b"\xff\xf1\x00")

    # Spark dispatch: audio mode walks ADTS; video mode yields nothing
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, payload binary")
    rows = sample_frames(df, media="audio").orderBy("frame_index")
    got = [(r["frame_ms"], r["n_bytes"]) for r in rows.collect()]
    assert got == [(64 * f, 17 + 10 * f) for f in range(4)]
    assert sample_frames(df).count() == 0
    # tail tolerance reaches the ADTS branch through the shared flag
    cut_df = spark.createDataFrame(
        [(1, bytearray(cut))], "media_id long, payload binary")
    assert sample_frames(cut_df, media="audio").count() == 0
    assert sample_frames(
        cut_df, media="audio", tolerate_truncated_mp3_tail=True,
    ).count() == 3


def test_ogg_crc_fast_path_and_granules():
    """Round-14 Ogg fixes: the zlib-reflection CRC (the hot-loop
    replacement for the per-byte Python walk) matches the spec-literal
    table implementation bit-for-bit on arbitrary data, and the fixture
    writer's data-page granule positions follow RFC 7845 §4 — the
    cumulative 48 kHz sample count, NOT offset by pre-skip (pre-skip
    lives only in the OpusHead field)."""
    import numpy as np

    from sed_binning_spark.pipeline.ogg import (
        _iter_pages, _ogg_crc, _ogg_crc_bytewise, encode_ogg_opus,
        opus_packet_samples,
    )

    rng = np.random.default_rng(14)
    for n in (0, 1, 2, 3, 7, 8, 255, 256, 4096, 10001):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert _ogg_crc(data) == _ogg_crc_bytewise(data), n

    # 3 packets of 20 ms SILK WB (960 samples each) over 2 data pages
    pkts = [bytes([(9 << 3)]) + b"p" * 3 for _ in range(3)]
    blob = encode_ogg_opus(pkts, pre_skip=312, packets_per_page=2)
    assert opus_packet_samples(pkts[0][0]) == 960
    granules = [g for f, g, s, q, segs, b in _iter_pages(blob)
                if q >= 2]  # data pages only (0 = head, 1 = tags)
    # cumulative decoded-sample count per page: 2 packets then 1 more,
    # NOT 312 higher (the pre-skip overcount the round-13 advice found)
    assert granules == [1920, 2880]


def test_mp4_trun_default_size_zero_refuses():
    """Round-14 advice fix: a trun with NO per-sample fields draws
    every sample's size from the tfhd/trex default — with that default
    ZERO, nothing ties the declared count to real bytes (each row
    advances the data pointer by 0), so a lying count could fabricate
    rows. Refuse; the non-zero-default twin stays accepted with rows
    bounded by the mdat extent check."""
    import struct

    import pytest

    from sed_binning_spark.pipeline.mp4 import (
        encode_mp4_fragmented, parse_mp4_timeline,
    )

    base = encode_mp4_fragmented(
        [b"abc", b"def"], [40, 40], frames_per_fragment=2,
    )

    def rebuild_trun(blob: bytes, tf_flags: int, d_dur: int, d_size: int,
                     cnt: int) -> bytes:
        """Swap the fixture's per-sample trun for a defaults-only one:
        tfhd gains default duration/size fields, trun keeps only its
        data offset. Box sizes are rebuilt, not lied about."""
        b = bytearray(blob)
        tf = bytes(blob).index(b"tfhd") - 4
        tr = bytes(blob).index(b"trun") - 4
        tr_end = tr + struct.unpack_from(">I", blob, tr)[0]
        (doff,) = struct.unpack_from(">i", blob, tr + 16)
        tfhd = struct.pack(">I4sI I II", 24, b"tfhd", tf_flags, 1,
                           d_dur, d_size)
        trun = struct.pack(">I4sI Ii", 20, b"trun", 0x01, cnt, doff)
        new = bytes(b[:tf]) + tfhd + trun + bytes(b[tr_end:])
        # resize the two enclosing boxes (traf, moof) by the delta
        delta = len(new) - len(blob)
        out = bytearray(new)
        for tag in (b"traf", b"moof"):
            at = new.index(tag) - 4
            (sz,) = struct.unpack_from(">I", new, at)
            struct.pack_into(">I", out, at, sz + delta)
        # the trun data offset is moof-relative; moof size changed
        (old_doff,) = struct.unpack_from(">i", new, new.index(b"trun") + 12)
        struct.pack_into(">i", out, bytes(new).index(b"trun") + 12,
                         old_doff + delta)
        return bytes(out)

    # defaults-only trun with a REAL default size: rows come out, sized
    # and timed from tfhd defaults (0x08 = duration, 0x10 = size,
    # 0x20000 = default-base-is-moof)
    ok = rebuild_trun(base, 0x20000 | 0x08 | 0x10, 40, 3, 2)
    rows = parse_mp4_timeline(ok)["samples"]
    assert [(r[0], r[1], r[3]) for r in rows] == [(0, 40, 3), (40, 40, 3)]

    # same shape with default size 0: the count is unverifiable (a
    # count below the file size, so the lie slips past the cnt > n
    # check that catches the grosser fabrications)
    with pytest.raises(ValueError, match="unverifiable"):
        parse_mp4_timeline(rebuild_trun(base, 0x20000 | 0x08 | 0x10,
                                        40, 0, 500))


def test_webm_lacing(spark):
    """Matroska lacing (round 14 — the round-13 verdict's #1 watch
    item): all three lacing formats decode to one row per laced frame
    with EXACT byte extents (Xiph 255-run bytes incl. multi-run sizes,
    EBML plain-vint-then-signed-deltas, fixed even division); laced
    timestamps step by DefaultDuration when declared, else by an evenly
    dividing BlockDuration, else share the block timestamp with a NULL
    delay; malformed lace tables refuse loudly; keyframes_only and
    max_frames behave across laced blocks; the Spark audio path carries
    laced Opus-shaped rows end-to-end."""
    import pytest

    from sed_binning_spark.pipeline.multimodal import sample_frames
    from sed_binning_spark.pipeline.webm import (
        encode_webm, parse_webm_timeline,
    )

    # six Opus-packet-shaped payloads with awkward sizes: one spanning
    # multiple Xiph run bytes (510 = 255+255+0), one exactly 255
    pay = [b"a" * 3, b"b" * 255, b"c" * 510, b"d" * 7, b"e" * 64,
           b"f" * 1]
    times = [0, 20, 40, 60, 80, 100]

    for lacing in ("xiph", "ebml"):
        blob = encode_webm(
            pay, times, track_type=2, codec_id="A_OPUS",
            default_duration_ms=20, lacing=lacing, frames_per_block=3,
            blocks_per_cluster=1,
        )
        info = parse_webm_timeline(blob, media="audio")
        assert [(r[0], r[1], r[3]) for r in info["samples"]] == [
            (t, 20, len(p)) for t, p in zip(times, pay)
        ], lacing
        for (st_, d, pos, sz, kf), p in zip(info["samples"], pay):
            assert blob[pos : pos + sz] == p, lacing
            assert kf

    # fixed lacing requires equal sizes — and divides exactly
    eq = [bytes([i]) * 16 for i in range(4)]
    fx = encode_webm(eq, [0, 10, 20, 30], track_type=2,
                     codec_id="A_OPUS", default_duration_ms=10,
                     lacing="fixed", frames_per_block=4)
    rows = parse_webm_timeline(fx, media="audio")["samples"]
    assert [(r[0], r[3]) for r in rows] == [(0, 16), (10, 16),
                                            (20, 16), (30, 16)]
    for (st_, d, pos, sz, kf), p in zip(rows, eq):
        assert fx[pos : pos + sz] == p
    with pytest.raises(ValueError, match="equal frame sizes"):
        encode_webm(pay[:2], [0, 10], lacing="fixed",
                    frames_per_block=2)

    # no DefaultDuration: laced frames share the block timestamp and
    # carry a NULL delay (the container has no finer clock)
    bare = encode_webm(pay[:3], [0, 20, 40], track_type=2,
                       codec_id="A_OPUS", lacing="xiph",
                       frames_per_block=3)
    rows = parse_webm_timeline(bare, media="audio")["samples"]
    assert [(r[0], r[1]) for r in rows] == [(0, None)] * 3

    # ... unless a BlockGroup's BlockDuration divides evenly: the whole
    # block spans 60 ms over 3 frames -> 20 ms steps (needs a 4th frame
    # to give the block a successor-derived duration)
    grp = encode_webm(pay[:4], [0, 20, 40, 60], track_type=2,
                      codec_id="A_OPUS", lacing="xiph",
                      frames_per_block=3, use_block_groups=True)
    rows = parse_webm_timeline(grp, media="audio")["samples"]
    assert [(r[0], r[1]) for r in rows[:3]] == [(0, 20), (20, 20),
                                                (40, 20)]

    # keyframes_only prunes whole laced video blocks by their flag
    vid = encode_webm(pay, times, keyframes=[True, True, True, False,
                                             False, False],
                      default_duration_ms=20, lacing="ebml",
                      frames_per_block=3)
    kf_rows = parse_webm_timeline(vid)["samples"]
    assert [r[4] for r in kf_rows] == [True] * 3 + [False] * 3
    from sed_binning_spark.pipeline.multimodal import sample_frames

    df = spark.createDataFrame([(5, bytearray(vid))],
                               "media_id long, payload binary")
    krows = sample_frames(df, keyframes_only=True) \
        .orderBy("frame_index").collect()
    assert [r.frame_index for r in krows] == [0, 1, 2]

    # max_frames trims INSIDE a laced block (no overshoot)
    assert len(parse_webm_timeline(vid, max_frames=2)["samples"]) == 2
    assert len(parse_webm_timeline(vid, max_frames=4)["samples"]) == 4

    # malformed lace tables refuse loudly, naming the defect
    lx = bytearray(encode_webm([b"q", b"r"], [0, 20], lacing="xiph",
                               frames_per_block=2))
    at = bytes(lx).index(b"qr") - 2  # the lace count byte
    assert lx[at] == 1
    lx[at] = 10  # 11 frames, but only 3 run bytes exist in the block
    with pytest.raises(ValueError, match="truncates its size runs"):
        parse_webm_timeline(bytes(lx))
    # a lace table whose sizes overrun the body refuses too
    lo = bytearray(encode_webm([b"q", b"r"], [0, 20], lacing="xiph",
                               frames_per_block=2))
    lo[bytes(lo).index(b"qr") - 1] = 9  # frame 0 claims 9 of 2 bytes
    with pytest.raises(ValueError, match="exceed the block body"):
        parse_webm_timeline(bytes(lo))

    le = bytearray(encode_webm([b"x" * 40, b"y" * 2, b"z" * 3],
                               [0, 10, 20], lacing="ebml",
                               frames_per_block=3))
    # lace header = count 2, vint(40) = 0xA8, svint(2-40) = 0x99 —
    # bump the first size vint beyond the block body so the remainder
    # goes negative
    at = bytes(le).index(bytes([2, 0xA8, 0x99])) + 1
    le[at] = 0x80 | 126
    with pytest.raises(ValueError, match="exceed the block body"):
        parse_webm_timeline(bytes(le))

    fe = bytearray(fx)
    # fixed lacing: shrink the count byte so the body stops dividing
    # (64 body bytes over 3 frames)
    at = bytes(fe).index(b"\x00" * 16) - 1
    assert fe[at] == 3
    fe[at] = 2
    with pytest.raises(ValueError, match="do not divide"):
        parse_webm_timeline(bytes(fe), media="audio")

    # the Spark audio path: laced Opus-shaped blocks yield per-frame
    # rows with sizes and stepped times
    adf = spark.createDataFrame(
        [(1, bytearray(encode_webm(pay, times, track_type=2,
                                   codec_id="A_OPUS", channels=2,
                                   sample_rate=48000.0,
                                   default_duration_ms=20,
                                   lacing="xiph", frames_per_block=2)))],
        "media_id long, payload binary",
    )
    rows = sample_frames(adf, media="audio").orderBy("frame_index") \
        .collect()
    assert [(r.frame_ms, r.delay_ms, r.n_bytes) for r in rows] == [
        (t, 20, len(p)) for t, p in zip(times, pay)
    ]


def test_flac_codec_roundtrips():
    """FLAC (round 14, RFC 9639): the lossless decoder reproduces the
    encoder's input EXACTLY across subframe types (constant, verbatim,
    fixed 0-4, LPC), stereo decorrelation modes (side channels carry
    their +1 bit), Rice partitions, the escape (raw-width) encoding,
    wasted bits, 8-bit depth, and multi-frame streams with a partial
    final block — plus the int16 contract of decode_audio_flac."""
    import numpy as np

    from sed_binning_spark.pipeline.flac import (
        decode_audio_flac, decode_flac, encode_flac,
    )

    rng = np.random.default_rng(7)

    def rt(sig, **kw):
        blob = encode_flac(sig, 16000, **kw)
        got = decode_flac(blob)["samples"]
        want = np.asarray(sig, np.int64)
        if want.ndim == 1:
            want = want[:, None]
        np.testing.assert_array_equal(got, want)
        return blob

    t = np.arange(5000)
    sig = np.round(8000 * np.sin(t / 25)).astype(np.int64)
    for o in range(5):
        rt(sig, subframe="fixed", order=o, block_size=512)
    rt(rng.integers(-32768, 32768, 1000), subframe="verbatim",
       block_size=256)
    rt(np.full(700, -123), subframe="constant", block_size=256)
    rt(sig, subframe="lpc", lpc_coefs=[3, -3, 1], lpc_shift=0,
       lpc_precision=5, block_size=512)
    rt(sig, subframe="lpc", lpc_coefs=[103, -52], lpc_shift=6,
       lpc_precision=9, block_size=512)
    st = np.stack(
        [sig[:3000],
         np.round(6000 * np.cos(t[:3000] / 40)).astype(np.int64)],
        axis=1)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        rt(st, channel_mode=mode, subframe="fixed", order=2,
           block_size=512)
    rt(sig, subframe="fixed", order=1, partition_order=3,
       block_size=512)
    rt(sig, subframe="fixed", order=2, rice_escape=True, block_size=512)
    rt((sig >> 3) << 3, subframe="fixed", order=2, wasted_bits=3,
       block_size=512)
    rt((sig >> 8), bits_per_sample=8, subframe="fixed", order=1,
       block_size=256)

    s16, rate = decode_audio_flac(encode_flac(sig, 16000))
    assert rate == 16000 and s16.dtype == np.int16
    np.testing.assert_array_equal(s16.ravel(), sig.astype(np.int16))
    # 8-bit rescales up to the shared int16 contract
    s8, _ = decode_audio_flac(encode_flac(
        (sig >> 8), 16000, bits_per_sample=8))
    np.testing.assert_array_equal(
        s8.ravel(), ((sig >> 8) << 8).astype(np.int16))


def test_flac_spec_literal_frame_and_refusals():
    """Independence check for the FLAC codec (no external decoder in
    this container): a frame hand-assembled BIT BY BIT from RFC 9639 —
    sync, blocksize code 6, sample-size code 4, coded number, a FIXED
    order-1 subframe with Rice(2) residuals — must decode to the
    hand-computed samples; the CRC-8/CRC-16 implementations pin the
    published '123456789' check values (0xF4 / 0xFEE8); the coded
    number IS UTF-8 where the ranges overlap; and malformed streams
    (bad magic/CRCs/sync, lying totals, md5 mismatch, truncation)
    refuse loudly by name."""
    import struct

    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.flac import (
        _coded_number_bytes, _crc8, _crc16, decode_flac, encode_flac,
    )

    # published check values: CRC-8 (poly 0x07) and CRC-16/BUYPASS
    # (poly 0x8005), both init 0, no reflection
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8

    # the frame-header coded number IS the UTF-8 encoding where the
    # scalar ranges overlap
    for n in (0x00, 0x44, 0x7F, 0x80, 0x100, 0x7FF, 0x800, 0x2345,
              0xFFFF, 0x10000, 0x10FFFF):
        assert _coded_number_bytes(n) == chr(n).encode("utf-8"), hex(n)

    # ---- hand-built stream: samples [100, 102, 103, 101], mono 16-bit
    # STREAMINFO: blocksizes 4/4, framesizes 0, rate 8000, 1 ch, 16 bps,
    # total 4, md5 zeroed (skip the hash so the frame is the only check)
    raw = (8000 << 44) | (0 << 41) | (15 << 36) | 4
    si = (struct.pack(">HH", 4, 4) + b"\x00" * 6
          + raw.to_bytes(8, "big") + b"\x00" * 16)
    header = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si

    # frame header: sync+0+0 | bs code 6, rate code 0 | ch 0, bps code
    # 4 (16-bit), 0 | coded number 0 | blocksize-1 = 3
    fh = bytes([0xFF, 0xF8, 0x60, 0x08, 0x00, 0x03])
    fh += bytes([_crc8(fh)])
    # subframe: 0|001001|0 = FIXED order 1, no wasted bits; warmup
    # 100 as 16 bits; residual: method 00, porder 0000, param 0010,
    # then diffs [2, 1, -2] -> zigzag [4, 2, 3] -> Rice(2):
    # q=1,low=00 | q=0,low=10 | q=0,low=11 -> bits 0100 0110 1111
    # subframe bit stream: 00010010 (hdr) | 00000000 01100100 (warmup)
    # | 00 0000 0010 (method/porder/param) 01 00 1 10 1 11 (codes)
    # | 0000 (pad) -> bytes 12 00 64 00 93 70
    body = bytes([0b00010010, 0b00000000, 0b01100100,
                  0b00000000, 0b10010011, 0b01110000])
    frame = fh + body
    frame += struct.pack(">H", _crc16(frame))
    got = decode_flac(header + frame)
    assert got["sample_rate"] == 8000 and got["channels"] == 1
    np.testing.assert_array_equal(
        got["samples"].ravel(), [100, 102, 103, 101])

    # ---- refusals, each naming its defect
    blob = encode_flac(np.arange(-500, 500, dtype=np.int64), 8000)
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"fLaX" + blob[4:])
    # a flipped payload byte must fail a CRC (or a decode check), never
    # pass silently
    bad = bytearray(blob)
    bad[-3] ^= 0x40
    with pytest.raises(ValueError,
                       match="CRC|md5|range|Rice|sync|padding"):
        decode_flac(bytes(bad))
    # lying STREAMINFO total
    lied = bytearray(blob)
    # total_samples low bit: STREAMINFO byte 17, at file offset 8 + 17
    lied[8 + 17] ^= 0x01
    with pytest.raises(ValueError, match="declares"):
        decode_flac(bytes(lied))
    # md5 mismatch: stomp the stored digest
    md5bad = bytearray(blob)
    md5bad[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="md5"):
        decode_flac(bytes(md5bad))
    # truncation inside a frame
    with pytest.raises(ValueError, match="truncat|declares"):
        decode_flac(blob[: len(blob) - 40])
    # garbage after the last frame when total is unknown: rebuild the
    # stream with total=0 and append junk -> no sync code
    from sed_binning_spark.pipeline.flac import _crc16 as c16  # noqa: F401
    nt = bytearray(encode_flac(np.arange(64, dtype=np.int64), 8000,
                               write_md5=False))
    raw0 = int.from_bytes(nt[8 + 10 : 8 + 18], "big")
    nt[8 + 10 : 8 + 18] = (raw0 & ~((1 << 36) - 1)).to_bytes(8, "big")
    assert len(decode_flac(bytes(nt))["samples"]) == 64
    with pytest.raises(ValueError, match="sync"):
        decode_flac(bytes(nt) + b"\x00\x00")


def test_flac_spark_paths(spark):
    """FLAC through the Spark operators: sample_audio_windows windows a
    FLAC payload on its own clock exactly like WAV (lossless → the
    stats equal the original PCM's), transcode_audio re-encodes FLAC to
    WAV (and the round-trip back through encode matches), and
    decode_payload classifies FLAC as audio with true
    dims/rate/channels."""
    import numpy as np

    from sed_binning_spark.pipeline.flac import encode_flac
    from sed_binning_spark.pipeline.multimodal import (
        decode_payload, encode_audio_wav, sample_audio_windows,
        transcode_audio,
    )

    t = np.arange(64)
    sig = (((t * t * 7 + 13 * t) % 4001) - 2000).astype(np.int64)
    blob = encode_flac(sig, 4000, block_size=32)
    wav = encode_audio_wav(sig.astype(np.int16), 4000)

    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(wav)),
         (3, bytearray(b"not audio"))],
        "media_id long, payload binary",
    )
    rows = sample_audio_windows(df, window_ms=4) \
        .orderBy("media_id", "window_index").collect()
    flac_rows = [r for r in rows if r.media_id == 1]
    wav_rows = [r for r in rows if r.media_id == 2]
    assert len(flac_rows) == 4 and len(wav_rows) == 4
    # lossless: FLAC windows carry the SAME stats as the PCM twin
    for a, b in zip(flac_rows, wav_rows):
        assert (a.start_ms, a.duration_ms, a.n_samples) \
            == (b.start_ms, b.duration_ms, b.n_samples)
        assert (a.mean, a.std, a.rms, a.min, a.max) \
            == (b.mean, b.std, b.rms, b.min, b.max)
    assert not [r for r in rows if r.media_id == 3]

    out = transcode_audio(df, fmt="pcm16").orderBy("media_id").collect()
    assert out[0].sample_rate == 4000 and out[0].n_samples == 64
    got = np.frombuffer(bytes(out[0].payload)[44:], "<i2")
    np.testing.assert_array_equal(got, sig.astype(np.int16))
    assert out[2].payload is None  # non-audio degrades to NULL

    vec = decode_payload(blob, 8)
    assert vec[0] == 2.0 and vec[1] == 64.0 and vec[2] == 4000.0 \
        and vec[3] == 1.0


def test_webp_header_sniff(spark):
    """WebP (round 14): mime-level sniff — variant and true dimensions
    from the RIFF/VP8/VP8L/VP8X headers with NO pixel decode (the
    H.264 posture). decode_payload classifies WebP as kind 3
    (image-metadata) with header dims and honest BYTE stats; malformed
    headers refuse by name and degrade to byte stats through the
    operator; resize_images leaves WebP alone (nothing decodable)."""
    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.multimodal import (
        decode_payload, encode_webp_header, extract_features,
        parse_webp_header, resize_images,
    )

    cases = [("vp8", 48, 30), ("vp8l", 33, 17), ("vp8x", 1024, 768)]
    for variant, w, h in cases:
        blob = encode_webp_header(w, h, variant=variant)
        assert parse_webp_header(blob) == (variant, w, h)
        vec = decode_payload(blob, 8)
        assert vec[:4] == [3.0, float(w), float(h), 0.0]
        arr = np.frombuffer(blob, np.uint8)
        assert vec[4] == float(arr.mean() / 255.0)

    # 14-bit VP8L edge: width exactly 16384 encodes as 16383+1
    big = encode_webp_header(16384, 1, variant="vp8l")
    assert parse_webp_header(big) == ("vp8l", 16384, 1)

    with pytest.raises(ValueError, match="not a WebP"):
        parse_webp_header(b"RIFF\x00\x00\x00\x00WAVE")
    vp8 = bytearray(encode_webp_header(48, 30))
    vp8[20] |= 1  # interframe bit
    with pytest.raises(ValueError, match="interframe"):
        parse_webp_header(bytes(vp8))
    vp8 = bytearray(encode_webp_header(48, 30))
    vp8[24] ^= 0xFF  # start code
    with pytest.raises(ValueError, match="start code"):
        parse_webp_header(bytes(vp8))
    short = encode_webp_header(48, 30)[:22]
    with pytest.raises(ValueError, match="past the payload end"):
        parse_webp_header(short)
    bad = bytearray(encode_webp_header(33, 17, variant="vp8l"))
    bad[20] = 0x30
    with pytest.raises(ValueError, match="signature"):
        parse_webp_header(bytes(bad))
    unk = bytearray(encode_webp_header(48, 30))
    unk[12:16] = b"ANIM"
    with pytest.raises(ValueError, match="unknown first chunk"):
        parse_webp_header(bytes(unk))

    # through the operator: valid WebP -> kind 3 with dims; corrupt
    # WebP degrades to byte stats (kind 0), the batch survives
    good = encode_webp_header(48, 30)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bytes(vp8)))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r.feat for r in
            extract_features(df, feature_dim=8).collect()}
    assert rows[1][:4] == [3.0, 48.0, 30.0, 0.0]
    assert rows[2][0] == 0.0  # corrupt start code -> byte stats
    rz = resize_images(df, 8, 8).collect()
    assert all(r.payload is None for r in rz)  # no pixels to resize


def test_mp3_tolerant_tail_through_operator(spark):
    """The opt-in MP3 tail tolerance reaches the Spark operator: by
    default a download-truncated MP3 degrades to ZERO rows (the loud
    posture, batch survives); with tolerate_truncated_mp3_tail=True
    the complete frames come through and only the dangling tail is
    dropped. Other containers are unaffected by the flag."""
    from sed_binning_spark.pipeline.mp3 import encode_mp3_frames
    from sed_binning_spark.pipeline.multimodal import sample_frames
    from sed_binning_spark.pipeline.ogg import encode_ogg_opus

    cut = encode_mp3_frames(4, bitrate_kbps=96, sample_rate=32000)[:-10]
    ogg = encode_ogg_opus([bytes([9 << 3]) + b"ab"] * 2)
    df = spark.createDataFrame(
        [(1, bytearray(cut)), (2, bytearray(ogg))],
        "media_id long, payload binary",
    )
    assert sample_frames(df, media="audio") \
        .where("media_id = 1").count() == 0
    rows = sample_frames(df, media="audio",
                         tolerate_truncated_mp3_tail=True) \
        .orderBy("media_id", "frame_index").collect()
    assert [(r.media_id, r.frame_ms) for r in rows] == [
        (1, 0), (1, 36), (1, 72), (2, 0), (2, 20),
    ]


def test_flac_and_webm_review_hardening():
    """Round-14 review fixes: (1) corrupt/crafted FLAC must surface
    only _DECODE_ERRORS types — a diverging LPC recursion or absurd
    Rice quotient raises ValueError, never an OverflowError escaping
    the batch (bit-flip fuzz over the frame region pins it); (2) a
    FLAC with trailing bytes after its declared total refuses loudly;
    (3) EBML all-ones varints are plain VALUES for lace sizes/deltas
    and block track numbers (0xFF = size 127 / delta +64 / track 127),
    not a reserved 'unknown' pattern — refusing them rejected valid
    third-party laced WebM."""
    import struct

    import numpy as np
    import pytest

    from sed_binning_spark.pipeline.flac import decode_flac, encode_flac
    from sed_binning_spark.pipeline.multimodal import _DECODE_ERRORS
    from sed_binning_spark.pipeline.webm import (
        _read_svint, _read_uint_vint, parse_webm_timeline,
    )
    from sed_binning_spark.pipeline import webm as W

    t = np.arange(600)
    sig = np.round(7000 * np.sin(t / 9)).astype(np.int64)
    blob = encode_flac(sig, 8000, subframe="lpc", lpc_coefs=[103, -52],
                       lpc_shift=6, lpc_precision=9, block_size=256)
    # every single-bit corruption of the frame region must raise one
    # of _DECODE_ERRORS (or decode clean if the bit lands in slack) —
    # never a foreign exception type that would kill a Spark batch
    frames_at = 8 + 4 + 34  # magic + block header + STREAMINFO
    for at in range(frames_at, len(blob)):
        bad = bytearray(blob)
        bad[at] ^= 0x80
        try:
            decode_flac(bytes(bad))
        except _DECODE_ERRORS:
            pass  # the contract: known types only
    # trailing bytes after the declared total refuse by name
    with pytest.raises(ValueError, match="trailing"):
        decode_flac(blob + b"\x00\x00\x00")

    # EBML all-ones varints are values, not reservations
    assert _read_uint_vint(b"\xff", 0) == (127, 1)
    assert _read_svint(b"\xff", 0) == (64, 1)
    assert _read_svint(b"\x60\x3f", 0) == (64, 2)  # 2-byte twin

    # a SimpleBlock with track number 127 encoded as the 1-byte 0xFF:
    # hand-built cluster (the fixture writer always picks 2 bytes)
    entry = (W._uint_elem(W._TRACK_NUMBER, 127)
             + W._uint_elem(W._TRACK_TYPE, 2)
             + W._elem(W._CODEC_ID, b"A_OPUS")
             + W._elem(W._AUDIO, b""))
    blk = b"\xff" + struct.pack(">h", 0) + b"\x80" + b"pay"
    hand = (W._elem(0x1A45DFA3, W._elem(0x4282, b"webm"))
            + W._elem(W._SEGMENT,
                      W._elem(W._TRACKS, W._elem(W._TRACK_ENTRY, entry))
                      + W._elem(W._CLUSTER,
                                W._uint_elem(W._CLUSTER_TIMESTAMP, 5)
                                + W._elem(W._SIMPLE_BLOCK, blk))))
    rows = parse_webm_timeline(hand, media="audio")["samples"]
    assert [(r[0], r[3], r[4]) for r in rows] == [(5, 3, True)]

    # Xiph lacing whose first size is the 1-byte all-ones 0xFF...
    # (Xiph runs are raw bytes, unaffected) — the EBML form: first
    # lace size 127 as 0xFF, second implicit
    lace = bytes([1]) + b"\xff"  # 2 frames, first size 127
    blk2 = (b"\xff" + struct.pack(">h", 0) + bytes([0x80 | 0x06])
            + lace + b"q" * 127 + b"r" * 9)
    hand2 = (W._elem(0x1A45DFA3, W._elem(0x4282, b"webm"))
             + W._elem(W._SEGMENT,
                       W._elem(W._TRACKS, W._elem(W._TRACK_ENTRY, entry))
                       + W._elem(W._CLUSTER,
                                 W._uint_elem(W._CLUSTER_TIMESTAMP, 0)
                                 + W._elem(W._SIMPLE_BLOCK, blk2))))
    rows = parse_webm_timeline(hand2, media="audio")["samples"]
    assert [r[3] for r in rows] == [127, 9]
