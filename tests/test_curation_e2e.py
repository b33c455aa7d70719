"""End-to-end curation chain (docs/curation.md, every stage): HTML →
gates → dedup (exact, segment, MinHash) → quality/language/LM →
PII → decontamination → mix/split → packing → assembly → telemetry,
run on the driver corpus, asserted non-degenerate and bit-identical
across partition layouts."""

from pathlib import Path

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not Path(f"{SF}/documents.parquet").exists(),
    reason="driver testdata not present",
)


def _chain(spark, docs):
    from sed_binning_spark.pipeline import (
        assign_splits,
        corpus_report,
        decontaminate,
        dedup_segments,
        exact_dedup_keep_rows,
        filter_badwords,
        filter_by_blocklist,
        minhash_lsh_pairs,
        near_dedup_keep_rows,
        ngram_jaccard,
        pack_chunks,
        pack_sequences,
        quality_score,
        scrub_pii,
        stratified_sample,
        strip_html,
        temperature_rates,
        unigram_logprob,
    )
    from sed_binning_spark.pipeline.text import dup_segment_stats, language_id

    # 0: raw-crawl shape — wrap the corpus in HTML with shared boilerplate
    docs = docs.select(
        "doc_id", "source",
        F.concat(
            F.lit("<!DOCTYPE html><html><body><script>x()</script><p>"),
            F.col("text"),
            F.lit("</p><p>shared footer</p></body></html>"),
        ).alias("text"),
    )
    docs = strip_html(docs).withColumn("text", F.col("text_clean")).drop("text_clean")
    docs = filter_by_blocklist(docs, ["blocked.example"], "source", match="domain")
    docs = filter_badwords(docs, ["zzzevil"], max_frac=0.0)
    docs = exact_dedup_keep_rows(docs)
    docs = (
        dedup_segments(docs)
        .withColumn("text", F.col("text_dedup"))
        .drop("text_dedup", "n_segments", "n_kept", "n_removed")
    )
    cand = minhash_lsh_pairs(docs)
    pairs = ngram_jaccard(cand, docs).filter(F.col("jaccard") > 0.8)
    docs = near_dedup_keep_rows(docs, pairs)
    docs = quality_score(dup_segment_stats(language_id(docs)))
    docs = unigram_logprob(docs)
    docs = scrub_pii(docs)
    bench = docs.where(F.col("doc_id") % 50 == 0).select("text")
    docs = decontaminate(docs.where(F.col("doc_id") % 50 != 0), bench, n=13)
    rates = temperature_rates(docs, "source", alpha=0.7)
    docs = stratified_sample(docs, "source", rates, key_columns=("doc_id",), seed=1)
    docs = assign_splits(
        docs, {"train": 0.9, "val": 0.1}, key_columns=("source",), seed=2,
    )
    train = docs.where(F.col("split") == "train")
    man = pack_chunks(train, seq_tokens=128, n_shards=4)
    seqs = pack_sequences(man, train)
    report = corpus_report(docs, strata_column="split")
    return docs, man, seqs, report


@needs_testdata
def test_full_chain_runs_and_is_layout_deterministic(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    docs_a, man_a, seqs_a, report_a = _chain(spark, base)
    docs_b, man_b, seqs_b, _ = _chain(spark, base.repartition(7))
    # several actions per frame below — cache so the LSH/dedup/packing
    # lineage executes once per layout, not once per assertion
    for frame in (docs_a, docs_b, man_a, man_b):
        frame.persist()

    a = {tuple(r) for r in docs_a.select("doc_id", "split", "quality",
                                         "unigram_logprob", "lang_pred").collect()}
    b = {tuple(r) for r in docs_b.select("doc_id", "split", "quality",
                                         "unigram_logprob", "lang_pred").collect()}
    assert a and a == b

    ma = {tuple(r) for r in man_a.collect()}
    mb = {tuple(r) for r in man_b.collect()}
    assert ma and ma == mb

    sa = {(r.shard, r.seq_id, tuple(r.tokens)) for r in seqs_a.collect()}
    sb = {(r.shard, r.seq_id, tuple(r.tokens)) for r in seqs_b.collect()}
    assert sa and sa == sb

    rep = {(r.stratum, r.metric): r.value for r in report_a.collect()}
    n_total = sum(v for (s, m), v in rep.items() if m == "n_docs")
    assert n_total == docs_a.count() > 0
    # the shared boilerplate paragraph survives in at most one document
    with_footer = docs_a.where(F.col("text").contains("shared footer")).count()
    assert with_footer <= 1


@needs_testdata
def test_media_text_feeds_the_curation_chain(spark):
    """The media tier composes with the text tier: subtitle cue text
    and tag text mined from payloads flow straight into language ID
    and text statistics — the transcript half of an A/V training pair
    is ordinary curation input once extracted."""
    from sed_binning_spark.pipeline import (
        extract_media_tags,
        extract_subtitle_cues,
        language_id,
        text_stats,
    )
    from sed_binning_spark.pipeline.subtitles import (
        synthesize_subtitle_media_from_text,
    )
    from sed_binning_spark.pipeline.tags import encode_id3v2

    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .where(F.col("text").isNotNull()).limit(40)

    # cues: synthesized subtitle payloads, parsed back, re-shaped as a
    # document table for the text operators
    media = synthesize_subtitle_media_from_text(docs)
    cue_docs = extract_subtitle_cues(media).select(
        F.col("media_id").alias("doc_id"),
        F.col("text"),
    )
    stats = text_stats(cue_docs)
    langs = language_id(cue_docs)
    n_cues = cue_docs.count()
    assert n_cues == 2 * docs.count()
    assert stats.where(F.col("n_chars") != 16).count() == 0
    assert langs.count() == n_cues

    # tags: ID3 titles re-enter as text rows the same way
    id3_media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.lit(b"ID3\x03\x00\x00\x00\x00\x00\x2b"
                  b"TIT2\x00\x00\x00\x21\x00\x00\x00"),
            F.encode(F.md5("text"), "UTF-8"),
        ).alias("payload"),
    )
    tag_docs = extract_media_tags(id3_media).select(
        F.col("media_id").alias("doc_id"),
        F.col("value").alias("text"),
    )
    assert text_stats(tag_docs).agg(
        F.sum("n_chars")).first()[0] == 32 * docs.count()
