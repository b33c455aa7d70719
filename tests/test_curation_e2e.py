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
