"""Benchmark decontamination: find and drop training documents that
overlap an evaluation set.

The standard guard (GPT-3 appendix C style): a training document is
contaminated when it shares at least ``min_matches`` distinct word
``n``-grams (n = 13 by convention) with any benchmark document. The
n-gram machinery is shared with :mod:`~sed_binning_spark.pipeline.dedup`
(lower-cased whitespace tokens, space-joined windows) so the same text
normalization governs dedup and decontamination.

Scale design:

- grams are compared as **full md5 hex digests** of the shingle string —
  engine-portable (the DuckDB oracle computes the same digest) and
  collision-safe at corpus scale (the 28-bit MinHash base hash would
  produce false contamination hits across billions of grams; 128 bits
  will not);
- each side contributes its **distinct** gram set, so a gram repeated
  inside one document counts once and per-document work is bounded by
  document length;
- the benchmark side is an evaluation suite — tiny next to a 100 TB
  corpus — so its gram set is **broadcast**; the corpus-side explode is
  map-only and nothing but (id, 32-byte digest) ever shuffles;
- documents shorter than ``n`` tokens shingle to their full token string
  (dedup's convention), which only matches a benchmark document that is
  the same short string — strictly conservative.

NULL/empty text on either side contributes no grams: such a training
document is never flagged, and reports ``n_matched = 0`` with
``n_grams = 0`` in the stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sed_binning_spark.pipeline.dedup import word_shingles


def ngram_digests(text: Column, n: int = 13) -> Column:
    """Distinct md5 digests of the word ``n``-grams of ``text`` (array of
    32-char hex strings; empty array for blank text, NULL for NULL text)."""
    return F.array_distinct(F.transform(word_shingles(text, n), F.md5))


def _gram_rows(
    df: DataFrame, text_column: str, id_column: str, n: int,
) -> DataFrame:
    """(id, gram) rows, one per distinct gram per document."""
    return df.select(
        F.col(id_column),
        F.explode(ngram_digests(F.col(text_column), n)).alias("gram"),
    )


def contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_column: str = "text",
    id_column: str = "doc_id",
    bench_text_column: str = "text",
    bench_id_column: str = "bench_id",
) -> DataFrame:
    """Which training document overlaps which benchmark document:
    ``(<id_column>, <bench_id_column>, n_matched)`` where ``n_matched``
    counts the distinct shared ``n``-grams. Only overlapping pairs are
    emitted (an all-pairs result would be meaningless at corpus scale).

    The join is an equi-join on the gram digest with the benchmark side
    broadcast — the corpus side never shuffles."""
    _check(docs, text_column, id_column, "docs")
    _check(benchmark, bench_text_column, bench_id_column, "benchmark")
    corpus = _gram_rows(docs, text_column, id_column, n)
    bench = F.broadcast(
        _gram_rows(benchmark, bench_text_column, bench_id_column, n),
    )
    return (
        corpus.join(bench, "gram")
        .groupBy(id_column, bench_id_column)
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_matches: int = 1,
    text_column: str = "text",
    id_column: str = "doc_id",
    bench_text_column: str = "text",
) -> DataFrame:
    """Per-document contamination report against the WHOLE benchmark
    suite: ``(<id_column>, n_grams, n_matched, contaminated)``. Every
    input document appears exactly once — including blank/NULL-text
    documents (``n_grams = 0``, never contaminated). ``n_matched`` counts
    the document's distinct grams that occur anywhere in the benchmark;
    ``contaminated`` is ``n_matched >= min_matches``."""
    if min_matches <= 0:
        raise ValueError(f"min_matches must be positive, got {min_matches}")
    _check(docs, text_column, id_column, "docs")
    _check(benchmark, bench_text_column, None, "benchmark")
    bench_grams = F.broadcast(
        benchmark.select(
            F.explode(ngram_digests(F.col(bench_text_column), n)).alias("gram"),
        ).distinct(),
    )
    per_doc = docs.select(
        F.col(id_column),
        ngram_digests(F.col(text_column), n).alias("grams"),
    ).select(
        id_column,
        # NULL-pinned size (same pattern as text_stats): under a legacy
        # non-ANSI session size(NULL) is -1, not NULL, so guard explicitly
        F.coalesce(
            F.when(F.col("grams").isNotNull(), F.size("grams")), F.lit(0),
        ).cast("bigint").alias("n_grams"),
        # explode_outer keeps gram-less (blank/NULL text) documents as one
        # NULL-gram row so they survive into the aggregate with 0 matches
        F.explode_outer("grams").alias("gram"),
    )
    hits = per_doc.join(
        bench_grams.withColumn("hit", F.lit(1)), "gram", "left",
    )
    return hits.groupBy(id_column).agg(
        F.first("n_grams").alias("n_grams"),
        F.count("hit").cast("bigint").alias("n_matched"),
        (F.count("hit") >= F.lit(int(min_matches))).alias("contaminated"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_matches: int = 1,
    text_column: str = "text",
    id_column: str = "doc_id",
    bench_text_column: str = "text",
) -> DataFrame:
    """Drop contaminated documents; everything else passes through with
    its full schema. The flagged-id set (small: contamination is rare by
    construction) drives a LEFT ANTI join on the id."""
    flagged = contamination_stats(
        docs, benchmark, n=n, min_matches=min_matches,
        text_column=text_column, id_column=id_column,
        bench_text_column=bench_text_column,
    ).where("contaminated").select(id_column)
    return docs.join(flagged, id_column, "left_anti")


def _check(df: DataFrame, text_column: str, id_column: str | None, side: str) -> None:
    if text_column not in df.columns:
        raise ValueError(
            f"{side} text column {text_column!r} not in dataframe "
            f"(columns: {df.columns})",
        )
    if id_column is not None and id_column not in df.columns:
        raise ValueError(
            f"{side} id column {id_column!r} not in dataframe "
            f"(columns: {df.columns})",
        )
