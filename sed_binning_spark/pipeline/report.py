"""Corpus telemetry — the one-pass summary every curation stage gets
wrapped in ("what did this filter do to the corpus?").

One aggregation job emits long-form ``(stratum, metric, value)`` rows:
document counts (total / NULL-text / blank), token and character totals
and means, and token-count percentiles. Percentiles default to Spark's
t-digest ``percentile_approx`` — a bounded-memory sketch that partial-
aggregates map-side, the only percentile that is sane at 100 TB — with
``exact=True`` switching to true ``percentile`` (buffers each group's
values: the cross-engine oracle/test path and fine for stratum counts
that fit an executor, wrong for a trillion rows).

Long form (not one wide row) so a report over N strata is one DataFrame
a dashboard can filter, and adding a metric never changes the schema.

Reference: no sed-binning counterpart (LLM-curation extension surface);
the metric set follows what corpus datasheets conventionally report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sed_binning_spark.pipeline.text import whitespace_tokens

_PCTS = (0.5, 0.9, 0.99)


def corpus_report(
    df: DataFrame,
    text_column: str = "text",
    strata_column: str | None = None,
    exact: bool = False,
    accuracy: int = 10_000,
    null_stratum: str = "__null__",
) -> DataFrame:
    """Summarize a document corpus in one aggregation pass.

    Returns ``(stratum, metric, value)`` — ``stratum`` is the
    ``strata_column`` value (or the literal ``'__all__'`` when no
    stratification is requested); metrics are:

    - ``n_docs`` / ``n_null_text`` / ``n_blank_text`` (blank = non-NULL,
      zero tokens);
    - ``total_tokens`` / ``total_chars`` / ``mean_tokens`` (means over
      non-NULL text);
    - ``tokens_p50`` / ``tokens_p90`` / ``tokens_p99`` — token-count
      percentiles over non-NULL text, t-digest by default (``accuracy``
      is the sketch knob), exact interpolated percentiles with
      ``exact=True``.

    Scale: one ``groupBy`` whose every aggregate partial-combines
    map-side (counts, sums, t-digest merge); the output is one row per
    stratum × metric. NULL strata report under the ``null_stratum``
    sentinel rather than vanishing — if the stratum column can contain
    that literal string, pass a sentinel it cannot (the function raises
    nothing on collision; the two groups would silently merge).
    """
    if text_column not in df.columns:
        raise ValueError(
            f"text column {text_column!r} not in dataframe (columns: {df.columns})",
        )
    if strata_column is not None and strata_column not in df.columns:
        raise ValueError(
            f"strata column {strata_column!r} not in dataframe "
            f"(columns: {df.columns})",
        )
    if accuracy <= 0:
        raise ValueError(f"accuracy must be positive, got {accuracy}")

    text = F.col(text_column)
    n_toks = F.when(text.isNotNull(), F.size(whitespace_tokens(text)))
    n_chars = F.when(text.isNotNull(), F.length(text))
    pcts = F.array(*[F.lit(p) for p in _PCTS])
    if exact:
        tiles = F.percentile(n_toks, pcts)
    else:
        tiles = F.percentile_approx(n_toks, pcts, F.lit(int(accuracy)))

    stratum = (
        F.coalesce(F.col(strata_column).cast("string"), F.lit(str(null_stratum)))
        if strata_column is not None
        else F.lit("__all__")
    )
    agg = (
        df.groupBy(stratum.alias("stratum"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.count_if(text.isNull()).cast("double").alias("n_null_text"),
            F.count_if(text.isNotNull() & (F.coalesce(n_toks, F.lit(0)) == 0))
            .cast("double").alias("n_blank_text"),
            F.coalesce(F.sum(n_toks), F.lit(0)).cast("double").alias("total_tokens"),
            F.coalesce(F.sum(n_chars), F.lit(0)).cast("double").alias("total_chars"),
            F.avg(n_toks).alias("mean_tokens"),
            tiles.alias("__tiles"),
        )
        .select(
            "stratum",
            "n_docs", "n_null_text", "n_blank_text",
            "total_tokens", "total_chars", "mean_tokens",
            *[
                F.col("__tiles")[i].cast("double").alias(f"tokens_p{int(p * 100)}")
                for i, p in enumerate(_PCTS)
            ],
        )
    )
    metrics = [
        "n_docs", "n_null_text", "n_blank_text",
        "total_tokens", "total_chars", "mean_tokens",
        *[f"tokens_p{int(p * 100)}" for p in _PCTS],
    ]
    stack = ", ".join(f"'{m}', {m}" for m in metrics)
    return agg.selectExpr(
        "stratum", f"stack({len(metrics)}, {stack}) AS (metric, value)",
    )
