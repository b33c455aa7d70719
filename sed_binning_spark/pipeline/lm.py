"""Corpus unigram language-model scoring — the classic LM-based quality
proxy for training-data curation (CCNet buckets web documents by LM
score; Gopher/RefinedWeb-style pipelines use the same signal to rank or
filter). A full KenLM is out of scope for a pure-Spark engine, but the
unigram restriction captures the load-bearing part of the signal — "is
this document made of words the corpus actually uses?" — and is exactly
expressible as two DataFrame aggregations:

1. :func:`unigram_model` — token occurrence counts over the corpus: one
   ``groupBy(token)`` with map-side partial aggregation (the shuffle
   carries ``(token, partial count)``, never documents).
2. :func:`unigram_logprob` — per-document mean token log-probability
   under Laplace smoothing: explode tokens, equi-join the model
   (broadcast when it fits, sort-merge otherwise), one ``groupBy(doc)``
   over integer partial sums.

Determinism contract (the repo-wide cross-engine convention): the mean
is computed from per-token log-probabilities quantized to integer
micro-nats (``round(ln(p) * 1e6)`` as int64). Integer sums are exact and
order-independent, so the score is bit-stable across partitionings,
retries, and engines — a raw ``avg(double)`` would depend on the
floating-point summation order.

100 TB notes: a web-scale corpus has an enormous unique-token tail
(typos, URLs, ids); ``min_count`` prunes the model — pruned tokens score
as out-of-vocabulary, which is what a quality signal wants (hapax junk
should look improbable, and the Laplace OOV mass prices it). Nothing
touches the driver: total/vocab ride along as a broadcast one-row cross
join, and the totals branch shares the LUT branch's ``groupBy(token)``
exchange (ReuseExchange), so the self-scored form aggregates the corpus
token stream exactly once.

Reference: this operator has no counterpart in sed-binning (LLM-curation
extension surface, like pipeline.dedup / pipeline.text); semantics follow
the standard add-alpha unigram LM of the CCNet line of work.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# THE package tokenizer (case-folded, empty-token stripped) — one
# definition, shared with dedup/filters, so the _TOKS_SQL DuckDB twin
# stays in lock-step for every token-keyed operator
from sed_binning_spark.pipeline.dedup import _tokens as _lm_tokens
from sed_binning_spark.pipeline.dedup import word_shingles


def _lm_grams(text, n: int):
    """The LM event stream: lowercased tokens (``n=1``) or word n-grams.
    Documents with no full n-gram emit NO events (the shorter-than-n
    partial window word_shingles keeps for dedup recall is not an n-gram
    observation — same gate as repetition_stats)."""
    if n == 1:
        return _lm_tokens(text)
    return F.when(
        F.size(_lm_tokens(text)) >= n, word_shingles(text, n),
    ).otherwise(F.array().cast("array<string>"))


def _array_grams(arr, n: int):
    """Gram stream over a PRECOMPUTED token array (a real tokenizer's
    output — BPE ids or subword strings): elements stringified, n-grams
    joined on the unit separator (token strings may themselves contain
    spaces, unlike the whitespace-tokenizer path). Same no-full-n-gram
    gate as :func:`_lm_grams`; a NULL array emits no events.

    ``arr`` must be a bound COLUMN (all callers pass ``F.col``): the
    window lambda slices it per gram, and an expression there would
    re-evaluate per element. The full-array stringify happens per SLICE
    (w elements), not once over a derived array referenced in the lambda
    — that form re-built the whole stringified array per gram (O(n²))."""
    if n == 1:
        return F.transform(arr, lambda x: x.cast("string"))
    m = F.size(arr)
    return F.when(
        m >= n,
        F.transform(
            F.sequence(F.lit(1), m - n + 1),
            lambda i: F.array_join(
                F.transform(F.slice(arr, i, n), lambda x: x.cast("string")),
                "\x1f",
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def unigram_model(
    df: DataFrame,
    text_column: str = "text",
    min_count: int = 1,
    n: int = 1,
    token_array_column: str | None = None,
) -> DataFrame:
    """Gram occurrence counts ``(token, n)`` over the corpus — unigrams
    by default, word n-grams with ``n > 1`` (a bigram model is a much
    sharper fluency proxy at ~vocabulary² model size; the scoring
    machinery is identical).

    ``token_array_column`` names a precomputed tokenizer output
    (``array<int>`` BPE ids or ``array<string>`` subwords) to build the
    model over instead of the whitespace tokenization of ``text_column``
    — the production hook for scoring with a real tokenizer's vocabulary
    (pass the SAME column to :func:`unigram_logprob`).

    One shuffle (``groupBy(token)``, partial-aggregated map-side). Grams
    with fewer than ``min_count`` occurrences are dropped from the model
    — they score as OOV downstream, which both bounds the model size on
    heavy-tailed corpora and makes hapax junk look improbable (prune
    harder as ``n`` grows).
    """
    if token_array_column is not None:
        if token_array_column not in df.columns:
            raise ValueError(
                f"token array column {token_array_column!r} not in dataframe "
                f"(columns: {df.columns})",
            )
    elif text_column not in df.columns:
        raise ValueError(
            f"text column {text_column!r} not in dataframe (columns: {df.columns})",
        )
    if min_count <= 0:
        raise ValueError(f"min_count must be positive, got {min_count}")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams = (
        _array_grams(F.col(token_array_column), n)
        if token_array_column is not None
        else _lm_grams(F.col(text_column), n)
    )
    model = (
        df.select(F.explode(grams).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        model = model.where(F.col("n") >= int(min_count))
    return model


def unigram_logprob(
    docs: DataFrame,
    model: DataFrame | None = None,
    text_column: str = "text",
    id_column: str = "doc_id",
    alpha: float = 1.0,
    min_count: int = 1,
    broadcast_model: bool = True,
    output_column: str = "unigram_logprob",
    n: int = 1,
    token_array_column: str | None = None,
) -> DataFrame:
    """Append the per-document mean gram log-probability under an
    add-``alpha`` (Laplace) n-gram model (unigram by default).

    ``p(gram) = (cnt + alpha) / (total + alpha * (vocab + 1))`` for model
    grams; unseen grams take the same formula at ``cnt = 0`` (the ``+1``
    in the denominator is the OOV class). The document score is the mean
    of ``ln p`` over its grams, computed exactly from integer micro-nat
    partial sums (see module docstring). NULL text or a document with no
    full n-gram yields NULL — no events, no evidence.

    ``model`` defaults to :func:`unigram_model` over ``docs`` itself at
    the same ``n`` (the self-scoring setup); pass a model built on a
    reference corpus to score against external statistics — the usual
    CCNet arrangement (and pass the n the model was built with).
    ``broadcast_model=True`` broadcast-joins the gram LUT (right for
    pruned vocabularies up to ~100M entries); set it False to let the
    optimizer pick a shuffle join for giant models.

    ``token_array_column`` scores a precomputed tokenizer output instead
    of the whitespace tokens of ``text_column`` (see
    :func:`unigram_model`); a NULL array yields a NULL score, like NULL
    text on the text path.
    """
    if id_column not in docs.columns:
        raise ValueError(
            f"id column {id_column!r} not in dataframe (columns: {docs.columns})",
        )
    if token_array_column is not None:
        if token_array_column not in docs.columns:
            raise ValueError(
                f"token array column {token_array_column!r} not in dataframe "
                f"(columns: {docs.columns})",
            )
    elif text_column not in docs.columns:
        raise ValueError(
            f"text column {text_column!r} not in dataframe (columns: {docs.columns})",
        )
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if model is None:
        model = unigram_model(
            docs, text_column, min_count=min_count, n=n,
            token_array_column=token_array_column,
        )
    if "token" not in model.columns or "n" not in model.columns:
        raise ValueError(
            f"model must have (token, n) columns, got {model.columns}",
        )

    # total/vocab ride along as a broadcast 1-row cross join instead of a
    # driver collect: the whole score stays ONE lazy plan, and because the
    # totals branch and the LUT branch share the identical groupBy(token)
    # exchange, Spark's ReuseExchange evaluates the model aggregation once
    # (a collect here would run the corpus-wide token shuffle twice)
    totals = F.broadcast(
        model.agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("double").alias("__lm_total"),
            F.count(F.lit(1)).cast("double").alias("__lm_vocab"),
        ),
    )
    denom = F.col("__lm_total") + F.lit(float(alpha)) * (F.col("__lm_vocab") + 1.0)

    logp_micro = F.round(
        F.log((F.col("n").cast("double") + F.lit(float(alpha))) / denom) * 1e6,
    ).cast("long")
    lut = model.crossJoin(totals).select("token", logp_micro.alias("logp_micro"))
    if broadcast_model:
        lut = F.broadcast(lut)
    oov_micro = F.round(F.log(F.lit(float(alpha)) / denom) * 1e6).cast("long")

    doc_grams = (
        _array_grams(F.col(token_array_column), n)
        if token_array_column is not None
        else _lm_grams(F.col(text_column), n)
    )
    toks = docs.select(
        F.col(id_column),
        F.explode(doc_grams).alias("token"),
    ).crossJoin(totals)
    scored = (
        toks.join(lut, "token", "left")
        .groupBy(id_column)
        .agg(
            F.sum(F.coalesce(F.col("logp_micro"), oov_micro)).alias("_lm_s"),
            F.count(F.lit(1)).alias("_lm_m"),
        )
        .select(
            id_column,
            (F.col("_lm_s").cast("double") / (F.col("_lm_m") * F.lit(1e6)))
            .alias(output_column),
        )
    )
    return docs.join(scored, on=id_column, how="left")


def unigram_logprob_rowwise(
    docs: DataFrame,
    model: DataFrame,
    text_column: str = "text",
    alpha: float = 1.0,
    output_column: str = "unigram_logprob",
    n: int = 1,
    token_array_column: str | None = None,
) -> DataFrame:
    """Row-local LM scoring against a PRECOMPUTED model — the map-only
    twin of :func:`unigram_logprob` for frames where a ``groupBy(id)``
    is unavailable or unwanted: STREAMING ingest gates (a streaming
    aggregation would need a watermark and holds state; this is
    stateless and append-safe, so ``readStream → score → filter →
    writeStream`` just works) and batch corpora where one row IS one
    document and the extra exchange isn't worth it.

    Same score, bit-for-bit, at the row grain: gram extraction stays
    JVM-side (the exact ``_lm_grams``/``_array_grams`` expressions —
    tokenization dialects never enter Python), the per-token micro-nat
    quantization is COMPUTED BY THE JVM with ``unigram_logprob``'s own
    ``F.log``/``F.round`` expressions and only then collected (so no
    Python-``math.log``-vs-``Math.log`` last-ulp divergence can flip a
    HALF_UP rounding), and the Arrow-batched UDF only looks each gram up
    in the broadcast ``token → micro-nat`` table and integer-sums —
    pinned bit-equal by the batch-equivalence tests. The model LUT is
    collected and broadcast — the same pruned-vocabulary contract as
    ``broadcast_model=True``; self-scoring is impossible here by
    construction (a stream cannot aggregate its own future), so
    ``model`` is required.

    Grain caveat vs :func:`unigram_logprob`: that path scores per
    DOCUMENT ID (``groupBy(id)`` + join back — a NULL id gets a NULL
    score, duplicate-id rows share one pooled score), while this one
    scores each ROW independently and never reads an id. On the
    unique-non-NULL-id corpora every other operator's contract assumes,
    the two are identical; on dirty ids the rowwise per-row semantics is
    the safer of the two.
    """
    import pandas as pd

    if token_array_column is not None:
        if token_array_column not in docs.columns:
            raise ValueError(
                f"token array column {token_array_column!r} not in dataframe "
                f"(columns: {docs.columns})",
            )
    elif text_column not in docs.columns:
        raise ValueError(
            f"text column {text_column!r} not in dataframe (columns: {docs.columns})",
        )
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if "token" not in model.columns or "n" not in model.columns:
        raise ValueError(
            f"model must have (token, n) columns, got {model.columns}",
        )

    # the LUT rides unigram_logprob's OWN expressions (one model pass:
    # grand-total window over the collected aggregation is tiny — the
    # pruned-vocab contract), so the quantization is the JVM's, verbatim
    totals = F.broadcast(
        model.agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("double").alias("__lm_total"),
            F.count(F.lit(1)).cast("double").alias("__lm_vocab"),
        ),
    )
    denom = F.col("__lm_total") + F.lit(float(alpha)) * (F.col("__lm_vocab") + 1.0)
    logp_micro = F.round(
        F.log((F.col("n").cast("double") + F.lit(float(alpha))) / denom) * 1e6,
    ).cast("long")
    oov_micro_col = F.round(F.log(F.lit(float(alpha)) / denom) * 1e6).cast("long")
    rows = (
        model.crossJoin(totals)
        .select("token", logp_micro.alias("__m"), oov_micro_col.alias("__oov"))
        .collect()  # pruned-vocab contract; ONE model pass, oov rides along
    )
    lut = {r["token"]: r["__m"] for r in rows}
    # empty model: denom = alpha*(0+1), so p_oov = 1 and ln = 0 — exactly
    # what the batch path's totals row yields
    oov = rows[0]["__oov"] if rows else 0
    blut = docs.sparkSession.sparkContext.broadcast(lut)

    def _score(grams: pd.Series) -> pd.Series:
        tab = blut.value
        out = []
        for gs in grams:
            if gs is None or len(gs) == 0:
                out.append(None)
                continue
            s = 0
            for g in gs:
                s += tab.get(g, oov)
            out.append(s / (len(gs) * 1e6))
        return pd.Series(out, dtype="float64")

    _score.__annotations__ = {"grams": pd.Series, "return": pd.Series}
    score_udf = F.pandas_udf(_score, "double")
    grams = (
        _array_grams(F.col(token_array_column), n)
        if token_array_column is not None
        else _lm_grams(F.col(text_column), n)
    )
    return docs.withColumn(output_column, score_udf(grams))


def perplexity_bucket_thresholds(
    df: DataFrame,
    fractions: tuple[float, ...] = (1 / 3, 2 / 3),
    logprob_column: str = "unigram_logprob",
    relative_error: float = 1e-4,
) -> list[float]:
    """CCNet's bucket boundaries: the LM-score quantiles that split the
    corpus into head/middle/tail (Wenzek et al. 2020 §4.3 — documents are
    ranked by language-model score and cut into terciles; training
    recipes then sample the buckets at different rates). Fit half of the
    driver-fit / cluster-applied seam: one ``approxQuantile`` pass
    (Greenwald-Khanna, driver traffic = len(fractions) doubles — nothing
    corpus-sized moves), returning thresholds to bake into
    :func:`assign_perplexity_buckets` (or to reuse on a STREAM, where a
    global quantile is impossible by construction). NULL scores (no
    tokens) are excluded, matching the assign side's NULL bucket."""
    if not fractions or list(fractions) != sorted(fractions) or not all(
        0.0 < f < 1.0 for f in fractions
    ):
        raise ValueError(
            f"fractions must be sorted cut points in (0, 1), got {fractions}",
        )
    if logprob_column not in df.columns:
        raise ValueError(
            f"logprob column {logprob_column!r} not in dataframe "
            f"(columns: {df.columns}) — run unigram_logprob first",
        )
    got = df.where(
        F.col(logprob_column).isNotNull() & ~F.isnan(F.col(logprob_column)),
    ).approxQuantile(logprob_column, list(fractions), float(relative_error))
    if len(got) < len(fractions):
        # approxQuantile over zero rows returns [] — name the real
        # problem here instead of a cryptic bucket-count error later
        raise ValueError(
            f"no non-NULL finite {logprob_column!r} scores to fit "
            "thresholds on",
        )
    return got


def assign_perplexity_buckets(
    df: DataFrame,
    thresholds: list[float],
    buckets: tuple[str, ...] = ("head", "middle", "tail"),
    logprob_column: str = "unigram_logprob",
    output_column: str = "ppl_bucket",
) -> DataFrame:
    """Apply half: label every document with its CCNet bucket as ONE
    map-only CASE expression (stream-safe, no shuffle). HIGHER mean
    log-probability = lower perplexity = closer to the LM's training
    distribution, so the TOP fraction is ``buckets[0]`` ("head") — the
    bucket CCNet upsamples. NULL scores get a NULL bucket (a document
    with no tokens has no perplexity)."""
    if len(buckets) != len(thresholds) + 1:
        raise ValueError(
            f"{len(thresholds)} thresholds split into "
            f"{len(thresholds) + 1} buckets; got {len(buckets)} names",
        )
    if list(thresholds) != sorted(thresholds):
        raise ValueError(f"thresholds must be sorted, got {thresholds}")
    if any(a == b for a, b in zip(thresholds, thresholds[1:])):
        # approxQuantile returns TIED cuts on low-cardinality score
        # distributions; a tied pair makes the bucket between the two
        # cuts unreachable, so the corpus would silently split into fewer
        # buckets than named — a degenerate corpus should be loud
        raise ValueError(
            f"tied adjacent thresholds {thresholds} leave a bucket "
            "unreachable (degenerate score distribution?)",
        )
    lp = F.col(logprob_column)
    # thresholds are ASCENDING logprob quantiles and buckets[0] is the
    # TOP (highest-logprob) slice: test the cuts bottom-up so bucket
    # -1-i pairs with thresholds[i], and everything above the last cut
    # falls through to buckets[0]
    expr = F.when(lp <= F.lit(float(thresholds[0])), F.lit(buckets[-1]))
    for i in range(1, len(thresholds)):
        expr = expr.when(
            lp <= F.lit(float(thresholds[i])), F.lit(buckets[-1 - i]),
        )
    expr = expr.otherwise(F.lit(buckets[0]))
    # NaN is non-NULL and compares above every threshold in Spark SQL —
    # without the explicit reject a garbage-scored document would land in
    # buckets[0], the slice CCNet UPSAMPLES; it gets a NULL bucket like
    # NULL scores instead
    return df.withColumn(
        output_column, F.when(lp.isNotNull() & ~F.isnan(lp), expr),
    )
