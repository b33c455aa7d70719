"""Trainable document-quality classifier — the CCNet/LLaMA-pipeline
pattern (a model fit on "pages I trust" vs "raw crawl" gating the
corpus), in the same driver-fit / cluster-applied architecture as the
BPE tokenizer:

- :func:`quality_classifier_fit` collects a BOUNDED sample of
  :func:`~sed_binning_spark.pipeline.text.text_stats` FEATURES (never
  text) to the driver and fits a standardized logistic regression with
  deterministic full-batch gradient descent — plain NumPy, no ML
  runtime, reproducible bit-for-bit.
- :func:`quality_classifier_apply` scores any corpus with a pure Column
  expression (standardize → dot product → sigmoid): map-only, inside
  whole-stage codegen, zero Python in the hot path. At 100 TB the model
  is a dozen floats baked into the plan — nothing is broadcast, nothing
  shuffles.

The linear model over the Gopher statistics is the honest built-in; a
fastText/transformer scorer drops into the same fit/apply seam as a
pandas UDF without touching callers.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sed_binning_spark.pipeline.text import text_stats

# text_stats columns the model consumes; counts go through log1p so a
# 100-token page and a 10k-token page differ by units, not thousands
FEATURE_COLUMNS = (
    "n_chars", "n_ws_tokens", "mean_token_len",
    "punct_ratio", "stopword_ratio", "uniq_token_ratio",
)
_LOG_FEATURES = frozenset({"n_chars", "n_ws_tokens"})


def _feature_exprs() -> list[Column]:
    return [
        F.log1p(F.col(c)) if c in _LOG_FEATURES else F.col(c)
        for c in FEATURE_COLUMNS
    ]


def _collect_features(
    df: DataFrame, text_column: str, max_rows: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side (feature matrix, occurrence weights): DISTINCT feature
    vectors with their counts, capped at ``max_rows`` vectors keeping the
    heaviest (hash of the vector as the deterministic tie-break). The
    weights make duplicate-heavy classes — a raw-crawl negative frame is
    mostly recrawls of the same boilerplate — contribute proportionally
    without a 100k-duplicate page either flooding or vanishing from a
    row-capped sample; the aggregation is layout-independent, so the fit
    is reproducible anywhere. NULL-stat rows (blank docs) drop — they
    carry no signal either class wants."""
    stats = text_stats(df, text_column=text_column).select(
        *[e.alias(f"f{i}") for i, e in enumerate(_feature_exprs())],
    ).na.drop()
    fcols = [f"f{i}" for i in range(len(FEATURE_COLUMNS))]
    agg = stats.groupBy(*fcols).agg(F.count(F.lit(1)).alias("wt"))
    tie = F.md5(F.concat_ws("\x00", *fcols))
    pdf = agg.orderBy(F.desc("wt"), tie).limit(max_rows).toPandas()
    if pdf.empty:
        raise ValueError("no usable training rows (all stats NULL?)")
    return (pdf[fcols].to_numpy(dtype=np.float64),
            pdf["wt"].to_numpy(dtype=np.float64))


def quality_classifier_fit(
    positive: DataFrame,
    negative: DataFrame,
    text_column: str = "text",
    max_rows_per_class: int = 50_000,
    iters: int = 300,
    lr: float = 0.5,
    l2: float = 1e-3,
) -> dict:
    """Fit the quality model: ``positive`` = documents like the corpus
    you want (wiki/books/reference pages), ``negative`` = raw crawl.
    Returns a JSON-serializable dict (features, standardization, weights,
    bias) that :func:`quality_classifier_apply` bakes into a plan."""
    # the two class scans are independent Spark jobs — submit them from two
    # driver threads so the second job's tasks back-fill executors freed by
    # the first one's tail (same results, they only overlap in time)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as pool:
        fut_p = pool.submit(_collect_features, positive, text_column,
                            max_rows_per_class)
        fut_n = pool.submit(_collect_features, negative, text_column,
                            max_rows_per_class)
        xp, wp = fut_p.result()
        xn, wn = fut_n.result()
    x = np.vstack([xp, xn])
    y = np.concatenate([np.ones(len(xp)), np.zeros(len(xn))])
    # occurrence-weighted, with each CLASS normalized to equal total mass
    # so an imbalanced crawl does not drown the trusted reference
    wt = np.concatenate([wp / wp.sum(), wn / wn.sum()])
    wt /= wt.sum()
    mean = (x * wt[:, None]).sum(axis=0)
    std = np.sqrt((((x - mean) ** 2) * wt[:, None]).sum(axis=0))
    std[std == 0] = 1.0
    xs = (x - mean) / std
    w = np.zeros(xs.shape[1])
    b = 0.0
    for _ in range(iters):  # deterministic full-batch weighted GD
        z = xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = (p - y) * wt
        w -= lr * (xs.T @ g + l2 * w)
        b -= lr * float(g.sum())
    p = 1.0 / (1.0 + np.exp(-(xs @ w + b)))
    return {
        "features": list(FEATURE_COLUMNS),
        "log_features": sorted(_LOG_FEATURES),
        "mean": mean.tolist(),
        "std": std.tolist(),
        "weights": w.tolist(),
        "bias": b,
        "train_accuracy": float((((p >= 0.5) == y) * wt).sum()),
        "n_train": int(len(y)),
    }


def quality_classifier_apply(
    df: DataFrame,
    model: dict,
    text_column: str = "text",
    output_column: str = "quality_prob",
    keep_threshold: float | None = None,
    use_precomputed_stats: bool = False,
) -> DataFrame:
    """Score every document with the fitted model as ONE map-only
    expression: the text statistics, standardization, dot product, and
    sigmoid all fold into the same whole-stage-codegen pass. A document
    whose statistic is undefined (blank text) contributes that feature
    at the training mean (z-term 0) — and a NULL text scores NULL.
    ``keep_threshold`` adds a boolean ``keep`` column.

    The statistics dominate the cost (the sigmoid is free);
    ``use_precomputed_stats=True`` OPTS IN to reusing feature columns
    already on ``df`` (a pipeline that ran ``text_stats`` for other
    gates pays for the Gopher statistics once). It is opt-in, not
    name-sniffed: the caller is asserting those columns were computed by
    ``text_stats`` over THIS ``text_column`` — a coincidentally-named
    column, or stats from a different text column, would silently score
    garbage. All six feature columns must be present."""
    # a model serialized before log_features existed used this same
    # transform set — default to compatible rather than rejecting it
    if list(model["features"]) != list(FEATURE_COLUMNS) or \
            list(model.get("log_features", sorted(_LOG_FEATURES))) \
            != sorted(_LOG_FEATURES):
        raise ValueError(
            f"model features {model['features']} "
            f"(log: {model.get('log_features')}) do not match this "
            f"build's {list(FEATURE_COLUMNS)} (log: {sorted(_LOG_FEATURES)})",
        )
    if use_precomputed_stats:
        missing = [c for c in FEATURE_COLUMNS if c not in df.columns]
        if missing:
            raise ValueError(
                f"use_precomputed_stats=True but {missing} are not on the "
                "dataframe — run text_stats first or drop the flag",
            )
        stats = df
    else:
        stats = text_stats(df, text_column=text_column)
    z: Column = F.lit(float(model["bias"]))
    for expr, m, s, w in zip(
        _feature_exprs(), model["mean"], model["std"],
        model["weights"],
    ):
        if not math.isfinite(m) or not math.isfinite(s) or s == 0:
            raise ValueError("model standardization is degenerate")
        z = z + F.coalesce(
            (expr - F.lit(float(m))) / F.lit(float(s)), F.lit(0.0),
        ) * F.lit(float(w))
    prob = F.when(
        F.col(text_column).isNotNull(),
        F.lit(1.0) / (F.lit(1.0) + F.exp(-z)),
    )
    out = stats.withColumn(output_column, prob) \
        .select(*df.columns, output_column)
    if keep_threshold is not None:
        out = out.withColumn(
            "keep", F.coalesce(F.col(output_column) >= keep_threshold,
                               F.lit(False)),
        )
    return out
