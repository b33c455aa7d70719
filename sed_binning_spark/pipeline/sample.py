"""Deterministic sampling and corpus splitting for training-data curation.

Every function here draws from :func:`~sed_binning_spark.core.dfops.
hash_uniform` — a per-row U[0,1) that is a pure function of the row key
(md5, length-prefixed encoding) — instead of ``df.sample``/``sampleBy``
(whose Bernoulli draw depends on partition layout and re-rolls on task
retry). Consequences that matter at 100 TB:

- **Reproducible**: the same row lands in the same sample/split on any
  cluster size, any partitioning, any engine — a rebuilt pipeline stage
  yields the identical corpus, so downstream caches stay valid.
- **Nested**: a 1% sample is a strict subset of a 10% sample at the same
  (seed, keys) — ``u < 0.01`` implies ``u < 0.10`` — so scaling a data
  ablation up never discards previously selected rows.
- **Leak-proof splits**: train/holdout assignment is a disjoint partition
  of [0,1); keying by a GROUP column (e.g. a document's source domain)
  puts the whole group in one split — the standard guard against
  train/test contamination via near-duplicates within a group.

Each operator salts its own domain tag into the digest ("sample",
"strata", "split"; jitter uses "jitter"), so composing them at the same
(keys, seed) still yields independent draws — while calls of the SAME
operator share randomness, which is what makes samples nest across
fractions. All pure Column expressions (md5 + conv), map-only, no
shuffle, no RNG state. Rows with a NULL key draw NULL and fall out of every sample and
split — an unidentifiable row cannot be reproducibly assigned.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sed_binning_spark.core.dfops import FILE_COLUMN, ROW_COLUMN, hash_uniform


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_columns: Sequence[str] = (FILE_COLUMN, ROW_COLUMN),
    seed: int = 0,
) -> DataFrame:
    """Keep the rows whose hash-uniform draw falls below ``fraction``.

    Exact-rate on the key distribution's randomness (Bernoulli per row,
    like ``df.sample`` — the row COUNT is binomial, not exact), but
    membership is layout/retry/engine-independent and nested across
    fractions at the same seed."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_uniform(df, key_columns, seed, "sample") < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_column: str,
    fractions: Mapping[str, float],
    key_columns: Sequence[str] = (FILE_COLUMN, ROW_COLUMN),
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling rates (the deterministic ``sampleBy``): a row
    in stratum ``s`` survives iff its draw < ``fractions[s]``. Strata not
    named in ``fractions`` get ``default_fraction`` (0.0 = dropped — the
    sampleBy convention); a NULL stratum uses ``default_fraction`` too.
    This is how corpus mixing weights are applied (e.g. upweight curated
    sources, downsample crawl)."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    if strata_column not in df.columns:
        raise ValueError(
            f"strata column {strata_column!r} not in dataframe "
            f"(columns: {df.columns})",
        )
    thresh = F.lit(float(default_fraction))
    for s, f in fractions.items():
        thresh = F.when(F.col(strata_column) == F.lit(s), F.lit(float(f))).otherwise(thresh)
    return df.filter(hash_uniform(df, key_columns, seed, "strata") < thresh)


def assign_splits(
    df: DataFrame,
    weights: Mapping[str, float],
    key_columns: Sequence[str] = (FILE_COLUMN, ROW_COLUMN),
    seed: int = 0,
    split_column: str = "split",
) -> DataFrame:
    """Label every keyed row with a split name ('train'/'val'/...): the
    [0,1) line is cut at the cumulative weights, in the mapping's order,
    and the row's draw picks its interval — disjoint and exhaustive by
    construction. Weights must sum to 1 (within 1e-9).

    Key by a GROUP column (document source, url domain, dedup-cluster
    representative) to keep correlated rows in one split; rows with a NULL
    key get a NULL label — filter or route them explicitly rather than
    letting leakage-prone rows default into 'train'."""
    total = float(sum(weights.values()))
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("split weights must be non-negative")
    u = hash_uniform(df, key_columns, seed, "split")
    names = list(weights)
    # a row belongs to the first interval whose upper cut exceeds its draw;
    # the last split takes everything below 1.0 (guarded on a real draw so
    # NULL-key rows stay NULL instead of defaulting into it)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += float(weights[name])
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.when(u.isNotNull(), F.lit(names[-1]))
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_column, expr)


def temperature_rates(
    df: DataFrame,
    strata_column: str,
    alpha: float,
    target_rows: int | None = None,
) -> dict[str, float]:
    """Per-stratum sampling fractions for temperature-based corpus mixing
    (the standard multilingual/multi-source recipe: sampling probability
    ``q_s ∝ (n_s/N)^alpha``) — feed the result to :func:`stratified_sample`.

    ``alpha=1`` reproduces the natural distribution, ``alpha=0`` weights
    every stratum equally, values in between up-weight the tail without
    drowning the head. The returned fraction for stratum ``s`` is
    ``q_s * T / n_s`` where ``T`` is the expected output row count:
    ``target_rows`` when given (fractions above 1 are capped — Bernoulli
    keep-filters cannot upsample; a capped stratum needs dataset
    repetition instead, which the cap makes visible as a shortfall), else
    the LARGEST ``T`` with no fraction above 1 (``min_s n_s/q_s`` — the
    maximal no-upsampling corpus).

    Driver-side by design: stratum cardinality (sources, languages) is
    tiny next to the corpus, so this is one ``groupBy(strata).count()``
    collect of a handful of rows. Deterministic given the corpus: no RNG
    here — the randomness stays in :func:`stratified_sample`'s hash draw.
    NULL strata are ignored (they take ``default_fraction`` downstream).
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if target_rows is not None and target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    if strata_column not in df.columns:
        raise ValueError(
            f"strata column {strata_column!r} not in dataframe "
            f"(columns: {df.columns})",
        )
    counts = {
        r[0]: int(r[1])
        for r in df.where(F.col(strata_column).isNotNull())
        .groupBy(strata_column)
        .count()
        .collect()
    }
    if not counts:
        return {}
    n_total = sum(counts.values())
    weights = {s: (n / n_total) ** float(alpha) for s, n in counts.items()}
    z = sum(weights.values())
    if z == 0.0:
        # (n_s/N)^alpha underflowed for EVERY stratum (enormous alpha on
        # tiny shares) — no distribution exists; fail with the cause
        raise ValueError(
            f"alpha={alpha} underflows every stratum weight to 0.0 — "
            f"use a smaller alpha",
        )
    q = {s: w / z for s, w in weights.items()}
    if target_rows is None:
        # strata whose weight underflowed to 0 sample at 0.0 and cannot
        # bind the no-upsampling constraint
        t = min(counts[s] / q[s] for s in counts if q[s] > 0.0)
    else:
        t = float(target_rows)
    return {
        s: min(1.0, q[s] * t / counts[s]) if q[s] > 0.0 else 0.0
        for s in counts
    }
