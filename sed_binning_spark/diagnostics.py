"""Diagnostics histogram grid A12 (reference: sed/diagnostics.py:14-162,
sed/core/processor.py:2368-2457).

The reference's ``view_event_histogram`` computes per-axis 1-D NumPy
histograms of ONE dask partition and draws a bokeh/matplotlib grid. The
data path here is Spark-first — each axis is one tiny
``groupBy(bin_index).count()`` over the selected source file (``file_id``
predicate → parquet pruning skips everything else), densified to
(centers, counts) arrays on the driver. Plotting is left to the caller
(this environment is headless); the returned dict has exactly the
arrays the reference hands to its ``grid_histogram``.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sed_binning_spark.binning.expressions import bin_index_expr


def event_histogram_grid(
    df: DataFrame,
    axes: Sequence[str],
    bins: int | Sequence[int] = 80,
    ranges: Sequence[tuple[float, float]] | None = None,
    partition: int | None = None,
    file_column: str = "file_id",
) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Per-axis 1-D histograms for quick data inspection
    (view_event_histogram, processor.py:2368-2457).

    Args:
        df: event dataframe.
        axes: columns to histogram.
        bins: bin count per axis (int = same for all).
        ranges: (lo, hi) per axis; None = min/max from ONE aggregation pass.
        partition: restrict to one source file (the reference's ``dfpid``);
            None = whole dataframe.

    Returns:
        {axis: (bin_centers, counts)} with float64 centers, int64 counts.
    """
    df, axes, bins, ranges = _grid_args(df, axes, bins, ranges, partition, file_column)

    out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for ax, n, (lo, hi) in zip(axes, bins, ranges):
        idx = bin_index_expr(ax, int(n), float(lo), float(hi), half_bin_shift=False)
        sparse = (
            df.select(idx.alias("b"))
            .dropna()
            .groupBy("b")
            .count()
            .toPandas()
        )
        counts = np.zeros(int(n), dtype=np.int64)
        counts[sparse["b"].to_numpy(dtype=np.int64)] = sparse["count"].to_numpy()
        edges = np.linspace(float(lo), float(hi), int(n) + 1)
        centers = (edges[:-1] + edges[1:]) / 2.0
        out[ax] = (centers, counts)
    return out


def event_histogram_grid_sparse(
    df: DataFrame,
    axes: Sequence[str],
    bins: int | Sequence[int] = 80,
    ranges: Sequence[tuple[float, float]] | None = None,
    partition: int | None = None,
    file_column: str = "file_id",
) -> DataFrame:
    """Sparse distributed form of the grid: one row per occupied
    ``(axis, bin)`` with columns ``(axis, b0, cnt)``.

    Scale design: all axes histogram in ONE scan — each event row explodes
    into ``len(axes)`` tiny ``(axis_tag, bin_index)`` structs and a single
    ``groupBy(axis, b0)`` aggregates them, so 100 TB is read once instead
    of once per axis, and the shuffle carries only (tag, int64) pairs whose
    distinct count is bounded by ``sum(bins)``. The driver-side dict form
    (:func:`event_histogram_grid`) is the densified convenience wrapper.
    """
    df, axes, bins, ranges = _grid_args(df, axes, bins, ranges, partition, file_column)

    pairs = [
        F.struct(
            F.lit(ax).alias("axis"),
            bin_index_expr(ax, int(n), float(lo), float(hi),
                           half_bin_shift=False).alias("b0"),
        )
        for ax, n, (lo, hi) in zip(axes, bins, ranges)
    ]
    return (
        df.select(F.explode(F.array(*pairs)).alias("e"))
        .select("e.axis", "e.b0")
        .where(F.col("b0").isNotNull())
        .groupBy("axis", "b0")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _grid_args(df, axes, bins, ranges, partition, file_column):
    """Shared grid-argument validation: broadcast int bins, check lengths
    and axis presence, apply the partition filter, infer missing ranges."""
    axes = list(axes)
    if isinstance(bins, int):
        bins = [bins] * len(axes)
    if len(bins) != len(axes):
        raise ValueError("bins and axes must have the same length")
    missing = [a for a in axes if a not in df.columns]
    if missing:
        raise ValueError(f"axes not in dataframe: {missing}")
    if partition is not None:
        if file_column not in df.columns:
            raise ValueError(f"partition selection needs a {file_column!r} column")
        df = df.filter(F.col(file_column) == int(partition))
    if ranges is None:
        ranges = _infer_ranges(df, axes)
    if len(ranges) != len(axes):
        raise ValueError("ranges and axes must have the same length")
    return df, axes, bins, ranges


def _infer_ranges(df: DataFrame, axes: Sequence[str]) -> list[tuple[float, float]]:
    """np.histogram-style auto-ranges from ONE aggregation pass (NaN
    skipped, constant columns widened by ±0.5, empty selections → (0, 1))."""
    from sed_binning_spark.core.dfops import _nan_to_null

    aggs = []
    for ax in axes:
        masked = _nan_to_null(df, ax)
        aggs += [F.min(masked).alias(f"__lo_{ax}"), F.max(masked).alias(f"__hi_{ax}")]
    row = df.agg(*aggs).collect()[0]
    ranges: list[tuple[float, float]] = []
    for ax in axes:
        lo, hi = row[f"__lo_{ax}"], row[f"__hi_{ax}"]
        if lo is None or hi is None:
            lo, hi = 0.0, 1.0
        elif float(lo) == float(hi):
            lo, hi = float(lo) - 0.5, float(hi) + 0.5
        ranges.append((float(lo), float(hi)))
    return ranges
