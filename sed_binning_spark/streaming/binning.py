"""Structured Streaming binning — the engine's streaming extension.

The reference is strictly batch (SURVEY §2.8: no streaming operators
exist), but its core aggregation — N-D histogramming — is exactly the
shape Structured Streaming handles natively: the same bin-index Column
expressions feed a streaming ``groupBy().count()``, micro-batches fold in
as incremental partial aggregates, and the sparse per-cell counts stream
out in ``update`` mode. An instrument can therefore watch a histogram
accumulate while the acquisition is still running, with the IDENTICAL
binning semantics (half-bin shift, inclusive last edge, NaN reject) as the
batch engine — the expressions are literally shared.

Late data: pass ``event_time_column`` (+ ``watermark_delay``) to get
per-event-time-window histograms with watermark-bounded state — one cube
per tumbling window, late rows folded in until the watermark passes.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sed_binning_spark.binning.binning import bin_dataframe_sparse, bin_index_columns
from sed_binning_spark.binning.utils import simplify_binning_arguments


def stream_events(
    spark,
    path: str,
    schema=None,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream: new files appearing under ``path`` become
    micro-batches (the streaming twin of the batch loaders' multi-path
    read; an acquisition writing one parquet per chunk needs no other
    integration). ``schema`` may be a DDL string, a StructType, or None to
    infer from the files already present."""
    reader = spark.readStream.format(fmt)
    if schema is None:
        schema = spark.read.format(fmt).load(path).schema
    reader = reader.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.load(path)


def bin_stream(
    df: DataFrame,
    bins=100,
    axes: Sequence[str] | None = None,
    ranges: Sequence[tuple[float, float]] | None = None,
    event_time_column: str | None = None,
    window_duration: str = "10 seconds",
    watermark_delay: str = "30 seconds",
    count_column: str = "count",
) -> DataFrame:
    """Streaming N-D histogram: sparse occupied-cell counts that accumulate
    across micro-batches.

    Returns a streaming DataFrame with one row per occupied cell — columns
    named after the axes (bin indices) plus ``count`` — matching
    :func:`sed_binning_spark.binning.binning.bin_dataframe_sparse` row for
    row once the stream has drained (the correctness contract the tests
    pin). Run it with ``outputMode("update")`` (or ``"complete"`` for small
    cubes) and rebuild the dense cube downstream when needed.

    With ``event_time_column`` the histogram becomes per-tumbling-window
    (extra ``window_start`` column): state is bounded by the watermark, so
    an endless acquisition stream runs in constant memory.
    """
    bins, axes, ranges = simplify_binning_arguments(bins, axes, ranges)
    if count_column in axes:
        raise ValueError(
            f"count_column {count_column!r} collides with an axis name; "
            f"the output would carry two {count_column!r} columns",
        )
    if event_time_column is None:
        # the non-windowed streaming histogram IS the batch sparse plan —
        # expression-only, so it compiles unchanged on a streaming frame,
        # including the post-agg NULL-group filter pinned with the
        # `| (count < 0)` disjunct (a dropna(subset) here would be pushed
        # below the aggregate by Catalyst, re-inlining every bin-index
        # expression tree pre-agg: measured 4x wall-clock and a codegen
        # method-limit blowup in the batch module)
        return bin_dataframe_sparse(
            df, bins=bins, axes=axes, ranges=ranges, count_column=count_column,
        )

    if "window_start" in axes or count_column == "window_start":
        raise ValueError(
            "'window_start' is reserved for the windowed output column",
        )
    df, _, _, exprs = bin_index_columns(df, bins, axes, ranges)
    renamed = [e.alias(ax) for e, ax in zip(exprs, axes)]
    df = df.withWatermark(event_time_column, watermark_delay)
    win = F.window(F.col(event_time_column), window_duration)
    w_col = "__w"
    while w_col in axes:  # never clobber a caller's axis name
        w_col += "_"
    # group by the WINDOW STRUCT itself, not __w.start: extracting the
    # field before the groupBy strips the event-time watermark metadata
    # (GetStructField drops it), so the state store would never evict
    # closed windows — unbounded state on an endless stream, and append
    # mode would refuse to start. Project window_start AFTER the agg.
    # Rows with NULL event time form a NULL-window group (window(NULL)
    # is a NULL struct) that belongs to no window — drop it with the
    # NULL bin-index groups, via the same post-agg pinned filter as the
    # batch path (dropna(subset) would be pushed below the aggregate).
    not_null = reduce(
        lambda a, b: a & b,
        [F.col(c).isNotNull() for c in (w_col, *axes)],
    )
    return (
        df.select(win.alias(w_col), *renamed)
        .groupBy(F.col(w_col), *axes)
        .agg(F.count(F.lit(1)).alias(count_column))
        .where(not_null | (F.col(count_column) < 0))
        .select(
            F.col(f"{w_col}.start").alias("window_start"),
            *axes,
            count_column,
        )
    )
