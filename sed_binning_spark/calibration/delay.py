"""Delay-stage calibration (reference: sed/calibrator/delay.py).

Linear ADC -> picosecond mapping; pure Column expression. Parameter
extraction from instrument files stays driver-side.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sed_binning_spark.sqlgen import fsql


def mm_to_ps(delay_mm, time0_mm: float):
    """Delay-stage mm -> relative delay in ps, double pass
    (sed/calibrator/delay.py:406-421): ``(mm - t0_mm) / 0.15``."""
    return (np.asarray(delay_mm, dtype=float) - float(time0_mm)) / 0.15


def delay_expr(
    adc: str | Column,
    adc_range: tuple[float, float],
    delay_range: tuple[float, float],
) -> Column:
    """``delay = d0 + (adc - a0) * (d1 - d0) / (a1 - a0)``
    (sed/calibrator/delay.py:188-192), as a single linear expression."""
    c = (F.col(adc) if isinstance(adc, str) else adc).cast("double")
    a0, a1 = float(adc_range[0]), float(adc_range[1])
    d0, d1 = float(delay_range[0]), float(delay_range[1])
    return F.lit(d0) + (c - F.lit(a0)) * F.lit((d1 - d0) / (a1 - a0))


def delay_sql(adc: str, adc_range, delay_range) -> str:
    """DuckDB twin of :func:`delay_expr` (same literal arithmetic)."""
    a0, a1 = float(adc_range[0]), float(adc_range[1])
    d0, d1 = float(delay_range[0]), float(delay_range[1])
    return f"{fsql(d0)} + (CAST({adc} AS DOUBLE) - {fsql(a0)}) * {fsql((d1 - d0) / (a1 - a0))}"


def append_delay_axis(
    df: DataFrame,
    calibration: dict,
    adc_column: str = "ADC",
    delay_column: str = "delay",
    flip_delay_axis: bool = False,
) -> tuple[DataFrame, dict]:
    """Append the calibrated delay column (append_delay_axis,
    sed/calibrator/delay.py:52-205).

    ``calibration`` needs ``adc_range`` plus either ``delay_range`` or
    (``delay_range_mm`` + ``time0``) — the latter converted via
    :func:`mm_to_ps`. ``flip_delay_axis`` negates the result
    (delay.py:368-369).
    """
    calibration = dict(calibration)
    if adc_column not in df.columns:
        raise KeyError(f"ADC column {adc_column!r} not in dataframe")
    if "adc_range" not in calibration:
        raise NotImplementedError("Not enough parameters for delay calibration.")
    if "delay_range" not in calibration:
        if "delay_range_mm" not in calibration or "time0" not in calibration:
            raise NotImplementedError("Not enough parameters for delay calibration.")
        calibration["delay_range"] = tuple(
            mm_to_ps(np.asarray(calibration["delay_range_mm"]), calibration["time0"]),
        )
    expr = delay_expr(adc_column, calibration["adc_range"], calibration["delay_range"])
    if flip_delay_axis:
        expr = -expr
    out = df.withColumn(delay_column, expr)
    return out, {"calibration": calibration, "flip_delay_axis": flip_delay_axis}


def add_offsets(
    df: DataFrame,
    delay_column: str = "delay",
    columns: str | Sequence[str] | None = None,
    weights: float | Sequence[float] = 1.0,
    reductions: str | Sequence[str] | None = None,
    preserve_mean: bool | Sequence[bool] = False,
    constant: float | None = None,
    flip_delay_axis: bool = False,
) -> tuple[DataFrame, dict]:
    """Delay-axis offsets (delay.py:207-374): per-row / mean-reduced column
    offsets, constant shift, optional axis flip."""
    from sed_binning_spark.core.dfops import offset_by_other_columns

    meta: dict = {"applied": True}
    if columns is not None:
        if isinstance(columns, str):
            columns = [columns]
        if isinstance(weights, (int, float)):
            weights = [float(weights)] * len(columns)
        elif len(weights) == 1 and len(columns) > 1:
            # reference broadcasts a length-1 weights sequence too
            # (sed/calibrator/delay.py:264-266)
            weights = [float(weights[0])] * len(columns)
        df = offset_by_other_columns(
            df,
            target_column=delay_column,
            offset_columns=columns,
            weights=weights,
            reductions=reductions,
            preserve_mean=preserve_mean,
        )
        meta.update({"columns": list(columns), "weights": list(weights)})
    if constant is not None:
        df = df.withColumn(delay_column, F.col(delay_column) + F.lit(float(constant)))
        meta["constant"] = constant
    # the reference negates LAST (delay.py:362-370): offsets, then constant,
    # then axis flip -> -(delay + offsets + constant)
    if flip_delay_axis:
        df = df.withColumn(delay_column, -F.col(delay_column))
        meta["flip_delay_axis"] = True
    return df, meta
