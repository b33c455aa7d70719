"""Property-based fill semantics (hypothesis): for arbitrary multi-file
frames and NaN patterns, the windowed + broadcast-boundary-handoff fills
must equal a plain pandas global ffill/bfill over (file, row) order — the
reference's semantics (forward_fill_lazy / backward_fill_lazy carry values
across partition boundaries)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sed_binning_spark.core.dfops import backward_fill, forward_fill


@st.composite
def sparse_frames(draw):
    n_files = draw(st.integers(min_value=1, max_value=4))
    rows_per_file = draw(st.lists(
        st.integers(min_value=1, max_value=12), min_size=n_files, max_size=n_files,
    ))
    rng = np.random.default_rng(draw(st.integers(min_value=0, max_value=2**31)))
    frames = []
    for fid, n in enumerate(rows_per_file):
        vals = rng.uniform(0, 100, n)
        # each row independently NULLed; occasionally whole files are empty
        mask = rng.random(n) < draw(st.floats(min_value=0.0, max_value=1.0))
        vals[mask] = np.nan
        frames.append(pd.DataFrame({
            "file_id": np.full(n, fid, dtype="int64"),
            "row_id": np.arange(n, dtype="int64"),
            "ch": vals,
        }))
    return pd.concat(frames, ignore_index=True)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pdf=sparse_frames())
def test_forward_fill_equals_global_pandas_ffill(spark, pdf):
    got = (
        forward_fill(spark.createDataFrame(pdf), "ch")
        .toPandas().sort_values(["file_id", "row_id"]).reset_index(drop=True)
    )
    want = pdf.sort_values(["file_id", "row_id"]).reset_index(drop=True)
    want["ch"] = want["ch"].ffill()
    pd.testing.assert_series_equal(got["ch"], want["ch"])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pdf=sparse_frames())
def test_backward_fill_equals_global_pandas_bfill(spark, pdf):
    got = (
        backward_fill(spark.createDataFrame(pdf), "ch")
        .toPandas().sort_values(["file_id", "row_id"]).reset_index(drop=True)
    )
    want = pdf.sort_values(["file_id", "row_id"]).reset_index(drop=True)
    want["ch"] = want["ch"].bfill()
    pd.testing.assert_series_equal(got["ch"], want["ch"])


@st.composite
def split_frames(draw):
    """Multi-file frames where each file is cut into scan splits, with a
    row_id that is globally ordered within the file across splits."""
    n_files = draw(st.integers(min_value=1, max_value=3))
    rng = np.random.default_rng(draw(st.integers(min_value=0, max_value=2**31)))
    frames = []
    for fid in range(n_files):
        n = draw(st.integers(min_value=1, max_value=20))
        n_splits = draw(st.integers(min_value=1, max_value=4))
        vals = rng.uniform(0, 100, n)
        mask = rng.random(n) < draw(st.floats(min_value=0.0, max_value=1.0))
        vals[mask] = np.nan
        # split boundaries partition [0, n) into n_splits contiguous ranges
        cuts = np.sort(rng.integers(0, n + 1, max(n_splits - 1, 0)))
        split_of_row = np.searchsorted(cuts, np.arange(n), side="right")
        frames.append(pd.DataFrame({
            "file_id": np.full(n, fid, dtype="int64"),
            "split_id": split_of_row.astype("int64"),
            "row_id": np.arange(n, dtype="int64"),
            "ch": vals,
        }))
    return pd.concat(frames, ignore_index=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pdf=split_frames())
def test_composite_key_fill_equals_single_key(spark, pdf):
    """Windowing on (file_id, split_id) with the cross-split boundary
    handoff must produce EXACTLY the per-file fill — the sub-file key only
    changes the physical plan (no multi-TB single-task sort), never the
    values."""
    sdf = spark.createDataFrame(pdf)
    base_f = forward_fill(sdf, ["ch"]).toPandas() \
        .sort_values(["file_id", "row_id"], ignore_index=True)
    split_f = forward_fill(sdf, ["ch"], file_column=("file_id", "split_id")) \
        .toPandas().sort_values(["file_id", "row_id"], ignore_index=True)
    pd.testing.assert_series_equal(base_f["ch"], split_f["ch"])

    base_b = backward_fill(sdf, ["ch"]).toPandas() \
        .sort_values(["file_id", "row_id"], ignore_index=True)
    split_b = backward_fill(sdf, ["ch"], file_column=("file_id", "split_id")) \
        .toPandas().sort_values(["file_id", "row_id"], ignore_index=True)
    pd.testing.assert_series_equal(base_b["ch"], split_b["ch"])


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pdf=split_frames())
def test_composite_key_timestamp_histogram_equals_single_key(spark, pdf):
    """The W3 event time-delta handoff generalizes the same way: per-split
    windows + handoff give the identical normalization histogram."""
    from sed_binning_spark.binning.binning import (
        normalization_histogram_sparse_from_timestamps,
    )

    pdf = pdf.copy()
    pdf["ts"] = np.linspace(0.0, 10.0, len(pdf)) ** 1.5
    pdf["x"] = np.abs(np.nan_to_num(pdf["ch"]))
    sdf = spark.createDataFrame(pdf)
    centers = np.linspace(0.0, 100.0, 10, endpoint=False)
    a = normalization_histogram_sparse_from_timestamps(
        sdf, "x", centers, "ts", order_columns=("file_id", "row_id"),
    ).toPandas().sort_values("bin", ignore_index=True)
    b = normalization_histogram_sparse_from_timestamps(
        sdf, "x", centers, "ts", order_columns=("file_id", "split_id", "row_id"),
    ).toPandas().sort_values("bin", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
