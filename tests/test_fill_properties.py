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
