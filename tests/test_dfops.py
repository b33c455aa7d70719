"""Operator unit tests for core dfops (mirrors reference
tests/test_dfops.py:28-456 — each operator incl. boundary/error paths)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sed_binning_spark.core.dfops import (
    add_time_stamped_data,
    apply_filter,
    apply_jitter,
    backward_fill,
    drop_column,
    drop_nan_rows,
    forward_fill,
    map_columns_2d,
    offset_by_other_columns,
)


# ---------------------------------------------------------------------- jitter
def test_jitter_uniform_bounds(events_df):
    out = apply_jitter(events_df, cols=["X"], amps=0.5, seed=1).toPandas()
    d = out["X_jittered"] - out["X"]
    assert (d.abs() <= 0.5).all()
    assert d.abs().mean() > 0.1  # actually jittered


def test_jitter_shared_draw(events_df):
    """ONE noise draw per call shared by all columns (dfops.py:16-70)."""
    out = apply_jitter(events_df, cols=["X", "Y"], amps=[1.0, 2.0], seed=2).toPandas()
    dx = out["X_jittered"] - out["X"]
    dy = out["Y_jittered"] - out["Y"]
    np.testing.assert_allclose(dy.to_numpy(), 2.0 * dx.to_numpy(), rtol=1e-6, atol=1e-9)


def test_jitter_normal_type(events_df):
    out = apply_jitter(events_df, cols=["X"], amps=1.0, jitter_type="normal", seed=3).toPandas()
    d = out["X_jittered"] - out["X"]
    assert abs(d.mean()) < 0.05
    assert 0.9 < d.std() < 1.1


def test_jitter_hash_layout_invariant(events_df):
    """method='hash' draws from md5(file_id:row_id:seed): the same row gets
    the same noise under ANY partition layout — the property rand(seed)
    lacks (its draw depends on the partition index)."""
    out1 = (
        apply_jitter(events_df, cols=["X"], amps=0.5, seed=9, method="hash")
        .select("file_id", "row_id", "X_jittered").toPandas()
        .sort_values(["file_id", "row_id"]).reset_index(drop=True)
    )
    out2 = (
        apply_jitter(events_df.repartition(17, "X"), cols=["X"], amps=0.5,
                     seed=9, method="hash")
        .select("file_id", "row_id", "X_jittered").toPandas()
        .sort_values(["file_id", "row_id"]).reset_index(drop=True)
    )
    assert (out1["X_jittered"] == out2["X_jittered"]).all()
    d = out1["X_jittered"] - out1.merge(
        apply_jitter(events_df, cols=["X"], amps=0.5, seed=9, method="hash")
        .select("file_id", "row_id", "X").toPandas(),
        on=["file_id", "row_id"],
    )["X"]
    assert (d.abs() <= 0.5).all() and d.abs().mean() > 0.1  # still uniform


def test_jitter_hash_normal_and_errors(events_df):
    out = apply_jitter(events_df, cols=["X"], amps=1.0, jitter_type="normal",
                       seed=3, method="hash").toPandas()
    d = out["X_jittered"] - out["X"]
    assert abs(d.mean()) < 0.05
    assert 0.9 < d.std() < 1.1
    with pytest.raises(ValueError, match="missing from dataframe"):
        apply_jitter(events_df.drop("row_id"), cols=["X"], method="hash")
    with pytest.raises(ValueError, match="'rand', 'hash'"):
        apply_jitter(events_df, cols=["X"], method="bogus")


def test_jitter_hash_null_key_draws_null(spark):
    """A row whose key is NULL cannot be reproducibly identified — it must
    draw NULL noise, not silently collapse onto a neighbour's key."""
    df = spark.createDataFrame(
        [(0, 0, 1.0), (0, None, 2.0)], "file_id int, row_id int, X double",
    )
    out = apply_jitter(df, cols=["X"], amps=0.5, seed=1, method="hash").toPandas()
    jit = out.set_index("X")["X_jittered"]
    assert not pd.isna(jit[1.0])  # keyed row gets a real draw
    assert pd.isna(jit[2.0])


def test_jitter_inplace_and_errors(events_df):
    out = apply_jitter(events_df, cols="X", cols_jittered="X", amps=0.5, seed=4)
    assert "X_jittered" not in out.columns
    with pytest.raises(ValueError, match="needs to be provided"):
        apply_jitter(events_df, cols=None)
    with pytest.raises(ValueError, match="'normal', 'uniform'"):
        apply_jitter(events_df, cols=["X"], jitter_type="bogus")


# -------------------------------------------------------------------- dropna
def test_drop_nan_rows_null_and_nan(spark):
    """Both NULL and float NaN reject the row (P5 dropna semantics,
    sed/loader/flash/loader.py:822-824); other columns never consulted."""
    pdf = pd.DataFrame({
        "id": [0, 1, 2, 3, 4],
        "a": [1.0, np.nan, 3.0, None, 5.0],
        "b": [1.0, 2.0, None, 4.0, 5.0],
    })
    df = spark.createDataFrame(pdf)
    out = drop_nan_rows(df, ["a", "b"]).toPandas()
    assert sorted(out["id"]) == [0, 4]
    # single-column subset keeps rows dirty only elsewhere
    out_a = drop_nan_rows(df, "a").toPandas()
    assert sorted(out_a["id"]) == [0, 2, 4]
    # non-float columns: NULL check only, no isnan on strings
    df2 = spark.createDataFrame(
        pd.DataFrame({"id": [0, 1], "s": ["x", None]}),
    )
    assert drop_nan_rows(df2, ["s"]).count() == 1
    with pytest.raises(KeyError, match="missing"):
        drop_nan_rows(df, ["nope"])


# ---------------------------------------------------------------------- filter
def test_filter_open_interval(events_df, events_pdf):
    out = apply_filter(events_df, "X", 100, 200).toPandas()
    oracle = events_pdf[(events_pdf.X > 100) & (events_pdf.X < 200)]
    assert len(out) == len(oracle)
    assert out.X.min() > 100 and out.X.max() < 200


def test_filter_one_sided(events_df, events_pdf):
    assert apply_filter(events_df, "X", lower_bound=1000).count() == (events_pdf.X > 1000).sum()
    assert apply_filter(events_df, "X", upper_bound=1000).count() == (events_pdf.X < 1000).sum()


def test_filter_index_column(events_df, events_pdf):
    """col='index' filters on the stable per-file row index (P1)."""
    out = apply_filter(events_df, "index", upper_bound=10)
    assert out.count() == (events_pdf.row_id < 10).sum()


def test_filter_missing_column(events_df):
    with pytest.raises(KeyError, match="not in dataframe"):
        apply_filter(events_df, "nope", 0, 1)


# ------------------------------------------------------------------------ drop
def test_drop_column(events_df):
    out = drop_column(events_df, "ADC")
    assert "ADC" not in out.columns
    out = drop_column(events_df, ["X", "Y"])
    assert "X" not in out.columns and "Y" not in out.columns
    with pytest.raises(KeyError):
        drop_column(events_df, "missing")


# -------------------------------------------------------------------- map 2d
def test_map_columns_2d(events_df, events_pdf):
    theta = 0.3

    def rot(x, y):
        return (
            x * F.lit(np.cos(theta)) - y * F.lit(np.sin(theta)),
            x * F.lit(np.sin(theta)) + y * F.lit(np.cos(theta)),
        )

    out = map_columns_2d(events_df, rot, "X", "Y", "Xr", "Yr").toPandas()
    np.testing.assert_allclose(
        out.Xr, out.X * np.cos(theta) - out.Y * np.sin(theta), rtol=1e-12,
    )


def test_map_columns_2d_inplace_simultaneous(spark):
    """Both outputs computed from the INPUTS even when overwriting in place."""
    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    out = map_columns_2d(df, lambda x, y: (y, x), "x", "y").collect()[0]
    assert out["x"] == 2.0 and out["y"] == 1.0


# ----------------------------------------------------------- timestamped data
def test_add_time_stamped_data(events_df, events_pdf):
    ts0 = float(events_pdf.timeStamps.min())
    ts1 = float(events_pdf.timeStamps.max())
    xs = np.linspace(ts0 - 1, ts1 + 1, 20)
    ys = np.sin(np.arange(20.0))
    out = add_time_stamped_data(
        events_df, xs, ys, dest_column="temp", time_stamp_column="timeStamps",
    ).toPandas().sort_values("timeStamps")
    oracle = np.interp(out.timeStamps.to_numpy(), xs, ys)
    np.testing.assert_allclose(out.temp.to_numpy(), oracle, rtol=1e-12)


def test_add_time_stamped_data_clamps(spark):
    df = spark.createDataFrame([(0.0,), (5.0,), (100.0,)], "ts double")
    out = add_time_stamped_data(
        df, np.array([1.0, 10.0]), np.array([2.0, 4.0]), "v", "ts",
    ).toPandas().sort_values("ts")
    np.testing.assert_allclose(out.v.to_numpy(), [2.0, 2.0 + 4 * 2 / 9, 4.0])


def test_add_time_stamped_data_errors(events_df):
    with pytest.raises(ValueError, match="not found"):
        add_time_stamped_data(events_df, np.array([1.0]), np.array([1.0]), "v", "nope")
    with pytest.raises(ValueError, match="equal length"):
        add_time_stamped_data(
            events_df, np.array([1.0, 2.0]), np.array([1.0]), "v", "timeStamps",
        )


# ----------------------------------------------------------------------- fills
@pytest.fixture(scope="module")
def sparse_pdf():
    """Sparse per-train channel table: non-null only on scattered rows,
    including an ALL-NULL file (file 1) that the fill must carry across
    (reference's all-NaN-partition case, tests/test_dfops.py:169-190)."""
    n_files, per_file = 4, 50
    rows = []
    rng = np.random.default_rng(9)
    for fid in range(n_files):
        for rid in range(per_file):
            val = float(rng.uniform()) if (fid != 1 and rid % 7 == 0) else None
            ival = int(rng.integers(0, 100)) if (fid != 1 and rid % 11 == 0) else None
            rows.append((fid, rid, val, ival))
    return pd.DataFrame(rows, columns=["file_id", "row_id", "v", "iv"])


@pytest.fixture(scope="module")
def sparse_df(spark, sparse_pdf):
    return spark.createDataFrame(sparse_pdf.astype(object).where(pd.notnull(sparse_pdf), None),
                                 "file_id int, row_id int, v double, iv int")


def test_forward_fill_matches_pandas(sparse_df, sparse_pdf):
    out = (
        forward_fill(sparse_df, ["v", "iv"])
        .toPandas().sort_values(["file_id", "row_id"]).reset_index(drop=True)
    )
    oracle = sparse_pdf.sort_values(["file_id", "row_id"]).reset_index(drop=True)
    np.testing.assert_allclose(
        out.v.to_numpy(dtype=float), oracle.v.ffill().to_numpy(dtype=float),
    )
    # non-double column fills losslessly with its own type (r1 ADVICE fix)
    assert out.iv.dtype.kind in "if"
    np.testing.assert_allclose(
        out.iv.to_numpy(dtype=float), oracle.iv.ffill().to_numpy(dtype=float),
    )


def test_backward_fill_matches_pandas(sparse_df, sparse_pdf):
    out = (
        backward_fill(sparse_df, ["v"])
        .toPandas().sort_values(["file_id", "row_id"]).reset_index(drop=True)
    )
    oracle = sparse_pdf.sort_values(["file_id", "row_id"]).reset_index(drop=True)
    np.testing.assert_allclose(
        out.v.to_numpy(dtype=float), oracle.v.bfill().to_numpy(dtype=float),
    )


def test_fill_build_runs_no_spark_jobs(spark, sparse_df):
    """The cross-file boundary handoff is computed IN-PLAN (an ordered
    window over the per-file aggregate), so building a fill must launch
    zero Spark jobs — the old implementation collected the boundary frame
    to the driver at query-build time (r14 optimization pin)."""
    sc = spark.sparkContext
    group = "fill-build-probe"
    sc.setJobGroup(group, "fill build should be lazy")
    try:
        out = forward_fill(sparse_df, ["v", "iv"])
        out = backward_fill(out, ["v"])
    finally:
        sc.setJobGroup(None, None)
    assert list(sc.statusTracker().getJobIdsForGroup(group)) == []
    # and the plan still executes correctly end-to-end
    assert out.count() == sparse_df.count()


def test_forward_fill_nan_is_missing(spark):
    """float NaN is treated as missing, like pandas ffill."""
    df = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, float("nan")), (0, 2, None), (0, 3, 2.0)],
        "file_id int, row_id int, v double",
    )
    out = forward_fill(df, "v").toPandas().sort_values("row_id")
    np.testing.assert_allclose(out.v.to_numpy(), [1.0, 1.0, 1.0, 2.0])


def test_forward_fill_no_file_column(spark):
    df = spark.createDataFrame(
        [(0, None), (1, 3.0), (2, None)], "row_id int, v double",
    )
    out = forward_fill(df, "v", file_column="absent").toPandas().sort_values("row_id")
    assert np.isnan(out.v.iloc[0]) or out.v.iloc[0] is None or pd.isna(out.v.iloc[0])
    np.testing.assert_allclose(out.v.to_numpy()[1:], [3.0, 3.0])


def test_fill_errors(sparse_df):
    with pytest.raises(ValueError, match="non-empty"):
        forward_fill(sparse_df, [])
    with pytest.raises(KeyError, match="not in dataframe"):
        forward_fill(sparse_df, ["nope"])
    with pytest.raises(KeyError, match="not in dataframe"):
        backward_fill(sparse_df, ["nope"])


# --------------------------------------------------------------------- offsets
def test_offset_per_row(events_df, events_pdf):
    out = offset_by_other_columns(events_df, "t", ["ADC"], weights=[2.0]).toPandas()
    oracle = events_pdf.t + 2.0 * events_pdf.ADC
    np.testing.assert_allclose(np.sort(out.t.to_numpy()), np.sort(oracle.to_numpy()), rtol=1e-12)


def test_offset_mean_reduction(events_df, events_pdf):
    out = offset_by_other_columns(
        events_df, "t", ["ADC"], weights=[1.0], reductions="mean",
    ).toPandas()
    oracle = events_pdf.t + events_pdf.ADC.mean()
    np.testing.assert_allclose(
        np.sort(out.t.to_numpy()), np.sort(oracle.to_numpy()), rtol=1e-9,
    )


def test_offset_preserve_mean(events_df, events_pdf):
    out = offset_by_other_columns(
        events_df, "t", ["ADC"], weights=[1.0], preserve_mean=True,
    ).toPandas()
    oracle = events_pdf.t + events_pdf.ADC - events_pdf.ADC.mean()
    np.testing.assert_allclose(
        np.sort(out.t.to_numpy()), np.sort(oracle.to_numpy()), rtol=1e-9,
    )
    assert abs(out.t.mean() - events_pdf.t.mean()) < 1e-6


def test_offset_not_inplace_rename(events_df):
    out = offset_by_other_columns(
        events_df, "t", ["ADC"], weights=[1.0], inplace=False, rename="t_shifted",
    )
    assert "t_shifted" in out.columns and "t" in out.columns


def test_offset_errors(events_df):
    with pytest.raises(KeyError):
        offset_by_other_columns(events_df, "nope", ["ADC"], [1.0])
    with pytest.raises(KeyError):
        offset_by_other_columns(events_df, "t", ["nope"], [1.0])
    with pytest.raises(ValueError, match="same length"):
        offset_by_other_columns(events_df, "t", ["ADC"], [1.0, 2.0])
    with pytest.raises(NotImplementedError, match="mean"):
        offset_by_other_columns(events_df, "t", ["ADC"], [1.0], reductions="median")
    with pytest.raises(TypeError):
        offset_by_other_columns(events_df, "t", ["ADC"], [1.0], preserve_mean=[1])


def test_jitter_hash_key_encoding_is_injective(spark):
    """The review-found collision: with a bare ':' separator, string keys
    ('x:y','z') and ('x','y:z') hash identically. The length-prefixed
    encoding must give them DIFFERENT noise, and every draw must equal the
    documented spec md5('len:val;' per key + 'jitter:<seed>') recomputed
    in Python."""
    import hashlib

    rows = [
        (0, "x:y", "z", 1.0),
        (1, "x", "y:z", 1.0),    # the ambiguous twin under a ':' join
        (2, "x;1:", ";", 1.0),   # separator chars inside values
        (3, "", "", 1.0),        # empty strings still keyed (len 0)
    ]
    df = spark.createDataFrame(rows, "i int, a string, b string, X double")
    out = (
        apply_jitter(df, cols=["X"], amps=1.0, seed=5, method="hash",
                     key_columns=("a", "b"))
        .orderBy("i").toPandas()
    )
    noise = (out["X_jittered"] - out["X"]).tolist()
    assert len(set(noise)) == len(noise), "key encoding collided"

    def spec(a, b, seed=5):
        enc = f"{len(a)}:{a};{len(b)}:{b};jitter:{seed}"
        n = int(hashlib.md5(enc.encode()).hexdigest()[:13], 16)
        return n / float(1 << 52) * 2.0 - 1.0

    for (_, a, b, _), got in zip(rows, noise):
        assert got == spec(a, b), (a, b)
