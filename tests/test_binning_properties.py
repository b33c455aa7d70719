"""Property-based binning semantics (hypothesis): for arbitrary bin
geometry, values placed anywhere EXCEPT within FP-ambiguous distance of an
edge must classify exactly like the reference semantics — half-bin-shifted
edges, inclusive last edge, out-of-range rejection. Complements the golden
random tests with adversarial geometry (tiny/huge widths, offsets,
single-bin cubes)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sed_binning_spark.binning.binning import bin_dataframe, bin_dataframe_sparse

_SET = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _binning_case(draw):
    nbins = draw(st.integers(1, 40))
    lo = draw(st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False))
    width = draw(st.floats(1e-3, 1e4, allow_nan=False, allow_infinity=False))
    # values addressed by (bin index, offset from center): stays >= 0.05*w
    # away from every edge, so classification has no FP ambiguity
    placements = draw(
        st.lists(
            st.tuples(st.integers(-3, nbins + 2),
                      st.floats(-0.45, 0.45, allow_nan=False)),
            min_size=1, max_size=120,
        ),
    )
    return nbins, lo, width, placements


@_SET
@given(case=_binning_case())
def test_uniform_binning_classification_property(spark, case):
    nbins, lo, width, placements = case
    w = width / nbins
    hi = lo + width
    values = [lo + b * w + frac * w for b, frac in placements]
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    cube = bin_dataframe(df, bins=[nbins], axes=["v"], ranges=[(lo, hi)])

    want = np.zeros(nbins, dtype=np.float32)
    for b, _frac in placements:
        if 0 <= b <= nbins - 1:
            want[b] += 1
    np.testing.assert_array_equal(cube.data, want)
    # sparse (oracle) path agrees cell-for-cell
    sparse = bin_dataframe_sparse(df, bins=[nbins], axes=["v"], ranges=[(lo, hi)])
    got = {int(r["v"]): r["count"] for r in sparse.collect()}
    assert got == {i: int(c) for i, c in enumerate(want) if c}


@_SET
@given(
    centers=st.lists(
        st.floats(-1e4, 1e4, allow_nan=False, allow_infinity=False),
        min_size=2, max_size=30, unique=True,
    ),
    placements=st.lists(
        st.tuples(st.integers(-2, 40), st.floats(-0.4, 0.4, allow_nan=False)),
        min_size=1, max_size=60,
    ),
)
def test_explicit_edges_classification_property(spark, centers, placements):
    """Explicit (possibly non-uniform) bin centers: same off-edge
    classification contract through the searchsorted/HOF path."""
    from hypothesis import assume

    from sed_binning_spark.binning.utils import bin_centers_to_bin_edges

    centers = np.sort(np.asarray(centers, dtype=float))
    assume(np.diff(centers).min() > 1e-6 * max(1.0, np.abs(centers).max()))
    edges = bin_centers_to_bin_edges(centers)
    n = len(centers)
    mids = (edges[:-1] + edges[1:]) / 2
    widths = np.diff(edges)
    values, want = [], np.zeros(n, dtype=np.float32)
    for b, frac in placements:
        if 0 <= b < n:
            values.append(float(mids[b] + frac * widths[b]))
            want[b] += 1
        else:  # out of range on either side
            values.append(float(edges[0] - 1.0 if b < 0 else edges[-1] + 1.0))
    df = spark.createDataFrame([(v,) for v in values], "v double")
    cube = bin_dataframe(df, bins=[np.asarray(centers)], axes=["v"])
    np.testing.assert_array_equal(cube.data, want)


@_SET
@given(
    nbins=st.integers(1, 20),
    lo=st.floats(-100, 100, allow_nan=False),
    width=st.floats(0.1, 100, allow_nan=False),
)
def test_nan_and_null_always_rejected_property(spark, nbins, lo, width):
    rows = [(float(lo),), (float("nan"),), (None,)]
    df = spark.createDataFrame(rows, "v double")
    cube = bin_dataframe(df, bins=[nbins], axes=["v"], ranges=[(lo, lo + width)])
    assert float(cube.data.sum()) == 1.0  # only the real value lands


@given(
    n_vals=st.integers(0, 50_000),
    n_cells=st.integers(1, 300_000),
    seed=st.integers(0, 2**31),
    n_chunks=st.integers(1, 5),
)
@settings(max_examples=20, deadline=None)
def test_driver_bincount_strategies_agree(n_vals, n_cells, seed, n_chunks):
    """Both driver histogram strategies must equal plain np.bincount for
    any value distribution, chunking, and cell count (the size thresholds
    only pick WHICH runs, never change the result)."""
    from sed_binning_spark.binning.binning import (
        _range_partitioned_bincount,
        _value_chunked_bincount,
    )

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, n_cells, n_vals, dtype=np.int64)
    want = np.bincount(vals, minlength=n_cells)
    arrays = np.array_split(vals, n_chunks)
    np.testing.assert_array_equal(_value_chunked_bincount(arrays, n_cells), want)
    np.testing.assert_array_equal(_range_partitioned_bincount(vals, n_cells), want)
    # chunked input (arrow row-group views) and the reused-workspace
    # accumulator must be invisible to the result
    np.testing.assert_array_equal(
        _range_partitioned_bincount(arrays, n_cells, reuse_workspace=True), want,
    )


def test_driver_bincount_threaded_paths_agree():
    """Sizes chosen to actually REACH both threaded implementations (the
    hypothesis variant above stays below the size thresholds): a 9M-value
    array splits inside _value_chunked_bincount, and 9M cells puts
    _range_partitioned_bincount on its bounds/slice ThreadPool branch —
    pinning the thread-boundary arithmetic against plain np.bincount."""
    from sed_binning_spark.binning.binning import (
        _VALUE_CHUNK_MAX_CELLS,
        _range_partitioned_bincount,
        _value_chunked_bincount,
    )

    rng = np.random.default_rng(11)
    n_cells_small = 100_000
    vals = rng.integers(0, n_cells_small, 9_000_000, dtype=np.int64)
    assert n_cells_small < _VALUE_CHUNK_MAX_CELLS  # value-chunked regime
    want = np.bincount(vals, minlength=n_cells_small)
    np.testing.assert_array_equal(
        _value_chunked_bincount([vals], n_cells_small), want,
    )

    n_cells_big = 9_000_000
    vals_big = rng.integers(0, n_cells_big, 5_000_000, dtype=np.int64)
    assert n_cells_big >= _VALUE_CHUNK_MAX_CELLS  # range-partitioned regime
    want_big = np.bincount(vals_big, minlength=n_cells_big)
    np.testing.assert_array_equal(
        _range_partitioned_bincount(vals_big, n_cells_big), want_big,
    )


def test_threaded_bincount_workspace_reuse_is_invisible():
    """The production dense-driver call shape — CHUNKED arrays (arrow
    row-group views) + reuse_workspace=True on the THREADED branch — must
    be value-identical to np.bincount across consecutive calls that
    shrink n_cells, change dtype, and change totals: the retained 'out'
    and 'vals' buffers are larger than the live region on later calls, so
    any missed slice-assignment or stale-byte reuse shows up as a count
    from a previous run."""
    from sed_binning_spark.binning.binning import (
        _VALUE_CHUNK_MAX_CELLS,
        _range_partitioned_bincount,
        release_bincount_workspace,
    )

    release_bincount_workspace()
    rng = np.random.default_rng(5)
    cases = [
        (9_500_000, 12_000_000, np.int64),   # seeds the workspace
        (5_000_000, 9_000_000, np.int32),    # smaller + dtype switch
        (4_000_001, 8_000_001, np.int32),    # shrink again, odd sizes
    ]
    for n_vals, n_cells, dtype in cases:
        assert n_cells >= _VALUE_CHUNK_MAX_CELLS
        vals = rng.integers(0, n_cells, n_vals).astype(dtype)
        chunks = np.array_split(vals, 37)
        got = _range_partitioned_bincount(chunks, n_cells, reuse_workspace=True)
        np.testing.assert_array_equal(got, np.bincount(vals, minlength=n_cells))
    release_bincount_workspace()
