"""Cube (dense labeled hypercube) tests: alignment, division, selection."""

from __future__ import annotations

import numpy as np
import pytest

from sed_binning_spark.cube import Cube


def test_cube_construction_and_props():
    data = np.arange(12, dtype=float).reshape(3, 4)
    c = Cube(data, {"x": np.arange(3), "y": np.arange(4)})
    assert c.shape == (3, 4)
    assert c.dims == ("x", "y")
    assert c.ndim == 2
    with pytest.raises(ValueError, match="dims"):
        Cube(data, {"x": np.arange(3)})
    with pytest.raises(ValueError, match="extent"):
        Cube(data, {"x": np.arange(3), "y": np.arange(5)})


def test_cube_division_by_aligned_1d():
    """J6: cube / 1-D histogram aligned on the shared axis name."""
    data = np.ones((3, 4))
    c = Cube(data, {"x": np.arange(3), "y": np.arange(4)})
    norm = Cube(np.array([1.0, 2.0, 4.0, 8.0]), {"y": np.arange(4)})
    out = c / norm
    np.testing.assert_allclose(out.data, np.tile(1.0 / np.array([1, 2, 4, 8]), (3, 1)))
    norm_x = Cube(np.array([1.0, 2.0, 4.0]), {"x": np.arange(3)})
    out = c / norm_x
    np.testing.assert_allclose(out.data[:, 0], [1.0, 0.5, 0.25])
    with pytest.raises(ValueError, match="align"):
        c / Cube(np.array([1.0]), {"z": np.arange(1)})


def test_cube_division_by_scalar():
    c = Cube(np.full((2, 2), 6.0), {"x": np.arange(2), "y": np.arange(2)})
    np.testing.assert_allclose((c / 2.0).data, 3.0)


def test_cube_sel_index_and_sum():
    data = np.arange(24, dtype=float).reshape(2, 3, 4)
    c = Cube(data, {"a": np.arange(2), "b": np.arange(3), "c": np.arange(4)})
    s = c.sel_index(b=1)
    assert s.dims == ("a", "c")
    np.testing.assert_allclose(s.data, data[:, 1, :])
    assert c.sum() == data.sum()
    sb = c.sum("b")
    assert sb.dims == ("a", "c")
    np.testing.assert_allclose(sb.data, data.sum(axis=1))


def test_cube_equals():
    a = Cube(np.ones((2,)), {"x": np.arange(2)})
    b = Cube(np.ones((2,)), {"x": np.arange(2)})
    assert a.equals(b)
    assert not a.equals(Cube(np.zeros((2,)), {"x": np.arange(2)}))


def test_cube_division_transposed_dims():
    """Dividing by a cube whose dims are in a different ORDER must align by
    name (transpose), not silently reinterpret the buffer."""
    data = np.arange(6, dtype=float).reshape(2, 3) + 1.0
    a = Cube(data, {"x": np.arange(2), "y": np.arange(3)}, dims=["x", "y"])
    b = Cube(data.T.copy(), {"y": np.arange(3), "x": np.arange(2)}, dims=["y", "x"])
    out = a / b
    np.testing.assert_array_equal(out.data, np.ones((2, 3)))


def test_cube_missing_coords_raises_value_error():
    with pytest.raises(ValueError, match="no coords entry"):
        Cube(np.zeros((2, 3)), {"x": np.arange(2)}, dims=["x", "y"])


def test_cube_equals_different_shapes_is_false():
    """allclose broadcasts, so equals must shape-check first: 16 vs 12 bins
    is False (not a raise), and a size-1 axis must not compare True against
    an N-bin cube by broadcasting."""
    a = Cube(np.zeros(16), {"x": np.arange(16.0)})
    b = Cube(np.zeros(12), {"x": np.arange(12.0)})
    assert not a.equals(b)
    c = Cube(np.zeros(1), {"x": np.zeros(1)})
    d = Cube(np.zeros(4), {"x": np.array([0.0, 0.0, 0.0, 0.0])})
    assert not c.equals(d)


def test_cube_division_rejects_mismatched_bin_centers():
    """Name-matched axes with DIFFERENT bin centers must not divide
    positionally (silently wrong counts/second) — they raise."""
    a = Cube(np.ones((4, 3)), {"x": np.arange(4.0), "y": np.arange(3.0)})
    hist = Cube(np.ones(4), {"x": np.arange(4.0) + 10.0})
    with pytest.raises(ValueError, match="different bin centers"):
        a / hist
    # matching centers still divide fine
    ok = a / Cube(2.0 * np.ones(4), {"x": np.arange(4.0)})
    assert float(ok.data.sum()) == 6.0
