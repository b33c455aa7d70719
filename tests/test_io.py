"""IO round-trip tests (reference tests/test_io.py pattern: save + load
equality on synthetic cubes)."""

from __future__ import annotations

import numpy as np
import pytest

from sed_binning_spark.cube import Cube
from sed_binning_spark.io import load_npz, load_tiff, save, to_npz, to_tiff
from sed_binning_spark.io.nexus import nexus_payload, to_nexus
from sed_binning_spark.io.tiff import _imagej_axis_order


def _cube(shape, dims):
    rng = np.random.default_rng(13)
    coords = {d: np.linspace(0, 1, n) for d, n in zip(dims, shape)}
    return Cube(
        rng.uniform(size=shape).astype(np.float32), coords, dims,
        attrs={"sample": "test", "nested": {"a": 1}},
    )


@pytest.mark.parametrize("shape,dims", [
    ((16, 8), ("X", "Y")),
    ((4, 16, 8), ("energy", "X", "Y")),
    ((3, 4, 16, 8), ("delay", "energy", "X", "Y")),
])
def test_tiff_roundtrip(tmp_path, shape, dims):
    c = _cube(shape, dims)
    path = tmp_path / "cube.tiff"
    to_tiff(c, path)
    back = load_tiff(path)
    order = _imagej_axis_order(c.dims)
    expected = np.transpose(c.data, order)
    np.testing.assert_array_equal(back.reshape(expected.shape), expected)


def test_tiff_imagej_axis_reorder(tmp_path):
    """x/y go last regardless of input order (sed/io/tiff.py:100-142)."""
    c = _cube((8, 16, 4), ("X", "Y", "energy"))
    order = _imagej_axis_order(c.dims)
    assert [c.dims[i] for i in order] == ["energy", "Y", "X"]
    path = tmp_path / "cube.tif"
    to_tiff(c, path)
    # the reference always normalizes the suffix to .tiff (sed/io/tiff.py:94)
    back = load_tiff(path.with_suffix(".tiff"))
    np.testing.assert_array_equal(back, np.transpose(c.data, order))
    with pytest.raises(ValueError, match="zero-length"):
        to_tiff(np.zeros((0, 4, 4)), tmp_path / "empty.tiff")


def test_tiff_rejects_1d(tmp_path):
    with pytest.raises(ValueError, match="2-D"):
        to_tiff(np.zeros(5), tmp_path / "x.tiff")


def test_npz_roundtrip(tmp_path):
    c = _cube((5, 7, 3), ("kx", "ky", "energy"))
    path = tmp_path / "cube.npz"
    to_npz(c, path)
    back = load_npz(path)
    assert back.dims == c.dims
    np.testing.assert_array_equal(back.data, c.data)
    for d in c.dims:
        np.testing.assert_allclose(back.coords[d], c.coords[d])
    assert back.attrs["sample"] == "test"
    assert back.attrs["nested"] == {"a": 1}


def test_save_dispatch(tmp_path):
    c = _cube((6, 4), ("X", "Y"))
    save(c, tmp_path / "a.tiff")
    save(c, tmp_path / "a.npz")
    assert (tmp_path / "a.tiff").exists() and (tmp_path / "a.npz").exists()
    with pytest.raises(NotImplementedError, match="Unrecognized"):
        save(c, tmp_path / "a.bogus")


def test_h5_round_trip(tmp_path):
    """K2 .h5 round trip works with OR without h5py (the engine carries its
    own classic-format writer/reader): data, axis names/coords, and the
    recursive metadata tree survive."""
    c = _cube((4, 4), ("X", "Y"))
    c.attrs.update({"jitter": {"amplitude": 0.5, "mode": "uniform"}, "n": 3})
    save(c, tmp_path / "a.h5")
    from sed_binning_spark.io import load_h5

    back = load_h5(tmp_path / "a.h5")
    np.testing.assert_array_equal(back.data, c.data)
    assert back.dims == c.dims
    for d in c.dims:
        np.testing.assert_array_equal(back.coords[d], c.coords[d])
    assert back.attrs["jitter"]["mode"] == "uniform"
    assert float(back.attrs["jitter"]["amplitude"]) == 0.5


def test_nexus_payload_and_basic_file(tmp_path):
    c = _cube((4, 4), ("kx", "ky"))
    payload = nexus_payload(c, input_files=["a.h5"])
    assert payload["nxdl"] == "NXmpes" and payload["objects"][0] is c
    # without pynxtools a structural NXmpes subset is written directly
    to_nexus(c, tmp_path / "a.nxs")
    from sed_binning_spark.io.hdf5_read import H5File

    f = H5File(str(tmp_path / "a.nxs"))
    assert f.attrs("/entry")["NX_class"] == "NXentry"
    d = f.attrs("/entry/data")
    assert d["signal"] == "data" and list(d["axes"]) == ["kx", "ky"]
    np.testing.assert_array_equal(f.read("/entry/data/data"), c.data)
    np.testing.assert_array_equal(f.read("/entry/data/kx"), c.coords["kx"])
