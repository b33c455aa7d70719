"""K2: HDF5 cube sink/source (reference: sed/io/hdf5.py:84-190), plus an
always-available NPZ twin.

h5py is an optional dependency (absent in this environment); the HDF5
functions gate on it with a clear error. The NPZ pair implements the SAME
contract — binned data + per-axis coordinate arrays + recursive metadata —
so round-trip tests and the save() dispatch work everywhere.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from sed_binning_spark.cube import Cube

try:  # gated optional dependency
    import h5py  # type: ignore
except ImportError:  # pragma: no cover - environment-dependent
    h5py = None


def to_h5(data: Cube, faddr: str | Path, mode: str = "w") -> None:
    """Cube + axes + recursive metadata dict → HDF5 (to_h5,
    sed/io/hdf5.py:84-130): datasets ``binned/BinnedData``, one
    ``binned/axes/ax{N}`` per axis, metadata group mirroring the dict."""
    if h5py is None:
        raise ImportError(
            "h5py is not installed; use to_npz()/load_npz() for the "
            "equivalent native format, or install h5py for .h5 output",
        )
    with h5py.File(faddr, mode) as fh:
        grp = fh.create_group("binned")
        ds = grp.create_dataset("BinnedData", data=data.data)
        axes_grp = grp.create_group("axes")
        for i, dim in enumerate(data.dims):
            ax = axes_grp.create_dataset(f"ax{i}", data=data.coords[dim])
            ax.attrs["name"] = dim
        ds.attrs["typ"] = "float32"
        if data.attrs:
            _write_meta_group(fh.create_group("metadata"), data.attrs)


def load_h5(faddr: str | Path, mode: str = "r") -> Cube:
    """HDF5 → Cube (load_h5, sed/io/hdf5.py:133-190)."""
    if h5py is None:
        raise ImportError("h5py is not installed; use load_npz() instead")
    with h5py.File(faddr, mode) as fh:
        data = fh["binned"]["BinnedData"][()]
        dims = []
        coords = {}
        axes_grp = fh["binned"]["axes"]
        for i in range(data.ndim):
            ax = axes_grp[f"ax{i}"]
            name = ax.attrs.get("name", f"ax{i}")
            if isinstance(name, bytes):
                name = name.decode()
            dims.append(name)
            coords[name] = ax[()]
        attrs = _read_meta_group(fh["metadata"]) if "metadata" in fh else {}
    return Cube(data, coords, dims, attrs)


def _write_meta_group(grp, meta: dict) -> None:
    for k, v in meta.items():
        if isinstance(v, dict):
            _write_meta_group(grp.create_group(str(k)), v)
        else:
            try:
                grp.create_dataset(str(k), data=v)
            except TypeError:
                grp.create_dataset(str(k), data=str(v))


def _read_meta_group(grp) -> dict:
    out = {}
    for k, v in grp.items():
        out[k] = _read_meta_group(v) if hasattr(v, "items") else v[()]
    return out


# ---------------------------------------------------------------------------
# NPZ twin (same contract, no optional deps)
# ---------------------------------------------------------------------------
def to_npz(data: Cube, faddr: str | Path) -> None:
    """Cube → .npz with the to_h5 contract: data + named axes + JSON attrs."""
    payload = {"BinnedData": data.data, "dims": np.array(list(data.dims))}
    for i, dim in enumerate(data.dims):
        payload[f"ax{i}"] = data.coords[dim]
    payload["attrs_json"] = np.array(json.dumps(data.attrs, default=str))
    np.savez_compressed(Path(faddr), **payload)


def load_npz(faddr: str | Path) -> Cube:
    with np.load(Path(faddr), allow_pickle=False) as z:
        data = z["BinnedData"]
        dims = [str(d) for d in z["dims"]]
        coords = {dim: z[f"ax{i}"] for i, dim in enumerate(dims)}
        attrs = json.loads(str(z["attrs_json"]))
    return Cube(data, coords, dims, attrs)
