"""K4: extension-based sink dispatch (reference SedProcessor.save,
sed/core/processor.py:2459-2551)."""

from __future__ import annotations

from pathlib import Path

from sed_binning_spark.cube import Cube


def save(data: Cube, faddr: str | Path, **kwds) -> None:
    """Dispatch on extension: .tiff/.tif → TIFF stack, .h5/.hdf5 → HDF5,
    .npz → NPZ, .nxs/.nexus → NeXus. Unknown extensions raise (matching the
    reference's NotImplementedError, processor.py:2544-2551)."""
    ext = Path(faddr).suffix.lower()
    if ext in (".tif", ".tiff"):
        from sed_binning_spark.io.tiff import to_tiff

        to_tiff(data, faddr, **kwds)
    elif ext in (".h5", ".hdf5"):
        from sed_binning_spark.io.hdf5 import to_h5

        to_h5(data, faddr, **kwds)
    elif ext == ".npz":
        from sed_binning_spark.io.hdf5 import to_npz

        to_npz(data, faddr, **kwds)
    elif ext in (".nxs", ".nexus"):
        from sed_binning_spark.io.nexus import to_nexus

        to_nexus(data, faddr, **kwds)
    else:
        raise NotImplementedError(f"Unrecognized file format: {ext}")
