"""K3: NeXus (NXmpes) sink (reference: sed/io/nexus.py:13-47).

The reference delegates to pynxtools' DataConverter with an eln_data
mapping. When pynxtools is importable that path is used verbatim;
otherwise :func:`to_nexus` writes a structural NXmpes subset itself via
the engine's pure-Python HDF5 writer — /entry (NXentry) with definition,
and /entry/data (NXdata) carrying the signal, the named axis datasets, and
the signal/axes attributes any NeXus browser keys on. That file is not
run through NXDL validation (that is exactly pynxtools' job), but it IS a
real, openable NeXus-shaped HDF5, not an error message.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from sed_binning_spark.cube import Cube

try:  # gated optional dependency
    from pynxtools.dataconverter.convert import convert  # type: ignore
except ImportError:  # pragma: no cover - environment-dependent
    convert = None


def nexus_payload(
    data: Cube,
    reader: str = "mpes",
    definition: str = "NXmpes",
    input_files: str | list[str] | None = None,
) -> dict:
    """The converter invocation payload (reader/nxdl/objects), assembled
    exactly as to_nexus does (sed/io/nexus.py:25-47). A bare-string
    ``input_files`` wraps to a one-element list (list(str) would explode
    the path into characters)."""
    if isinstance(input_files, (str, Path)):
        input_files = [str(input_files)]
    return {
        "reader": reader,
        "nxdl": definition,
        "input_file": list(input_files or []),
        "objects": (data,),
    }


def to_nexus(
    data: Cube,
    faddr: str | Path,
    reader: str = "mpes",
    definition: str = "NXmpes",
    input_files: str | list[str] | None = None,
    **kwds,
) -> None:
    payload = nexus_payload(data, reader, definition, input_files)
    if convert is None:
        _write_basic_nxmpes(data, faddr, definition)
        return
    convert(output=str(faddr), **payload, **kwds)  # pragma: no cover


def _write_basic_nxmpes(data: Cube, faddr: str | Path, definition: str) -> None:
    """Structural NXmpes subset via the built-in HDF5 writer: NXentry +
    NXdata with signal/axes wiring (the layout load paths key on)."""
    from sed_binning_spark.io.hdf5_write import H5Writer

    if "data" in data.dims:
        # the NXdata signal dataset lives at /entry/data/data; an axis
        # literally named 'data' would overwrite it with its coordinate
        # array and every NeXus browser would show axis values as the
        # signal — refuse rather than corrupt
        raise ValueError(
            "an axis named 'data' collides with the NXdata signal dataset; "
            "rename the dimension before writing NeXus",
        )
    w = H5Writer()
    w.add_group("/entry")
    w.add_attr("/entry", "NX_class", "NXentry")
    w.add_dataset("/entry/definition", definition)
    w.add_dataset("/entry/data/data", np.asarray(data.data))
    w.add_attr("/entry/data", "NX_class", "NXdata")
    w.add_attr("/entry/data", "signal", "data")
    w.add_attr("/entry/data", "axes", np.array(list(data.dims)))
    for i, dim in enumerate(data.dims):
        w.add_dataset(f"/entry/data/{dim}", np.asarray(data.coords[dim]))
        w.add_attr("/entry/data", f"{dim}_indices", np.int64(i))
        unit = data.attrs.get("units", {}).get(dim) if isinstance(
            data.attrs.get("units"), dict,
        ) else None
        if unit:
            w.add_attr(f"/entry/data/{dim}", "units", str(unit))
    w.write(str(faddr))
