"""K3: NeXus (NXmpes) sink (reference: sed/io/nexus.py:13-47).

The reference delegates to pynxtools' DataConverter with an eln_data
mapping. pynxtools is not available in this environment; the entry point
validates its inputs and raises with a clear message, keeping the save()
dispatch contract (the metadata assembly it WOULD hand over is returned
by :func:`nexus_payload` and is unit-testable without the dependency).
"""

from __future__ import annotations

from pathlib import Path

from sed_binning_spark.cube import Cube

try:  # gated optional dependency
    from pynxtools.dataconverter.convert import convert  # type: ignore
except ImportError:  # pragma: no cover - environment-dependent
    convert = None


def nexus_payload(
    data: Cube,
    reader: str = "mpes",
    definition: str = "NXmpes",
    input_files: list[str] | None = None,
) -> dict:
    """The converter invocation payload (reader/nxdl/objects), assembled
    exactly as to_nexus does (sed/io/nexus.py:25-47)."""
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
    input_files: list[str] | None = None,
    **kwds,
) -> None:
    payload = nexus_payload(data, reader, definition, input_files)
    if convert is None:
        raise ImportError(
            "pynxtools is not installed; NeXus export is unavailable in "
            "this environment (payload assembly is tested via nexus_payload)",
        )
    convert(output=str(faddr), **payload, **kwds)  # pragma: no cover
