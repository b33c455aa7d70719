"""K1: TIFF stack sink/source (reference: sed/io/tiff.py:39-97).

The reference writes the cube as an ImageJ-ordered TIFF stack via tifffile
with TZCYXS axis inference (sed/io/tiff.py:100-220). tifffile is not
available here, so this module implements the small slice of baseline TIFF
needed for that contract in pure NumPy: uncompressed little-endian
float32, one page per leading-axes index, ImageJ dimension order. The
files read back with tifffile/ImageJ (baseline tags only) and with
:func:`load_tiff`.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

from sed_binning_spark.cube import Cube

# ImageJ dimension order (reference _sort_dims_for_imagej, sed/io/tiff.py:100-142):
# time, z/energy, channel, y, x
_AXIS_PRIORITY = {
    "t": 0, "time": 0, "delay": 0, "ts": 0,
    "z": 1, "e": 1, "energy": 1, "E": 1,
    "c": 2, "ch": 2, "channel": 2,
    "y": 3, "Y": 3, "ky": 3,
    "x": 4, "X": 4, "kx": 4,
}


def _imagej_axis_order(dims: tuple[str, ...]) -> list[int]:
    """Axis permutation putting dims into TZCYX-ish order; unknown axes keep
    relative order ahead of y/x (treated as stack axes)."""
    def key(i):
        d = dims[i]
        return (_AXIS_PRIORITY.get(d, _AXIS_PRIORITY.get(d.lower(), 2)), i)

    return sorted(range(len(dims)), key=key)


def to_tiff(data: Cube | np.ndarray, faddr: str | Path, alias_dict: dict | None = None) -> None:
    """Write a 2-D..5-D cube as a float32 multi-page TIFF stack
    (to_tiff, sed/io/tiff.py:39-97). Axes are permuted to ImageJ order; the
    last two axes become the page (rows, cols)."""
    if isinstance(data, Cube):
        dims = data.dims
        if alias_dict:
            dims = tuple(alias_dict.get(d, d) for d in dims)
        order = _imagej_axis_order(dims)
        arr = np.transpose(data.data, order)
    else:
        arr = np.asarray(data)
    if arr.ndim < 2:
        raise ValueError(f"need at least a 2-D array to write a TIFF, got {arr.ndim}-D")
    arr = arr.astype(np.float32)
    pages = arr.reshape((-1,) + arr.shape[-2:])
    if pages.shape[0] == 0 or 0 in pages.shape[1:]:
        # a header pointing at an IFD that was never written is a corrupt
        # file every reader rejects — fail at write time instead
        raise ValueError(f"cannot write a TIFF with a zero-length axis: {arr.shape}")
    # the reference always normalizes the suffix (sed/io/tiff.py:94)
    _write_baseline_tiff(Path(faddr).with_suffix(".tiff"), pages)


def load_tiff(faddr: str | Path) -> np.ndarray:
    """Read back a float32 stack written by :func:`to_tiff` (pages, H, W);
    single page → (H, W)."""
    pages = _read_baseline_tiff(Path(faddr))
    return pages[0] if pages.shape[0] == 1 else pages


# ---------------------------------------------------------------------------
# minimal baseline-TIFF codec (little endian, one strip per page, float32)
# ---------------------------------------------------------------------------
_TAG_WIDTH, _TAG_LENGTH, _TAG_BPS, _TAG_COMPRESSION = 256, 257, 258, 259
_TAG_PHOTOMETRIC, _TAG_STRIP_OFFSETS, _TAG_SPP = 262, 273, 277
_TAG_ROWS_PER_STRIP, _TAG_STRIP_BYTES, _TAG_SAMPLE_FORMAT = 278, 279, 339
_TYPE_SHORT, _TYPE_LONG = 3, 4


def _write_baseline_tiff(path: Path, pages: np.ndarray) -> None:
    n, h, w = pages.shape
    page_bytes = h * w * 4
    ifd_size = 2 + 10 * 12 + 4
    with open(path, "wb") as fh:
        fh.write(b"II*\x00")
        fh.write(struct.pack("<I", 8))  # first IFD offset
        ifd_base = 8
        data_base = ifd_base + n * ifd_size
        for p in range(n):
            entries = [
                (_TAG_WIDTH, _TYPE_LONG, 1, w),
                (_TAG_LENGTH, _TYPE_LONG, 1, h),
                (_TAG_BPS, _TYPE_SHORT, 1, 32),
                (_TAG_COMPRESSION, _TYPE_SHORT, 1, 1),
                (_TAG_PHOTOMETRIC, _TYPE_SHORT, 1, 1),
                (_TAG_STRIP_OFFSETS, _TYPE_LONG, 1, data_base + p * page_bytes),
                (_TAG_SPP, _TYPE_SHORT, 1, 1),
                (_TAG_ROWS_PER_STRIP, _TYPE_LONG, 1, h),
                (_TAG_STRIP_BYTES, _TYPE_LONG, 1, page_bytes),
                (_TAG_SAMPLE_FORMAT, _TYPE_SHORT, 1, 3),  # IEEE float
            ]
            fh.write(struct.pack("<H", len(entries)))
            for tag, typ, cnt, val in entries:
                fh.write(struct.pack("<HHII", tag, typ, cnt, val))
            next_ifd = ifd_base + (p + 1) * ifd_size if p + 1 < n else 0
            fh.write(struct.pack("<I", next_ifd))
        fh.write(np.ascontiguousarray(pages, dtype="<f4").tobytes())


def _read_baseline_tiff(path: Path) -> np.ndarray:
    buf = Path(path).read_bytes()
    if buf[:4] != b"II*\x00":
        raise ValueError("not a little-endian TIFF")
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    pages = []
    seen_ifds: set[int] = set()
    while ifd_off:
        # a corrupt next-IFD pointer aiming back at an earlier offset would
        # otherwise loop forever appending pages — fail like the HDF5
        # reader does on corruption, naming the defect
        if ifd_off in seen_ifds:
            raise ValueError(
                f"corrupt TIFF: IFD chain cycles back to offset {ifd_off}",
            )
        seen_ifds.add(ifd_off)
        (n_ent,) = struct.unpack_from("<H", buf, ifd_off)
        tags = {}
        for i in range(n_ent):
            tag, typ, cnt, val = struct.unpack_from("<HHII", buf, ifd_off + 2 + 12 * i)
            if typ == _TYPE_SHORT and cnt == 1:
                val &= 0xFFFF
            tags[tag] = val
        w, h = tags[_TAG_WIDTH], tags[_TAG_LENGTH]
        off, nbytes = tags[_TAG_STRIP_OFFSETS], tags[_TAG_STRIP_BYTES]
        # BitsPerSample/SamplesPerPixel must be validated too: slicing a
        # float64 or RGB strip as single-sample f4 silently yields garbage
        if (
            tags.get(_TAG_COMPRESSION, 1) != 1
            or tags.get(_TAG_SAMPLE_FORMAT, 1) != 3
            or tags.get(_TAG_BPS, 32) != 32
            or tags.get(_TAG_SPP, 1) != 1
        ):
            raise ValueError(
                "only uncompressed single-sample float32 TIFFs are supported",
            )
        page = np.frombuffer(buf, dtype="<f4", count=h * w, offset=off).reshape(h, w)
        pages.append(page)
        (ifd_off,) = struct.unpack_from("<I", buf, ifd_off + 2 + 12 * n_ent)
    return np.stack(pages)
