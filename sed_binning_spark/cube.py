"""Dense labeled hypercube — the binning result type.

The reference materializes binned histograms as ``xarray.DataArray`` (float32
data + bin-center coordinate axes + units/metadata attrs; see
sed/binning/binning.py:430-437 in the reference). xarray is not a required
dependency here, so ``Cube`` provides the small slice of the DataArray
contract the engine and its tests need (dims/coords/attrs, aligned division
for acquisition-time normalization, equality helpers), plus a lossless
``to_xarray()`` when xarray is importable.

Cubes are small by construction (the product of bin counts, <= ~1e8 cells),
so they live on the driver; all heavy lifting happens in Spark before a Cube
exists.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import numpy as np


class Cube:
    """N-dimensional labeled array: data + named axes with bin-center coords.

    Mirrors the xarray.DataArray surface used by the reference processor
    (sed/core/processor.py:2250-2295): ``.data``, ``.dims``, ``.coords``,
    ``.attrs``, per-axis unit attrs, and element-wise division aligned on
    shared axis names (for normalization, sed/core/processor.py:2260-2293).
    """

    def __init__(
        self,
        data: np.ndarray,
        coords: Mapping[str, np.ndarray],
        dims: Sequence[str] | None = None,
        attrs: dict | None = None,
        name: str | None = None,
    ) -> None:
        self.data = np.asarray(data)
        if dims is None:
            dims = list(coords.keys())
        self.dims: tuple[str, ...] = tuple(dims)
        self.coords: dict[str, np.ndarray] = {k: np.asarray(v) for k, v in coords.items()}
        self.attrs: dict = dict(attrs or {})
        self.name = name
        if self.data.ndim != len(self.dims):
            raise ValueError(
                f"data has {self.data.ndim} dims but {len(self.dims)} axis names given",
            )
        for i, ax in enumerate(self.dims):
            if ax not in self.coords:
                raise ValueError(f"axis {ax!r} has no coords entry")
            n = self.coords[ax].shape[0]
            if self.data.shape[i] != n:
                raise ValueError(
                    f"axis {ax!r}: data extent {self.data.shape[i]} != {n} coords",
                )

    # -- xarray-like conveniences -------------------------------------------------
    @property
    def shape(self) -> tuple[int, ...]:
        return self.data.shape

    @property
    def ndim(self) -> int:
        return self.data.ndim

    @property
    def values(self) -> np.ndarray:
        return self.data

    def axis_index(self, axis: str) -> int:
        return self.dims.index(axis)

    def sel_index(self, **indexers: int) -> "Cube":
        """Integer-position selection along named axes (subset of .isel)."""
        slicer = [slice(None)] * self.ndim
        for ax, i in indexers.items():
            slicer[self.axis_index(ax)] = i
        new_dims = [d for d in self.dims if d not in indexers]
        new_coords = {d: self.coords[d] for d in new_dims}
        return Cube(self.data[tuple(slicer)], new_coords, new_dims, self.attrs, self.name)

    def __truediv__(self, other: "Cube | np.ndarray | float") -> "Cube":
        """Element-wise division aligned on axis names (J6 semantics:
        sed/core/processor.py:2270-2271 divides the cube by a 1-D histogram
        sharing one axis; xarray broadcasts by dimension name)."""
        if isinstance(other, Cube):
            # Broadcast other over self by matching axis names: first
            # TRANSPOSE other's data into self's axis order (a reshape on a
            # differently-ordered buffer would silently scramble values),
            # then insert singleton axes for dims other lacks.
            for ax in other.dims:
                if ax not in self.dims:
                    raise ValueError(f"cannot align: axis {ax!r} not in {self.dims}")
                # name match is not enough: a histogram built on different
                # bin centers for the same axis name would divide
                # positionally, pairing mismatched bins into silently wrong
                # ratios (xarray would align-by-coordinate here)
                if other.coords[ax].shape != self.coords[ax].shape or not np.allclose(
                    other.coords[ax], self.coords[ax], equal_nan=True,
                ):
                    raise ValueError(
                        f"cannot align: axis {ax!r} has different bin "
                        "centers in the two cubes",
                    )
            order = sorted(range(other.ndim), key=lambda i: self.axis_index(other.dims[i]))
            other_arr = other.data.transpose(order)
            shape = [
                other.coords[ax].shape[0] if ax in other.dims else 1 for ax in self.dims
            ]
            other_arr = other_arr.reshape(shape)
            return Cube(self.data / other_arr, self.coords, self.dims, self.attrs, self.name)
        return Cube(self.data / other, self.coords, self.dims, self.attrs, self.name)

    def astype(self, dtype) -> "Cube":
        return Cube(self.data.astype(dtype), self.coords, self.dims, self.attrs, self.name)

    def sum(self, axis: str | None = None):
        if axis is None:
            return float(self.data.sum())
        i = self.axis_index(axis)
        new_dims = [d for d in self.dims if d != axis]
        return Cube(
            self.data.sum(axis=i),
            {d: self.coords[d] for d in new_dims},
            new_dims,
            self.attrs,
            self.name,
        )

    def equals(self, other: "Cube", rtol: float = 0.0, atol: float = 0.0) -> bool:
        # shape check first: allclose BROADCASTS, so without it a 16-bin vs
        # 12-bin comparison raises (or a size-1 axis compares wrongly True)
        if self.dims != other.dims or self.data.shape != other.data.shape:
            return False
        for ax in self.dims:
            if self.coords[ax].shape != other.coords[ax].shape:
                return False
            if not np.allclose(self.coords[ax], other.coords[ax], rtol=rtol, atol=atol):
                return False
        return np.allclose(self.data, other.data, rtol=rtol, atol=atol)

    def to_xarray(self):
        """Return the equivalent xarray.DataArray (requires xarray)."""
        import xarray as xr  # gated: optional dependency

        return xr.DataArray(
            data=self.data,
            coords=self.coords,
            dims=self.dims,
            attrs=self.attrs,
            name=self.name,
        )

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        axes = ", ".join(f"{d}: {self.coords[d].shape[0]}" for d in self.dims)
        return f"<Cube ({axes}) dtype={self.data.dtype}>"
