"""Binning argument normalization and centers<->edges conversion.

Driver-side (plan-time) helpers matching the reference's semantics:
- simplify_binning_arguments: sed/binning/utils.py:18-138
- bin_centers_to_bin_edges / bin_edges_to_bin_centers: sed/binning/utils.py:141-177
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np


def simplify_binning_arguments(
    bins,
    axes: Sequence[str] | None = None,
    ranges: Sequence[tuple[float, float]] | None = None,
) -> tuple[list, list[str], list[tuple[float, float]] | None]:
    """Normalize the flexible bins/axes/ranges input to canonical form.

    Accepts (matching sed/binning/utils.py:18-138):
      - bins as a single int (requires axes + ranges)
      - a sequence of ints (requires ranges)
      - a sequence of np.ndarray bin CENTERS
      - a sequence of (start, end, n_bins) tuples
      - a dict {axis: any of the above per-axis forms}
    Returns (bins, axes, ranges) where bins is list[int] | list[np.ndarray].
    """
    if isinstance(bins, dict):
        axes = list(bins.keys())
        bins = list(bins.values())

    if isinstance(bins, (int, np.integer)):
        if axes is None:
            raise AttributeError("Must define on which axes to bin")
        bins = [int(bins)] * len(axes)

    if not isinstance(bins, Sequence):
        raise TypeError(f"Cannot interpret bins of type {type(bins)}")
    if axes is None:
        raise AttributeError("Must define on which axes to bin")
    if not isinstance(axes, Sequence):
        raise TypeError(f"Cannot interpret axes of type {type(axes)}")
    if not all(isinstance(axis, str) for axis in axes):
        raise TypeError("Axes has to contain only strings!")
    if len(bins) == 0:
        # the all(...) form checks below are vacuously true on [], which
        # would surface as a bare IndexError at bins[0]
        raise ValueError("bins must name at least one axis to bin")

    if all(isinstance(x, tuple) for x in bins):
        # validate EVERY tuple: a mixed-length list would pass a
        # first-element check and die later with a bare IndexError
        if any(len(t) != 3 for t in bins):
            raise ValueError("Tuples as bins need to have format (start, end, num_bins).")
        ranges = [(t[0], t[1]) for t in bins]
        bins = [t[2] for t in bins]

    if all(isinstance(x, (int, np.integer)) for x in bins):
        bins = [int(b) for b in bins]
        if ranges is None:
            raise AttributeError("Must provide a range if bins is an integer or list of integers")
        if not isinstance(ranges, Sequence):
            raise AttributeError(f"Ranges must be a sequence, not {type(ranges)}.")
    elif all(isinstance(x, np.ndarray) for x in bins):
        bins = [np.asarray(b) for b in bins]
    else:
        raise TypeError(f"Could not interpret bins of type {type(bins[0])}")

    if len(axes) != len(bins):
        raise AttributeError("axes and bins must have the same number of elements")

    return bins, list(axes), list(ranges) if ranges else None


def bin_edges_to_bin_centers(bin_edges: np.ndarray) -> np.ndarray:
    """Midpoints of consecutive edges (sed/binning/utils.py:141-155)."""
    bin_edges = np.asarray(bin_edges, dtype=float)
    return (bin_edges[1:] + bin_edges[:-1]) / 2


def bin_centers_to_bin_edges(bin_centers: np.ndarray) -> np.ndarray:
    """Edges from centers: interior midpoints + extrapolated end edges
    (sed/binning/utils.py:158-177)."""
    c = np.asarray(bin_centers, dtype=float)
    if c.size < 2:
        raise ValueError("need at least two bin centers to derive edges")
    edges = (c[1:] + c[:-1]) / 2
    edges = np.insert(edges, 0, c[0] - (c[1] - c[0]) / 2)
    edges = np.append(edges, c[-1] + (c[-1] - c[-2]) / 2)
    return edges
