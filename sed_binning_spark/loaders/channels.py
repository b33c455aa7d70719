"""Shared HDF5 channel-spec extraction for the instrument loaders.

flash and sxp describe their raw-file layout with the same channel-spec
dict shape (``format`` + either ``group_name`` or
``index_key``/``dataset_key``; reference config schema,
sed/config/flash_example_config.yaml and sxp config). The reading and
frame-assembly mechanics are identical across loaders and across the
driver-side and executor-side (mapInPandas) extraction paths — only the
specs differ — so they live here once:

- :func:`channel_h5_keys` resolves a spec to (index dataset, value dataset)
- :func:`read_channel` reads one channel's (trainId index, values)
- :func:`aligned_array_pdf` assembles index-aligned array channels into one
  pandas frame, enforcing that every channel shares the SAME train index
  (positional attach would silently mis-attribute hits)
- :func:`first_reading_train_pdf` outer-merges per-train scalar series,
  keeping the first reading per train (ids may repeat, e.g. encoder
  readbacks)
"""

from __future__ import annotations

import numpy as np


def channel_h5_keys(name: str, ch: dict) -> tuple[str, str]:
    """(index_key, dataset_key) for one channel spec. ``group_name`` form:
    datasets are ``<group>/index`` + ``<group>/value`` (``/time`` for the
    timeStamp channel — reference flash/loader.py:398-410); otherwise the
    spec names both datasets explicitly."""
    if "group_name" in ch:
        grp = ch["group_name"].rstrip("/")
        ds = "time" if name == "timeStamp" else "value"
        return f"{grp}/index", f"{grp}/{ds}"
    return ch["index_key"], ch["dataset_key"]


def read_channel(f, name: str, ch: dict) -> tuple[np.ndarray, np.ndarray]:
    """One channel from an open :class:`~sed_binning_spark.io.hdf5_read.H5File`:
    (int64 train index, float64 values, detector ``slice`` applied)."""
    idx_key, ds_key = channel_h5_keys(name, ch)
    idx = f.read(idx_key).astype(np.int64)
    val = f.read(ds_key)
    sl = ch.get("slice")
    if sl is not None and val.ndim >= 2:
        val = val[:, sl, ...]
    return idx, np.asarray(val, dtype=np.float64)


def aligned_array_pdf(chans: dict[str, tuple[np.ndarray, np.ndarray]], kind: str,
                      context: str = ""):
    """trainId + one array column per channel, all sharing one train index.

    Channels whose index differs from the first raise: attaching by
    position would assign values to the wrong trains.
    """
    import pandas as pd

    idx0 = next(iter(chans.values()))[0]
    pdf = pd.DataFrame({"trainId": idx0})
    where = f" in {context}" if context else ""
    for name, (idx, val) in chans.items():
        if not np.array_equal(idx, idx0):
            raise ValueError(
                f"{kind} channel {name}{where} has a different train index",
            )
        pdf[name] = list(val)
    # a repeated train id in the index dataset is a repeated READBACK of
    # the same train (the case first_reading_train_pdf handles for scalar
    # channels): keep the first reading, or the outer join on trainId
    # downstream would silently multiply every event row of that train
    return pdf[~pdf["trainId"].duplicated(keep="first")].reset_index(drop=True)


def array_frame_schema(names) -> str:
    """Spark schema string for an :func:`aligned_array_pdf` result."""
    arr_cols = ", ".join(f"`{n}` array<double>" for n in names)
    return f"trainId long, {arr_cols}"


def first_reading_train_pdf(chans: dict[str, tuple[np.ndarray, np.ndarray]]):
    """Per-train scalar channels outer-merged on trainId, first reading per
    (possibly repeated) train id, sorted by trainId."""
    import pandas as pd

    merged: pd.DataFrame | None = None
    for name, (idx, val) in chans.items():
        _, first = np.unique(idx, return_index=True)
        part = pd.DataFrame({"trainId": idx[first], name: val[first]})
        merged = part if merged is None else merged.merge(
            part, on="trainId", how="outer",
        )
    return merged.sort_values("trainId")


def train_frame_schema(columns) -> str:
    """Spark schema string for a :func:`first_reading_train_pdf` result."""
    cols = ", ".join(f"`{c}` double" for c in columns if c != "trainId")
    return f"trainId long, {cols}"


def union_frame_maps(per_file, into: dict | None = None) -> dict:
    """Merge per-file ``{kind: DataFrame}`` maps into one map by
    ``unionByName`` per kind (shared by the flash and sxp read paths)."""
    out = dict(into or {})
    for frames in per_file:
        for key, frame in frames.items():
            out[key] = frame if key not in out else out[key].unionByName(frame)
    return out
