"""Uniform loader read-mode dispatch — the reference's BaseLoader contract
(sed/loader/base/loader.py:60-135): every loader accepts ``files`` (one path
or a list), ``folders`` (one or many, globbed by extension), or ``runs``
(facility run ids resolved against ``folders`` / configured raw-data dirs),
with precedence runs > folders > files, and records the resolved list on
``self.files``.

Path resolution is pure driver-side bookkeeping; what happens WITH the
resolved paths stays in each loader (spark.read for generic, the gated
HDF5-extraction + injected-data assembly for the instrument loaders).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import SparkSession

from sed_binning_spark.loaders.utils import gather_files


class BaseLoader:
    """Shared read-mode normalization for every loader.

    Subclasses set ``supported_file_types`` (first entry = default ftype)
    and override :meth:`get_files_from_run_id` where the facility has a
    run-id naming scheme.
    """

    name = "base"
    supported_file_types: tuple[str, ...] = ()

    def __init__(self, spark: SparkSession, config: dict | None = None) -> None:
        self.spark = spark
        self.config = config or {}
        self.files: list[str] = []
        self.runs: list = []
        self.metadata: dict = {}

    # -- S2/S3: read-mode -> ordered path list ------------------------------
    def resolve_paths(
        self,
        files: str | Sequence[str] | None = None,
        folders: str | Sequence[str] | None = None,
        runs: str | int | Sequence | None = None,
        ftype: str | None = None,
        metadata: dict | None = None,
        **kwds,
    ) -> list[str]:
        """Normalize the six reference read modes (one_file / files /
        one_folder / folders / one_run / runs) into a naturally-ordered
        absolute path list; precedence runs > folders > files
        (base/loader.py:86-124). ``kwds`` pass through to
        :func:`gather_files` (f_start/f_end/f_step slicing) or the run
        resolver.
        """
        if ftype is None:
            ftype = self.supported_file_types[0] if self.supported_file_types else "h5"
        if ftype not in self.supported_file_types:
            raise ValueError(
                f"Unsupported file type {ftype!r}; choose from {self.supported_file_types}",
            )
        self.metadata = dict(metadata or {})

        if runs is not None:
            if isinstance(runs, (str, int)):
                runs = [runs]
            self.runs = list(runs)
            search = folders if folders is not None else self._run_search_folders()
            # the slice kwds only apply to folders=/files= reads; the run
            # resolvers accept **kwds and would silently drop them — say so
            # (a user passing f_end=2 expects 2 files, not all of the run)
            slice_like = [k for k in ("f_start", "f_end", "f_step") if k in kwds]
            if slice_like:
                import warnings

                warnings.warn(
                    f"runs= read ignores {slice_like}: run resolution "
                    f"selects every file of the run by id, not by slice",
                    stacklevel=3,
                )
            paths: list[str] = []
            for run in runs:
                paths.extend(
                    self.get_files_from_run_id(run, search, extension=ftype, **kwds),
                )
        elif folders is not None:
            if isinstance(folders, str):
                folders = [folders]
            # forward only the keys gather_files understands: extra kwds
            # meant for other read modes (e.g. flash's daq=) must not crash
            # the folder glob with a TypeError — but say what was ignored,
            # or a misspelled f_strt= would silently read every file
            gf_keys = ("f_start", "f_end", "f_step", "file_sorting")
            gf_kwds = {k: kwds[k] for k in gf_keys if k in kwds}
            ignored = sorted(set(kwds) - set(gf_keys))
            if ignored:
                import warnings

                warnings.warn(
                    f"folders= read ignores keyword(s) {ignored} "
                    f"(gather_files accepts {list(gf_keys)})",
                    stacklevel=3,
                )
            paths = []
            for folder in folders:
                paths.extend(gather_files(os.path.realpath(folder), ftype, **gf_kwds))
        elif files is not None:
            if isinstance(files, str):
                files = [files]
            paths = list(files)
            # same slice contract as gather_files (applies only when both
            # bounds are given) — silently ignoring the kwds here would
            # make files= behave differently from folders= for no reason
            if kwds.get("f_start") is not None and kwds.get("f_end") is not None:
                paths = paths[
                    slice(kwds.get("f_start"), kwds.get("f_end"), kwds.get("f_step"))
                ]
        else:
            raise ValueError("Either folder, file paths, or runs should be provided!")

        paths = [os.path.realpath(p) for p in paths]
        if not paths:
            raise FileNotFoundError("No valid files or runs found!")
        self.files = paths
        return paths

    def _run_search_folders(self) -> list[str]:
        """Run-id search roots from config (core.paths.data_raw_dir)."""
        raw = self.config.get("core", {}).get("paths", {}).get("data_raw_dir")
        if raw is None:
            raise ValueError(
                "runs= requires folders= or a config core.paths.data_raw_dir",
            )
        return [raw] if isinstance(raw, str) else list(raw)

    def get_files_from_run_id(self, run_id, folders, extension="h5", **kwds) -> list[str]:
        raise NotImplementedError(
            f"loader {self.name!r} has no run-id naming scheme",
        )

    def read_dataframe(self, **kwds):
        raise NotImplementedError
