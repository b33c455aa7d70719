"""SedProcessor — the user-facing orchestration layer (reference:
sed/core/processor.py:117-2551).

Holds the lazy event DataFrame + the timed DataFrame + config + provenance
metadata, and exposes the reference's method-chain API: load → transforms
(each appending Catalyst expression nodes, applied SYMMETRICALLY to the
timed dataframe when its columns exist, processor.py:766-831) → compute()
(the binning aggregation) → save().

Nothing executes until compute()/head(); the "IR" is the Catalyst logical
plan exactly where the reference grows a Dask task graph.
"""

from __future__ import annotations

from collections.abc import Sequence
from pathlib import Path

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from sed_binning_spark.binning.binning import (
    bin_dataframe,
    normalization_histogram_from_timed_dataframe,
    normalization_histogram_from_timestamps,
)
from sed_binning_spark.config import parse_config, resolve_alias
from sed_binning_spark.cube import Cube
from sed_binning_spark.metadata import MetaHandler


class SedProcessor:
    """Processor binding (dataframe, timed_dataframe, config, metadata).

    Args:
        spark: SparkSession (created via get_spark() if omitted).
        config: config dict or YAML path (merged per the reference's
            precedence, sed/core/config.py:19-141).
        dataframe / files / folder / runs: initial load target (any one).
        loader: loader name from config["core"]["loader"] — any of the
            registered loaders (generic/mpes/flash/sxp).
    """

    def __init__(
        self,
        spark: SparkSession | None = None,
        config: dict | str | None = None,
        dataframe: DataFrame | None = None,
        files: Sequence[str] | None = None,
        folder: str | None = None,
        runs=None,
        **kwds,
    ) -> None:
        if spark is None:
            from sed_binning_spark.session import get_spark

            self.spark = get_spark()
        else:
            self.spark = spark
        self._config = parse_config(config)
        self._dataframe: DataFrame | None = None
        self._timed_dataframe: DataFrame | None = None
        self._binned: Cube | None = None
        self._normalization_histogram: Cube | None = None
        self._attributes = MetaHandler()
        self.loader = None
        if dataframe is not None or files is not None or folder is not None or runs is not None:
            self.load(dataframe=dataframe, files=files, folder=folder, runs=runs, **kwds)

    # ------------------------------------------------------------------ state
    @property
    def config(self) -> dict:
        return self._config

    @property
    def dataframe(self) -> DataFrame | None:
        return self._dataframe

    @property
    def timed_dataframe(self) -> DataFrame | None:
        return self._timed_dataframe

    @property
    def binned(self) -> Cube | None:
        return self._binned

    @property
    def attributes(self) -> MetaHandler:
        return self._attributes

    def _col(self, role: str) -> str:
        """Concrete column name for a config role (x_column, tof_column, ...)."""
        return self._config["dataframe"][role]

    def _require_df(self) -> DataFrame:
        if self._dataframe is None:
            raise ValueError("No dataframe loaded! Load data with load() first.")
        return self._dataframe

    def _apply_symmetric(self, fn, needed_columns: Sequence[str]) -> None:
        """Apply a df→df transform to the event df and, when every needed
        column exists there, to the timed df (processor.py:766-831)."""
        self._dataframe = fn(self._require_df())
        if self._timed_dataframe is not None and all(
            c in self._timed_dataframe.columns for c in needed_columns
        ):
            self._timed_dataframe = fn(self._timed_dataframe)

    # ------------------------------------------------------------------- load
    def load(
        self,
        dataframe: DataFrame | None = None,
        files: Sequence[str] | None = None,
        folder: str | None = None,
        runs=None,
        timed_dataframe: DataFrame | None = None,
        metadata: dict | None = None,
        **kwds,
    ) -> "SedProcessor":
        """Load events (SedProcessor.load, processor.py:366-447): an
        existing DataFrame, or files/folder/runs through the loader named by
        config["core"]["loader"] (the reference's loader_interface
        dispatch) — generic parquet/csv/json or raw instrument HDF5 via the
        built-in pure-Python reader."""
        if dataframe is not None:
            self._dataframe = dataframe
            self._timed_dataframe = timed_dataframe
        elif files is not None or folder is not None or runs is not None:
            from sed_binning_spark.loaders.interface import get_loader

            loader_name = self._config.get("core", {}).get("loader", "generic")
            self.loader = get_loader(loader_name, self.spark, self._config)
            df, timed, meta = self.loader.read_dataframe(
                files=files, folders=folder, runs=runs, **kwds,
            )
            self._dataframe = df
            self._timed_dataframe = timed
            metadata = {**(meta or {}), **(metadata or {})}
        else:
            raise ValueError(
                "Either dataframe, files, folder, or runs needs to be provided!",
            )
        if metadata:
            self._attributes.add(metadata, "loader", duplicate_policy="merge")
        return self

    # ------------------------------------------------------ filters / columns
    def filter_column(
        self,
        column: str,
        min_value: float = -np.inf,
        max_value: float = np.inf,
    ) -> "SedProcessor":
        """P2 (processor.py:449-487): open-interval filter on BOTH frames."""
        from sed_binning_spark.core.dfops import apply_filter

        column = resolve_alias(column, self._config)
        if column != "index" and column not in self._require_df().columns:
            raise KeyError(f"Column {column} not found in dataframe.")
        if column == "index":
            # event-row bounds are meaningless on the timed (fixed-rate)
            # frame — filter the event frame only, like the reference
            self._dataframe = apply_filter(
                self._require_df(), column, min_value, max_value,
            )
        else:
            self._apply_symmetric(
                lambda df: apply_filter(df, column, min_value, max_value),
                [column],
            )
        self._attributes.add(
            {"filter": {"column": column, "min_value": min_value, "max_value": max_value}},
            "filter", duplicate_policy="append",
        )
        return self

    def add_jitter(
        self,
        cols: Sequence[str] | None = None,
        amps: float | Sequence[float] | None = None,
        seed: int | None = None,
        method: str = "rand",
    ) -> "SedProcessor":
        """M1 (processor.py:1956-2005): jitter the configured columns in
        place (event df only — the timed frame is not jittered in the
        reference either). ``method="hash"`` selects the counter-based
        layout-independent draw (see core.dfops.apply_jitter)."""
        from sed_binning_spark.core.dfops import apply_jitter

        if cols is None:
            cols = [resolve_alias(c, self._config)
                    for c in self._config["dataframe"].get("jitter_cols", [])]
        if amps is None:
            amps = self._config["dataframe"].get("jitter_amps", 0.5)
        df = self._require_df()
        # drop missing columns and their amplitudes TOGETHER — filtering
        # cols alone would silently re-pair the remaining columns with the
        # wrong entries of a per-column amps sequence
        if isinstance(amps, (int, float)):
            kept = [(c, float(amps)) for c in cols if c in df.columns]
        else:
            amps = list(amps)
            if len(amps) != len(cols):
                raise ValueError(
                    f"jitter amps has {len(amps)} entries for {len(cols)} columns",
                )
            kept = [(c, float(a)) for c, a in zip(cols, amps) if c in df.columns]
        if not kept:
            raise ValueError("No valid jitter columns found in dataframe!")
        cols = [c for c, _ in kept]
        amps = [a for _, a in kept]
        self._dataframe = apply_jitter(
            df, cols=cols, cols_jittered=cols, amps=amps, seed=seed,
            method=method,
        )
        self._attributes.add({"jitter": {"cols": cols, "amps": amps}},
                             "jitter", duplicate_policy="append")
        return self

    # ------------------------------------------------------------- momentum
    def apply_momentum_correction(
        self,
        dfield: np.ndarray,
        **kwds,
    ) -> "SedProcessor":
        """M9 (processor.py:766-831): inverse-dfield distortion correction →
        corrected X/Y columns on both frames."""
        from sed_binning_spark.calibration.momentum import apply_dfield

        x, y = self._col("x_column"), self._col("y_column")
        cx, cy = self._col("corrected_x_column"), self._col("corrected_y_column")
        self._apply_symmetric(
            lambda df: apply_dfield(
                df, dfield, x_column=x, y_column=y,
                new_x_column=cx, new_y_column=cy, **kwds,
            ),
            [x, y],
        )
        self._attributes.add({"correction": {"applied": True}},
                             "momentum_correction", duplicate_policy="merge")
        return self

    def apply_momentum_calibration(self, calibration: dict) -> "SedProcessor":
        """M10 (processor.py:1180-1262): linear detector→k map."""
        from sed_binning_spark.calibration.momentum import append_k_axis

        x, y = self._col("x_column"), self._col("y_column")
        meta_box = {}

        def _fn(df):
            out, meta = append_k_axis(
                df, calibration, x_column=x, y_column=y,
                new_x_column=self._col("kx_column"),
                new_y_column=self._col("ky_column"),
                corrected_x_column=self._col("corrected_x_column"),
                corrected_y_column=self._col("corrected_y_column"),
            )
            meta_box.update(meta)
            return out

        self._apply_symmetric(_fn, [x, y])
        self._attributes.add(meta_box, "momentum_calibration", duplicate_policy="merge")
        return self

    # --------------------------------------------------------------- energy
    def apply_energy_correction(self, correction: dict) -> "SedProcessor":
        """M6 (processor.py:1290-1380): t → corrected TOF column."""
        from sed_binning_spark.calibration.energy import apply_energy_correction

        tof = self._col("tof_column")
        new_tof = self._col("corrected_tof_column")
        x, y = self._col("x_column"), self._col("y_column")
        meta_box = {}

        def _fn(df):
            out, meta = apply_energy_correction(
                df, correction, tof_column=tof, new_tof_column=new_tof,
                x_column=x, y_column=y,
            )
            meta_box.update(meta)
            return out

        self._apply_symmetric(_fn, [tof, x, y])
        self._attributes.add(meta_box, "energy_correction", duplicate_policy="merge")
        return self

    def append_energy_axis(self, calibration: dict, **kwds) -> "SedProcessor":
        """M3/M4 (processor.py:1585-1661): TOF → energy. Uses the corrected
        TOF column when present (energy.py:853-871)."""
        from sed_binning_spark.calibration.energy import append_energy_axis

        tof = self._col("corrected_tof_column")
        if tof not in self._require_df().columns:
            tof = self._col("tof_column")
        meta_box = {}

        def _fn(df):
            out, meta = append_energy_axis(
                df, calibration, tof_column=tof,
                energy_column=self._col("energy_column"), **kwds,
            )
            meta_box.update(meta)
            return out

        self._apply_symmetric(_fn, [tof])
        self._attributes.add(meta_box, "energy_calibration", duplicate_policy="merge")
        return self

    def append_tof_ns_axis(self, **kwds) -> "SedProcessor":
        """M5 (processor.py:1663-1698)."""
        from sed_binning_spark.calibration.energy import append_tof_ns_axis

        tof = self._col("tof_column")
        meta_box = {}

        def _fn(df):
            out, meta = append_tof_ns_axis(df, tof_column=tof, **kwds)
            meta_box.update(meta)
            return out

        self._apply_symmetric(_fn, [tof])
        self._attributes.add(meta_box, "tof_ns", duplicate_policy="merge")
        return self

    def align_dld_sectors(self, sector_delays: Sequence[float], **kwds) -> "SedProcessor":
        """M7 (processor.py:1700-1737) — event df only (sector ids are
        per-electron)."""
        from sed_binning_spark.calibration.energy import align_dld_sectors

        df, meta = align_dld_sectors(self._require_df(), sector_delays, **kwds)
        self._dataframe = df
        self._attributes.add(meta, "sector_alignment", duplicate_policy="merge")
        return self

    def add_energy_offset(self, **kwds) -> "SedProcessor":
        """M12 energy wrapper (processor.py:1440-1583)."""
        from sed_binning_spark.calibration.energy import add_offsets

        energy = self._col("energy_column")
        if energy not in self._require_df().columns:
            raise ValueError(
                f"Energy column {energy} not found! Run append_energy_axis() first.",
            )
        meta_box = {}

        def _fn(df):
            out, meta = add_offsets(df, energy_column=energy, **kwds)
            meta_box.update(meta)
            return out

        self._apply_symmetric(_fn, [energy])
        self._attributes.add(meta_box, "energy_offset", duplicate_policy="merge")
        return self

    # ---------------------------------------------------------------- delay
    def calibrate_delay_axis(self, calibration: dict, **kwds) -> "SedProcessor":
        """M11 (processor.py:1739-1796)."""
        from sed_binning_spark.calibration.delay import append_delay_axis

        adc = self._col("adc_column")
        if adc not in self._require_df().columns:
            raise ValueError(f"ADC column {adc} not found in dataframe!")
        meta_box = {}

        def _fn(df):
            out, meta = append_delay_axis(
                df, calibration, adc_column=adc,
                delay_column=self._col("delay_column"), **kwds,
            )
            meta_box.update(meta)
            return out

        self._apply_symmetric(_fn, [adc])
        self._attributes.add(meta_box, "delay_calibration", duplicate_policy="merge")
        return self

    def add_delay_offset(self, **kwds) -> "SedProcessor":
        """M12 delay wrapper (processor.py:1798-1926)."""
        from sed_binning_spark.calibration.delay import add_offsets

        delay = self._col("delay_column")
        if delay not in self._require_df().columns:
            raise ValueError(f"Delay column {delay} not found! Run calibrate_delay_axis() first.")
        meta_box = {}

        def _fn(df):
            out, meta = add_offsets(df, delay_column=delay, **kwds)
            meta_box.update(meta)
            return out

        self._apply_symmetric(_fn, [delay])
        self._attributes.add(meta_box, "delay_offset", duplicate_policy="merge")
        return self

    # ------------------------------------------------------- misc transforms
    def add_time_stamped_data(
        self,
        time_stamps: np.ndarray,
        data: np.ndarray,
        dest_column: str,
        **kwds,
    ) -> "SedProcessor":
        """M13 (processor.py:2007-2074)."""
        from sed_binning_spark.core.dfops import add_time_stamped_data

        ts_col = kwds.pop("time_stamp_column", self._col("time_stamp_alias"))
        self._apply_symmetric(
            lambda df: add_time_stamped_data(
                df, time_stamps, data, dest_column=dest_column,
                time_stamp_column=ts_col, **kwds,
            ),
            [ts_col],
        )
        self._attributes.add(
            {"time_stamped_data": {"dest_column": dest_column}},
            "time_stamped_data", duplicate_policy="append",
        )
        return self

    # ---------------------------------------------------------------- preview
    def head(self, n: int = 5):
        """Driver-side preview (the reference's .head() boundary)."""
        return self._require_df().limit(n).toPandas()

    # ---------------------------------------------------------------- compute
    def compute(
        self,
        bins=100,
        axes: Sequence[str] | None = None,
        ranges: Sequence[tuple[float, float]] | None = None,
        normalize_to_acquisition_time: bool | str = False,
        df_partitions: int | Sequence[int] | None = None,
        **kwds,
    ) -> Cube:
        """The aggregation query (processor.py:2125-2295): resolve @-aliases,
        bin, attach axis units, optionally normalize by acquisition time
        (timed-df histogram when available, else timestamp diffs).

        ``df_partitions`` (P7, processor.py:2210-2216): bin only the first N
        source files (int) or an explicit file list — a non-destructive
        ``file_id`` predicate that parquet partition/row-group pruning turns
        into a metadata-only skip.
        """
        from pyspark.sql import functions as F

        df = self._require_df()
        timed_df = self._timed_dataframe
        if df_partitions is not None:
            file_col = self._config.get("dataframe", {}).get("file_column", "file_id")
            if file_col not in df.columns:
                raise ValueError(
                    f"df_partitions needs a {file_col!r} column in the dataframe",
                )
            if isinstance(df_partitions, int):
                pred = F.col(file_col) < df_partitions
            else:
                pred = F.col(file_col).isin([int(p) for p in df_partitions])
            df = df.filter(pred)
            # normalization must see the SAME file subset, or counts/second
            # is biased low by n_total_files / n_selected
            if timed_df is not None:
                if file_col in timed_df.columns:
                    timed_df = timed_df.filter(pred)
                elif isinstance(normalize_to_acquisition_time, str):
                    # the per-bin histogram would be built from ALL files'
                    # acquisition time — exactly the bias the filter above
                    # prevents on the event side — so refuse loudly
                    raise ValueError(
                        f"df_partitions with per-axis normalization needs a "
                        f"{file_col!r} column in the timed dataframe to "
                        "restrict it to the same file subset",
                    )
        if axes is not None:
            axes = [resolve_alias(ax, self._config) for ax in axes]
        cube = bin_dataframe(df, bins=bins, axes=axes, ranges=ranges, **kwds)

        units = self._config.get("units", {})
        for ax in cube.dims:
            if ax in units:
                cube.attrs[f"{ax}_units"] = units[ax]
        cube.attrs["metadata"] = self._attributes.metadata

        self._binned = cube
        if normalize_to_acquisition_time:
            # string → per-bin histogram division; True → scalar elapsed
            # time (processor.py:2260-2293)
            if isinstance(normalize_to_acquisition_time, str):
                axis = resolve_alias(normalize_to_acquisition_time, self._config)
                hist = self.get_normalization_histogram(
                    axis=axis, bin_centers=cube.coords[axis],
                    timed_dataframe=timed_df, dataframe=df,
                )
                self._normalization_histogram = hist
                normalized = cube / hist
            else:
                acquisition_time = self.get_elapsed_time(dataframe=df)
                if acquisition_time <= 0:
                    raise ValueError(
                        "Total acquisition time is zero — cannot normalize "
                        "to counts/second.",
                    )
                normalized = cube / acquisition_time
            normalized.attrs["units"] = "counts/second"
            normalized.attrs["long_name"] = "photoelectron counts per second"
            normalized.attrs["metadata"] = self._attributes.metadata
            return normalized
        return cube

    def get_normalization_histogram(
        self,
        axis: str,
        use_time_stamps: bool = False,
        bin_centers: np.ndarray | None = None,
        timed_dataframe: DataFrame | None = None,
        dataframe: DataFrame | None = None,
    ) -> Cube:
        """A9-A11 (processor.py:2297-2366): timed-df histogram when
        available (and not forced to timestamps), else timestamp diffs.

        ``timed_dataframe`` / ``dataframe`` override the stored frames —
        ``compute(df_partitions=...)`` passes its file-filtered frames so
        the normalization covers exactly the binned subset.
        """
        axis = resolve_alias(axis, self._config)
        if bin_centers is None:
            if self._binned is None or axis not in self._binned.coords:
                raise ValueError("Need computed binned data or explicit bin_centers!")
            bin_centers = self._binned.coords[axis]
        timed = timed_dataframe if timed_dataframe is not None else self._timed_dataframe
        if not use_time_stamps and timed is not None:
            return normalization_histogram_from_timed_dataframe(
                timed, axis, bin_centers,
                self._config["dataframe"].get("timed_dataframe_unit_time", 0.001),
            )
        events = dataframe if dataframe is not None else self._require_df()
        ts_col = self._col("time_stamp_alias")
        if ts_col not in events.columns:
            raise ValueError(
                f"Time stamp column {ts_col} not found in dataframe! "
                "Cannot compute the normalization histogram.",
            )
        return normalization_histogram_from_timestamps(
            events, axis, bin_centers, ts_col,
        )

    def view_event_histogram(
        self,
        dfpid: int | None = 0,
        bins: int | Sequence[int] | None = None,
        axes: Sequence[str] | None = None,
        ranges: Sequence[tuple[float, float]] | None = None,
    ) -> dict:
        """A12 diagnostics grid data (processor.py:2368-2457): per-axis 1-D
        histograms of one source file. Returns {axis: (centers, counts)};
        plotting is the caller's concern in this headless engine.

        Config ``histogram`` values fill in ONLY the arguments the caller
        left unset (None) — an explicit ``bins=`` or ``ranges=`` is never
        overridden just because ``axes`` came from config."""
        from sed_binning_spark.diagnostics import event_histogram_grid

        hist_conf = self._config.get("histogram", {})
        if axes is None:
            axes = [resolve_alias(ax, self._config) for ax in hist_conf.get("axes", [])]
        if bins is None:
            bins = hist_conf.get("bins", 80)
        if ranges is None:
            ranges = hist_conf.get("ranges")
        if not axes:
            raise ValueError("No axes specified and no histogram axes configured!")
        return event_histogram_grid(
            self._require_df(), axes, bins=bins, ranges=ranges, partition=dfpid,
            file_column=self._config.get("dataframe", {}).get("file_column", "file_id"),
        )

    def get_elapsed_time(self, dataframe: DataFrame | None = None) -> float:
        """Total acquisition time in seconds: the timestamp span of the
        event table (the generic-loader analogue of the reference's
        per-file ms-marker bookkeeping, sed/loader/mpes/loader.py:924-1016)."""
        from pyspark.sql import functions as F

        ts_col = self._col("time_stamp_alias")
        df = dataframe if dataframe is not None else self._require_df()
        if ts_col not in df.columns:
            raise ValueError(
                f"Time stamp column {ts_col} not found; cannot compute elapsed time.",
            )
        row = df.agg(
            (F.max(ts_col) - F.min(ts_col)).alias("span"),
        ).collect()[0]
        return float(row["span"] or 0.0)

    # ------------------------------------------------------------------- save
    # recorded operation metadata -> (config section, subsection): boxes
    # that already carry the subsection key contribute it (plus any sibling
    # keys like flip_delay_axis at section level); flat boxes (the offset
    # metas) are wrapped under the subsection so the file matches the
    # reference's config layout and round-trips
    # -------------------------------------------------- misc facade parity
    def add_attribute(self, attributes: dict, name: str, **kwds) -> None:
        """Add an entry to the metadata tree (add_attribute,
        sed/core/processor.py:274-286)."""
        self._attributes.add(attributes, name, **kwds)

    @property
    def files(self) -> list[str]:
        """Resolved input files of the last loader read (files property,
        sed/core/processor.py:296-303); empty for direct-DataFrame loads."""
        return list(getattr(self.loader, "files", []) or [])

    @property
    def normalization_histogram(self):
        """The cached normalization histogram, if one was computed
        (sed/core/processor.py:328-340)."""
        return self._normalization_histogram

    @property
    def normalized(self):
        """The last computed histogram divided by the cached normalization
        histogram (normalized property, sed/core/processor.py:342-364)."""
        if self._binned is None:
            raise ValueError("No binned data available, run compute() first.")
        if self._normalization_histogram is None:
            raise ValueError(
                "No normalization histogram available, generate it with "
                "get_normalization_histogram() first.",
            )
        return self._binned / self._normalization_histogram

    def cpy(self, path: str | Path) -> str:
        """Mirror-copy hook (cpy, sed/core/processor.py:250-272): on a
        distributed filesystem the scheduler reads data-local, so this is
        the identity CopyTool."""
        from sed_binning_spark.loaders.storage import CopyTool

        return CopyTool().copy(str(path))

    def pre_binning(
        self,
        df_partitions: int | Sequence[int] = 100,
        axes: Sequence[str] | None = None,
        bins: Sequence[int] | None = None,
        ranges: Sequence[tuple[float, float]] | None = None,
        **kwds,
    ):
        """Initial momentum-space binning with config defaults
        (pre_binning, sed/core/processor.py:2076-2123): the cube feature
        detection and warp estimation operate on."""
        if axes is None:
            axes = list(self._config["momentum"]["axes"])
        # @-aliases pass straight through: compute() resolves them with
        # resolve_alias, which raises a clear error for an unbound role
        if bins is None:
            bins = list(self._config["momentum"]["bins"])
        if ranges is None:
            ranges_ = list(self._config["momentum"]["ranges"])
            ranges_[2] = (
                np.asarray(ranges_[2], dtype=float)
                / 2 ** (self._config["dataframe"]["tof_binning"] - 1)
            )
            ranges = [tuple(map(float, v)) for v in ranges_]
        return self.compute(
            bins=bins, axes=axes, ranges=ranges,
            df_partitions=df_partitions, **kwds,
        )

    def bin_and_load_momentum_calibration(
        self,
        df_partitions: int | Sequence[int] = 100,
        axes: Sequence[str] | None = None,
        bins: Sequence[int] | None = None,
        ranges: Sequence[tuple[float, float]] | None = None,
        plane: int = 0,
        width: int = 5,
        **kwds,
    ) -> np.ndarray:
        """Headless twin of bin_and_load_momentum_calibration
        (sed/core/processor.py:495-532): pre-bin, slice the (plane, width)
        TOF window, and return the 2-D momentum image the interactive tool
        would display — downstream feature detection takes it directly."""
        cube = self.pre_binning(
            df_partitions=df_partitions, axes=axes, bins=bins, ranges=ranges,
            **kwds,
        )
        data = np.asarray(cube.data, dtype=float)
        if data.ndim == 3:
            if not 0 <= plane < data.shape[2]:
                raise ValueError(
                    f"plane {plane} out of range for {data.shape[2]} TOF bins",
                )
            data = data[:, :, plane:min(plane + width, data.shape[2])].sum(axis=2)
        self._attributes.add(
            {"plane": plane, "width": width}, "momentum_prebin_slice",
            duplicate_policy="overwrite",
        )
        return data

    # ---------------------------------- energy-calibration workflow (F1-F4)
    def load_bias_series(
        self,
        data_files: Sequence[str] | None = None,
        binned_data: tuple[np.ndarray, np.ndarray] | None = None,
        biases: np.ndarray | None = None,
        bias_key: str | None = None,
        bins: int | None = None,
        tof_range: tuple[float, float] | None = None,
        normalize: bool | None = None,
        span: int | None = None,
        order: int | None = None,
    ) -> "SedProcessor":
        """F1 (load_bias_series, sed/core/processor.py:1127-1218,
        headless): one TOF histogram per source file (= per bias voltage)
        from a single partition-stacked aggregation, optionally
        savgol-normalized for the correspondence step. Unset arguments
        fall back to config["energy"] exactly like the reference."""
        from pyspark.sql import functions as F

        from sed_binning_spark.calibration.fitting import (
            bin_bias_series,
            extract_bias_h5,
            normspec,
        )

        energy_cfg = self._config.get("energy", {})
        bins = int(energy_cfg.get("bins", 1000)) if bins is None else int(bins)
        normalize = bool(energy_cfg.get("normalize", True)) if normalize is None else normalize
        span = int(energy_cfg.get("normalize_span", 7)) if span is None else int(span)
        order = int(energy_cfg.get("normalize_order", 1)) if order is None else int(order)
        if data_files is not None:
            self.load(files=list(data_files))
        if binned_data is not None:
            tof, traces = (np.asarray(a, dtype=float) for a in binned_data)
        else:
            df = self._require_df()
            tof_col = self._col("tof_column")
            if tof_range is None:
                row = df.agg(
                    F.min(tof_col).alias("lo"), F.max(tof_col).alias("hi"),
                ).collect()[0]
                tof_range = (float(row["lo"]), float(row["hi"]))
            tof, traces = bin_bias_series(
                df, tof_col, bins, tof_range,
                file_column=self._config["dataframe"].get("file_column", "file_id"),
                # after a loader read the ids are range(n_files) by
                # construction — skip the distinct() discovery job, which
                # over a raw-instrument plan would re-decode every file
                file_ids=list(range(len(self.files))) if self.files else None,
            )
        if biases is None and bias_key is not None:
            biases = extract_bias_h5(self.files, bias_key)
        self._bias_tof = tof
        self._bias_traces = traces
        # normalize=False keeps the RAW traces (reference behavior): a
        # forced max-normalization would turn an all-zero trace into NaNs
        self._bias_traces_normed = (
            normspec(traces, smooth=True, span=span, order=order)
            if normalize else np.asarray(traces, dtype=float)
        )
        self._biases = None if biases is None else np.asarray(biases, dtype=float)
        # a NEW series invalidates peaks found on the previous one —
        # without this, calibrate_energy_axis would silently pair the old
        # series' peaks with the new biases
        self._bias_peaks = None
        return self

    def find_bias_peaks(
        self,
        ranges: Sequence[tuple[float, float]] | tuple[float, float],
        ref_id: int = 0,
        infer_others: bool = True,
        peak_window: int | None = None,
    ) -> np.ndarray:
        """F2 + F3 (find_bias_peaks, sed/core/processor.py:1220-1291,
        headless): carry the reference trace's feature range to every
        other trace by exact-DTW alignment, then take the first peak
        inside each range."""
        from sed_binning_spark.calibration.fitting import (
            infer_feature_ranges,
            peaksearch,
        )

        if getattr(self, "_bias_traces_normed", None) is None:
            raise ValueError("Load a bias series first (load_bias_series).")
        if peak_window is None:
            peak_window = int(self._config.get("energy", {}).get("peak_window", 7))
        if infer_others:
            all_ranges = infer_feature_ranges(
                self._bias_tof, self._bias_traces_normed,
                tuple(ranges), ref_id=ref_id,
            )
        else:
            all_ranges = list(ranges)
            if len(all_ranges) != len(self._bias_traces_normed):
                raise ValueError(
                    "infer_others=False needs one range per trace "
                    f"({len(self._bias_traces_normed)}), got {len(all_ranges)}.",
                )
        self._bias_peaks = peaksearch(
            self._bias_traces_normed, self._bias_tof, all_ranges,
            pkwindow=peak_window,
        )
        return self._bias_peaks

    def calibrate_energy_axis(
        self,
        ref_id: int = 0,
        ref_energy: float | None = None,
        method: str | None = None,
        energy_scale: str | None = None,
        **kwds,
    ) -> dict:
        """F4 (calibrate_energy_axis, sed/core/processor.py:1293-1384,
        headless): fit the TOF→energy calibration from the detected bias
        peaks and stash it where append_energy_axis and
        save_energy_calibration pick it up."""
        from sed_binning_spark.calibration.fitting import calibrate_energy

        if getattr(self, "_bias_peaks", None) is None:
            raise ValueError("Find bias peaks first (find_bias_peaks).")
        if self._biases is None:
            raise ValueError(
                "Bias values are missing: pass biases/bias_key to "
                "load_bias_series.",
            )
        method = method or self._config["energy"].get("calibration_method", "lmfit")
        energy_scale = energy_scale or self._config["energy"].get(
            "energy_scale", "kinetic",
        )
        # peaks carry (position, amplitude); the calibration consumes the
        # TOF positions (reference sed/calibrator/energy.py:561-562)
        calibration = calibrate_energy(
            self._bias_peaks[:, 0], self._biases, t=self._bias_tof,
            ref_id=ref_id, ref_energy=ref_energy, method=method,
            energy_scale=energy_scale,
            binwidth=self._config["dataframe"]["tof_binwidth"],
            binning=self._config["dataframe"]["tof_binning"],
            **kwds,
        )
        self._attributes.add(
            {"calibration": calibration}, "energy_calibration",
            duplicate_policy="overwrite",
        )
        return calibration

    # -------------------------------- momentum-calibration workflow (F5-F9)
    def define_features(
        self,
        image: np.ndarray | None = None,
        features: np.ndarray | None = None,
        rotation_symmetry: int | None = None,
        auto_detect: bool = False,
        **kwds,
    ) -> np.ndarray:
        """F5 (define_features, sed/core/processor.py:534-585, headless):
        take landmark coordinates directly, or auto-detect them on the
        momentum image with the 2-D peak detector."""
        from sed_binning_spark.calibration.momentum_fit import peakdetect2d

        if rotation_symmetry is None:
            rotation_symmetry = int(
                self._config["momentum"].get("rotation_symmetry", 6),
            )
        if features is None:
            if not auto_detect:
                raise ValueError(
                    "Headless define_features needs explicit features= or "
                    "auto_detect=True.",
                )
            if image is None:
                raise ValueError("auto_detect=True requires image=.")
            features = peakdetect2d(np.asarray(image, dtype=float), **kwds)
        features = np.asarray(features, dtype=float)
        self._mom_features = features
        self._mom_rotsym = int(rotation_symmetry)
        self._attributes.add(
            {"features": features.tolist(), "rotation_symmetry": rotation_symmetry},
            "momentum_features", duplicate_policy="overwrite",
        )
        return features

    def generate_splinewarp(
        self,
        image: np.ndarray,
        use_center: bool = True,
        **kwds,
    ) -> dict:
        """F6 (generate_splinewarp, sed/core/processor.py:587-673,
        headless): thin-plate-spline warp from the defined landmarks to the
        ideal rotation-symmetric target set."""
        from sed_binning_spark.calibration.momentum_fit import spline_warp_estimate

        if getattr(self, "_mom_features", None) is None:
            raise ValueError("Define features first (define_features).")
        result = spline_warp_estimate(
            np.asarray(image, dtype=float), self._mom_features,
            rotsym=self._mom_rotsym, use_center=use_center, **kwds,
        )
        self._splinewarp = result
        # keep the RAW image: the deformation fields map output pixels back
        # to ORIGINAL-image coordinates, so pose_adjustment must re-warp
        # the original, never the already-corrected image (double warp)
        self._mom_image = np.asarray(image, dtype=float)
        self._pose_params = {"scale": 1.0, "xtrans": 0.0, "ytrans": 0.0, "angle": 0.0}
        self._attributes.add(
            {"correction": {
                k: v for k, v in result.items()
                if k not in ("rdeform_field", "cdeform_field", "corrected_image")
            }},
            "momentum_correction", duplicate_policy="overwrite",
        )
        return result

    def pose_adjustment(
        self,
        image: np.ndarray | None = None,
        scale: float = 1.0,
        xtrans: float = 0.0,
        ytrans: float = 0.0,
        angle: float = 0.0,
        use_correction: bool = True,
        **kwds,
    ) -> dict:
        """F7 (pose_adjustment, sed/core/processor.py:675-833, headless):
        compose scale/translate/rotate onto the current deformation fields
        (the splinewarp's, when one was generated)."""
        from sed_binning_spark.calibration.momentum_fit import pose_adjustment

        warp = getattr(self, "_splinewarp", None) if use_correction else None
        if image is None and warp is not None:
            # the ORIGINAL pre-binned image: the composed fields already
            # include the splinewarp, so warping the corrected image would
            # apply the TPS correction twice
            image = getattr(self, "_mom_image", None)
        if image is None:
            raise ValueError("pose_adjustment needs image= or a splinewarp.")
        result = pose_adjustment(
            np.asarray(image, dtype=float),
            rdeform=None if warp is None else warp["rdeform_field"],
            cdeform=None if warp is None else warp["cdeform_field"],
            scale=scale, xtrans=xtrans, ytrans=ytrans, angle=angle, **kwds,
        )
        if warp is not None:
            warp["rdeform_field"] = result["rdeform_field"]
            warp["cdeform_field"] = result["cdeform_field"]
            warp["corrected_image"] = result.get(
                "corrected_image", warp.get("corrected_image"),
            )
        # CUMULATIVE parameters: repeated calls compose onto the fields, so
        # the persisted transform must compose too — an overwrite would
        # make save_transformations silently drop every earlier call
        params = getattr(
            self, "_pose_params",
            {"scale": 1.0, "xtrans": 0.0, "ytrans": 0.0, "angle": 0.0},
        )
        params = {
            "scale": params["scale"] * scale,
            "xtrans": params["xtrans"] + xtrans,
            "ytrans": params["ytrans"] + ytrans,
            "angle": params["angle"] + angle,
        }
        self._pose_params = params
        self._attributes.add(
            dict(params), "momentum_pose", duplicate_policy="overwrite",
        )
        return result

    def calibrate_momentum_axes(
        self,
        point_a,
        point_b=None,
        k_distance: float | None = None,
        k_coord_a=None,
        k_coord_b=(0.0, 0.0),
        equiscale: bool = True,
        **kwds,
    ) -> dict:
        """F9 (calibrate_momentum_axes, sed/core/processor.py:835-905,
        headless): pixel→k linear calibration from two symmetry points,
        stashed where apply_momentum_calibration and
        save_momentum_calibration pick it up."""
        from sed_binning_spark.calibration.momentum_fit import calibrate_momentum

        if point_b is None:
            point_b = self._config["momentum"]["center_pixel"]
        kwds.setdefault(
            "bin_ranges",
            [tuple(map(float, r)) for r in self._config["momentum"]["detector_ranges"]],
        )
        calibration = calibrate_momentum(
            point_a, point_b, k_distance=k_distance,
            k_coord_a=k_coord_a, k_coord_b=k_coord_b,
            equiscale=equiscale, **kwds,
        )
        self._attributes.add(
            {"calibration": calibration}, "momentum_calibration",
            duplicate_policy="overwrite",
        )
        return calibration

    def adjust_energy_correction(
        self,
        correction_type: str | None = None,
        amplitude: float | None = None,
        center: tuple[float, float] | None = None,
        apply: bool = False,
        **kwds,
    ) -> dict:
        """F11 headless (adjust_energy_correction,
        sed/core/processor.py:987-1069): the interactive sliders are out of
        scope (SURVEY §2.7) — this assembles the correction dict from
        arguments/config, stores it for save_energy_correction, and applies
        it when asked."""
        section = self._config.get("energy", {}).get("correction", {})
        correction = {
            **section,
            **kwds,
            "correction_type": correction_type
            or section.get("correction_type", "spherical"),
        }
        if amplitude is not None:
            correction["amplitude"] = amplitude
        if center is not None:
            correction["center"] = tuple(center)
        for key in ("amplitude", "center"):
            if key not in correction:
                raise ValueError(
                    f"energy correction needs {key!r}: pass it or set "
                    f"config['energy']['correction'][{key!r}].",
                )
        self._attributes.add(
            {"correction": correction}, "energy_correction",
            duplicate_policy="overwrite",
        )
        if apply:
            self.apply_energy_correction(correction)
        return correction

    # ------------------------------------------ per-section config persists
    # fit-derived diagnostics that must NOT round-trip through config
    # (the reference excludes them too): per-bin axes and least-squares
    # matrices are reproducible from the parameters and bloat the YAML
    _DERIVED_CALIB_KEYS = frozenset(
        {"axis", "Tmat", "bvec", "kx_axis", "ky_axis", "extent", "residual"},
    )

    def _strip_derived(self, box: dict) -> dict:
        return {
            k: (self._strip_derived(v) if isinstance(v, dict) else v)
            for k, v in box.items() if k not in self._DERIVED_CALIB_KEYS
        }

    def _save_workflow_section(
        self, attr: str, filename: str | Path, overwrite: bool,
    ) -> dict:
        """One section of save_workflow_params — the reference's
        save_energy_calibration-style helpers each persist exactly one
        calibration dict (sed/core/processor.py:1386-1427 and siblings)."""
        from sed_binning_spark.config import save_config

        if attr not in self._attributes:
            raise ValueError(f"No {attr} parameters to save!")
        section, sub = self._WORKFLOW_PARAM_SECTIONS[attr]
        box = self._strip_derived(self._attributes[attr])
        payload = {section: dict(box) if sub in box else {sub: dict(box)}}
        save_config(payload, filename, overwrite=overwrite)
        return payload

    def save_energy_calibration(self, filename="sed_config.yaml", overwrite=False):
        return self._save_workflow_section("energy_calibration", filename, overwrite)

    def save_energy_correction(self, filename="sed_config.yaml", overwrite=False):
        return self._save_workflow_section("energy_correction", filename, overwrite)

    def save_energy_offset(self, filename="sed_config.yaml", overwrite=False):
        return self._save_workflow_section("energy_offset", filename, overwrite)

    def save_momentum_calibration(self, filename="sed_config.yaml", overwrite=False):
        return self._save_workflow_section("momentum_calibration", filename, overwrite)

    def save_splinewarp(self, filename="sed_config.yaml", overwrite=False):
        return self._save_workflow_section("momentum_correction", filename, overwrite)

    def save_transformations(self, filename="sed_config.yaml", overwrite=False):
        return self._save_workflow_section("momentum_pose", filename, overwrite)

    def save_delay_calibration(self, filename="sed_config.yaml", overwrite=False):
        return self._save_workflow_section("delay_calibration", filename, overwrite)

    def save_delay_offsets(self, filename="sed_config.yaml", overwrite=False):
        return self._save_workflow_section("delay_offset", filename, overwrite)

    _WORKFLOW_PARAM_SECTIONS = {
        "momentum_calibration": ("momentum", "calibration"),
        "momentum_correction": ("momentum", "correction"),
        "momentum_pose": ("momentum", "transformations"),
        "energy_calibration": ("energy", "calibration"),
        "energy_correction": ("energy", "correction"),
        "energy_offset": ("energy", "offsets"),
        "delay_calibration": ("delay", "calibration"),
        "delay_offset": ("delay", "offsets"),
    }

    def save_workflow_params(
        self,
        filename: str | Path = "sed_config.yaml",
        overwrite: bool = False,
    ) -> dict:
        """Persist every calibration applied in this session back into a
        folder config (save_workflow_params, sed/core/processor.py:
        1928-1954): the next session reproduces the workflow from config
        alone. Returns the section dict that was written/merged."""
        from sed_binning_spark.config import save_config

        out: dict = {}
        for attr, (section, sub) in self._WORKFLOW_PARAM_SECTIONS.items():
            if attr not in self._attributes:
                continue
            box = self._attributes[attr]
            if not isinstance(box, dict):
                continue
            box = self._strip_derived(box)
            sec = out.setdefault(section, {})
            if sub in box:
                sec[sub] = box[sub]
                for key, val in box.items():
                    if key != sub:
                        sec[key] = val
            else:
                sec[sub] = dict(box)
        if out:
            save_config(out, filename, overwrite=overwrite)
        return out

    def save(self, faddr: str | Path, **kwds) -> None:
        """K4 sink dispatch on the computed cube (processor.py:2459-2551)."""
        if self._binned is None:
            raise NameError("Need to bin data with compute() before saving!")
        from sed_binning_spark.io import save as _save

        _save(self._binned, faddr, **kwds)

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        n = "unloaded" if self._dataframe is None else "loaded"
        return f"<SedProcessor ({n})>"
