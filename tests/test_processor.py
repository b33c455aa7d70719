"""End-to-end processor chain tests (reference tests/test_processor.py:
the canonical 6-step workflow, filters, normalization, save round-trip)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sed_binning_spark.processor import SedProcessor


@pytest.fixture()
def proc(spark, events_df):
    return SedProcessor(spark=spark, dataframe=events_df)


K_CALIB = {"rstart": 0.0, "cstart": 0.0, "x_center": 1024.0, "y_center": 1024.0,
           "kx_scale": 0.01, "ky_scale": 0.01, "rstep": 1.0, "cstep": 1.0}
E_CALIB = {"d": 1.0, "t0": 1e-7, "E0": 20.0}
D_CALIB = {"adc_range": (2000.0, 20000.0), "delay_range": (-5.0, 5.0)}


def test_processor_requires_load(spark):
    p = SedProcessor(spark=spark)
    with pytest.raises(ValueError, match="Either dataframe"):
        p.load()
    with pytest.raises(ValueError, match="No dataframe loaded"):
        p.filter_column("X", 0, 1)


def test_canonical_workflow(proc):
    """The benchmarked 6-step chain (benchmarks/benchmark_sed.py:124-129):
    jitter → momentum calib → energy correction → energy calib → delay
    calib → 4-D compute."""
    cube = (
        proc.add_jitter(seed=42)
        .apply_momentum_calibration(K_CALIB)
        .apply_energy_correction({
            "correction_type": "spherical", "center": (1024.0, 1024.0),
            "amplitude": 2.5, "diameter": 3000.0,
        })
        .append_energy_axis(E_CALIB)
        .calibrate_delay_axis(D_CALIB)
        .compute(
            bins=[20, 20, 20, 20],
            axes=["@kx_column", "@ky_column", "@energy_column", "@delay_column"],
            ranges=[(-12, 12), (-12, 12), (20, 60), (-6, 6)],
        )
    )
    assert cube.dims == ("kx", "ky", "energy", "delay")
    assert cube.data.sum() > 0
    # provenance recorded for every step
    meta = proc.attributes.metadata
    for key in ["jitter", "momentum_calibration", "energy_correction",
                "energy_calibration", "delay_calibration"]:
        assert key in meta, key
    assert cube.attrs["metadata"] is meta


def test_corrected_tof_column_preferred(proc):
    proc.apply_energy_correction({
        "correction_type": "Gaussian", "center": (1024.0, 1024.0),
        "amplitude": 2.5, "sigma": 400.0,
    })
    assert "tm" in proc.dataframe.columns
    proc.append_energy_axis(E_CALIB)
    # energy must derive from tm, not t: compare against direct computation
    pdf = proc.dataframe.select("t", "tm", "energy").limit(100).toPandas()
    from sed_binning_spark.calibration.energy import _TOF2EV_CONST
    tof_ns = pdf.tm.to_numpy() * 4.125e-12 * 2.0
    oracle = _TOF2EV_CONST * (1.0 / (tof_ns - 1e-7)) ** 2 + 20.0
    np.testing.assert_allclose(pdf.energy.to_numpy(), oracle, rtol=1e-9)


def test_filter_column_open_interval(proc, events_pdf):
    proc.filter_column("@x_column", 100, 1000)
    n = proc.dataframe.count()
    assert n == ((events_pdf.X > 100) & (events_pdf.X < 1000)).sum()
    with pytest.raises(KeyError, match="not found"):
        proc.filter_column("bogus", 0, 1)


def test_timed_df_symmetry(spark, events_pdf):
    """Transforms propagate to the timed dataframe when columns exist."""
    ev = spark.createDataFrame(events_pdf)
    timed = spark.createDataFrame(events_pdf.iloc[::10])
    p = SedProcessor(spark=spark, dataframe=ev, timed_dataframe=timed)
    p.filter_column("@x_column", 100, 1000).append_energy_axis(E_CALIB)
    assert "energy" in p.dataframe.columns
    assert "energy" in p.timed_dataframe.columns
    assert p.timed_dataframe.count() < p.dataframe.count()


def test_normalization_by_axis_name(spark, events_pdf):
    ev = spark.createDataFrame(events_pdf)
    timed = spark.createDataFrame(events_pdf.iloc[::5])
    p = SedProcessor(spark=spark, dataframe=ev, timed_dataframe=timed)
    normalized = p.compute(
        bins=[16], axes=["@x_column"], ranges=[(0.0, 2048.0)],
        normalize_to_acquisition_time="@x_column",
    )
    assert normalized.attrs["units"] == "counts/second"
    # un-normalized cube kept separately
    assert p.binned is not None
    assert not np.allclose(normalized.data, p.binned.data)


def test_normalization_by_elapsed_time(proc, events_pdf):
    normalized = proc.compute(
        bins=[16], axes=["@x_column"], ranges=[(0.0, 2048.0)],
        normalize_to_acquisition_time=True,
    )
    span = events_pdf.timeStamps.max() - events_pdf.timeStamps.min()
    np.testing.assert_allclose(
        normalized.data, proc.binned.data / span, rtol=1e-9,
    )


def test_add_time_stamped_data(proc, events_pdf):
    ts0, ts1 = events_pdf.timeStamps.min(), events_pdf.timeStamps.max()
    proc.add_time_stamped_data(
        np.array([ts0 - 1, ts1 + 1]), np.array([1.0, 3.0]), dest_column="temp",
    )
    assert "temp" in proc.dataframe.columns


def test_align_dld_sectors_and_offsets(spark, events_pdf):
    pdf = events_pdf.copy()
    pdf["dldSectorID"] = (pdf.row_id % 8).astype("int32")
    p = SedProcessor(spark=spark, dataframe=spark.createDataFrame(pdf))
    p.align_dld_sectors([0.0, 1.0, -1.0, 0.5, -0.5, 2.0, -2.0, 0.25], tof_column="t")
    p.append_energy_axis(E_CALIB)
    p.add_energy_offset(constant=5.0)
    assert "sector_alignment" in p.attributes.metadata
    assert "energy_offset" in p.attributes.metadata
    with pytest.raises(ValueError, match="Delay column"):
        p.add_delay_offset(constant=1.0)


def test_save_roundtrip(proc, tmp_path):
    with pytest.raises(NameError, match="compute"):
        proc.save(tmp_path / "out.npz")
    proc.compute(bins=[8, 8], axes=["@x_column", "@y_column"],
                 ranges=[(0, 2048), (0, 2048)])
    proc.save(tmp_path / "out.npz")
    proc.save(tmp_path / "out.tiff")
    from sed_binning_spark.io import load_npz
    back = load_npz(tmp_path / "out.npz")
    np.testing.assert_array_equal(back.data, proc.binned.data)


def test_loader_path(spark, tmp_path, events_pdf):
    events_pdf.to_parquet(tmp_path / "f1.parquet", index=False)
    p = SedProcessor(spark=spark, folder=str(tmp_path))
    assert p.dataframe.count() == len(events_pdf)
    assert "loader" in p.attributes.metadata


def test_head_preview(proc):
    pdf = proc.head(3)
    assert len(pdf) == 3 and isinstance(pdf, pd.DataFrame)


def test_compute_df_partitions(proc):
    """P7: first-N / explicit-list file pruning before binning."""
    full = proc.compute(bins=[40], axes=["t"], ranges=[(60000.0, 120000.0)])
    first2 = proc.compute(
        bins=[40], axes=["t"], ranges=[(60000.0, 120000.0)], df_partitions=2,
    )
    listed = proc.compute(
        bins=[40], axes=["t"], ranges=[(60000.0, 120000.0)], df_partitions=[0, 1],
    )
    assert first2.data.sum() < full.data.sum()
    np.testing.assert_array_equal(first2.data, listed.data)
    # file_id in {0..3} -> selecting all four returns the full histogram
    all4 = proc.compute(
        bins=[40], axes=["t"], ranges=[(60000.0, 120000.0)], df_partitions=4,
    )
    np.testing.assert_array_equal(all4.data, full.data)


def test_view_event_histogram(proc):
    out = proc.view_event_histogram(
        dfpid=0, bins=50, axes=["X", "Y"],
        ranges=[(0.0, 2048.0), (0.0, 2048.0)],
    )
    assert set(out) == {"X", "Y"}
    centers, counts = out["X"]
    assert centers.shape == (50,) and counts.shape == (50,)
    assert counts.sum() > 0
    # only file 0 contributes
    df = proc.dataframe
    from pyspark.sql import functions as F
    n_f0 = df.where(F.col("file_id") == 0).count()
    assert counts.sum() <= n_f0


def test_view_event_histogram_requires_axes(proc):
    with pytest.raises(ValueError, match="axes"):
        proc.view_event_histogram(dfpid=None, axes=[])


def test_flash_run_id_resolution(tmp_path):
    from sed_binning_spark.loaders.flash import get_files_from_run_id

    for name in ["FLASH1_USER3_stream_2_run43878_file10.h5",
                 "FLASH1_USER3_stream_2_run43878_file2.h5",
                 "FLASH1_USER3_stream_2_run99_file1.h5"]:
        (tmp_path / name).touch()
    # NB: the pattern sorts naturally on the trailing "_"-chunk, as the
    # reference does (file2 before file10)
    files = get_files_from_run_id(43878, str(tmp_path))
    assert [f.rsplit("/", 1)[-1] for f in files] == [
        "FLASH1_USER3_stream_2_run43878_file2.h5",
        "FLASH1_USER3_stream_2_run43878_file10.h5",
    ]
    with pytest.raises(FileNotFoundError):
        get_files_from_run_id(11111, str(tmp_path))


def test_processor_loads_instrument_run_end_to_end(spark):
    """The reference's canonical session: SedProcessor(config with an
    instrument loader, runs=[...]) -> raw HDF5 -> event table -> compute()
    cube, all through the registry dispatch."""
    import os

    fixture_dir = "/root/reference/tests/data/loader/mpes"
    if not os.path.isfile(f"{fixture_dir}/Scan0030_2.h5"):
        pytest.skip("reference fixture not present")
    proc = SedProcessor(
        spark,
        config={"core": {"loader": "mpes", "paths": {"data_raw_dir": fixture_dir}}},
        runs=[30],
        time_stamps=True,
    )
    assert proc.loader.name == "mpes"
    assert proc.dataframe.count() == 297398
    assert proc.timed_dataframe is not None
    cube = proc.compute(bins=[50], axes=["t"], ranges=[(100000.0, 300000.0)])
    assert float(cube.data.sum()) == 297398.0


def test_save_workflow_params_round_trip(spark, tmp_path, events_df):
    """Calibrations applied in a session persist to a folder config and a
    fresh session reproduces the identical dataframe from that file alone
    (the reference's save_workflow_params -> sed_config.yaml round trip)."""
    import yaml

    cal_k = dict(K_CALIB, kx_scale=0.013)
    cal_e = {"d": 1.0, "t0": 1e-7, "E0": -20.0, "energy_scale": "kinetic"}
    cal_d = {"adc_range": (2000.0, 20000.0), "delay_range": (-5.0, 5.0)}
    proc = SedProcessor(spark, dataframe=events_df)
    proc.apply_momentum_calibration(cal_k)
    proc.append_energy_axis(cal_e)
    proc.add_energy_offset(constant=5.0)
    proc.calibrate_delay_axis(cal_d)

    cfg_path = tmp_path / "sed_config.yaml"
    written = proc.save_workflow_params(cfg_path)
    assert set(written) == {"momentum", "energy", "delay"}
    loaded = yaml.safe_load(cfg_path.read_text())
    assert loaded["momentum"]["calibration"]["kx_scale"] == 0.013
    assert loaded["energy"]["calibration"]["E0"] == -20.0
    # flat offset metadata lands under the offsets SUBSECTION (reference
    # layout), not splattered across the energy section
    assert loaded["energy"]["offsets"]["constant"] == 5.0
    assert "constant" not in loaded["energy"]

    # merge semantics: unrelated sections survive a second save
    cfg_path.write_text(cfg_path.read_text() + "\ncore:\n  loader: mpes\n")
    proc.save_workflow_params(cfg_path)
    again = yaml.safe_load(cfg_path.read_text())
    assert again["core"]["loader"] == "mpes"
    assert again["momentum"]["calibration"]["kx_scale"] == 0.013

    # a fresh session driven purely by the saved params matches
    proc2 = SedProcessor(spark, dataframe=events_df)
    proc2.apply_momentum_calibration(again["momentum"]["calibration"])
    a = proc.dataframe.select("kx").toPandas()
    b = proc2.dataframe.select("kx").toPandas()
    assert a.equals(b)


def test_parse_config_explicit_missing_path_raises(tmp_path):
    from sed_binning_spark.config import parse_config

    with pytest.raises(FileNotFoundError):
        parse_config(config=str(tmp_path / "nope.yaml"))
    # implicit folder/user/system layers still skip silently
    assert isinstance(parse_config(), dict)


def test_parse_config_verify_rejects_bad_channel(tmp_path):
    from sed_binning_spark.config import parse_config

    bad = {"dataframe": {"channels": {"x": {"format": "per_banana"}}}}
    with pytest.raises(ValueError, match="invalid format"):
        parse_config(config=bad, verify=True)
    ok = {"dataframe": {"channels": {"x": {
        "format": "per_train", "group_name": "/g/"}}}}
    assert parse_config(config=ok, verify=True)["dataframe"]["channels"]


def test_view_event_histogram_constant_and_empty_columns(spark):
    """Auto-ranges must widen constant columns and tolerate empty
    selections instead of crashing (np.histogram semantics)."""
    import pandas as pd

    from sed_binning_spark.diagnostics import event_histogram_grid

    pdf = pd.DataFrame({
        "const": np.full(50, 7.0),
        "normal": np.linspace(0, 10, 50),
        "file_id": np.zeros(50, dtype="int64"),
    })
    out = event_histogram_grid(spark.createDataFrame(pdf), ["const", "normal"],
                               bins=10, partition=0)
    assert out["const"][1].sum() == 50          # all rows in the widened range
    empty = event_histogram_grid(spark.createDataFrame(pdf), ["normal"],
                                 bins=10, partition=99)  # no such file
    assert empty["normal"][1].sum() == 0


def test_parse_config_empty_yaml_section_keeps_defaults(tmp_path):
    """A bare 'dataframe:' line parses as None; it must not clobber the
    default section (every transform would die on NoneType)."""
    from sed_binning_spark.config import parse_config

    p = tmp_path / "sed_config.yaml"
    p.write_text("dataframe:\nbinning:\n")
    conf = parse_config(folder_config=str(p))
    assert conf["dataframe"]["x_column"] == "X"
    assert conf["binning"]["hist_mode"] == "spark"


def test_add_jitter_amps_stay_paired_with_columns(spark, events_df):
    """Dropping a missing jitter column must drop its amplitude too, and a
    mismatched amps length must raise (zip would silently truncate)."""
    from sed_binning_spark.processor import SedProcessor

    proc = SedProcessor(spark)
    proc.load(dataframe=events_df)
    with pytest.raises(ValueError, match="amps has 3 entries"):
        proc.add_jitter(cols=["X", "t"], amps=[0.5, 0.5, 2.0])
    # 'nope' is missing: its amplitude must vanish with it, leaving t at 2.0
    proc.add_jitter(cols=["X", "nope", "t"], amps=[0.0, 0.5, 2.0], seed=1)
    meta = proc.attributes.metadata["jitter"]["jitter"]
    assert meta["cols"] == ["X", "t"]
    assert meta["amps"] == [0.0, 2.0]


def test_view_event_histogram_explicit_bins_beat_config(spark, events_df):
    """Explicit bins must survive when axes come from config."""
    from sed_binning_spark.processor import SedProcessor

    proc = SedProcessor(spark, config={"histogram": {"axes": ["@x_column"], "bins": [10]}})
    proc.load(dataframe=events_df)
    out = proc.view_event_histogram(dfpid=None, bins=25)
    centers, counts = out["X"]
    assert len(centers) == len(counts) == 25
    # and config bins apply when the caller leaves bins unset
    out2 = proc.view_event_histogram(dfpid=None)
    assert len(out2["X"][0]) == 10


def test_event_histogram_grid_auto_range_skips_nan(spark):
    """One NaN row must not poison the auto-range into (lo, NaN)."""
    import pandas as pd

    from sed_binning_spark.diagnostics import event_histogram_grid

    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0, np.nan]})
    centers, counts = event_histogram_grid(
        spark.createDataFrame(pdf), ["v"], bins=4,
    )["v"]
    assert np.isfinite(centers).all()
    assert counts.sum() == 3


def test_parse_config_does_not_modify_inputs():
    """Layer dicts passed to parse_config stay untouched (reference
    tests/test_config.py:test_load_does_not_modify)."""
    from sed_binning_spark.config import parse_config

    user = {"dataframe": {"x_column": "custom_x"}}
    before = {"dataframe": {"x_column": "custom_x"}}
    merged = parse_config(config=user)
    assert user == before                          # input unmutated
    merged["dataframe"]["x_column"] = "poked"
    assert user == before                          # no aliasing either


def test_save_config_merge_and_overwrite(tmp_path):
    """save_config round trip (reference test_save_dict): merge preserves
    unrelated sections; overwrite replaces the file."""
    import numpy as np

    from sed_binning_spark.config import load_yaml, save_config

    p = tmp_path / "sed_config.yaml"
    save_config({"energy": {"calibration": {"d": np.float64(1.5)}}}, p)
    save_config({"delay": {"offsets": {"constant": 2.0}}}, p)
    merged = load_yaml(p)
    assert merged["energy"]["calibration"]["d"] == 1.5    # preserved + plain type
    assert merged["delay"]["offsets"]["constant"] == 2.0
    save_config({"only": 1}, p, overwrite=True)
    assert load_yaml(p) == {"only": 1}


# ---------------------------------------------- headless fit-workflow facade
def test_energy_calibration_facade(spark, tmp_path):
    """F1-F4 through the processor facade (headless twins of the
    reference's load_bias_series -> find_bias_peaks ->
    calibrate_energy_axis -> save_energy_calibration chain,
    sed/core/processor.py:1127-1427)."""
    import pandas as pd

    rng = np.random.default_rng(5)
    rows = []
    centers = [70000.0, 74000.0, 78000.0]
    for fid, center in enumerate(centers):
        t = rng.normal(center, 1200, 4000)
        rows.append(pd.DataFrame({"t": t, "file_id": fid}))
    p = SedProcessor(spark=spark, dataframe=spark.createDataFrame(pd.concat(rows)))
    p.load_bias_series(
        biases=np.array([20.0, 24.0, 28.0]),
        bins=150, tof_range=(60000.0, 90000.0),
    )
    peaks = p.find_bias_peaks(ranges=(66000.0, 74000.0), ref_id=0)
    assert peaks.shape == (3, 2)
    for (pos, _amp), center in zip(peaks, centers):
        assert abs(pos - center) < 1200
    calib = p.calibrate_energy_axis(ref_id=0, ref_energy=-0.5, method="lmfit")
    assert "coeffs" in calib or "d" in calib or "calib" in str(calib.keys())
    out = p.save_energy_calibration(tmp_path / "cfg.yaml")
    assert "calibration" in out["energy"]
    # guard rails
    q = SedProcessor(spark=spark)
    with pytest.raises(ValueError, match="bias series"):
        q.find_bias_peaks(ranges=(0.0, 1.0))
    with pytest.raises(ValueError, match="peaks"):
        q.calibrate_energy_axis(ref_energy=0.0)


def test_momentum_calibration_facade(spark, tmp_path):
    """F5-F7 + F9 through the processor facade: landmarks -> splinewarp ->
    pose adjustment -> two-point k calibration -> per-section saves."""
    p = SedProcessor(spark=spark)
    # an ideal hexagon on a synthetic intensity map
    feats = np.array([
        [128.0 + 60 * np.cos(a), 128.0 + 60 * np.sin(a)]
        for a in np.linspace(0, 2 * np.pi, 7)[:-1]
    ])
    got = p.define_features(features=feats, rotation_symmetry=6)
    assert got.shape == (6, 2)
    img = np.zeros((256, 256))
    for r, c in feats:
        img[int(r), int(c)] = 1.0
    warp = p.generate_splinewarp(img)
    assert warp["rdeform_field"].shape == (256, 256)
    pose = p.pose_adjustment(scale=1.05, xtrans=2.0, angle=5.0)
    assert pose["rdeform_field"].shape == (256, 256)
    calib = p.calibrate_momentum_axes(
        point_a=(188.0, 128.0), point_b=(128.0, 128.0),
        k_distance=1.2, shape=(256, 256),
        bin_ranges=[(0.0, 256.0), (0.0, 256.0)],
    )
    assert "kx_scale" in calib or "rstart" in calib
    for saver in ("save_momentum_calibration", "save_splinewarp",
                  "save_transformations"):
        out = getattr(p, saver)(tmp_path / f"{saver}.yaml")
        assert "momentum" in out
    # auto-detect path: peaks of the synthetic map recover the landmarks
    auto = p.define_features(image=img, auto_detect=True, radius=8)
    assert len(auto) >= 6
    with pytest.raises(ValueError, match="features= or"):
        SedProcessor(spark=spark).define_features(image=img)


def test_misc_facade_parity(spark, events_df, tmp_path):
    """files / cpy / add_attribute / normalized / pre_binning facade."""
    p = SedProcessor(spark=spark, dataframe=events_df)
    assert p.files == []                       # direct-DataFrame load
    assert p.cpy("/some/path") == "/some/path" # identity mirror
    p.add_attribute({"sample": "WSe2"}, "experiment")
    assert p.attributes["experiment"]["sample"] == "WSe2"
    with pytest.raises(ValueError, match="binned"):
        _ = p.normalized
    img = p.bin_and_load_momentum_calibration(
        axes=["X", "Y", "t"], bins=[16, 16, 4],
        ranges=[(0.0, 2048.0), (0.0, 2048.0), (60000.0, 120000.0)],
        plane=0, width=4,
    )
    assert img.shape == (16, 16) and img.sum() > 0


def test_adjust_energy_correction_headless(spark, events_df, tmp_path):
    """F11 headless: assemble + stash + optionally apply the correction."""
    p = SedProcessor(spark=spark, dataframe=events_df)
    corr = p.adjust_energy_correction(
        correction_type="spherical", amplitude=2.5,
        center=(1024.0, 1024.0), diameter=3000.0, apply=True,
    )
    assert corr["correction_type"] == "spherical"
    assert "tm" in p.dataframe.columns
    out = p.save_energy_correction(tmp_path / "c.yaml")
    assert out["energy"]["correction"]["amplitude"] == 2.5
    with pytest.raises(ValueError, match="amplitude"):
        SedProcessor(spark=spark, dataframe=events_df).adjust_energy_correction(
            center=(1.0, 1.0),
        )


def test_pose_adjustment_composes_not_double_warps(spark):
    """An identity pose after splinewarp must reproduce the splinewarp's
    own corrected image (the fields map to ORIGINAL coordinates — feeding
    the corrected image back in would apply the TPS twice), and repeated
    poses must persist CUMULATIVE parameters."""
    p = SedProcessor(spark=spark)
    feats = np.array([
        [128.0 + 60 * np.cos(a), 128.0 + 60 * np.sin(a)]
        for a in np.linspace(0, 2 * np.pi, 7)[:-1]
    ])
    p.define_features(features=feats, rotation_symmetry=6)
    rng = np.random.default_rng(3)
    img = rng.uniform(0.0, 1.0, (256, 256))
    warp = p.generate_splinewarp(img)
    golden = warp["corrected_image"].copy()
    ident = p.pose_adjustment()  # no scale/trans/rotation
    np.testing.assert_allclose(ident["corrected_image"], golden, atol=1e-9)
    p.pose_adjustment(scale=1.05)
    p.pose_adjustment(angle=5.0, xtrans=2.0)
    pose = p.attributes["momentum_pose"]
    assert pose["scale"] == pytest.approx(1.05)
    assert pose["angle"] == pytest.approx(5.0)
    assert pose["xtrans"] == pytest.approx(2.0)


def test_new_bias_series_invalidates_old_peaks(spark):
    """Loading a new bias series must clear peaks found on the old one —
    calibrating old peaks against new biases would be silently wrong."""
    tof = np.linspace(60000.0, 90000.0, 200)
    traces = np.exp(-((tof - 70000.0) ** 2) / (2 * 1200.0**2))[None, :].repeat(3, 0)
    for i in range(3):
        traces[i] = np.exp(-((tof - (70000.0 + 4000 * i)) ** 2) / (2 * 1200.0**2))
    p = SedProcessor(spark=spark)
    p.load_bias_series(binned_data=(tof, traces), biases=np.array([20.0, 24.0, 28.0]))
    p.find_bias_peaks(ranges=(66000.0, 74000.0))
    p.load_bias_series(binned_data=(tof, traces[::-1]), biases=np.array([28.0, 24.0, 20.0]))
    with pytest.raises(ValueError, match="peaks"):
        p.calibrate_energy_axis(ref_energy=-0.5)


def test_saved_calibration_excludes_derived_arrays(spark, tmp_path):
    """save_energy_calibration must not dump the per-bin 'axis' (or the
    lstsq matrices) into the YAML — they bloat the config and round-trip
    back as junk keys."""
    tof = np.linspace(60000.0, 90000.0, 200)
    traces = np.stack([
        np.exp(-((tof - (70000.0 + 4000 * i)) ** 2) / (2 * 1200.0**2))
        for i in range(3)
    ])
    p = SedProcessor(spark=spark)
    p.load_bias_series(binned_data=(tof, traces), biases=np.array([20.0, 24.0, 28.0]))
    p.find_bias_peaks(ranges=(66000.0, 74000.0))
    calib = p.calibrate_energy_axis(ref_energy=-0.5)
    assert "axis" in calib  # the in-memory dict keeps the diagnostics
    out = p.save_energy_calibration(tmp_path / "cfg.yaml")
    assert "axis" not in out["energy"]["calibration"]
