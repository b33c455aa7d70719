"""Loader tests: file discovery, generic read, (file_id, row_id) minting
(reference tests/loader/test_loaders.py contract style, on synthetic files)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from sed_binning_spark.loaders.generic import GenericLoader, add_file_and_row_ids
from sed_binning_spark.loaders.utils import gather_files, natural_sort_key


@pytest.fixture(scope="module")
def parquet_folder(tmp_path_factory):
    """Three parquet files with known, distinct contents and natural-sort
    ordering (file2 < file10)."""
    folder = tmp_path_factory.mktemp("files")
    rng = np.random.default_rng(5)
    sizes = {"scan_2": 100, "scan_10": 150, "scan_1": 50}
    for name, n in sizes.items():
        pdf = pd.DataFrame({
            "X": rng.uniform(0, 2048, n),
            "seq": np.arange(n, dtype="int64"),
            "tag": [name] * n,
        })
        pdf.to_parquet(folder / f"{name}.parquet", index=False)
    return str(folder)


def test_natural_sort():
    names = ["scan_10", "scan_2", "scan_1"]
    assert sorted(names, key=natural_sort_key) == ["scan_1", "scan_2", "scan_10"]


def test_gather_files(parquet_folder):
    files = gather_files(parquet_folder, "parquet")
    bases = [os.path.basename(f) for f in files]
    assert bases == ["scan_1.parquet", "scan_2.parquet", "scan_10.parquet"]
    sliced = gather_files(parquet_folder, "parquet", f_start=1, f_end=3)
    assert len(sliced) == 2


def test_generic_loader_reads_folder(spark, parquet_folder):
    loader = GenericLoader(spark)
    df, timed, meta = loader.read_dataframe(folders=parquet_folder)
    assert timed is None
    assert df.count() == 300
    assert meta["file_statistics"]["num_files"] == 3
    assert "file_id" in df.columns and "row_id" in df.columns


def test_generic_loader_errors(spark):
    loader = GenericLoader(spark)
    with pytest.raises(ValueError, match="Unsupported file type"):
        loader.read_dataframe(files=["x.foo"], ftype="foo")
    with pytest.raises(ValueError, match="folder, file paths, or runs"):
        loader.read_dataframe()


def test_file_and_row_ids_match_physical_order(spark, parquet_folder):
    """row_id equals the in-file row index (the files carry their own `seq`
    ground truth); file_id equals the natural-sort position."""
    loader = GenericLoader(spark)
    df, _, meta = loader.read_dataframe(folders=parquet_folder)
    pdf = df.toPandas()
    # file_id 0 -> scan_1 (50 rows), 1 -> scan_2 (100), 2 -> scan_10 (150)
    sizes = pdf.groupby("file_id").size().to_dict()
    assert sizes == {0: 50, 1: 100, 2: 150}
    tags = pdf.groupby("file_id").tag.first().to_dict()
    assert tags == {0: "scan_1", 1: "scan_2", 2: "scan_10"}
    # row_id == seq within every file
    np.testing.assert_array_equal(pdf.row_id.to_numpy(), pdf.seq.to_numpy())


def test_file_and_row_ids_multisplit(spark, tmp_path):
    """A file large enough to span multiple scan splits still gets row_ids in
    physical order (the r1 scale fix: split byte offset, not id-pack order)."""
    n = 200_000
    pdf = pd.DataFrame({"seq": np.arange(n, dtype="int64"),
                        "pad": np.random.default_rng(1).uniform(size=n)})
    path = tmp_path / "big.parquet"
    pdf.to_parquet(path, index=False, row_group_size=10_000)
    # force many small splits so one file spans >1 partition; restore the
    # PRIOR conf value, not a hardcoded default (a clobbered session conf
    # would leak into every later test)
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    try:
        df = spark.read.parquet(str(path))
        assert df.rdd.getNumPartitions() > 1, "test needs a multi-split file"
        out = add_file_and_row_ids(df, [str(path)]).toPandas()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    np.testing.assert_array_equal(out.row_id.to_numpy(), out.seq.to_numpy())


def test_add_ids_fallback_non_file_df(spark):
    """createDataFrame input (no file metadata) falls back to a window."""
    df = spark.createDataFrame([(i,) for i in range(10)], "v int")
    out = add_file_and_row_ids(df, [])
    assert "row_id" in out.columns
    assert out.count() == 10


def test_generic_loader_file_ids_with_spaces_and_directories(spark, tmp_path):
    """input_file_name() reports percent-encoded URIs and inner part-files
    for directory datasets — both must still map to the caller's path."""
    import pandas as pd

    from sed_binning_spark.loaders.generic import GenericLoader

    p1 = tmp_path / "a file 1.parquet"          # space -> %20 in the URI
    pd.DataFrame({"v": [1.0, 2.0]}).to_parquet(p1)
    # directory-style dataset (what spark.write itself produces)
    d2 = tmp_path / "b2.parquet"
    spark.createDataFrame(pd.DataFrame({"v": [3.0, 4.0, 5.0]})) \
        .coalesce(1).write.parquet(str(d2))

    df, _, _ = GenericLoader(spark).read_dataframe(files=[str(p1), str(d2)])
    got = df.groupBy("file_id").count().toPandas().set_index("file_id")["count"]
    assert dict(got) == {0: 2, 1: 3}
    assert df.where("row_id IS NULL OR file_id IS NULL").count() == 0


def test_generic_loader_file_ids_with_plus_in_name(spark, tmp_path):
    """'+' is legal and unescaped in file URIs, but url_decode form-decodes
    it to a space — the loader must re-escape before decoding or the
    file_id mapping misses."""
    import pandas as pd

    from sed_binning_spark.loaders.generic import GenericLoader

    p = tmp_path / "run+1.parquet"
    pd.DataFrame({"v": [1.0, 2.0, 3.0]}).to_parquet(p)
    df, _, _ = GenericLoader(spark).read_dataframe(files=[str(p)])
    got = df.groupBy("file_id").count().toPandas().set_index("file_id")["count"]
    assert dict(got) == {0: 3}


def test_gather_files_slices_only_with_both_bounds(tmp_path):
    from sed_binning_spark.loaders.utils import gather_files

    for i in range(5):
        (tmp_path / f"f{i}.h5").write_bytes(b"")
    assert len(gather_files(str(tmp_path), "h5", f_start=2)) == 5   # lone bound
    assert len(gather_files(str(tmp_path), "h5", f_step=2)) == 5    # lone step
    assert len(gather_files(str(tmp_path), "h5", f_start=1, f_end=4)) == 3


def test_generic_csv_caller_options_win(spark, tmp_path):
    """An explicit header='false' must not be overridden by the CSV
    defaults (which would eat the first data row as column names)."""
    p = tmp_path / "d.csv"
    p.write_text("1.0,a\n2.0,b\n3.0,c\n")
    df, _, _ = GenericLoader(spark).read_dataframe(
        files=[str(p)], ftype="csv", header="false",
    )
    assert df.count() == 3


def test_resolve_paths_files_slicing(spark, tmp_path):
    """files= honors the same both-bounds slice contract as folders=."""
    import pandas as pd

    paths = []
    for i in range(5):
        p = tmp_path / f"f{i}.parquet"
        pd.DataFrame({"v": [float(i)]}).to_parquet(p)
        paths.append(str(p))
    df, _, meta = GenericLoader(spark).read_dataframe(
        files=paths, f_start=1, f_end=4,
    )
    assert meta["file_statistics"]["num_files"] == 3
    assert df.count() == 3


def test_load_parquet_uri_paths_bypass_local_check(spark, tmp_path):
    """URI-style paths go straight to Spark: pathlib would mangle the
    scheme and exists() tests the driver's local filesystem."""
    import pandas as pd

    from sed_binning_spark.loaders.storage import load_parquet, save_parquet

    p = tmp_path / "tbl.parquet"
    save_parquet(spark.createDataFrame(pd.DataFrame({"v": [1.0, 2.0]})), p)
    out = load_parquet(spark, f"file://{p}")
    assert out.count() == 2


def test_mpes_distributed_rejects_mismatched_stream_sets(spark, tmp_path):
    """A file whose Stream_* set differs from the first file's fails at
    submit time with both files named, not executor-side as a KeyError."""
    import pytest

    from sed_binning_spark.io.hdf5_write import H5Writer
    from sed_binning_spark.loaders.mpes import MpesLoader

    def write(path, n_streams):
        w = H5Writer()
        for i in range(n_streams):
            w.add_dataset(f"/Stream_{i}", np.arange(4, dtype="<f4"))
        w.write(str(path))

    a, b = tmp_path / "a.h5", tmp_path / "b.h5"
    write(a, 2)
    write(b, 1)
    with pytest.raises(ValueError, match="missing streams"):
        MpesLoader(spark).read_dataframe(files=[str(a), str(b)])


def test_mpes_count_rate_requires_markers(spark):
    import pytest

    from sed_binning_spark.loaders.mpes import MpesLoader

    loader = MpesLoader(spark)
    with pytest.raises(ValueError, match="no ms_marker"):
        loader.get_count_rate([{"streams": {}}])
    with pytest.raises(ValueError, match="no ms_marker"):
        loader.get_elapsed_time([{"streams": {}}])


def test_aligned_array_pdf_error_names_file():
    """A train-index mismatch in a multi-file read must say WHICH file
    diverged (ADVICE r5: driver-side flash/sxp paths passed no context)."""
    import numpy as np
    import pytest

    from sed_binning_spark.loaders.channels import aligned_array_pdf

    chans = {
        "a": (np.array([1, 2, 3]), np.array([0.1, 0.2, 0.3])),
        "b": (np.array([1, 2, 4]), np.array([0.1, 0.2, 0.3])),
    }
    with pytest.raises(ValueError, match="run_0042.h5"):
        aligned_array_pdf(chans, "per-pulse", context="/data/run_0042.h5")


def test_add_file_and_row_ids_mints_split_ordinals(spark, tmp_path):
    """split_column mints the per-file scan-split ordinal: with a small
    maxPartitionBytes one parquet file really is read as several splits,
    row_id stays globally ordered within the file, and split ordinals are
    contiguous from 0 in row order."""
    import numpy as np
    import pandas as pd

    from sed_binning_spark.loaders.generic import add_file_and_row_ids

    p = str(tmp_path / "big.parquet")
    n = 200_000
    # several row groups: a split only yields rows when a row-group START
    # falls inside it, so one giant row group would collapse to one
    # populated split no matter the byte-range splitting
    pd.DataFrame({"v": np.random.default_rng(0).random(n)}).to_parquet(
        p, compression=None, row_group_size=20_000,
    )
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024))
    try:
        df = spark.read.parquet(p)
        out = add_file_and_row_ids(df, [p], split_column="split_id").toPandas()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert len(out) == n
    assert sorted(out["row_id"]) == list(range(n))
    out = out.sort_values("row_id", ignore_index=True)
    splits = out["split_id"].to_numpy()
    assert splits[0] == 0
    assert (np.diff(splits) >= 0).all()          # ordinal follows row order
    assert splits.max() >= 1, "expected the file to scan as multiple splits"
    # without split_column the schema is unchanged (back-compat)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024))
    try:
        cols = add_file_and_row_ids(spark.read.parquet(p), [p]).columns
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert "split_id" not in cols


def test_directory_dataset_with_multiple_part_files_row_ids(spark, tmp_path):
    """A directory dataset maps SEVERAL physical part-files to one file_id,
    every part-file starting at block 0 — the split key must include the
    physical path or the part-files merge into one offset group and row_id
    silently corrupts (review-found)."""
    import pandas as pd

    from sed_binning_spark.loaders.generic import GenericLoader

    d = tmp_path / "multi.parquet"
    spark.createDataFrame(
        pd.DataFrame({"v": [float(i) for i in range(40)]}),
    ).repartition(3).write.parquet(str(d))
    n_parts = len(list(d.glob("part-*.parquet")))
    assert n_parts >= 2  # the scenario under test

    df, _, _ = GenericLoader(spark).read_dataframe(files=[str(d)])
    got = df.select("file_id", "row_id").toPandas()
    assert (got["file_id"] == 0).all()
    # contiguous, duplicate-free 0..N-1 within the logical file
    assert sorted(got["row_id"]) == list(range(40))


def test_generic_loader_honors_file_sorting_kwarg(spark, tmp_path):
    import pandas as pd

    from sed_binning_spark.loaders.generic import GenericLoader

    for name in ("b.parquet", "a.parquet"):
        pd.DataFrame({"v": [1.0]}).to_parquet(tmp_path / name)
    _, _, meta = GenericLoader(spark).read_dataframe(
        folders=str(tmp_path), file_sorting=True,
    )
    assert [p.split("/")[-1] for p in meta["files"]] == ["a.parquet", "b.parquet"]


def test_split_channel_bitwise_wide_mask_default_type(spark):
    """bit_mask >= 16 must default the low column to int: the reference's
    int16 default silently wraps under numpy and would ABORT under Spark's
    ANSI mode (deliberate deviation from reference wraparound)."""
    from sed_binning_spark.loaders.utils import split_channel_bitwise

    df = spark.createDataFrame([(40000,)], "x long")
    out = split_channel_bitwise(df, "x", ["lo", "hi"], bit_mask=16).collect()[0]
    assert out["lo"] == 40000 and out["hi"] == 0


def test_duplicated_train_readback_keeps_first(spark):
    """A repeated train id in an index dataset is a repeated readback: the
    assembled frame keeps the first reading, or the outer join on trainId
    would multiply every event row of that train (review-found)."""
    import numpy as np

    from sed_binning_spark.loaders.channels import aligned_array_pdf

    idx = np.array([100, 101, 101, 102], dtype=np.int64)
    val = np.array([[1.0], [2.0], [99.0], [3.0]])
    pdf = aligned_array_pdf({"ch": (idx, val)}, "per-pulse")
    assert list(pdf["trainId"]) == [100, 101, 102]
    assert [v[0] for v in pdf["ch"]] == [1.0, 2.0, 3.0]


def test_gather_files_warns_on_missing_folder(tmp_path):
    import warnings as _w

    from sed_binning_spark.loaders.utils import gather_files

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out = gather_files(str(tmp_path / "typo-dir"), "parquet")
    assert out == []
    assert any("does not exist" in str(r.message) for r in rec)
