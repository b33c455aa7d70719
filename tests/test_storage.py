"""S9/S10/S11 + F10 utility tests."""

from __future__ import annotations

import zipfile

import numpy as np
import pytest

from sed_binning_spark.calibration.fitting import extract_bias_values
from sed_binning_spark.loaders.storage import (
    CopyTool,
    DatasetFetcher,
    load_parquet,
    save_parquet,
)


def test_parquet_save_load_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "a long, b double")
    path = tmp_path / "final.parquet"
    save_parquet(df, path)
    back = load_parquet(spark, path)
    assert back.count() == 2 and set(back.columns) == {"a", "b"}
    with pytest.raises(FileNotFoundError, match="save_parquet"):
        load_parquet(spark, tmp_path / "missing.parquet")


def test_copy_tool_identity():
    assert CopyTool().copy("/data/raw/scan1") == "/data/raw/scan1"


def test_dataset_fetcher_zip_and_cache(tmp_path):
    # build a local "remote" zip and serve it via file://
    payload = tmp_path / "payload.txt"
    payload.write_text("hello dataset")
    zpath = tmp_path / "demo.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(payload, "payload.txt")
    fetcher = DatasetFetcher(
        tmp_path / "store", registry={"demo": f"file://{zpath}"},
    )
    d1 = fetcher.get("demo")
    assert (tmp_path / "store" / "demo" / "payload.txt").read_text() == "hello dataset"
    # second call is a registry cache hit (delete the source to prove it)
    zpath.unlink()
    assert fetcher.get("demo") == d1
    with pytest.raises(KeyError, match="unknown dataset"):
        fetcher.get("nope")


def test_extract_bias_values():
    metas = [{"KTOF:Lens:Sample:V": 12.345}, {"KTOF:Lens:Sample:V": 13.0}]
    out = extract_bias_values(metas, "@KTOF:Lens:Sample:V")
    np.testing.assert_array_equal(out, [12.35, 13.0])
    with pytest.raises(KeyError, match="bias key"):
        extract_bias_values([{}], "@missing")


def test_dataset_fetcher_http_mocked_with_checksum(tmp_path, monkeypatch):
    """HTTP(S) fetch path, network-mocked: the fetcher streams through
    urlopen (so http needs no extra code path), verifies the declared
    sha256, records the extracted member list, and rejects a corrupted
    download without recording it."""
    import hashlib
    import io
    import json

    from sed_binning_spark.loaders import storage as storage_mod

    payload = io.BytesIO()
    with zipfile.ZipFile(payload, "w") as zf:
        zf.writestr("inner/data.csv", "a,b\n1,2\n")
    blob = payload.getvalue()
    good_sha = hashlib.sha256(blob).hexdigest()

    served: dict[str, bytes] = {"https://example.invalid/ds.zip": blob}
    calls = []

    def fake_urlopen(url):
        calls.append(url)
        return io.BytesIO(served[url])

    monkeypatch.setattr(storage_mod, "urlopen", fake_urlopen)
    fetcher = storage_mod.DatasetFetcher(
        tmp_path / "store",
        registry={
            "ds": {"url": "https://example.invalid/ds.zip", "sha256": good_sha},
            "bad": {"url": "https://example.invalid/ds.zip",
                    "sha256": "0" * 64},
        },
    )
    d = fetcher.get("ds")
    assert (tmp_path / "store" / "ds" / "inner" / "data.csv").exists()
    state = json.loads((tmp_path / "store" / "datasets.json").read_text())
    assert state["ds"]["files"] == ["inner/data.csv"]
    assert state["ds"]["sha256"] == good_sha
    # cache hit: no second network call
    assert fetcher.get("ds") == d
    assert len(calls) == 1

    with pytest.raises(ValueError, match="checksum mismatch"):
        fetcher.get("bad")
    assert "bad" not in json.loads((tmp_path / "store" / "datasets.json").read_text())
    assert not (tmp_path / "store" / "bad" / "ds.zip").exists()
