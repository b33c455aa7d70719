"""MetaHandler duplicate-policy tests (reference tests/test_metadata.py):
raise / overwrite / merge / append semantics, deep-copy on store, and the
JSON persistence of numpy-typed provenance."""

from __future__ import annotations

import json

import numpy as np
import pytest

from sed_binning_spark.metadata import MetaHandler


@pytest.fixture()
def handler():
    return MetaHandler(meta={
        "entry_title": "Title",
        "sample": {"size": [1, 2, 3], "name": "Sample Name"},
    })


def test_add_entry_overwrite(handler):
    handler.add({"sample": "Sample Name"}, "sample", duplicate_policy="overwrite")
    assert handler.metadata["sample"] == {"sample": "Sample Name"}


def test_add_entry_raise(handler):
    with pytest.raises(ValueError, match="already exists"):
        handler.add({}, "entry_title", duplicate_policy="raise")
    with pytest.raises(ValueError, match="duplicate_policy"):
        handler.add({}, "entry_title", duplicate_policy="bogus")


def test_add_entry_append(handler):
    handler.add({"sample": "Sample Name"}, "sample", duplicate_policy="append")
    assert handler.metadata["sample_1"] == {"sample": "Sample Name"}
    handler.add({"v": 2}, "sample", duplicate_policy="append")
    assert handler.metadata["sample_2"] == {"v": 2}


def test_add_entry_merge_fills_missing_only(handler):
    """Merge = the reference's complete_dictionary: existing keys WIN,
    missing keys fill in."""
    handler.add(
        {"name": "Other", "type": "crystal"}, "sample", duplicate_policy="merge",
    )
    got = handler.metadata["sample"]
    assert got["name"] == "Sample Name"      # existing wins
    assert got["type"] == "crystal"          # missing fills
    assert got["size"] == [1, 2, 3]
    with pytest.raises(ValueError, match="dict and non-dict"):
        handler.add("scalar", "sample", duplicate_policy="merge")


def test_entries_deep_copied_on_store():
    h = MetaHandler()
    entry = {"calibration": {"coeffs": [1.0, 2.0]}}
    h.add(entry, "energy")
    entry["calibration"]["coeffs"].append(999.0)   # caller mutates later
    assert h.metadata["energy"]["calibration"]["coeffs"] == [1.0, 2.0]


def test_to_json_handles_numpy(tmp_path):
    h = MetaHandler()
    h.add({"arr": np.arange(3), "scalar": np.float64(1.5), "n": np.int64(7)}, "op")
    p = tmp_path / "meta.json"
    h.to_json(p)
    back = json.loads(p.read_text())
    assert back["op"] == {"arr": [0, 1, 2], "scalar": 1.5, "n": 7}


def test_contains_and_getitem(handler):
    assert "sample" in handler and "nope" not in handler
    assert handler["entry_title"] == "Title"
