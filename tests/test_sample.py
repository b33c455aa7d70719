"""Deterministic sampling / split assignment (pipeline.sample): spec
equality against a pure-Python md5 reimplementation, the nested-sample
property, leak-proof group splits, and the DuckDB twin of the draw."""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sed_binning_spark.pipeline.sample import (
    assign_splits,
    deterministic_sample,
    stratified_sample,
)
from sed_binning_spark.sqlgen import hex_to_bigint_sql

EV = "/root/testdata/sf0.001/events.parquet"

needs_testdata = pytest.mark.skipif(
    not Path(EV).exists(), reason="driver testdata not present",
)


def _u(event_id, seed=0):
    """The documented draw spec, reimplemented from scratch."""
    enc = f"{len(str(event_id))}:{event_id};sample:{seed}"
    return int(hashlib.md5(enc.encode()).hexdigest()[:13], 16) / float(1 << 52)


@needs_testdata
def test_sample_matches_spec_and_rate(spark):
    df = spark.read.parquet(EV)
    out = deterministic_sample(
        df, 0.25, key_columns=("event_id",), seed=3,
    ).select("event_id").toPandas()
    got = set(out["event_id"])
    keys = spark.read.parquet(EV).select("event_id").toPandas()
    want = {e for e in keys["event_id"] if _u(e, 3) < 0.25}
    assert got == want
    n = len(keys)
    assert abs(len(got) / n - 0.25) < 0.05  # binomial, not exact


@needs_testdata
def test_samples_nest_across_fractions(spark):
    df = spark.read.parquet(EV)
    small = set(deterministic_sample(df, 0.02, key_columns=("event_id",), seed=1)
                .select("event_id").toPandas()["event_id"])
    big = set(deterministic_sample(df, 0.20, key_columns=("event_id",), seed=1)
              .select("event_id").toPandas()["event_id"])
    assert small and small < big  # strict subset: scaling up never drops rows


@needs_testdata
def test_sample_draw_matches_duckdb_twin(spark):
    """The kept-row set is reproducible by the SQL twin of the draw."""
    got = sorted(deterministic_sample(
        spark.read.parquet(EV), 0.1, key_columns=("event_id",), seed=7,
    ).select("event_id").toPandas()["event_id"])
    hx = (
        "md5(CAST(length(CAST(event_id AS VARCHAR)) AS VARCHAR) || ':' || "
        "CAST(event_id AS VARCHAR) || ';sample:7')"
    )
    want = duckdb.connect().execute(
        f"SELECT event_id FROM read_parquet('{EV}') "
        f"WHERE CAST({hex_to_bigint_sql(hx, 1)} AS DOUBLE) "
        f"/ 4503599627370496e0 < 0.1e0 ORDER BY event_id",
    ).fetchall()
    assert got == [r[0] for r in want]


def test_stratified_rates_and_defaults(spark):
    rows = [(i, i, ["a", "b", "c", None][i % 4]) for i in range(4000)]
    df = spark.createDataFrame(rows, "file_id int, row_id int, src string")
    out = stratified_sample(
        df, "src", {"a": 1.0, "b": 0.3}, seed=2,
    ).groupBy("src").count().toPandas().set_index("src")["count"]
    assert out.get("a") == 1000          # fraction 1.0 keeps everything
    assert 200 < out.get("b", 0) < 400   # ~0.3
    assert "c" not in out.index          # unnamed stratum -> default 0.0
    assert not out.index.isnull().any()  # NULL stratum -> default too
    kept_c = stratified_sample(
        df, "src", {"b": 0.3}, seed=2, default_fraction=1.0,
    ).where("src = 'c'").count()
    assert kept_c == 1000
    with pytest.raises(ValueError, match="fraction for stratum"):
        stratified_sample(df, "src", {"a": 1.5})


def test_assign_splits_disjoint_exhaustive_and_grouped(spark):
    rows = [(i % 50, i, float(i)) for i in range(5000)]
    df = spark.createDataFrame(rows, "domain int, row_id int, x double")
    out = assign_splits(
        df, {"train": 0.8, "val": 0.1, "test": 0.1},
        key_columns=("domain",), seed=4,
    ).toPandas()
    assert out["split"].notna().all()
    assert set(out["split"]) <= {"train", "val", "test"}
    # keyed by GROUP: every row of a domain shares one split (no leakage)
    assert (out.groupby("domain")["split"].nunique() == 1).all()
    # stable under a different layout
    out2 = assign_splits(
        df.repartition(13, "x"), {"train": 0.8, "val": 0.1, "test": 0.1},
        key_columns=("domain",), seed=4,
    ).toPandas().sort_values("row_id").reset_index(drop=True)
    assert (out.sort_values("row_id").reset_index(drop=True)["split"]
            == out2["split"]).all()
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(df, {"train": 0.5}, key_columns=("domain",))


def test_null_key_rows_fall_out(spark):
    df = spark.createDataFrame(
        [(0, 0), (None, 1)], "file_id int, row_id int",
    )
    assert deterministic_sample(df, 1.0).count() == 1  # NULL key never kept
    lab = assign_splits(df, {"train": 1.0}).toPandas().set_index("row_id")["split"]
    assert lab[0] == "train" and pd.isna(lab[1])


def test_composed_operators_draw_independently(spark):
    """The review-demonstrated hazard: without per-operator domain salts,
    a 10% sample followed by an 80/10/10 split puts EVERY surviving row in
    'train' (u < 0.1 < 0.8), and hash-jitter on that sample draws only
    from the bottom of its range. Domain tags must decorrelate them."""
    from sed_binning_spark.core.dfops import apply_jitter

    rows = [(0, i, float(i)) for i in range(4000)]
    df = spark.createDataFrame(rows, "file_id int, row_id int, X double")
    sampled = deterministic_sample(df, 0.1)           # default seed on BOTH
    out = assign_splits(sampled, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = out.groupBy("split").count().toPandas().set_index("split")["count"]
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0
    jit = apply_jitter(sampled, cols=["X"], amps=0.5, seed=0, method="hash").toPandas()
    d = jit["X_jittered"] - jit["X"]
    assert d.min() < -0.25 and d.max() > 0.25  # spans the range, not a sliver
