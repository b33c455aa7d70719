"""Engine-vs-oracle parity for event-family queries on a DIRTY event table.

Twin of tests/test_oracle_parity.py for the events side: the driver's
generated events.parquet has no NaN or NULL measurement values, so the
NaN-reject semantics of the bin-index expressions and the NaN propagation
of the calibration formulas are never exercised by the selfcheck gate.
This suite injects NaN and NULL `value` rows into a copy of the real
sf0.001 table and re-runs representative queries against their oracles.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

QUERIES = [
    "binning_1d",
    "binning_4d",
    "binning_edges",
    "sink_roundtrip",
    "binning_2d3d",
    "filters",
    "map_drop",
    "nan_drop",
    "offsets",
    "energy_axes",
    "corr_profiles",
    "aux_combine",
    "diag_grid",
    "k_axis",
    "delay_calib",  # merged row: calibrated delay + flipped-offset delay_fo
    "bitwise_split",
    "norm_hists",  # merged row: timed + timestamp normalization histograms
    "bias_normspec",
    "jitter",  # method='hash': deterministic md5 draw, oracle-twinnable
    "fills",
    "interp_channel",
    "mpes_timestamps",
    "mpes_timed",
    "norm_spectrum",
    "binning_partitions",
    "sector_align",
    "flash_electron_ids",
    "sxp_electron_ids",
    "flash_pulse_frame",
    "pulse_projection",
    "storage_roundtrip",
    "channel_join",
]


@pytest.fixture(scope="module")
def dirty_sf(tmp_path_factory):
    """sf-dir whose events.parquet is the real sf0.001 table with the first
    rows' `value` turned into NaN and NULL."""
    src = Path("/root/testdata/sf0.001/events.parquet")
    if not src.exists():
        pytest.skip("driver testdata not present")
    d = tmp_path_factory.mktemp("dirty_ev")
    tbl = pq.read_table(src)
    value = tbl.column("value").to_pylist()
    value[0] = float("nan")
    value[1] = None
    value[2] = float("nan")
    value[3] = float("inf")     # saturates (long)Math.floor to Long.MAX
    value[4] = float("-inf")
    idx = tbl.schema.get_field_index("value")
    tbl = tbl.set_column(idx, "value", pa.array(value, type=tbl.schema.field(idx).type))
    pq.write_table(tbl, d / "events.parquet")
    # the documents/embeddings tables are not needed by these queries
    shutil.copy(src.parent / "documents.parquet", d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def oracle_con(dirty_sf):
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{dirty_sf}/{t}.parquet')",
        )
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_dirty_events_parity(spark, dirty_sf, oracle_con, name):
    import __spark_entry__ as entry_mod
    from tools.selfcheck import value_hash

    sdf = entry_mod.queries()[name](spark, dirty_sf).toPandas()
    odf = oracle_con.execute(entry_mod.oracle_sql()[name]).df()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), name
    if value_hash(sdf) != value_hash(odf):
        key = next((c for c in ("event_id", "b0", "bin") if c in sdf.columns), None)
        if key is not None:
            s = sdf.sort_values(key).reset_index(drop=True)
            o = odf.sort_values(key).reset_index(drop=True)
            for c in sorted(sdf.columns):
                sv, ov = list(s[c])[:8], list(o[c])[:8]
                if [repr(x) for x in list(s[c])] != [repr(x) for x in list(o[c])]:
                    raise AssertionError(f"{name}.{c}: spark={sv} oracle={ov}")
        raise AssertionError(f"{name}: value mismatch")


@pytest.fixture(scope="module")
def dirty_emb_sf(tmp_path_factory):
    """sf-dir whose embeddings.parquet carries NULL, ragged, and zero-norm
    rows on top of the real sf0.001 table."""
    src = Path("/root/testdata/sf0.001/embeddings.parquet")
    if not src.exists():
        pytest.skip("driver testdata not present")
    d = tmp_path_factory.mktemp("dirty_emb")
    tbl = pq.read_table(src)
    emb = tbl.column("embedding").to_pylist()
    emb[0] = None
    emb[1] = emb[1][:3]                  # ragged
    emb[2] = [0.0] * len(emb[2])         # zero norm
    idx = tbl.schema.get_field_index("embedding")
    tbl = tbl.set_column(idx, "embedding", pa.array(emb, type=tbl.schema.field(idx).type))
    pq.write_table(tbl, d / "embeddings.parquet")
    return str(d)


@pytest.mark.parametrize("name", ["ann_topk", "ann_pairs_brute"])
def test_dirty_embeddings_parity(spark, dirty_emb_sf, name):
    import __spark_entry__ as entry_mod
    from tools.selfcheck import value_hash

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{dirty_emb_sf}/embeddings.parquet')",
    )
    sdf = entry_mod.queries()[name](spark, dirty_emb_sf).toPandas()
    odf = con.execute(entry_mod.oracle_sql()[name]).df()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert value_hash(sdf) == value_hash(odf), f"{name}: spark=\n{sdf}\noracle=\n{odf}"
