"""Engine-vs-oracle parity for the similarity queries on a DIRTY
embeddings table.

Twin of tests/test_oracle_parity.py for the embedding side: the driver's
embeddings.parquet is uniformly clean 64-dim vectors, so the NULL /
ragged / zero-norm / NaN-element handling of the cosine expressions is
never exercised by the selfcheck gate. NaN is the treacherous one: it is
non-NULL, sorts ABOVE every real double in descending order, and
compares GREATER than any threshold under both engines' total-order
semantics — without an explicit reject a single poisoned vector becomes
everyone's #1 neighbor.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

QUERIES = ["ann_topk", "ann_pairs_brute", "ann_pairs_lsh"]


@pytest.fixture(scope="module")
def dirty_sf(tmp_path_factory):
    """sf-dir whose embeddings.parquet covers every dirty-vector class at
    the driver table's dimensionality (64)."""
    rng = np.random.default_rng(5)
    base = rng.standard_normal(64)
    vecs: list[list[float] | None] = []
    for i in range(6):  # clean near-parallel cluster + noise
        v = base + rng.standard_normal(64) * (0.01 if i < 3 else 1.0)
        vecs.append([float(x) for x in v])
    vecs.append(None)                                  # 6: NULL embedding
    vecs.append([1.0, 2.0, 3.0])                       # 7: ragged (short)
    vecs.append([0.0] * 64)                            # 8: zero norm
    poisoned = [float(x) for x in base]
    poisoned[10] = float("nan")
    vecs.append(poisoned)                              # 9: NaN element
    vecs.append([float(x) for x in base] + [7.0, 7.0])  # 10: longer than dim
    vecs.append([])                                    # 11: empty array
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    })
    d = tmp_path_factory.mktemp("dirty_emb")
    pq.write_table(tbl, d / "embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def oracle_con(dirty_sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{dirty_sf}/embeddings.parquet')",
    )
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_dirty_embeddings_parity(spark, dirty_sf, oracle_con, name):
    import __spark_entry__ as entry_mod
    from tools.selfcheck import value_hash

    sdf = entry_mod.queries()[name](spark, dirty_sf).toPandas()
    odf = oracle_con.execute(entry_mod.oracle_sql()[name]).df()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert value_hash(sdf) == value_hash(odf), f"{name}: value mismatch"


def test_dirty_vectors_never_rank(spark, dirty_sf):
    """The NULL/ragged/zero/NaN/empty rows must be absent from top-k, and
    the NaN-poisoned vector must not claim a similar pair. Scoped to the
    RANKING legs of the merged ann_topk slot — the pca_c* legs are
    map-only projections that legitimately emit every >= dim row (the
    poisoned one projects to NULL elements), and the pca_fit_* legs
    carry dim indexes, not vec_ids."""
    import __spark_entry__ as entry_mod

    out = entry_mod.queries()["ann_topk"](spark, dirty_sf).toPandas()
    cos = out[out["path"].isin(["brute", "ivf_full_probe"])]
    assert set(cos["vec_id"]).isdisjoint({6, 7, 8, 9, 11})
    # the PQ leg ranks by L2, under which the ZERO vector is a perfectly
    # legal point (only cosine leaves it undefined) — but NULL, ragged,
    # NaN-poisoned, and empty rows still never compete
    pq = out[out["path"] == "pq_adc"]
    assert set(pq["vec_id"]).isdisjoint({6, 7, 9, 11})
    pairs = entry_mod.queries()["ann_pairs_brute"](spark, dirty_sf).toPandas()
    ids = set(pairs["id_a"]) | set(pairs["id_b"])
    assert ids.isdisjoint({6, 7, 8, 9, 11})
    assert {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])} >= {(0, 1), (0, 2)}
