"""Connected-components / cluster dedup tests (pipeline.cluster)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sed_binning_spark.pipeline.cluster import connected_components, near_dedup_keep_rows


def _uf_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Reference result: plain union-find, min-id labels."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["id_a", "id_b"]).astype("int64"),
    )


def test_two_chained_pairs_form_one_component(spark):
    # A~B, B~C  =>  {A, B, C} labeled A
    out = connected_components(_pairs_df(spark, [(1, 2), (2, 3), (10, 11)]))
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_matches_union_find_on_random_graphs(spark):
    rng = np.random.default_rng(7)
    for _ in range(3):
        n_nodes, n_edges = 60, 45
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, n_nodes, size=(n_edges, 2))
            if a != b
        ]
        expected = _uf_components(pairs)
        out = connected_components(_pairs_df(spark, pairs))
        got = {r["id"]: r["component"] for r in out.collect()}
        assert got == expected


def test_star_pairs_resolve_like_full_expansion(spark):
    """The oversized-bucket star fallback (hub pairs only) must yield the
    same components as full pair expansion — that is its whole point."""
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    star = [(0, j) for j in range(1, 5)]
    full = connected_components(_pairs_df(spark, clique)).collect()
    starred = connected_components(_pairs_df(spark, star)).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, starred))


def test_non_convergence_raises(spark, monkeypatch):
    # a 12-node path needs ~11 propagation rounds; 3 must fail loudly.
    # Force the distributed loop: the driver union-find route (r14) has
    # no iteration cap and would just solve this small graph.
    from sed_binning_spark.pipeline import cluster as cluster_mod

    monkeypatch.setattr(cluster_mod, "_DRIVER_CC_MAX_EDGES", 0)
    path = [(i, i + 1) for i in range(11)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs_df(spark, path), max_iterations=3)


def test_driver_and_distributed_cc_agree(spark, monkeypatch):
    """The r14 driver union-find route must label exactly like the
    hash-min loop (same nodes, same smallest-id components), for int and
    string ids."""
    from sed_binning_spark.pipeline import cluster as cluster_mod

    edges = [(3, 1), (1, 7), (10, 11), (5, 5), (2, 9), (9, 4)]
    want = connected_components(_pairs_df(spark, edges)).toPandas()
    monkeypatch.setattr(cluster_mod, "_DRIVER_CC_MAX_EDGES", 0)
    got = connected_components(_pairs_df(spark, edges)).toPandas()
    key = lambda d: sorted(map(tuple, d.to_numpy()))
    assert key(want) == key(got)

    sdf = spark.createDataFrame(
        [("b", "a"), ("a", "c"), ("x", "y")], "id_a string, id_b string",
    )
    monkeypatch.undo()
    want_s = connected_components(sdf).toPandas()
    monkeypatch.setattr(cluster_mod, "_DRIVER_CC_MAX_EDGES", 0)
    got_s = connected_components(sdf).toPandas()
    assert key(want_s) == key(got_s)


def test_near_dedup_keep_rows(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": np.arange(6, dtype="int64"),
            "text": [f"doc {i}" for i in range(6)],
        }),
    )
    # clusters {0,1,2} and {4,5}; doc 3 untouched
    pairs = _pairs_df(spark, [(0, 1), (1, 2), (4, 5)])
    kept = sorted(r["doc_id"] for r in near_dedup_keep_rows(docs, pairs).collect())
    assert kept == [0, 3, 4]


def test_empty_pairs_keeps_everything(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(3, dtype="int64"), "text": list("abc")}),
    )
    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    out = connected_components(empty)
    assert out.count() == 0
    assert sorted(r["doc_id"] for r in near_dedup_keep_rows(docs, empty).collect()) == [0, 1, 2]


def test_string_ids_propagate_correctly(spark):
    """Convergence must not depend on numeric labels — a label-sum check
    would NULL out on strings and falsely converge after one round."""
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": ["a", "b", "c"], "id_b": ["b", "c", "d"]}),
    )
    out = connected_components(pairs)
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def _emb_docs(spark):
    # three exact-direction groups + one orthogonal singleton + one
    # NaN-poisoned vector (must never be "similar" to anything)
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0, 0.0]),     # same direction as 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 3.0, 0.0, 0.0]),     # same direction as 2
        (4, [0.0, 0.0, 1.0, 0.0]),     # singleton
        (5, [float("nan"), 1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")


def test_embedding_dedup_exact(spark):
    from sed_binning_spark.pipeline.cluster import embedding_dedup

    kept = sorted(
        r["vec_id"]
        for r in embedding_dedup(_emb_docs(spark), 0.99, exact=True).collect()
    )
    # 1 collapses into 0, 3 into 2; 4 survives alone; NaN row 5 survives
    assert kept == [0, 2, 4, 5]


def test_embedding_dedup_lsh_matches_exact(spark):
    """The LSH path may MISS pairs (approximate recall) but must never
    invent one: with enough tables on orthogonal vectors it finds all."""
    from sed_binning_spark.pipeline.cluster import embedding_dedup

    docs = _emb_docs(spark)
    kept = sorted(
        r["vec_id"]
        for r in embedding_dedup(
            docs, 0.99, num_planes=8, num_tables=8, seed=7,
        ).collect()
    )
    assert kept == [0, 2, 4, 5]
