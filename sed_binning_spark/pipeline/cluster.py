"""Duplicate-cluster resolution: candidate pairs -> connected components ->
representative selection.

LSH/SimHash emit candidate PAIRS, but a training-data dedup pass needs
CLUSTERS: if A~B and B~C, then {A, B, C} is one duplicate class and exactly
one member survives. The bridge is connected components over the pair
graph — computed here with iterative hash-min label propagation in plain
DataFrame ops (joins + groupBy min), the standard MapReduce-era CC shape.

Scale design:

- Each iteration is two shuffles (edge join + label groupBy) keyed on node
  id; no step ever materializes a component's member list, so a 1e9-node
  graph with a 1e8-member boilerplate cluster never concentrates on one
  task (contrast collect_set-based approaches).
- Label frames are ``localCheckpoint``-ed per iteration — iterative joins
  otherwise grow the lineage/plan exponentially and re-plan cost dominates
  by iteration ~10.
- Convergence: labels only ever decrease (in the id type's ordering), so
  iteration stops on the first round where no row's label improved (one
  tiny existence probe per round). Round count is bounded by the graph
  diameter, which for dedup graphs is small by construction: clique-ish
  clusters from full pair expansion (diameter 1) and star pairs around a
  representative for oversized buckets (diameter 2; see
  ``dedup._bucket_pairs``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Edge-count ceiling for the driver union-find route: 200k collected edge
# rows is a few MB and resolves in well under 0.1 s, while each avoided
# hash-min iteration costs two fixed-overhead Spark jobs. Above it the
# distributed loop (whose per-iteration cost amortizes at that size) runs
# unchanged.
_DRIVER_CC_MAX_EDGES = 200_000


def _driver_connected_components(spark, edge_rows, id_dtype,
                                 id_column: str, component_column: str):
    """Union-find labeling of a collected edge list — the driver twin of
    the hash-min loop for graphs that fit. Produces the identical result:
    every node that appears in the (mirrored, deduped) edge set, labeled
    with the smallest node id of its component. Spark's binary UTF8String
    ordering equals Python's code-point string ordering (UTF-8 is
    order-preserving), and numeric/temporal types compare identically, so
    min-id selection agrees with the distributed route for every
    orderable id type."""
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in edge_rows:
        u, v = r["u"], r["v"]
        for n in (u, v):
            if n not in parent:
                parent[n] = n
        ru, rv = find(u), find(v)
        if ru != rv:
            # attach the larger root under the smaller, so every root is
            # already its component's minimum
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru

    rows = [(n, find(n)) for n in parent]
    schema = StructType([
        StructField(id_column, id_dtype, True),
        StructField(component_column, id_dtype, True),
    ])
    return spark.createDataFrame(rows, schema=schema)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_column: str = "id",
    component_column: str = "component",
    max_iterations: int = 25,
) -> DataFrame:
    """Label every node of the pair graph with the smallest node id of its
    connected component (hash-min propagation; ids may be any orderable
    type — ints, strings — "smallest" follows the type's ordering).

    Args:
        pairs: candidate-pair frame (one row per undirected edge).
        id_a / id_b: edge endpoint columns.
        id_column / component_column: output column names.
        max_iterations: hard stop; raises if propagation has not converged
            (diameter of a dedup graph should be tiny — non-convergence
            means the input is not a dedup pair set).

    Returns:
        DataFrame[id_column, component_column] covering every node that
        appears in ``pairs`` (isolated documents never show up, matching
        the "only duplicates need resolution" contract).
    """
    # Checkpoint the RAW pair frame BEFORE mirroring: union'ing a frame
    # with its own flip duplicates the whole pair-generation subtree in
    # the plan (no cross-branch subexpression reuse), so the expensive
    # candidate pipeline (LSH verify / brute cosine) would execute TWICE
    # in one job. Materialized first, it runs exactly once and the mirror
    # below is a cheap re-read of checkpointed rows.
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    e = e.localCheckpoint(eager=True)

    # Size-adaptive routing (same posture as the binning driver combine):
    # a dedup pair graph is usually TINY next to its corpus, and each
    # hash-min iteration costs two fixed-overhead Spark jobs (checkpoint +
    # convergence probe). When the edge set fits comfortably on the
    # driver, one union-find pass gives the identical smallest-id
    # labeling in microseconds — on the RAW pairs: union-find is
    # symmetric and idempotent, so mirrored/duplicate edges change
    # nothing, and the node set (all endpoints) is identical. take()
    # reads the already-materialized checkpoint, so the probe costs one
    # short job and never recomputes the pair pipeline; bigger graphs
    # (or exotic NULL/NaN endpoints, which Python cannot order the way
    # Spark's join/least semantics do) fall through to the distributed
    # loop unchanged.
    head = e.take(_DRIVER_CC_MAX_EDGES + 1)
    if len(head) <= _DRIVER_CC_MAX_EDGES and not any(
        r["u"] is None or r["v"] is None
        or (isinstance(r["u"], float) and np.isnan(r["u"]))
        or (isinstance(r["v"], float) and np.isnan(r["v"]))
        for r in head
    ):
        return _driver_connected_components(
            pairs.sparkSession, head, e.schema["u"].dataType,
            id_column, component_column,
        )

    edges = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    # eager: the distributed loop re-reads edges every iteration
    edges = edges.localCheckpoint(eager=True)

    labels = edges.select("u").distinct().select("u", F.col("u").alias("lbl"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels.select(F.col("u").alias("v"), "lbl"), on="v")
            .groupBy("u")
            .agg(F.min("lbl").alias("nl"))
        )
        # least() skips NULLs, so isolated-in-this-round nodes keep lbl.
        # __chg marks rows whose label improved; `<` and min/least agree on
        # ordering for every orderable id type (ints, strings, ...), so the
        # any-row-changed probe is type-agnostic (a numeric label-sum check
        # would NULL out on string ids and falsely report convergence).
        # Superseded label snapshots become unreachable when `labels`
        # rebinds; the ContextCleaner unpersists their checkpoint RDDs, and
        # round count is diameter-bounded (1-2 for dedup graphs), so at most
        # a few snapshots coexist.
        new_labels = (
            labels.join(nbr_min, on="u", how="left")
            .select(
                "u",
                F.least("lbl", "nl").alias("lbl"),
                (F.col("nl") < F.col("lbl")).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        labels = new_labels.drop("__chg")
        if new_labels.where(F.col("__chg")).limit(1).count() == 0:
            return labels.select(
                F.col("u").alias(id_column), F.col("lbl").alias(component_column),
            )

    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations; "
        "the pair graph has a path longer than that — not a dedup pair set?",
    )


def near_dedup_keep_rows(
    df: DataFrame,
    pairs: DataFrame,
    id_column: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop every near-duplicate except its cluster representative (the
    smallest id per connected component of the pair graph).

    The surviving frame = rows not in any pair + one representative per
    cluster. One broadcast-able anti-join against the (small, duplicates
    only) victim list when clusters are rare; Spark picks the join strategy
    from actual sizes via AQE.
    """
    comp = connected_components(pairs, id_a, id_b, id_column="__cc_id",
                                component_column="__cc_comp")
    victims = comp.where(F.col("__cc_id") != F.col("__cc_comp")).select(
        F.col("__cc_id").alias(id_column),
    )
    return df.join(victims, on=id_column, how="left_anti")


def embedding_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    exact: bool = False,
    **lsh_kwargs,
) -> DataFrame:
    """Embedding-cosine near-duplicate removal: rows whose embeddings are
    more than ``threshold`` cosine-similar collapse to one representative
    (smallest id per connected component).

    The candidate generator is :func:`~sed_binning_spark.pipeline.
    similarity.lsh_bucket_pairs` (hyperplane LSH, one shuffle, skew-guarded
    — the 100 TB path; tune via ``lsh_kwargs``: num_planes/num_tables/seed/
    max_bucket_size). ``exact=True`` swaps in the O(n²)
    :func:`~sed_binning_spark.pipeline.similarity.cosine_pairs_brute` —
    the correctness oracle, for small frames and tests only.

    Composition twin of the text-side MinHash cascade
    (``minhash_lsh_pairs`` → ``near_dedup_keep_rows``); reference has no
    counterpart (sed-binning has no embedding columns) — this is part of
    the training-data-pipeline extension surface (SURVEY §7 phase 6).
    """
    from sed_binning_spark.pipeline.similarity import (
        cosine_pairs_brute,
        lsh_bucket_pairs,
    )

    if exact:
        pairs = cosine_pairs_brute(
            df, threshold, embedding_column=embedding_column,
            id_column=id_column,
        )
    else:
        pairs = lsh_bucket_pairs(
            df, threshold, embedding_column=embedding_column,
            id_column=id_column, **lsh_kwargs,
        )
    return near_dedup_keep_rows(
        df, pairs.select("id_a", "id_b"), id_column=id_column,
    )
