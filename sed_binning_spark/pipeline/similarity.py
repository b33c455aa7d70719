"""Similarity search over embedding columns (``array<float>``).

Two paths, as a scale-tiered pair:

- **Brute-force cosine top-k** — the correctness baseline: a generated
  fixed-length dot-product expression (whole-stage codegen, no Python, no
  shuffle except the final top-k). Linear scan; right answer by
  construction. The engine-portable expression form (explicit per-element
  sum) also lets an independent SQL engine reproduce it bit-for-bit.
- **Random-hyperplane LSH bucketing** — the scale path: sign-bit sketches
  from a seeded hyperplane set give a bucket key; candidate generation is
  an equi-join on the key (optionally multi-probe over rotated keys), and
  only candidates get the exact cosine. At 100 TB the all-pairs product
  never exists.

Top-k at scale: ``ORDER BY score LIMIT k`` in Spark is a per-partition
top-k + single merge (TakeOrderedAndProject) — no global sort shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(col: Column, query: Sequence[float]) -> Column:
    """Explicit left-to-right dot product against a literal query vector.

    Generated as element_at(c,1)*q1 + element_at(c,2)*q2 + ... — stays in
    codegen AND is bit-reproducible by any engine that evaluates a
    left-associated sum (the HOF ``aggregate`` fold is Spark-specific;
    this form is portable).
    """
    # zip_with + aggregate: ONE array kernel instead of dim element_at
    # nodes (measured 5x faster at dim=64 — the unrolled chain's codegen
    # cost grows with every term). aggregate folds LEFT-TO-RIGHT from 0.0,
    # so the result is bit-identical to the oracle's explicit
    # left-associated sum (0.0 + t1 == t1 in IEEE). Rows shorter than the
    # query are NULL (not neighbors; no ANSI indexing error is possible —
    # nothing indexes); longer rows use their first dim elements like the
    # oracle's embedding[1..dim] reads.
    dim = len(query)
    qarr = F.array(*[F.lit(float(q)) for q in query])
    body = F.aggregate(
        F.zip_with(F.slice(col, 1, dim), qarr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(F.size(col) >= dim, body)


def norm_expr(col: Column, dim: int) -> Column:
    """Euclidean norm via the same left-to-right fold (NULL for rows
    shorter than ``dim`` — see dot_expr)."""
    body = F.sqrt(
        F.aggregate(
            F.slice(col, 1, dim),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        ),
    )
    return F.when(F.size(col) >= dim, body)


def cosine_similarity_expr(col: Column, query: Sequence[float]) -> Column:
    """cos(col, query) with the query norm folded in as a literal. NULL for
    zero-norm embeddings (nullif keeps ANSI mode from aborting on /0) —
    cosine against the zero vector is undefined, and NULL scores drop out
    of top-k and threshold filters."""
    q = np.asarray(query, dtype=float)
    qnorm = float(np.sqrt((q * q).sum()))
    return dot_expr(col, query) / F.nullif(
        norm_expr(col, len(query)) * F.lit(qnorm), F.lit(0.0),
    )


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    score_column: str = "score",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    Plan: scan → codegen'd projection → TakeOrderedAndProject (per-partition
    heap + driver merge of k rows). Ties break on id for determinism.
    """
    score = cosine_similarity_expr(F.col(embedding_column), query)
    return (
        df.select(F.col(id_column), score.alias(score_column))
        # NULL scores (NULL/ragged/zero-norm embeddings) are not neighbors:
        # without the filter they'd pad the result whenever k exceeds the
        # number of scorable rows. NaN scores (a NaN element anywhere in
        # the vector) must ALSO be rejected explicitly — NaN is non-NULL
        # and sorts ABOVE every real double in descending order, so a
        # single NaN-poisoned embedding would occupy the #1 neighbor slot
        .where(
            F.col(score_column).isNotNull() & ~F.isnan(F.col(score_column)),
        )
        .orderBy(F.col(score_column).desc(), F.col(id_column))
        .limit(k)
    )


# Row ceiling for the vectorized brute-pairs route: the corpus is collected
# once (64-dim float64 at 64k rows is ~32 MB broadcast) and every task
# scores a horizontal slice against all of it with numpy. Above it the
# expression self-join runs unchanged (the operator is documented as the
# O(n²) correctness oracle either way).
_BRUTE_VEC_MAX_ROWS = 65_536


def _brute_normalized(rows, dim):
    """ids + row-normalized float64 matrix replicating the expression
    path's arithmetic exactly: elements cast to double, the squared-sum
    folded LEFT-TO-RIGHT per element (each += is the same single IEEE add
    the aggregate() fold performs), sqrt, then per-element division. Rows
    shorter than dim or NULL are dropped (zip_with would NULL-pad their
    every pair); zero-norm rows are dropped (nullif semantics); NaN rows
    stay and poison their cosines, which the caller's isnan filter
    rejects — identical outcomes in all cases."""
    ids, vecs = [], []
    for rid, emb in rows:
        # NULL ids can never satisfy id_a < id_b in the self-join form
        if rid is None or emb is None or len(emb) < dim:
            continue
        ids.append(rid)
        vecs.append(np.asarray(emb[:dim], dtype=np.float64))
    if not ids:
        return [], np.zeros((0, dim))
    mat = np.stack(vecs)
    acc = np.zeros(len(ids))
    for d in range(dim):
        acc += mat[:, d] * mat[:, d]
    norm = np.sqrt(acc)
    keep = norm != 0.0  # NaN norms pass (isnan rejection happens per pair)
    mat = mat[keep] / norm[keep, None]
    return [i for i, k in zip(ids, keep) if k], mat


def _pairs_brute_vectorized(spark, rows, dim, threshold,
                            id_column, id_dtype) -> DataFrame:
    """The collected-corpus twin of the brute self-join: every task scores
    a slice of the normalized matrix against the whole matrix with the
    same left-associated fold (one IEEE add per element per pair, in
    expression order), so every cosine is bit-identical to the
    zip_with/aggregate form and the pair set cannot drift."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    import pandas as pd

    ids, mat = _brute_normalized(rows, dim)
    n = len(ids)
    schema = StructType([
        StructField("id_a", id_dtype, True),
        StructField("id_b", id_dtype, True),
        StructField("cosine", DoubleType(), True),
    ])
    if n == 0:
        return spark.createDataFrame([], schema=schema)
    # id order must match Spark's `<` for any orderable id type; ranks via
    # np.unique (code-point order for strings == Spark's UTF8 byte order)
    ranks = np.unique(np.asarray(ids), return_inverse=True)[1]
    matT = np.ascontiguousarray(mat.T)
    rows_per_chunk = max(1, 4_000_000 // n)
    n_chunks = (n + rows_per_chunk - 1) // rows_per_chunk
    bc = spark.sparkContext.broadcast((ids, mat, matT, ranks))
    thr = float(threshold)

    def _score(batches):
        b_ids, b_mat, b_matT, b_ranks = bc.value
        for pdf in batches:
            for k in pdf["id"]:
                lo = int(k) * rows_per_chunk
                hi = min(lo + rows_per_chunk, n)
                a = b_mat[lo:hi]
                s = np.zeros((hi - lo, n))
                for d in range(dim):
                    s += a[:, d:d + 1] * b_matT[d]
                m = (b_ranks[lo:hi, None] < b_ranks[None, :]) & ~np.isnan(s)
                m &= s > thr
                ai, bi = np.nonzero(m)
                yield pd.DataFrame({
                    "id_a": [b_ids[lo + i] for i in ai],
                    "id_b": [b_ids[j] for j in bi],
                    "cosine": s[ai, bi],
                })

    chunks = spark.range(n_chunks, numPartitions=n_chunks)
    return chunks.mapInPandas(_score, schema)


def cosine_pairs_brute(
    df: DataFrame,
    threshold: float,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
) -> DataFrame:
    """All pairs above a cosine threshold — the CORRECTNESS oracle only
    (O(n²); use :func:`lsh_bucket_pairs` at scale). Corpora that fit a
    broadcast take the vectorized route (collect once, numpy-score slices
    against the whole matrix — the guide-§4.2 shape; the interpreted
    zip_with/aggregate fold costs ~10 µs per pair, 2000× numpy); bigger
    inputs fall back to the explicit self-join with the normalization
    computed once per row."""
    dim = _dim(df, embedding_column)
    src = df.select(F.col(id_column), F.col(embedding_column))
    head = src.limit(_BRUTE_VEC_MAX_ROWS + 1).collect()
    if len(head) <= _BRUTE_VEC_MAX_ROWS:
        return _pairs_brute_vectorized(
            df.sparkSession, [(r[0], r[1]) for r in head], dim,
            threshold, id_column, df.schema[id_column].dataType,
        )
    # norm in an inner projection, division in an outer one: inside a
    # higher-order-function lambda subexpression elimination does not apply
    # (see dedup.word_shingles' measurement note), so an inline norm_expr
    # would re-evaluate the O(dim) sum once per element — O(dim^2) per row
    normed = df.select(
        F.col(id_column),
        F.col(embedding_column),
        # nullif: a zero-norm embedding gets NULL normalized elements ->
        # NULL cosine -> excluded by the threshold filter (ANSI mode would
        # otherwise abort the job on the division)
        F.nullif(norm_expr(F.col(embedding_column), dim), F.lit(0.0)).alias("__n"),
    ).select(
        F.col(id_column),
        # slice to dim BEFORE normalizing: a longer-than-dim row uses its
        # first dim elements (the dot_expr/topk contract) — an unsliced
        # array would zip_with NULL-padding against dim-length partners,
        # silently NULLing every pair the long row participates in
        F.transform(
            F.slice(F.col(embedding_column), 1, dim),
            lambda x: x.cast("double") / F.col("__n"),
        ).alias("__e"),
    )
    a = normed.select(F.col(id_column).alias("id_a"), F.col("__e").alias("__ea"))
    b = normed.select(F.col(id_column).alias("id_b"), F.col("__e").alias("__eb"))
    dot = F.aggregate(
        F.zip_with("__ea", "__eb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot)
        # NaN similarity (a NaN element in either vector) compares GREATER
        # than any threshold under both engines' total-order semantics —
        # reject it explicitly, a poisoned vector is not "similar"
        .where(
            ~F.isnan(F.col("cosine"))
            & (F.col("cosine") > F.lit(float(threshold)))
        )
        .select("id_a", "id_b", "cosine")
    )


def hyperplane_sketch_expr(
    col: Column,
    planes: np.ndarray,
) -> Column:
    """Sign-bit sketch string for a (P, dim) seeded hyperplane matrix:
    bit p = 1 iff dot(col, plane_p) >= 0."""
    bits = [
        F.when(dot_expr(col, planes[p]) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in range(planes.shape[0])
    ]
    return F.concat(*bits)


def hyperplane_sketch_udf(planes: np.ndarray, num_tables: int):
    """Vectorized sketch computation: one BLAS matmul per Arrow batch
    computes ALL tables' sign-bit keys at once ((N, dim) @ (dim, T*P)).

    The expression form (:func:`hyperplane_sketch_expr`) is right for a few
    planes; at T*P*dim in the thousands the generated code blows past the
    JVM's 64 KB method limit and falls out of codegen — the matmul UDF is
    the scale path.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    t, p, dim = planes.shape
    flat = np.ascontiguousarray(planes.reshape(t * p, dim).T)  # (dim, T*P)
    weights = 1 << np.arange(p)[::-1]

    def _sketch_fn(emb):
        if not len(emb):  # empty Arrow batch: asarray([]) would be 1-D
            return pd.Series([], dtype=object)
        # NULL/short embeddings sketch to NULL (explode then drops the
        # row) — a bare np.asarray over a batch containing None raises
        # 'inhomogeneous shape' and aborts the whole job. Longer-than-dim
        # rows use their first dim elements, the package-wide contract
        # (dot_expr/cosine_pairs_brute/ivf_assign all slice): without the
        # slice the LSH path would silently miss duplicates the exact
        # oracle finds
        rows = [
            None if e is None else np.asarray(e, dtype=np.float64)[:dim]
            for e in emb
        ]
        ok = [i for i, r in enumerate(rows) if r is not None and r.shape == (dim,)]
        out = [None] * len(rows)
        if ok:
            mat = np.stack([rows[i] for i in ok])
            bits = (mat @ flat) >= 0  # (N_ok, T*P)
            keys = bits.reshape(len(ok), t, p) @ weights  # (N_ok, T) buckets
            for j, i in enumerate(ok):
                out[i] = [f"{tbl}:{int(k)}" for tbl, k in enumerate(keys[j])]
        return pd.Series(out, dtype=object)

    _sketch_fn.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return pandas_udf(_sketch_fn, "array<string>")


def _lsh_verify_vectorized(spark, buckets: DataFrame, rows, dim, threshold,
                           id_dtype, max_bucket_size) -> DataFrame:
    """Bucket-array pair expansion + verification against a broadcast
    raw-vector matrix — the fits-a-broadcast twin of the expression
    expansion + join verify. Receives one row per bucket (the sorted
    member-id array), expands pairs with numpy (full triangle, or the
    same star-around-the-first-member fallback above
    ``max_bucket_size``), and scores them replicating the expression
    arithmetic exactly: raw elements cast to double, the dot and both
    squared-norm folds left-associated element by element (one IEEE
    multiply and add per step, in expression order), cosine = dot /
    (na*nb) with zero denominators excluded (nullif semantics) and NaN
    cosines rejected. The caller distincts the (tiny) surviving pair
    set, which lands on the same rows as the expression route's
    pre-verify distinct because verification is a pure function of the
    pair. Ids missing from the matrix (shorter-than-dim or NULL
    embeddings) drop, mirroring the inner joins' behavior."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    import pandas as pd

    ids, vecs = [], []
    for rid, emb in rows:
        if rid is None or emb is None or len(emb) < dim:
            continue
        ids.append(rid)
        vecs.append(np.asarray(emb[:dim], dtype=np.float64))
    mat = np.stack(vecs) if vecs else np.zeros((0, dim))
    acc = np.zeros(len(vecs))
    for d in range(dim):
        acc += mat[:, d] * mat[:, d]
    norms = np.sqrt(acc)
    index = {rid: i for i, rid in enumerate(ids)}
    bc = spark.sparkContext.broadcast((index, mat, norms))
    thr = float(threshold)
    schema = StructType([
        StructField("id_a", id_dtype, True),
        StructField("id_b", id_dtype, True),
        StructField("cosine", DoubleType(), True),
    ])

    def _verify(batches):
        b_index, b_mat, b_norms = bc.value

        def _score(members, idx, la, lb, out):
            ia, ib = idx[la], idx[lb]
            ok = np.flatnonzero((ia >= 0) & (ib >= 0))
            a, b = b_mat[ia[ok]], b_mat[ib[ok]]
            s = np.zeros(len(ok))
            for d in range(dim):
                s += a[:, d] * b[:, d]
            denom = b_norms[ia[ok]] * b_norms[ib[ok]]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = s / denom
            m = (denom != 0.0) & ~np.isnan(cos) & (cos > thr)
            for j, c in zip(ok[m], cos[m]):
                out.append((members[la[j]], members[lb[j]], float(c)))

        for pdf in batches:
            out: list = []
            for arr in pdf["__ids"]:
                members = list(arr)
                k = len(members)
                idx = np.fromiter(
                    (b_index.get(x, -1) for x in members), np.int64, count=k,
                )
                if k > max_bucket_size:  # star around the smallest member
                    _score(members, idx, np.zeros(k - 1, np.int64),
                           np.arange(1, k), out)
                else:
                    la, lb = np.triu_indices(k, 1)
                    # chunk the triangle: one giant bucket must not
                    # materialize its full pair set at once
                    for lo in range(0, len(la), 4_000_000):
                        _score(members, idx, la[lo:lo + 4_000_000],
                               lb[lo:lo + 4_000_000], out)
            yield pd.DataFrame(out, columns=["id_a", "id_b", "cosine"])

    return buckets.mapInPandas(_verify, schema)


def lsh_bucket_pairs(
    df: DataFrame,
    threshold: float,
    num_planes: int = 16,
    num_tables: int = 4,
    seed: int = 42,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    max_bucket_size: int = 1024,
) -> DataFrame:
    """Near-duplicate pairs via random-hyperplane LSH: ``num_tables``
    independent sketch keys; same key in ANY table → candidate; candidates
    verified with exact cosine. One shuffle on the bucket key + bucket-local
    pair expansion — the scale path (never all-pairs). Buckets above
    ``max_bucket_size`` fall back to O(n) star pairs around one
    representative (skew guard; see dedup._bucket_pairs) — still
    cosine-verified, so precision is unaffected.
    """
    from sed_binning_spark.pipeline.dedup import _bucket_pairs

    dim = _dim(df, embedding_column)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim))
    sketch = hyperplane_sketch_udf(planes, num_tables)
    stacked = df.select(
        F.col(id_column),
        F.explode(sketch(F.col(embedding_column))).alias("key"),
    )
    # When the corpus fits the brute-route broadcast ceiling, hand the
    # BUCKET ARRAYS to one vectorized stage that expands pairs with numpy
    # and scores them against a broadcast raw-vector matrix in the fold's
    # exact IEEE operation order, then distinct the tiny survivor set.
    # The expression route's costs — the interpreted per-bucket pair
    # expansion, a distinct shuffle over every candidate occurrence, two
    # hash-joins, and the interpreted per-pair fold — all collapse into
    # one small shuffle plus numpy. Larger corpora keep the expression
    # form unchanged.
    head = df.select(F.col(id_column), F.col(embedding_column)).limit(
        _BRUTE_VEC_MAX_ROWS + 1,
    ).collect()
    if len(head) <= _BRUTE_VEC_MAX_ROWS:
        buckets = (
            stacked.groupBy("key")
            .agg(F.sort_array(F.collect_set(id_column)).alias("__ids"))
            .where(F.size("__ids") > 1)
            .select("__ids")
        )
        return _lsh_verify_vectorized(
            df.sparkSession, buckets, [(r[0], r[1]) for r in head], dim,
            threshold, df.schema[id_column].dataType, max_bucket_size,
        ).distinct()
    cand = _bucket_pairs(stacked, ["key"], id_column, max_bucket_size)
    # verify candidates with the exact cosine (two hash-joins pull sides)
    sides = df.select(F.col(id_column), F.col(embedding_column).alias("__e"))
    withe = (
        cand.join(sides.withColumnRenamed(id_column, "id_a").withColumnRenamed("__e", "__ea"), "id_a")
        .join(sides.withColumnRenamed(id_column, "id_b").withColumnRenamed("__e", "__eb"), "id_b")
    )
    # slice both sides to dim: a longer-than-dim candidate zip_with'd
    # against a dim-length partner would NULL-pad and NULL the whole dot
    dot = F.aggregate(
        F.zip_with(
            F.slice("__ea", 1, dim), F.slice("__eb", 1, dim),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = norm_expr(F.col("__ea"), dim)
    nb = norm_expr(F.col("__eb"), dim)
    return (
        withe.select(
            "id_a", "id_b",
            (dot / F.nullif(na * nb, F.lit(0.0))).alias("cosine"),
        )
        # NaN similarity (a NaN element in either vector) compares GREATER
        # than any threshold under both engines' total-order semantics —
        # reject it explicitly, a poisoned vector is not "similar"
        .where(
            ~F.isnan(F.col("cosine"))
            & (F.col("cosine") > F.lit(float(threshold)))
        )
    )


def _dim(df: DataFrame, embedding_column: str) -> int:
    """Embedding dimensionality: the MODE of the sizes over a bounded
    prefix (plan-time probe). A first-row probe would let one truncated
    row at the head of the corpus dictate the dimension and silently
    disqualify every well-formed embedding downstream; NULL embeddings are
    skipped rather than crashing the probe.

    The mode aggregates 64k rows (deterministic tie-break: higher count,
    then larger size), so a corrupted head REGION — not just a few rows —
    cannot dictate the inferred dimension; the limit keeps the probe from
    scanning a 100 TB corpus at plan time (a fully order-independent probe
    would need that full scan; callers with adversarially ordered data can
    pass the dimension explicitly where the API accepts it)."""
    rows = (
        df.where(F.col(embedding_column).isNotNull())
        .select(F.size(embedding_column).alias("d"))
        .limit(65536)
        .groupBy("d")
        .count()
        .orderBy(F.desc("count"), F.desc("d"))
        .take(1)
    )
    if not rows:
        raise ValueError(
            f"no non-null {embedding_column!r} values; cannot infer "
            "embedding dimensionality",
        )
    return int(rows[0]["d"])


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the third tier: a coarse k-means quantizer
# partitions the corpus into lists; a query probes only its nearest lists.
# Complements the LSH path: IVF gives tunable recall/cost via n_probes and
# a natural storage layout (partition the corpus parquet by list id).
# ---------------------------------------------------------------------------
def ivf_train_centroids(
    df: DataFrame,
    n_lists: int = 16,
    embedding_column: str = "embedding",
    sample_size: int = 4096,
    iterations: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Spherical k-means coarse quantizer trained driver-side on a bounded
    sample (centroid fitting is small-data model estimation, like the
    calibration fits — the corpus itself never leaves the cluster).
    Returns (n_lists, dim) L2-normalized centroids.

    The sample comes from the shared ``_sample_embeddings`` draw (seeded
    TakeOrdered, not a bare limit() — limit reads the first partitions
    only, and a corpus parquet written sorted/clustered by source would
    train every centroid on one region of embedding space, silently
    collapsing most of the corpus into one or two lists)."""
    dim = _dim(df, embedding_column)
    x = _sample_embeddings(df, embedding_column, dim, sample_size, seed,
                           what="the IVF coarse quantizer")
    if len(x) < n_lists:
        raise ValueError(f"sample of {len(x)} rows cannot seed {n_lists} lists")
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=n_lists, replace=False)]
    for _ in range(iterations):
        assign = np.argmax(x @ centroids.T, axis=1)
        for c in range(n_lists):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids /= np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    return centroids


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    embedding_column: str = "embedding",
    list_column: str = "ivf_list",
) -> DataFrame:
    """Nearest-centroid list assignment: one BLAS matmul per Arrow batch
    (same shape as the LSH sketch UDF). At scale, write the assigned corpus
    partitioned by ``list_column`` so probes become partition pruning."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cent = np.ascontiguousarray(np.asarray(centroids, dtype=np.float64).T)

    dim = cent.shape[0]

    def _assign_fn(emb):
        if not len(emb):  # empty Arrow batch: asarray([]) would be 1-D
            return pd.Series([], dtype="Int32")
        # NULL/short embeddings assign to NULL (excluded from every probed
        # list) instead of crashing the batch's np.asarray; longer-than-dim
        # rows use their first dim elements — the dot_expr/cosine_topk
        # contract, so a full probe keeps exactly the rows brute scores
        rows = [None if e is None else np.asarray(e, dtype=np.float64) for e in emb]
        rows = [r[:dim] if r is not None and r.ndim == 1 and r.size >= dim else r
                for r in rows]
        ok = [i for i, r in enumerate(rows) if r is not None and r.shape == (dim,)]
        out = pd.array([None] * len(rows), dtype="Int32")
        if ok:
            mat = np.stack([rows[i] for i in ok])
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            out[ok] = np.argmax(mat @ cent, axis=1).astype(np.int32)
        return pd.Series(out)

    _assign_fn.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    _assign = pandas_udf(_assign_fn, "int")
    return df.withColumn(list_column, _assign(F.col(embedding_column)))


def ivf_topk(
    df: DataFrame,
    centroids: np.ndarray,
    query: Sequence[float],
    k: int = 10,
    n_probes: int = 4,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    list_column: str = "ivf_list",
) -> DataFrame:
    """Approximate top-k: probe only the ``n_probes`` lists whose centroids
    are nearest the query, exact cosine + TakeOrderedAndProject within.
    If ``list_column`` is already on ``df`` (pre-assigned, ideally the
    partition column of the stored corpus) the assignment UDF is skipped
    and probing prunes partitions."""
    cent = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(cent @ q))[: int(n_probes)].tolist()
    if list_column not in df.columns:
        df = ivf_assign(df, centroids, embedding_column, list_column)
    probed = df.where(F.col(list_column).isin(probes))
    return cosine_topk(
        probed, query, k=k,
        embedding_column=embedding_column, id_column=id_column,
    )


# --------------------------------------------------------------------- PCA
def pca_fit(
    df: DataFrame,
    k: int,
    embedding_column: str = "embedding",
    whiten: bool = False,
) -> dict:
    """Fit a PCA projection over an embedding column in ONE distributed
    pass: each partition reduces to its exact moment sums (count, sum
    vector, sum of outer products — one BLAS ``m.T @ m`` per Arrow
    batch) through ``mapInPandas``, a second 64-way reduce stage folds
    the per-partition rows (so an 800k-partition corpus never lands
    800k d x d rows on the driver), and the driver eigendecomposes the
    d x d covariance from at most 64 combined rows. No embedding is
    ever collected. Eigenvector signs are pinned (largest-|component|
    entry positive) so the model is deterministic up to float summation
    order. NULL, too-short, and non-finite embeddings (one NaN element
    would poison whole covariance rows) are skipped; longer rows
    contribute their first d elements (the package-wide contract every
    scorer follows). Returns a JSON-serializable model for
    :func:`pca_apply`:
    mean, components (k x d, variance-descending), explained variance
    and its ratio. ``whiten=True`` scales each output axis to unit
    variance — the standard preprocessing before cosine LSH/IVF so no
    single high-variance axis dominates every bucket boundary."""
    import pandas as pd

    d = _dim(df, embedding_column)
    if not 1 <= k <= d:
        raise ValueError(f"k={k} outside 1..{d}")

    def partial(batches):
        s = np.zeros(d)
        ss = np.zeros((d, d))
        n = 0
        for pdf in batches:
            rows = [
                np.asarray(e, dtype=np.float64)[:d]
                for e in pdf[embedding_column]
                if e is not None and len(e) >= d
            ]
            if rows:
                m = np.stack(rows)
                # a single NaN/Inf element would turn whole covariance
                # rows non-finite (and Arrow returns NaN array elements
                # as NULL, corrupting the moment rows on the way back) —
                # a poisoned vector contributes nothing, like the NaN
                # reject in cosine_topk
                m = m[np.isfinite(m).all(axis=1)]
                if len(m):
                    s += m.sum(axis=0)
                    ss += m.T @ m
                    n += len(m)
        yield pd.DataFrame({
            "n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()],
        })

    moment_schema = "n long, s array<double>, ss array<double>"

    def combine(batches):
        s = np.zeros(d)
        ss = np.zeros(d * d)
        n = 0
        for pdf in batches:
            for _, row in pdf.iterrows():
                n += int(row["n"])
                if row["n"]:
                    s += np.asarray(row["s"])
                    ss += np.asarray(row["ss"])
        yield pd.DataFrame({
            "n": [n], "s": [s.tolist()], "ss": [ss.tolist()],
        })

    partials = df.select(embedding_column).mapInPandas(partial, schema=moment_schema)
    # Tree-reduce gate, data-derived: the partial stage yields ONE moment
    # row per input partition (~(d + d^2) doubles each). When that count
    # is bounded the driver folds the rows itself — the fixed
    # repartition(64) + combine stage costs an Exchange plus 64 Python
    # worker tasks, which dwarfs the fold for small corpora. A
    # many-thousand-partition corpus keeps the 64-way combine so the
    # driver never holds more than 64 rows.
    n_parts = partials.rdd.getNumPartitions()
    if n_parts > 256:
        partials = partials.repartition(64).mapInPandas(combine, schema=moment_schema)
    parts = partials.collect()
    n = sum(r["n"] for r in parts)
    if n < 2:
        raise ValueError(f"PCA needs at least 2 usable embeddings, got {n}")
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    ss = np.sum([np.asarray(r["ss"]).reshape(d, d) for r in parts], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    var = np.maximum(evals[order], 0.0)
    # sign convention: the largest-magnitude entry of each component is
    # positive (eigh's signs are arbitrary)
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    total = float(np.maximum(evals, 0.0).sum()) or 1.0
    return {
        "dim": d,
        "k": int(k),
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": var.tolist(),
        "explained_variance_ratio": (var / total).tolist(),
        "whiten": bool(whiten),
        "n_fit": int(n),
    }


def pca_apply(
    df: DataFrame,
    model: dict,
    embedding_column: str = "embedding",
    output_column: str = "embedding_pca",
) -> DataFrame:
    """Project embeddings through a fitted PCA model — one BLAS matmul
    per Arrow batch ((N, d) @ (d, k)), the same vectorized shape as the
    LSH sketch UDF. NULL/short embeddings project to NULL. The output is
    ``array<float>`` of length k, drop-in for every downstream ANN /
    clustering operator."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    d, k = int(model["dim"]), int(model["k"])
    mean = np.asarray(model["mean"], dtype=np.float64)
    proj = np.asarray(model["components"], dtype=np.float64).T  # (d, k)
    if mean.shape != (d,) or proj.shape != (d, k):
        raise ValueError("PCA model fields disagree with its dim/k")
    if model.get("whiten"):
        scale = np.sqrt(np.maximum(
            np.asarray(model["explained_variance"], dtype=np.float64),
            1e-12,
        ))
        proj = proj / scale[None, :]

    def _project(emb):
        if not len(emb):
            return pd.Series([], dtype=object)
        rows = [
            None if e is None or len(e) < d
            else np.asarray(e, dtype=np.float64)[:d]
            for e in emb
        ]
        ok = [i for i, r in enumerate(rows) if r is not None]
        out = [None] * len(rows)
        if ok:
            mat = np.stack([rows[i] for i in ok])
            red = (mat - mean) @ proj
            for j, i in enumerate(ok):
                out[i] = [float(v) for v in red[j]]
        return pd.Series(out, dtype=object)

    _project.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    # nondeterministic marker: a caller filtering on the projected column
    # (e.g. .where(embedding_pca.isNotNull())) would otherwise get the
    # matmul UDF duplicated below the filter (guide §4.4 shape; seen as
    # two identical _project ArrowEvalPython nodes per leg in the
    # ann_topk plan). Pure function — single evaluation, same results.
    proj_udf = pandas_udf(_project, "array<float>").asNondeterministic()
    return df.withColumn(output_column, proj_udf(F.col(embedding_column)))


# ------------------------------------------------- product quantization
def _kmeans_l2(x: np.ndarray, k: int, iters: int,
               rng: np.random.Generator) -> np.ndarray:
    """Plain Lloyd k-means (L2) with seeded kmeans++ init and
    farthest-point reseeding for emptied clusters — deterministic for a
    given rng state. Small-data driver-side model estimation only.
    Distances use the ||c||² - 2·x@cᵀ (+ ||x||²) expansion throughout:
    an (n, k) matrix, never an (n, k, dim) broadcast temp (which at
    sample_size=65536, codes=256, sub_dim=96 would be ~13 GB per Lloyd
    step). A zero-spread input (constant subspace — padded or dead
    dimensions) degenerates to k copies of that point instead of
    crashing the kmeans++ draw."""
    n = len(x)
    x2 = (x ** 2).sum(axis=1)
    cent = np.empty((k, x.shape[1]))
    cent[0] = x[rng.integers(n)]
    d2 = ((x - cent[0]) ** 2).sum(axis=1)
    for c in range(1, k):  # kmeans++: sample proportional to distance²
        total = d2.sum()
        if total <= 1e-12:  # no spread left: every point already covered
            cent[c:] = cent[c - 1]
            break
        cent[c] = x[rng.choice(n, p=d2 / total)]
        d2 = np.minimum(d2, ((x - cent[c]) ** 2).sum(axis=1))
    for _ in range(iters):
        d2all = (cent ** 2).sum(axis=1)[None, :] - 2.0 * (x @ cent.T) \
            + x2[:, None]
        assign = d2all.argmin(axis=1)
        # per-cluster means via bincount, not k boolean masks: the mask
        # loop was the Lloyd bottleneck (256 full-sample scans per
        # iteration — measured 58 s for the documented PQ training shape;
        # bincount makes the update O(n·dim) total)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        sums = np.empty((k, x.shape[1]))
        for j in range(x.shape[1]):
            sums[:, j] = np.bincount(assign, weights=x[:, j], minlength=k)
        served = counts > 0
        cent[served] = sums[served] / counts[served, None]
        if not served.all():  # reseed empty clusters to the worst point
            cent[~served] = x[d2all.min(axis=1).argmax()]
    return cent


def _sample_embeddings(
    df: DataFrame, embedding_column: str, dim: int, n: int, seed: int,
    what: str,
) -> np.ndarray:
    """Bounded seeded training sample shared by the quantizer trainers:
    a seeded random top-k (TakeOrdered, no full sort), never a bare
    limit() — limit reads the first partitions only, and a corpus
    written clustered by source would train the whole model on one
    region of embedding space. NULL/ragged rows are skipped, matching
    assign-time behavior."""
    pdf = (
        df.select(embedding_column)
        .where(F.col(embedding_column).isNotNull()
               & (F.size(embedding_column) == dim))
        .orderBy(F.rand(seed))
        .limit(int(n))
        .toPandas()
    )
    x = np.asarray(
        [np.asarray(e, dtype=np.float64) for e in pdf[embedding_column]],
    )
    if x.ndim != 2:
        raise ValueError(f"no usable embeddings to train {what}")
    return x


def pq_train(
    df: DataFrame,
    m: int = 8,
    codes: int = 256,
    embedding_column: str = "embedding",
    sample_size: int = 65536,
    iterations: int = 20,
    seed: int = 42,
) -> dict:
    """Train a product quantizer: split the embedding into ``m``
    contiguous subspaces and fit a ``codes``-entry L2 k-means codebook
    per subspace on a bounded seeded sample (driver-side model
    estimation, the ivf_train_centroids posture — the corpus never
    leaves the cluster). A d-dim float32 vector compresses to ``m``
    bytes: 32x at d=64/m=8, which is what makes a 100 TB embedding
    corpus searchable from memory. Returns a JSON-serializable model
    for :func:`pq_encode` / :func:`pq_topk`."""
    dim = _dim(df, embedding_column)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    if not 2 <= codes <= 256:
        raise ValueError("codes must be in 2..256 (one byte per subspace)")
    sub = dim // m
    x = _sample_embeddings(df, embedding_column, dim, sample_size, seed,
                           what="the product quantizer")
    if len(x) < codes:
        raise ValueError(
            f"sample of {len(x)} rows cannot seed {codes} codes",
        )
    rng = np.random.default_rng(seed)
    books = [
        _kmeans_l2(x[:, s * sub : (s + 1) * sub], codes, iterations, rng)
        for s in range(m)
    ]
    return {
        "dim": dim,
        "m": int(m),
        "sub_dim": sub,
        "codes": int(codes),
        "codebooks": [b.tolist() for b in books],  # (m, codes, sub_dim)
    }


def pq_encode(
    df: DataFrame,
    model: dict,
    embedding_column: str = "embedding",
    output_column: str = "pq_code",
) -> DataFrame:
    """Quantize embeddings to their per-subspace nearest-codeword ids
    (``array<int>`` of length m, each 0..codes-1) — one vectorized
    distance computation per Arrow batch per subspace; NULL/ragged/
    non-finite embeddings encode to NULL (a NaN element makes every
    codeword distance NaN, so "nearest" is undefined — a poisoned
    vector gets no code rather than an arbitrary one, mirroring
    cosine_topk's NaN reject). The encoded column is what a 100 TB
    deployment PERSISTS; the float vectors become cold storage."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    dim, m, sub = model["dim"], model["m"], model["sub_dim"]
    books = np.asarray(model["codebooks"], dtype=np.float64)
    # ||c||² per codeword, precomputed once per executor closure
    norms = (books ** 2).sum(axis=2)  # (m, codes)

    def _encode(emb):
        if not len(emb):
            return pd.Series([], dtype=object)
        # longer-than-dim rows use their first dim elements — the
        # package-wide contract every scorer here follows, so the PQ
        # tier searches exactly the rows the exact oracle scores
        rows = [
            None if e is None or len(e) < dim
            else np.asarray(e, dtype=np.float64)[:dim]
            for e in emb
        ]
        rows = [
            r if r is None or np.isfinite(r).all() else None for r in rows
        ]
        ok = [i for i, r in enumerate(rows) if r is not None]
        out = [None] * len(rows)
        if ok:
            mat = np.stack([rows[i] for i in ok]).reshape(len(ok), m, sub)
            codes_out = np.empty((len(ok), m), dtype=np.int64)
            for s in range(m):
                # argmin ||v - c||² = argmin (||c||² - 2 v·c)
                ip = mat[:, s, :] @ books[s].T  # (N, codes)
                codes_out[:, s] = (norms[s][None, :] - 2.0 * ip).argmin(axis=1)
            for j, i in enumerate(ok):
                out[i] = [int(c) for c in codes_out[j]]
        return pd.Series(out, dtype=object)

    _encode.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    # nondeterministic marker (guide-standard for expensive UDFs): a
    # downstream filter on the code column — pq_topk's own validity gate
    # when composed as pq_topk(pq_encode(df)) — would otherwise have the
    # encode expression substituted into it and every row would pay the
    # encoder TWICE (one ArrowEvalPython below the filter, a second
    # re-encode inside the composed scorer above it; seen in the ann_topk
    # plan). The function is pure, so blocking reorder/duplication cannot
    # change results — it only pins a single evaluation.
    enc = pandas_udf(_encode, "array<int>").asNondeterministic()
    return df.withColumn(output_column, enc(F.col(embedding_column)))


def pq_topk(
    df: DataFrame,
    model: dict,
    query: Sequence[float],
    k: int = 10,
    code_column: str = "pq_code",
    id_column: str = "vec_id",
    output_column: str = "pq_dist",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query stays
    UNCOMPRESSED and its squared distance to every codeword becomes an
    (m, codes) lookup table computed ONCE on the driver; each row's
    approximate distance is m table lookups summed — no float vector is
    read at query time. Ends in ORDER BY LIMIT k
    (TakeOrderedAndProject: per-partition top-k + merge). For recall
    beyond PQ resolution, take a wider k here and exact-re-rank the
    survivors against their float vectors."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m, codes = model["m"], model["codes"]
    books = np.asarray(model["codebooks"], dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    if q.shape != (model["dim"],):
        # the first-dim-elements contract applies to CORPUS rows (ragged
        # storage); the query is a caller argument, so a length mismatch
        # is a wrong-model bug and must raise, not silently truncate
        raise ValueError(
            f"query has {q.shape[0] if q.ndim == 1 else '?'} dims; "
            f"the model wants exactly {model['dim']}",
        )
    qsub = q.reshape(m, 1, model["sub_dim"])
    table = ((books - qsub) ** 2).sum(axis=2)  # (m, codes)

    def _score(code):
        if not len(code):
            return pd.Series([], dtype="float64")
        vals = np.full(len(code), np.nan)
        rows = [
            (i, np.asarray(c, dtype=np.int64))
            for i, c in enumerate(code)
            if c is not None and len(c) == m
        ]
        if rows:
            idx = np.asarray([i for i, _ in rows])
            mats = np.stack([c for _, c in rows])  # (N, m)
            if int(mats.max(initial=0)) >= codes or int(mats.min(initial=0)) < 0:
                raise ValueError("PQ code outside the model's codebook")
            vals[idx] = table[np.arange(m)[None, :], mats].sum(axis=1)
        return pd.Series(vals)

    _score.__annotations__ = {"code": pd.Series, "return": pd.Series}
    # gate invalid rows on the INPUT column, not the UDF output: a filter
    # on the computed score gets the UDF expression substituted into it,
    # so Catalyst would evaluate the scorer TWICE per row (caught by the
    # ivf_pq plan pin); a plain code-column predicate instead pushes all
    # the way into the scan
    scored = df.where(
        F.col(code_column).isNotNull() & (F.size(code_column) == m),
    ).withColumn(
        output_column, pandas_udf(_score, "double")(F.col(code_column)),
    )
    return (
        scored.select(id_column, output_column)
        .orderBy(F.col(output_column).asc(), F.col(id_column).asc())
        .limit(int(k))
    )


def ivf_pq_topk(
    df: DataFrame,
    centroids: np.ndarray,
    model: dict,
    query: Sequence[float],
    k: int = 10,
    n_probes: int = 4,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    list_column: str = "ivf_list",
    code_column: str = "pq_code",
) -> DataFrame:
    """The production 100 TB ANN composition: IVF routing × PQ scoring.
    The query picks the ``n_probes`` nearest-centroid lists (driver-side,
    the :func:`ivf_topk` rule); only rows in those lists are scored, and
    the scoring reads PQ CODES through :func:`pq_topk`'s asymmetric
    distance table — m byte-lookups per candidate, no float vector
    touched at query time.

    If ``list_column`` / ``code_column`` are already on ``df`` (the
    persisted layout: corpus partitioned by list, codes materialized,
    vectors in cold storage) the assignment/encode UDFs are skipped
    entirely — the probe filter is then a plain column predicate that
    prunes partitions before any Python runs, so a 1-of-1000-lists probe
    reads ~0.1% of the corpus. Recall follows IVF's probe coverage
    degraded by PQ resolution; take a wider ``k`` and exact-re-rank the
    survivors against their float vectors when that matters (the
    :func:`pq_topk` contract).

    Metric note: PQ distances are L2 (:func:`pq_topk`), while IVF
    routing is direction-based — for COSINE semantics, L2-normalize the
    corpus before :func:`pq_encode` (and train the codebooks on the
    normalized vectors): on unit vectors L2 order is exactly reversed
    cosine order, so the composition ranks identically to
    :func:`cosine_topk`. Skipping the normalization silently mixes
    magnitude into the ranking."""
    cent = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(cent @ qn))[: int(n_probes)].tolist()
    if list_column not in df.columns:
        df = ivf_assign(df, cent, embedding_column, list_column)
    if code_column not in df.columns:
        df = pq_encode(df, model, embedding_column, code_column)
    probed = df.where(F.col(list_column).isin(probes))
    return pq_topk(
        probed, model, query, k=k,
        code_column=code_column, id_column=id_column,
    )
