"""Deduplication operators over document tables.

Scale design notes (the point of this module):

- **Exact dedup** is one hash aggregation: ``groupBy(md5(text))`` with
  ``min(doc_id)`` as the keeper. At 100 TB the shuffle key is the 32-byte
  digest, never the document body; AQE handles skew (identical boilerplate
  documents land in one reducer but only their ids travel).
- **MinHash + LSH** never computes all pairs: per-row signature expressions
  (no shuffle), then an equi-join on the *band key* so only same-bucket
  documents meet. Candidate pairs are then verified with true n-gram
  Jaccard. This is the standard shingle→minhash→band→bucket-join cascade.
- **SimHash** is a per-row 64-bit expression pipeline; near-dup candidates
  come from equality on rotated bit-blocks (again an equi-join).

MinHash here uses md5 as the hash family (seeded by an integer prefix) and
compares digests lexicographically — engine-portable (any SQL engine with
md5 reproduces it bit-for-bit) and uniform enough for Jaccard estimation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), TOKEN_SPLIT)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles: array of space-joined n-token windows.

    Built with transform over an index sequence — pure expression, no
    Python. Documents shorter than ``n`` tokens yield their full token
    string as the single shingle.
    """
    toks = _tokens(text)
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def minhash_expr(shingles: Column, seed: int) -> Column:
    """One MinHash value: lexicographic min of seeded md5 digests."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s))),
    )


def minhash_signatures(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    num_hashes: int = 8,
    shingle_size: int = 3,
) -> DataFrame:
    """Append ``mh_0..mh_{k-1}`` MinHash signature columns (per-row
    expressions only — scales linearly, no shuffle)."""
    sh = word_shingles(F.col(text_column), shingle_size)
    out = df.withColumn("__sh", sh)
    for i in range(num_hashes):
        out = out.withColumn(f"mh_{i}", minhash_expr(F.col("__sh"), i))
    return out.drop("__sh")


def minhash_lsh_pairs(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_size: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH.

    rows/bands hashes per band are concatenated into a band key; documents
    sharing ANY band key become a candidate pair. The only join is an
    equi-join on (band index, band key) — bucket-local, never all-pairs.
    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_column, id_column, num_hashes, shingle_size)
    band_cols = [
        F.concat_ws("#", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)])
        .alias(f"band_{b}")
        for b in range(bands)
    ]
    keyed = sigs.select(F.col(id_column), *band_cols)
    # long-form (band_idx, key) so one shuffle covers all bands; signatures
    # are computed ONCE (a self-join would evaluate the md5 pipeline twice)
    stacked = keyed.select(
        id_column,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("key"))
                for b in range(bands)
            ]),
        ).alias("bk"),
    ).select(id_column, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    return _bucket_pairs(stacked, ["band", "key"], id_column)


def _bucket_pairs(stacked: DataFrame, bucket_cols: list[str], id_column: str) -> DataFrame:
    """Distinct (id_a < id_b) pairs within each bucket: one groupBy shuffle
    + expression-level pair expansion over the sorted bucket-member array —
    no self-join, bucket-local quadratic cost only (LSH guarantees small
    buckets for any sane banding)."""
    ids = F.sort_array(F.collect_set(id_column)).alias("__ids")
    buckets = stacked.groupBy(*bucket_cols).agg(ids).where(F.size("__ids") > 1)
    a = F.col("__ids")
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(a) - 1),
            lambda i: F.transform(
                F.slice(a, i + 1, F.size(a)),
                lambda x: F.struct(
                    F.element_at(a, i).alias("id_a"), x.alias("id_b"),
                ),
            ),
        ),
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def ngram_jaccard(
    df_pairs: DataFrame,
    df_docs: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    shingle_size: int = 3,
) -> DataFrame:
    """True n-gram Jaccard for candidate pairs (the verify stage after LSH):
    broadcast-free — two equi-joins pull each side's shingle set, then
    ``array_intersect``/``array_union`` sizes give the similarity."""
    sh = df_docs.select(
        F.col(id_column),
        F.array_distinct(word_shingles(F.col(text_column), shingle_size)).alias("__sh"),
    )
    out = (
        df_pairs.join(sh.withColumnRenamed(id_column, "id_a").withColumnRenamed("__sh", "__sa"), "id_a")
        .join(sh.withColumnRenamed(id_column, "id_b").withColumnRenamed("__sh", "__sb"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("__sa", "__sb"))
            / F.size(F.array_union("__sa", "__sb")).cast("double"),
        )
        .drop("__sa", "__sb")
    )
    return out


def exact_dedup(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    keep: str = "min",
) -> DataFrame:
    """Exact deduplication by content digest: one row per distinct text with
    the kept id (min or max) and the duplicate count.

    groupBy on md5(text) — the 100 TB-safe form: the shuffle carries
    (digest, id), not document bodies.
    """
    if keep not in ("min", "max"):
        raise ValueError("keep must be 'min' or 'max'")
    agg = F.min(id_column) if keep == "min" else F.max(id_column)
    return (
        df.groupBy(F.md5(F.col(text_column)).alias("text_hash"))
        .agg(agg.alias("kept_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def exact_dedup_keep_rows(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> DataFrame:
    """Deduplicated full rows: keeps the min-id row per distinct text via a
    self-semi-join on (digest, min id) — avoids windowing over the corpus."""
    keepers = exact_dedup(df, text_column, id_column).select(
        F.col("kept_id").alias(id_column),
    )
    return df.join(keepers, on=id_column, how="left_semi")


def simhash(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Per-document SimHash: sign of the per-bit sum of token hash bits.

    Token hash = first 8 hex chars of md5 → 32-bit int (engine-portable);
    bit b contributes +1/-1. Pure expression pipeline: tokens → ints →
    per-bit votes via bitwise ops inside aggregate(). Returns ``simhash``
    as a ``bits``-length bit string (MSB first); near-dup candidates are
    documents whose simhash differs in few bits (compare via block equality
    joins, not pairwise distance).
    """
    if not 1 <= bits <= 32:
        raise ValueError("bits must be in [1, 32]")
    toks = _tokens(F.col(text_column))
    # 32-bit token hash from the md5 hex prefix (conv returns string)
    tok_hash = F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10).cast("bigint")
    hashed = df.withColumn("__th", F.transform(toks, lambda t: (
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
    )))
    _ = tok_hash  # doc: expression shown above; transform builds it per token
    def _vote_fn(b):
        # closure factory (default-arg lambdas break pyspark HOF arity)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1,
        ).otherwise(-1)

    bit_cols = []
    for b in range(bits):
        vote = F.aggregate(F.col("__th"), F.lit(0).cast("bigint"), _vote_fn(b))
        bit_cols.append(F.when(vote > 0, F.lit("1")).otherwise(F.lit("0")))
    out = hashed.withColumn("simhash", F.concat(*reversed(bit_cols))).drop("__th")
    return out
