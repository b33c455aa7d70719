"""Sequence packing: lay documents out into fixed-token-budget training
sequences (the "concat-and-chunk" step of an LLM pre-training pipeline).

Training consumes fixed-length sequences (e.g. 4096 tokens); documents
come in arbitrary lengths. The standard high-throughput layout is to
concatenate documents into one token stream and cut it every
``seq_tokens`` tokens — zero padding waste, documents may span a cut. At
100 TB a SINGLE stream is a global sort (one reducer owns the running
offset), so this module shards first:

- each document is hashed (:func:`~sed_binning_spark.core.dfops.
  hash_uniform`, domain ``"pack"``) onto one of ``n_shards`` independent
  streams — deterministic, layout/retry/engine-independent, uniform (so
  shard skew is O(sqrt) sampling noise, not data-dependent);
- each shard is packed independently: ONE shuffle (hash partition +
  in-shard sort by document id), after which every sequence boundary is a
  pure window cumulative sum — no running state, no driver loop;
- the output is a *manifest* — (shard, seq_id, doc slice) rows — not the
  materialized token arrays: the expensive token payload never shuffles,
  and a writer task can assemble the actual sequences for its shard by
  joining the manifest back to the token store partition-locally.

Determinism contract: document ids must be unique (the in-shard order is
``ORDER BY id``; a duplicate id would make the layout tie-dependent) —
:func:`pack_chunks` raises at execution time if the contract is violated.
Rows with a NULL id or a NULL/zero token count contribute nothing to any
stream and emit no manifest rows — an unidentifiable or empty document
has no position in a reproducible layout.

Reference: this operator has no counterpart in sed-binning (it is part of
the LLM-curation extension surface, like pipeline.dedup / pipeline.text);
the packing semantics follow the standard concat-and-chunk scheme of
GPT-style pre-training data loaders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sed_binning_spark.core.dfops import hash_uniform
from sed_binning_spark.pipeline.text import whitespace_tokens

PACK_DOMAIN = "pack"


def pack_chunks(
    df: DataFrame,
    seq_tokens: int,
    text_column: str = "text",
    id_column: str = "doc_id",
    token_column: str | None = None,
    n_shards: int = 32,
    seed: int = 0,
    order: str = "id",
) -> DataFrame:
    """Assign every document to its training-sequence slices.

    Returns the packing manifest, one row per (document, sequence it
    touches):

    - ``shard`` (int) — independent stream the document was hashed into;
    - ``seq_id`` (bigint) — sequence index within the shard; sequence
      ``s`` covers shard-stream tokens ``[s*seq_tokens, (s+1)*seq_tokens)``;
    - ``<id_column>`` — the document;
    - ``n_tokens`` (bigint) — the document's total token count;
    - ``slice_start`` / ``slice_len`` (bigint) — the token range OF THE
      DOCUMENT that lands in this sequence (0-based);
    - ``seq_offset`` (bigint) — where that slice starts WITHIN the
      sequence.

    ``token_column`` supplies a precomputed token count (the production
    path: real BPE counts from the tokenizer run); when absent, whitespace
    tokens of ``text_column`` are counted (engine-portable, used by the
    cross-engine oracle). ``seq_tokens`` is the fixed sequence budget;
    every sequence except the tail of each shard is exactly full.

    ``order`` lays each shard's token stream in ascending document id
    ("id", the default and the cross-engine oracle form) or in a seeded
    md5 order ("shuffled") — the globally-randomized document order
    training wants, at ZERO extra cost: the in-shard window sort runs
    either way and the shard hash already randomizes ACROSS shards, so
    flipping the sort key is the whole shuffle. Deterministic for a
    given (seed, ids) on any partition layout; hash ties break on id,
    and ``pack_sequences`` reassembles from offsets, order-independent.

    Scale: one shuffle (window over ``shard``); per-document output rows
    are bounded by ``ceil(n_tokens / seq_tokens) + 1``; nothing but ids
    and integer offsets ever moves.
    """
    if order not in ("id", "shuffled"):
        raise ValueError(f"order must be 'id' or 'shuffled', got {order!r}")
    if seq_tokens <= 0:
        raise ValueError(f"seq_tokens must be positive, got {seq_tokens}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if id_column not in df.columns:
        raise ValueError(
            f"id column {id_column!r} not in dataframe (columns: {df.columns})",
        )
    if token_column is not None:
        if token_column not in df.columns:
            raise ValueError(
                f"token column {token_column!r} not in dataframe "
                f"(columns: {df.columns})",
            )
        n_tok = F.col(token_column).cast("bigint")
    else:
        if text_column not in df.columns:
            raise ValueError(
                f"text column {text_column!r} not in dataframe "
                f"(columns: {df.columns})",
            )
        n_tok = F.size(whitespace_tokens(F.col(text_column))).cast("bigint")

    shard = F.floor(
        hash_uniform(df, [id_column], seed, PACK_DOMAIN) * F.lit(int(n_shards)),
    ).cast("int")
    docs = (
        df.select(
            F.col(id_column),
            n_tok.alias("n_tokens"),
            shard.alias("shard"),
        )
        # NULL id -> NULL draw -> no reproducible position; empty docs
        # occupy zero stream tokens and would only emit degenerate slices
        .where(F.col("shard").isNotNull() & (F.col("n_tokens") > 0))
    )

    # ROWS frame pinned explicitly: the default RANGE frame would give tied
    # rows (duplicate ids) identical cumulative sums — silently overlapping
    # slices — and diverge from the DuckDB twin's ROWS formulation
    order_keys = [id_column]
    if order == "shuffled":
        docs = docs.withColumn(
            "__okey",
            hash_uniform(docs, [id_column], seed, "pack-order"),
        )
        order_keys = ["__okey", id_column]
    w = (
        Window.partitionBy("shard")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # loud guard for the unique-id contract: duplicate ids make the in-shard
    # order tie-dependent (an irreproducible layout), so fail instead of
    # corrupting it; same (shard)-clustering, so no extra shuffle
    n_same = F.count(F.lit(1)).over(Window.partitionBy("shard", id_column))
    cum = F.when(n_same == 1, F.sum("n_tokens").over(w)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("pack_chunks: duplicate document id "),
                F.col(id_column).cast("string"),
                F.lit(" violates the unique-id layout contract"),
            ),
        ).cast("bigint"),
    )
    laid = docs.select(
        "shard",
        id_column,
        "n_tokens",
        (cum - F.col("n_tokens")).alias("start"),
        cum.alias("end"),
    )

    budget = F.lit(int(seq_tokens))
    seq = F.col("seq_id")
    seq_lo = seq * budget  # first stream token of this sequence
    overlap_lo = F.greatest(F.col("start"), seq_lo)
    overlap_hi = F.least(F.col("end"), seq_lo + budget)
    return (
        laid.select(
            "shard",
            id_column,
            "n_tokens",
            "start",
            "end",
            F.explode(
                F.sequence(
                    F.floor(F.col("start") / budget),
                    F.floor((F.col("end") - 1) / budget),
                ),
            ).alias("seq_id"),
        )
        .select(
            "shard",
            seq.cast("bigint").alias("seq_id"),
            id_column,
            "n_tokens",
            (overlap_lo - F.col("start")).cast("bigint").alias("slice_start"),
            (overlap_hi - overlap_lo).cast("bigint").alias("slice_len"),
            (overlap_lo - seq_lo).cast("bigint").alias("seq_offset"),
        )
    )


def pack_stats(manifest: DataFrame, seq_tokens: int) -> DataFrame:
    """Per-sequence fill accounting over a :func:`pack_chunks` manifest:
    ``(shard, seq_id, n_docs, filled_tokens, fill_ratio)``. Every sequence
    except each shard's tail should report ``fill_ratio = 1.0`` — the
    invariant a packing regression test pins."""
    if seq_tokens <= 0:
        raise ValueError(f"seq_tokens must be positive, got {seq_tokens}")
    return manifest.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("slice_len").alias("filled_tokens"),
        (F.sum("slice_len") / F.lit(float(seq_tokens))).alias("fill_ratio"),
    )


def pack_sequences(
    manifest: DataFrame,
    docs: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    token_array_column: str | None = None,
    check_unique_ids: bool = True,
) -> DataFrame:
    """Assemble the actual training sequences from a :func:`pack_chunks`
    manifest — the "writer" half of concat-and-chunk:
    ``(shard, seq_id, tokens, n_docs, n_tokens)``, one row per sequence,
    ``tokens`` being the documents' slices concatenated in stream order.

    ``token_array_column`` names a real tokenizer's output
    (``array<...>``) on ``docs``; when absent the whitespace tokens of
    ``text_column`` are used — which is exactly the count
    :func:`pack_chunks` laid out with, so every slice lands in bounds.
    With a custom token array, pass the SAME tokenization to BOTH calls
    (via ``token_column``) — the manifest's offsets are only meaningful
    against the counts they were computed from.

    Scale: the token payload moves exactly twice and only where it must —
    one id-keyed equi-join attaching each document's tokens to its
    manifest rows (a document spans ≤ ``ceil(n/seq_tokens)+1`` sequences,
    and ``slice()`` cuts the array BEFORE the next shuffle, so a document
    crossing a boundary ships each token once, not per-sequence), then
    one ``groupBy(shard, seq_id)`` whose sorted ``collect_list`` rebuilds
    the sequence deterministically on any layout. No window, no driver
    state; sequence rows are bounded by ``seq_tokens`` elements each.

    ``check_unique_ids=False`` skips the duplicate-id guard — an id-only
    aggregation over ``docs`` plus a broadcast join — for pipelines that
    have already validated id uniqueness upstream (e.g. a nightly rerun
    after :func:`pack_chunks`, whose own guard raised on the same
    contract). The default stays loud. The tokenization-mismatch guard
    (token array length ≠ the manifest's ``n_tokens``, in EITHER
    direction) is row-local and always on.
    """
    for col, what, frame in [
        (id_column, "id", manifest),
        ("slice_start", "slice_start", manifest),
        ("n_tokens", "n_tokens", manifest),
        (id_column, "id", docs),
    ]:
        if col not in frame.columns:
            raise ValueError(
                f"{what} column {col!r} not in dataframe (columns: {frame.columns})",
            )
    if token_array_column is not None:
        if token_array_column not in docs.columns:
            raise ValueError(
                f"token array column {token_array_column!r} not in dataframe "
                f"(columns: {docs.columns})",
            )
        toks = F.col(token_array_column)
    else:
        if text_column not in docs.columns:
            raise ValueError(
                f"text column {text_column!r} not in dataframe "
                f"(columns: {docs.columns})",
            )
        toks = whitespace_tokens(F.col(text_column))

    token_side = docs.select(F.col(id_column), toks.alias("__toks"))
    tok_type = token_side.schema["__toks"].dataType.simpleString()
    # loud guards (the pack_chunks posture — corrupt training sequences
    # must never ship silently): a manifest doc missing from `docs` would
    # leave a hole, a duplicate id would duplicate its slice, a token
    # array whose length differs from the laid-out n_tokens — in EITHER
    # direction: shorter silently clamps, longer silently drops the
    # document's tail — means a different tokenization reached the two
    # calls, and a slice the array cannot fully serve (an internally
    # inconsistent or NULL-n_tokens manifest row that the length check
    # alone would miss) would ship a clipped sequence. The dup check is an
    # id-only aggregation broadcast back (limit()ed so a
    # pervasively-duplicated corpus fails by raising, not by OOMing the
    # broadcast); the others are row-local. The length comparison is
    # null-SAFE so a NULL n_tokens raises instead of skipping both
    # branches.
    # slice() is 1-based; the manifest's slice_start is 0-based
    cut = F.slice(
        F.col("__toks"),
        (F.col("slice_start") + 1).cast("int"),
        F.col("slice_len").cast("int"),
    )
    checked = F.when(
        F.col("__toks").isNull(),
        F.raise_error(
            F.concat(
                F.lit("pack_sequences: document "),
                F.col(id_column).cast("string"),
                F.lit(" is in the manifest but missing from docs "
                      "(or has NULL tokens)"),
            ),
        ).cast(tok_type),
    ).when(
        ~F.size(F.col("__toks")).cast("bigint").eqNullSafe(F.col("n_tokens")),
        F.raise_error(
            F.concat(
                F.lit("pack_sequences: document "),
                F.col(id_column).cast("string"),
                F.lit(" token array length does not match the manifest's "
                      "n_tokens layout — pass the SAME tokenization to "
                      "pack_chunks and pack_sequences"),
            ),
        ).cast(tok_type),
    ).when(
        F.size(cut).cast("bigint") != F.col("slice_len"),
        F.raise_error(
            F.concat(
                F.lit("pack_sequences: document "),
                F.col(id_column).cast("string"),
                F.lit(" manifest slice is out of the token array's bounds "
                      "(inconsistent slice_start/slice_len/n_tokens row)"),
            ),
        ).cast(tok_type),
    ).otherwise(cut)
    if check_unique_ids:
        from sed_binning_spark.pipeline.dedup import duplicate_id_frame

        dup_ids = duplicate_id_frame(token_side, id_column)
        checked = F.when(
            F.col("__n_rows").isNotNull(),
            F.raise_error(
                F.concat(
                    F.lit("pack_sequences: duplicate document id "),
                    F.col(id_column).cast("string"),
                    F.lit(" in docs"),
                ),
            ).cast(tok_type),
        ).otherwise(checked)
    joined = manifest.join(token_side, on=id_column, how="left")
    if check_unique_ids:
        joined = joined.join(F.broadcast(dup_ids), on=id_column, how="left")
    sliced = joined.select(
        "shard", "seq_id", "seq_offset", checked.alias("__slice"),
    )
    return (
        sliced.groupBy("shard", "seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seq_offset", "__slice"))),
                    lambda s: s["__slice"],
                ),
            ).alias("tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            "shard",
            "seq_id",
            "tokens",
            "n_docs",
            F.size("tokens").cast("bigint").alias("n_tokens"),
        )
    )
