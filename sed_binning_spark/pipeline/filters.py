"""Blocklist and badword filtering — the C4-style content gates.

Two distinct shapes, each with the right physical plan:

- :func:`filter_by_blocklist` — drop (or keep) rows whose KEY column
  (source, url domain, license tag) appears in a blocklist: one
  broadcast ``left_anti``/``left_semi`` join. The blocklist side is by
  definition tiny next to the corpus; the corpus side never shuffles.
- :func:`badword_stats` / :func:`filter_badwords` — the C4 "bad words"
  text gate: score every document by how much of it matches a word
  list. For list sizes that fit a literal array (the real-world case —
  C4's per-language lists are ~1-2k entries) the scan is MAP-ONLY:
  membership tests run inside codegen against an inlined array, no
  explode, no shuffle, and the filter decision pushes down with the
  scan. Above the literal cutoff the operator switches to
  explode + broadcast join + one ``groupBy(id)`` — same result, one
  shuffle of (id, int) rows.

Matching is on the dedup-family token stream (lowercased whitespace
tokens), so 'Word' and 'word' match the same list entry and the SQL twin
is the shared ``_TOKS_SQL`` tokenizer.

Reference: no sed-binning counterpart (LLM-curation extension surface);
semantics follow the C4 badwords filter (Raffel et al. 2020) and the
standard URL/domain blocklist pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sed_binning_spark.pipeline.dedup import _tokens

# above this the inlined-literal membership array stops being the right
# plan (expression-tree size, per-row linear scans) and the explode+join
# path takes over
LITERAL_WORDLIST_MAX = 512


def filter_by_blocklist(
    df: DataFrame,
    blocked: DataFrame | Sequence[str],
    column: str,
    keep: str = "unblocked",
    match: str = "exact",
) -> DataFrame:
    """Keep the rows whose ``column`` value is absent from (``keep=
    'unblocked'``, the filter form) or present in (``keep='blocked'``,
    the audit form) the blocklist.

    ``blocked`` is a one-column DataFrame or a plain sequence of values.
    ``match='exact'`` joins on the value itself; ``match='domain'``
    treats values as dotted hostnames and matches on ANY label suffix —
    blocking ``evil.com`` also blocks ``www.evil.com`` (the standard
    URL-blocklist semantics). Domain matching is case-folded and strips
    one trailing dot on both sides (the FQDN form ``evil.com.`` is the
    same host); exact mode matches the value verbatim.

    The corpus is scanned ONCE in every mode. Exact: one broadcast
    semi/anti join. Domain with a literal-sized sequence (≤
    ``LITERAL_WORDLIST_MAX``): the list is inlined and the suffix test
    runs in codegen — map-only, no join at all. Domain with a DataFrame
    (or larger) blocklist: one broadcast HASH equi-join per distinct
    label depth present in the blocklist (real domain lists have 2-3 —
    ``evil.com`` vs ``ads.evil.com``), each probing the row's
    same-depth suffix in O(1); per-row cost is independent of blocklist
    size, the corpus never shuffles, and a giant list costs only its
    broadcast. NULL values never match, so NULL rows survive the filter
    form; route them explicitly if a missing key should block. Both
    domain paths normalize entries identically (spaces trimmed, one
    trailing dot removed, case-folded, empties dropped), so the plan
    choice can never change results.
    """
    if column not in df.columns:
        raise ValueError(
            f"column {column!r} not in dataframe (columns: {df.columns})",
        )
    if keep not in ("unblocked", "blocked"):
        raise ValueError(f"keep must be 'unblocked' or 'blocked', got {keep!r}")
    if match not in ("exact", "domain"):
        raise ValueError(f"match must be 'exact' or 'domain', got {match!r}")
    if isinstance(blocked, DataFrame) and len(blocked.columns) != 1:
        raise ValueError(
            f"blocklist dataframe must have exactly one column, "
            f"got {blocked.columns}",
        )
    anti = keep == "unblocked"
    how = "left_anti" if anti else "left_semi"

    if match == "exact":
        if isinstance(blocked, DataFrame):
            bl = blocked.toDF("__bl").distinct()
        else:
            from pyspark.sql.types import StructField, StructType

            bl = df.sparkSession.createDataFrame(
                [(v,) for v in blocked],
                StructType([StructField("__bl", df.schema[column].dataType)]),
            ).distinct()
        # DataFrame-qualified right side: unambiguous even if df itself
        # carries a '__bl' column
        return df.join(F.broadcast(bl), on=df[column] == bl["__bl"], how=how)

    # domain mode: a host matches when any dot-suffix of its labels
    # equals a (normalized) blocklist entry; the suffix array is built
    # per row, bounded by the label count
    def _norm(c):
        return F.regexp_replace(F.lower(F.trim(c)), r"\.$", "")

    labels = F.split(_norm(df[column].cast("string")), r"\.")
    n_lab = F.size(labels)
    suffixes = F.transform(
        F.sequence(F.lit(1), n_lab),
        lambda i: F.array_join(F.slice(labels, n_lab - i + 1, i), "."),
    )

    if not isinstance(blocked, DataFrame) and len(blocked) <= LITERAL_WORDLIST_MAX:
        # map-only: inlined list, suffix membership in codegen, no join.
        # Normalization is the exact Python twin of _norm: trim SPACES
        # only (F.trim semantics, not str.strip's all-whitespace), fold
        # case, remove exactly ONE trailing dot, drop empties.
        vocab = set()
        for v in blocked:
            if v is None:
                continue
            w = str(v).strip(" ").lower()
            if w.endswith("."):
                w = w[:-1]
            if w:
                vocab.add(w)
        vocab = sorted(vocab)
        if not vocab:
            raise ValueError("domain blocklist is empty")
        lit = F.array(*[F.lit(w) for w in vocab])
        is_hit = F.coalesce(
            F.exists(suffixes, lambda s: F.array_contains(lit, s)), F.lit(False),
        )
        return df.where(~is_hit if anti else is_hit)

    # one corpus pass, one broadcast HASH equi-join per distinct label
    # depth in the blocklist: a host's depth-d suffix can only equal a
    # depth-d entry, so each join probes a hash table in O(1) — never a
    # BroadcastNestedLoopJoin scanning the whole list per row. The depth
    # probe aggregates only the (small) blocklist side at plan time; the
    # corpus never shuffles. Entries are distinct per depth, so the left
    # joins preserve row count exactly.
    if isinstance(blocked, DataFrame):
        bl = blocked.toDF("__bl")
    else:
        bl = df.sparkSession.createDataFrame([(v,) for v in blocked], "__bl string")
    bl = (
        bl.select(_norm(F.col("__bl").cast("string")).alias("__bl"))
        .where(F.col("__bl") != "")
        .distinct()
        .withColumn("__d", F.size(F.split(F.col("__bl"), r"\.")))
    )
    depths = sorted(r[0] for r in bl.select("__d").distinct().collect())
    if not depths:
        # the literal path raises on a list that normalizes to nothing; the
        # plan flip must not turn that into a silent match-nothing filter
        raise ValueError("domain blocklist is empty")
    if len(depths) > 64:
        raise ValueError(
            f"domain blocklist has {len(depths)} distinct label depths — "
            "not a hostname blocklist; use match='exact'",
        )
    joined = df
    hit_cols: list[str] = []
    for d in depths:
        sfx, key, mk = f"__sfx{d}", f"__blkey{d}", f"__blhit{d}"
        while sfx in joined.columns or key in joined.columns or mk in joined.columns:
            sfx, key, mk = "_" + sfx, "_" + key, "_" + mk
        bld = bl.where(F.col("__d") == d).select(
            F.col("__bl").alias(key), F.lit(True).alias(mk),
        )
        joined = (
            joined.withColumn(
                sfx,
                F.when(
                    n_lab >= d,
                    F.array_join(F.slice(labels, n_lab - d + 1, d), "."),
                ),
            )
            .join(F.broadcast(bld), on=F.col(sfx) == F.col(key), how="left")
            .drop(sfx, key)
        )
        hit_cols.append(mk)
    is_hit = F.coalesce(*[F.col(c) for c in hit_cols], F.lit(False))
    return joined.where(~is_hit if anti else is_hit).drop(*hit_cols)


def badword_stats(
    df: DataFrame,
    words: Sequence[str],
    text_column: str = "text",
    id_column: str = "doc_id",
    method: str = "auto",
) -> DataFrame:
    """Append the C4-style badword signals:

    - ``n_badword_tokens`` — occurrences of list words among the
      document's (lowercased) tokens;
    - ``badword_frac`` — that count over the token count (0.0 for a
      token-less document — no tokens, no evidence);

    NULL text yields NULL stats (the text-family convention), and so does
    a NULL id: the document grain is the id, and the join path cannot
    attribute counts to an unidentifiable row — the literal path pins the
    same NULL so the two methods agree row for row on every input they
    both accept. Duplicate ids break that: the join path's ``groupBy(id)``
    would credit each row with the id's COMBINED count, so it enforces the
    unique-id contract loudly (``raise_error`` via an id-only broadcast
    check, the pack_chunks posture) — an 'auto' flip at the list-size
    cutoff therefore either matches the literal result exactly or raises;
    it can never silently change scores.
    ``method='literal'`` inlines the (lowercased, deduplicated) list as
    an array literal — map-only, refused above ``LITERAL_WORDLIST_MAX``
    entries; ``'join'`` explodes tokens against a broadcast word table
    (one ``groupBy(id)`` shuffle of int rows); ``'auto'`` picks by list
    size.
    """
    for col, what in [(text_column, "text"), (id_column, "id")]:
        if col not in df.columns:
            raise ValueError(
                f"{what} column {col!r} not in dataframe (columns: {df.columns})",
            )
    if method not in ("auto", "literal", "join"):
        raise ValueError(
            f"method must be 'auto', 'literal' or 'join', got {method!r}",
        )
    vocab = sorted({w.lower() for w in words if w})
    if not vocab:
        raise ValueError("badword list is empty")
    if method == "auto":
        method = "literal" if len(vocab) <= LITERAL_WORDLIST_MAX else "join"
    if method == "literal" and len(vocab) > LITERAL_WORDLIST_MAX:
        raise ValueError(
            f"literal method refused for {len(vocab)} words "
            f"(> {LITERAL_WORDLIST_MAX}); use method='join'",
        )

    text = F.col(text_column)
    rid = F.col(id_column)
    toks = _tokens(text)
    n_toks = F.size(toks).cast("bigint")
    scored_row = text.isNotNull() & rid.isNotNull()

    if method == "literal":
        wl = F.array(*[F.lit(w) for w in vocab])
        n_bad = F.size(F.filter(toks, lambda t: F.array_contains(wl, t))).cast("bigint")
        out = df.withColumn(
            "n_badword_tokens", F.when(scored_row, n_bad),
        )
    else:
        spark = df.sparkSession
        wtab = F.broadcast(
            spark.createDataFrame([(w,) for w in vocab], "__bw string"),
        )
        # unique-id guard: groupBy(id) would credit each duplicate-id row
        # with the COMBINED count — raise instead of silently diverging
        # from the literal path. Id-only aggregation, limit()ed broadcast.
        from sed_binning_spark.pipeline.dedup import duplicate_id_frame

        dup_ids = duplicate_id_frame(df, id_column, "__n_dup")
        hits = (
            df.where(scored_row)
            .select(rid, F.explode(toks).alias("__tok"))
            .join(wtab, F.col("__tok") == F.col("__bw"), "inner")
            .groupBy(id_column)
            .agg(F.count(F.lit(1)).alias("__n_bad"))
        )
        out = (
            df.join(hits, on=id_column, how="left")
            .join(F.broadcast(dup_ids), on=id_column, how="left")
            .withColumn(
                "n_badword_tokens",
                F.when(
                    F.col("__n_dup").isNotNull(),
                    F.raise_error(
                        F.concat(
                            F.lit("badword_stats: duplicate document id "),
                            rid.cast("string"),
                            F.lit(" violates the unique-id contract of "
                                  "the join method"),
                        ),
                    ).cast("bigint"),
                ).when(scored_row, F.coalesce(F.col("__n_bad"), F.lit(0))),
            )
            .drop("__n_bad", "__n_dup")
        )
    return out.withColumn(
        "badword_frac",
        F.when(
            scored_row,
            F.coalesce(
                F.col("n_badword_tokens") / F.when(n_toks > 0, n_toks.cast("double")),
                F.lit(0.0),
            ),
        ),
    )


def filter_badwords(
    df: DataFrame,
    words: Sequence[str],
    text_column: str = "text",
    id_column: str = "doc_id",
    max_frac: float = 0.0,
    method: str = "auto",
) -> DataFrame:
    """Drop documents whose badword fraction exceeds ``max_frac`` (the C4
    default 0.0 = any hit blocks). Unscored rows pass — NULL text is not
    bad text and a NULL id has no attributable stats (identical under
    both methods); gate them elsewhere if needed."""
    if not 0.0 <= max_frac <= 1.0:
        raise ValueError(f"max_frac must be in [0, 1], got {max_frac}")
    scored = badword_stats(df, words, text_column, id_column, method=method)
    kept = scored.where(
        F.col("badword_frac").isNull()
        | (F.col("badword_frac") <= F.lit(float(max_frac))),
    )
    return kept.drop("n_badword_tokens", "badword_frac")
