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
    (or larger) blocklist: a broadcast nested-loop semi/anti join on
    ``array_contains(suffixes, entry)`` — still one corpus pass and no
    shuffle; per-row cost is linear in the blocklist size, so pass giant
    lists as a DataFrame deliberately. NULL values never match, so NULL
    rows survive the filter form; route them explicitly if a missing key
    should block.
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
        # map-only: inlined list, suffix membership in codegen, no join
        vocab = sorted({
            v.strip().lower().rstrip(".") for v in blocked if v and v.strip(".")
        })
        if not vocab:
            raise ValueError("domain blocklist is empty")
        lit = F.array(*[F.lit(w) for w in vocab])
        is_hit = F.coalesce(
            F.exists(suffixes, lambda s: F.array_contains(lit, s)), F.lit(False),
        )
        return df.where(~is_hit if anti else is_hit)

    # one corpus pass, broadcast nested-loop semi/anti: each row tests its
    # suffix array against the broadcast entries — no second scan of df,
    # no shuffle (the double-scan distinct/join formulation this replaces
    # read the corpus twice)
    if isinstance(blocked, DataFrame):
        bl = blocked.toDF("__bl")
    else:
        bl = df.sparkSession.createDataFrame([(v,) for v in blocked], "__bl string")
    bl = bl.select(_norm(F.col("__bl").cast("string")).alias("__bl")).distinct()
    return df.join(
        F.broadcast(bl), on=F.array_contains(suffixes, bl["__bl"]), how=how,
    )


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
    same NULL so the two methods are interchangeable on ANY input (an
    'auto' flip at the list-size cutoff must never change results).
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
        hits = (
            df.where(scored_row)
            .select(rid, F.explode(toks).alias("__tok"))
            .join(wtab, F.col("__tok") == F.col("__bw"), "inner")
            .groupBy(id_column)
            .agg(F.count(F.lit(1)).alias("__n_bad"))
        )
        out = df.join(hits, on=id_column, how="left").withColumn(
            "n_badword_tokens",
            F.when(scored_row, F.coalesce(F.col("__n_bad"), F.lit(0))),
        ).drop("__n_bad")
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
