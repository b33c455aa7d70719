"""Text analysis operators: token counting, quality stats, language ID,
document fingerprinting.

All pure Catalyst expressions (regex split / transform / aggregate) — the
whole module stays in whole-stage codegen, so throughput is scan-bound at
any scale. Every operator is engine-portable (the DuckDB oracle reproduces
it exactly): no engine-specific hash functions in checked outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# THE whitespace class, spelled explicitly: identical to Java regex \s,
# but RE2 (DuckDB) \s EXCLUDES \x0B — every tokenizer and its SQL twin
# must use this class, never \s, or the two engines tokenize
# vertical-tab documents differently.
WHITESPACE_CLASS = " \t\n\x0B\f\r"

# BPE-ish tokenization: word pieces OR single non-space punctuation — the
# standard pre-tokenizer shape (letters/digits runs split from punctuation).
BPE_TOKEN_RE = rf"[A-Za-z0-9_]+|[^A-Za-z0-9_{WHITESPACE_CLASS}]"

# Tiny high-frequency stopword lists for the n-gram/stopword language
# heuristic. Deliberately small: the heuristic is a ratio detector, not a
# classifier; extend per deployment.
# dict order is the tie-break priority (first entry wins a tied score)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "los", "las", "y", "es", "en", "por", "con", "para", "del"],
    "it": ["il", "lo", "gli", "di", "che", "per", "della", "sono", "una", "anche"],
    "pt": ["o", "os", "as", "um", "uma", "com", "para", "por", "dos", "mais"],
}


def whitespace_tokens(text: Column) -> Column:
    # split('') yields [''] — strip the empty token so a blank/whitespace
    # document counts ZERO tokens (quality filters keyed on token counts
    # would otherwise see a 1-token document)
    return F.array_remove(F.split(F.trim(text), f"[{WHITESPACE_CLASS}]+"), "")


def bpe_tokens(text: Column) -> Column:
    """Tokens under the BPE-ish pre-tokenizer regex."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)


def shifted_zip_fold(arr, n: int, combine):
    """Fold each length-``n`` forward window of ``arr`` into one value at
    the window's start position, via ``n-1`` element-wise ``zip_with``s
    against shifted copies — whole-array projection-level ops, never a
    per-window slice inside a lambda (the HOF-recompute/allocation
    antipattern; see SCALE.md). ``combine(a, b)`` merges the accumulator
    with the j-shifted element; ``zip_with`` pads the shorter shifted
    side with NULL, and the NULL branch keeps ``a``, which reproduces the
    partial trailing windows — callers slice the result to the window
    count they want (dropping or keeping partials). Shared by
    ``dedup.word_shingles`` (concat) and ``winnow_fingerprints``
    (least)."""
    acc = arr
    for j in range(1, n):
        shifted = F.slice(arr, j + 1, F.greatest(F.size(arr) - F.lit(j), F.lit(0)))
        acc = F.zip_with(
            acc, shifted,
            lambda a, b: F.when(b.isNull(), a).otherwise(combine(a, b)),
        )
    return acc


# ------------------------------------------------------- Rabin-Karp hashing

# Double 31-bit polynomial rolling hash: two independent tracks, each a
# left fold H = (...((h_0*B + h_1)*B + h_2)...) mod M over per-TOKEN hash
# residues, combined into one 62-bit value (track1 * 2^31 + track2).
# 31-bit moduli keep every product a*B < 2^62 inside checked BIGINT
# arithmetic in BOTH engines (DuckDB raises on 64-bit overflow); the
# combined 62 bits match the xxhash64 collision profile — the throughput
# alternative to per-window md5 (which stays the collision-audited
# default for exactness gates; see dedup.dedup_substrings).
RK_MOD1 = 2147483647  # 2^31 - 1 (Mersenne prime)
RK_MOD2 = 2147483629  # 2^31 - 19 (prime)
RK_BASE1 = 1000003
RK_BASE2 = 1000033
_RK_COMBINE = 2147483648  # 2^31: track1 * this + track2 < 2^62


def _rk_token_residues(md5s: Column, track: int) -> Column:
    """Per-token residue array for one track, from ONE md5 digest per
    token: hex chars 1-13 mod RK_MOD1 (track 1) or 14-26 mod RK_MOD2
    (track 2) — 13 hex chars = 52 bits, the cross-engine-portable bigint
    width; the two slices are independent bits of the same digest, so one
    digest feeds both tracks."""
    start, mod = (1, RK_MOD1) if track == 1 else (14, RK_MOD2)
    return F.transform(
        md5s,
        lambda m: F.conv(F.substring(m, start, 13), 16, 10).cast("long") % mod,
    )


def _rk_zip(left: Column, right: Column, shift: int, block: int, track: int) -> Column:
    """One doubling/combine step on one track's primitive bigint array:
    entry j of the result hashes the concatenation of left's window at j
    with right's ``block``-token window starting ``shift`` tokens later —
    ``(H_left * B^block + H_right) mod M``. ``zip_with`` NULL-pads the
    shorter shifted side and NULL propagates through the arithmetic, so
    entries whose window runs past the end come out NULL (sliced off by
    the caller). Primitive long arrays, not struct<a,b> arrays: struct
    element allocation and per-layer UnsafeArrayData serialization
    measured ~15% slower than two primitive-track zips."""
    base, mod = (RK_BASE1, RK_MOD1) if track == 1 else (RK_BASE2, RK_MOD2)
    p = pow(base, block, mod)
    shifted = F.slice(right, shift + 1, F.greatest(F.size(right) - shift, F.lit(0)))
    return F.zip_with(left, shifted, lambda x, y: (x * p + y) % mod)


def rk_window_hashes(
    df: DataFrame,
    token_column: str,
    out_column: str,
    window: int,
) -> DataFrame:
    """Rabin-Karp rolling hash of every ``window``-token span of
    ``token_column`` — the O(n + n·log w) replacement for hashing each
    window from scratch (md5-per-window is O(n·w) digest bytes and was
    the measured dominant cost of the substring/winnow family; see
    SCALE.md). One md5 per TOKEN, then binary-doubling ``zip_with`` folds:
    level k holds the hash of every k-token window, level 2k is one
    element-wise combine of level k with its k-shifted self, and the
    final width assembles from ``window``'s set bits — O(log w) whole-array
    zips total, each a multiply-add-mod per element.

    Appends ``out_column`` (``array<bigint>``): entry j = the 62-bit
    combined hash of tokens [j, j+window); documents with fewer than
    ``window`` tokens get an EMPTY array (the dedup-family "no windows"
    shape — wrap with a NULL guard where token-less docs must stay NULL).
    The value is engine-portable: the DuckDB twin
    (:func:`sed_binning_spark.sqlgen.rk_window_hashes_sql`) computes the
    identical polynomial with a per-window left fold.

    Two data-flow rules keep the layer stack cheap (each measured on the
    2M-doc SCALE.md corpus):

    - Each doubling level materializes as a temp COLUMN, not a nested
      expression: expression-level chaining would duplicate the whole
      tree once per level (levels reference their input twice —
      accumulator and shifted copy), while a column referenced >= 2
      times survives CollapseProject (see SCALE.md's HOF-recompute
      notes).
    - NOTHING after the first layer references the token (or md5) array:
      the final slice sizes itself on the level-1 residue column, so
      column pruning drops the ~1 KB-per-row token strings after one
      layer instead of serializing them through every level's UnsafeRow
      (measured 6x: 15.5 s -> 2.4 s for the 500k-doc occurrence frame).
    """
    w = int(window)
    if w < 1:
        raise ValueError(f"window must be >= 1 token, got {window}")
    if token_column not in df.columns:
        raise ValueError(
            f"token column {token_column!r} not in dataframe "
            f"(columns: {df.columns})",
        )
    pre = "__rk"
    while any(c.startswith(pre) for c in df.columns):
        pre = "_" + pre
    # one md5 per token, dead (pruned) after the residue layer; the
    # residue arrays are primitive longs from here on
    temps = [f"{pre}_m"]
    df = df.withColumn(f"{pre}_m", F.transform(F.col(token_column), F.md5))
    for t in (1, 2):
        temps.append(f"{pre}_t{t}_1")
        df = df.withColumn(
            f"{pre}_t{t}_1", _rk_token_residues(F.col(f"{pre}_m"), t),
        )
    levels = {1: f"{pre}_t{{t}}_1"}
    k = 1
    while k * 2 <= w:
        for t in (1, 2):
            temps.append(f"{pre}_t{t}_{k * 2}")
            df = df.withColumn(
                f"{pre}_t{t}_{k * 2}",
                _rk_zip(
                    F.col(levels[k].format(t=t)),
                    F.col(levels[k].format(t=t)), k, k, t,
                ),
            )
        k *= 2
        levels[k] = f"{pre}_t{{t}}_{k}"
    bits = [1 << i for i in range(w.bit_length()) if w >> i & 1][::-1]
    acc_name, covered = levels[bits[0]], bits[0]
    for b in bits[1:]:
        nxt = f"{pre}_t{{t}}_c{covered + b}"
        for t in (1, 2):
            temps.append(nxt.format(t=t))
            df = df.withColumn(
                nxt.format(t=t),
                _rk_zip(
                    F.col(acc_name.format(t=t)),
                    F.col(levels[b].format(t=t)), covered, b, t,
                ),
            )
        covered += b
        acc_name = nxt
    n = F.size(F.col(levels[1].format(t=1)))
    valid = F.greatest(n - (w - 1), F.lit(0))
    out = F.when(
        n >= w,
        F.zip_with(
            F.slice(F.col(acc_name.format(t=1)), 1, valid),
            F.slice(F.col(acc_name.format(t=2)), 1, valid),
            lambda a, b: a * F.lit(_RK_COMBINE) + b,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return df.withColumn(out_column, out).drop(*temps)


def _rk_whole_doc_hash(tk: Column) -> Column:
    """62-bit Rabin-Karp hash of the WHOLE token array — one scalar
    ``F.aggregate`` left fold (O(n), scalar accumulator, no array
    copying). Equals :func:`rk_window_hashes` with ``window=len(tk)``:
    the fold seeds at 0 and ``0·B + h_0 = h_0``, so the leading zero
    vanishes and both forms compute the identical polynomial."""
    init = F.struct(
        F.lit(0).cast("long").alias("a"), F.lit(0).cast("long").alias("b"),
    )
    folded = F.aggregate(
        F.transform(tk, F.md5), init,
        lambda acc, m: F.struct(
            ((acc["a"] * RK_BASE1
              + F.conv(F.substring(m, 1, 13), 16, 10).cast("long") % RK_MOD1)
             % RK_MOD1).alias("a"),
            ((acc["b"] * RK_BASE2
              + F.conv(F.substring(m, 14, 13), 16, 10).cast("long") % RK_MOD2)
             % RK_MOD2).alias("b"),
        ),
    )
    return folded["a"] * F.lit(_RK_COMBINE) + folded["b"]


def _rk_hash_sequence(
    df: DataFrame,
    token_column: str,
    out_column: str,
    window: int,
) -> DataFrame:
    """Winnow-family rolling-hash sequence: :func:`rk_window_hashes` for
    documents with >= ``window`` tokens, and the single whole-document
    partial window for shorter non-empty documents — the same
    partial-window rule the md5 path applies (``k = max(n - w + 1, 1)``),
    so short documents still fingerprint. Token-less documents get NULL.

    The token count and the partial whole-document hash are captured as
    FIRST-layer columns (the partial fold under a ``when()``, so it only
    runs for sub-window rows): nothing after layer 1 references the token
    array, which lets column pruning drop the ~1 KB-per-row strings
    before the zip layers instead of serializing them through every one
    (the same data-flow rule :func:`rk_window_hashes` documents)."""
    strict, n_col, part = "__rks", "__rks_n", "__rks_p"
    while any(c in df.columns for c in (strict, n_col, part)):
        strict, n_col, part = "_" + strict, "_" + n_col, "_" + part
    tk = F.col(token_column)
    w = int(window)
    df = df.withColumn(n_col, F.size(tk)).withColumn(
        part,
        F.when(
            (F.size(tk) > 0) & (F.size(tk) < w), _rk_whole_doc_hash(tk),
        ),
    )
    df = rk_window_hashes(df, token_column, strict, window)
    n = F.col(n_col)
    return df.withColumn(
        out_column,
        F.when(n >= w, F.col(strict)).when(n > 0, F.array(F.col(part))),
    ).drop(strict, n_col, part)


def text_stats(
    df: DataFrame,
    text_column: str = "text",
) -> DataFrame:
    """Quality-scoring statistics per document:

    - ``n_chars``/``n_ws_tokens``/``n_bpe_tokens`` — length and token counts
    - ``mean_token_len`` — characters per whitespace token
    - ``punct_ratio`` — punctuation chars / chars
    - ``stopword_ratio`` — English stopword tokens / tokens
    - ``uniq_token_ratio`` — distinct/total whitespace tokens (repetition
      detector)
    """
    t = F.col(text_column)
    ws = whitespace_tokens(t)
    stop = STOPWORDS["en"]

    # size() of a NULL array is ANSI-dependent (-1 under the legacy
    # non-ANSI setting, NULL under ANSI) — pin the NULL-in-NULL-out
    # semantics explicitly so counts don't flip to -1 if a session runs
    # with ANSI disabled
    def _size(arr: Column) -> Column:
        return F.when(arr.isNotNull(), F.size(arr))

    # NULL-guarded denominators: blank documents have 0 tokens/chars, and
    # under ANSI mode a bare /0 would abort the whole job — their ratios
    # are NULL (undefined), not a crash
    n_ws = F.nullif(_size(ws).cast("double"), F.lit(0.0))
    n_ch = F.nullif(F.length(t).cast("double"), F.lit(0))
    return df.withColumns({
        "n_chars": F.length(t),
        "n_ws_tokens": _size(ws),
        # regexp_count, NOT size(regexp_extract_all(...)): the counts are
        # identical (same non-overlapping match walk) but extract_all
        # materializes an array of every match just to throw it away
        "n_bpe_tokens": F.regexp_count(t, F.lit(BPE_TOKEN_RE)),
        "mean_token_len": F.length(F.regexp_replace(t, f"[{WHITESPACE_CLASS}]+", "")) / n_ws,
        "punct_ratio": F.regexp_count(
            t, F.lit(f"[^A-Za-z0-9_{WHITESPACE_CLASS}]"),
        ) / n_ch,
        "stopword_ratio": F.size(F.filter(F.transform(ws, F.lower), lambda x: x.isin(*stop)))
        / n_ws,
        "uniq_token_ratio": F.size(F.array_distinct(ws)) / n_ws,
    })


def quality_score(
    df: DataFrame,
    text_column: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    mean_token_len_range: tuple[float, float] = (3.0, 10.0),
    max_punct_ratio: float = 0.2,
    min_stopword_ratio: float = 0.01,
    min_uniq_token_ratio: float = 0.45,
    keep_threshold: float = 0.8,
) -> DataFrame:
    """Gopher-style document quality score: five heuristic rules over the
    :func:`text_stats` statistics (token-count window, mean token length,
    punctuation density, stopword presence, repetition), each worth 1/5 of
    ``quality`` ∈ [0, 1]; ``keep`` is ``quality >= keep_threshold``.

    A rule whose statistic is undefined (NULL/blank document → NULL ratio)
    FAILS rather than propagating NULL — an empty document must never be
    kept by a filter keyed on this flag. Pure Column expressions, stays in
    whole-stage codegen; at 100 TB this is a map-only pass with the text
    column pruned to one scan."""
    stats = text_stats(df, text_column=text_column)
    lo_mtl, hi_mtl = mean_token_len_range
    rules = [
        F.col("n_ws_tokens").between(min_tokens, max_tokens),
        F.col("mean_token_len").between(lo_mtl, hi_mtl),
        F.col("punct_ratio") <= max_punct_ratio,
        F.col("stopword_ratio") >= min_stopword_ratio,
        F.col("uniq_token_ratio") >= min_uniq_token_ratio,
    ]
    score = sum(
        (F.coalesce(r, F.lit(False)).cast("int") for r in rules), F.lit(0),
    ) / float(len(rules))
    stats = stats.withColumn("quality", score)
    return stats.withColumn("keep", F.col("quality") >= keep_threshold)


def language_id(
    df: DataFrame,
    text_column: str = "text",
    lang_column: str = "lang_pred",
) -> DataFrame:
    """Stopword-ratio language ID over the configured languages: the
    language whose stopword list covers the most tokens wins; ties and
    zero-evidence rows fall back to 'und' (undetermined)."""
    toks = F.transform(whitespace_tokens(F.col(text_column)), F.lower)

    def _in_list(ws):
        # closure factory: a default-arg lambda would be mis-read by
        # pyspark's higher-order-function arity inspection
        return lambda x: x.isin(*ws)

    scores = {
        lang: F.size(F.filter(toks, _in_list(ws))) for lang, ws in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # deterministic priority order on ties: en > de > fr (dict order)
    for lang in reversed(list(scores)):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return df.withColumn(lang_column, pred)


def document_fingerprint(
    df: DataFrame,
    text_column: str = "text",
    fingerprint_column: str = "fingerprint",
    normalized: bool = True,
) -> DataFrame:
    """Content fingerprint: md5 of the whitespace-normalized lowercased
    text (normalized=True) or of the raw text. The normalized form makes
    whitespace/case-variant copies collide — the standard first pass before
    fuzzy dedup."""
    t = F.col(text_column)
    if not normalized:
        return df.withColumn(fingerprint_column, F.md5(t))  # md5(NULL) = NULL
    # whitespace_tokens strips empty tokens (a leading '\n' must not change
    # the fingerprint); NULL/blank documents have no content to fingerprint
    # and get NULL — concat_ws would otherwise silently turn NULL text into
    # md5(''), making every missing document "identical"
    toks = whitespace_tokens(F.lower(t))
    return df.withColumn(
        fingerprint_column,
        F.when(F.size(toks) > 0, F.md5(F.concat_ws(" ", toks))),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_column: str = "text",
    shingle_window: int = 5,
    winnow_window: int = 4,
    out_column: str = "winnowed",
    hash_function: str = "md5",
) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken): keep the minimum rolling hash
    of every ``winnow_window``-length window over the shingle-hash
    sequence, deduplicated — the standard sublinear fingerprint set that
    guarantees any shared run of ``shingle_window + winnow_window - 1``
    tokens between two documents yields at least one common fingerprint.

    Pure expression pipeline over :func:`rolling_hashes`' spans (array HOFs
    only); output is the sorted distinct fingerprint array.

    ``hash_function="md5"`` (default) yields hex-string fingerprints;
    ``"rolling"`` routes the shingle hashing through the Rabin-Karp path
    (:func:`rk_window_hashes` — one md5 per token, O(log w) zips) and
    yields 62-bit BIGINT fingerprints. Winnowing's min-per-window and
    the shared-run guarantee are hash-value-agnostic, so both forms are
    valid winnow fingerprints — they just don't mix across corpora.
    """
    if shingle_window < 1 or winnow_window < 1:
        raise ValueError(
            f"shingle_window and winnow_window must be >= 1, got "
            f"{shingle_window} and {winnow_window}",
        )
    if hash_function not in ("md5", "rolling"):
        raise ValueError(
            f"hash_function must be 'md5' or 'rolling', got {hash_function!r}",
        )
    # tokens AND the hash sequence materialize as columns before the
    # per-window lambdas: an expression referenced inside a higher-order
    # lambda re-evaluates per ELEMENT, so the un-materialized form
    # re-split the text per shingle and re-hashed the whole sequence per
    # winnow window (O(n^2) md5 calls)
    tmp_t, tmp_h = "__wn_tk", "__wn_h"
    while tmp_t in df.columns or tmp_h in df.columns:
        tmp_t, tmp_h = "_" + tmp_t, "_" + tmp_h
    toks = F.col(tmp_t)
    k = F.greatest(F.size(toks) - F.lit(shingle_window - 1), F.lit(1))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    hashes = F.col(tmp_h)
    n_win = F.greatest(F.size(hashes) - F.lit(winnow_window - 1), F.lit(1))
    # min-per-window via shifted element-wise least() zips (measured
    # 35 s -> 24 s on 2M docs vs per-window slices); the final slice
    # drops the partial trailing windows except the
    # fewer-hashes-than-window single window
    mins = F.slice(shifted_zip_fold(hashes, winnow_window, F.least), 1, n_win)
    df = df.withColumn(tmp_t, whitespace_tokens(F.lower(F.col(text_column))))
    if hash_function == "rolling":
        df = _rk_hash_sequence(df, tmp_t, tmp_h, shingle_window)
    else:
        df = df.withColumn(tmp_h, F.transform(
            idx,
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, shingle_window))),
        ))
    # token-less (NULL/blank) documents have no fingerprints: NULL, not a
    # shared [md5('')] that would pair every empty document with every
    # other in a fingerprint-overlap similarity join — the same guard
    # rolling_hashes pins. The rolling hash sequence already encodes
    # token-less as NULL, so its guard reads the HASH column — keeping
    # the token array out of every post-layer projection (the
    # rk_window_hashes payload-pruning rule); the md5 path's hashes are
    # never NULL, so it guards on the token count directly.
    guard = hashes.isNotNull() if hash_function == "rolling" else F.size(toks) > 0
    return (
        df.withColumn(
            out_column,
            F.when(guard, F.array_sort(F.array_distinct(mins))),
        )
        .drop(tmp_t, tmp_h)
    )


def rolling_hashes(
    df: DataFrame,
    text_column: str = "text",
    window: int = 5,
    out_column: str = "rolling_hashes",
    hash_function: str = "md5",
) -> DataFrame:
    """Winnowing-style rolling fingerprints: a hash of each ``window``-token
    span (the shingle-hash sequence used for local-similarity detection).
    Per-row expression; downstream winnowing (:func:`winnow_fingerprints`)
    composes with array HOFs. Documents shorter than ``window`` tokens
    yield ONE partial whole-document window; token-less documents yield
    NULL.

    ``hash_function="md5"`` (default) digests each span from scratch —
    32-hex-char fingerprints, O(n·w) digest bytes. ``"rolling"`` is the
    Rabin-Karp path (:func:`rk_window_hashes`): 62-bit BIGINT
    fingerprints from one md5 per token plus O(log w) whole-array
    multiply-add-mod zips — the throughput choice for large windows, with
    an exact DuckDB twin (:func:`~sed_binning_spark.sqlgen.
    rk_window_hashes_sql`)."""
    if hash_function not in ("md5", "rolling"):
        raise ValueError(
            f"hash_function must be 'md5' or 'rolling', got {hash_function!r}",
        )
    tmp = "__rh_tk"
    while tmp in df.columns:
        tmp = "_" + tmp
    # tokens materialize as a column BEFORE the per-window lambda: slicing
    # the tokenizer expression inside the lambda re-splits the text once
    # per window (the word_shingles docstring's measured antipattern)
    df = df.withColumn(tmp, whitespace_tokens(F.lower(F.col(text_column))))
    if hash_function == "rolling":
        return _rk_hash_sequence(df, tmp, out_column, window).drop(tmp)
    toks = F.col(tmp)
    k = F.greatest(F.size(toks) - F.lit(window - 1), F.lit(1))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    return df.withColumn(
        out_column,
        # token-less (NULL/blank) documents have no windows: NULL, not a
        # single md5('') hash that would collide every empty document
        F.when(
            F.size(toks) > 0,
            F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, window)))),
        ),
    ).drop(tmp)


# ---------------------------------------------------------------- PII / URLs

# Detection patterns in the COMMON dialect of Java regex (Spark) and RE2
# (DuckDB/Go/Rust scanners): character classes, bounded quantifiers, \b —
# no backreferences, no lookaround, and NO \s/\S (Java's \s includes
# vertical tab \x0B, RE2's does not — the one place the dialects' shared
# syntax diverges in MEANING; whitespace is spelled as an explicit class
# instead) — so every engine in a mixed pipeline masks the same spans.
# Dict order IS the scrub order: URLs first (a URL's userinfo part would
# otherwise surface as an email match), then emails, then the purely
# numeric shapes.
PII_PATTERNS = {
    "url": r"https?://[^ \t\n\x0B\f\r]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d\- ]{7,}\d",
}


def pii_stats(df: DataFrame, text_column: str = "text") -> DataFrame:
    """Per-document counts of URL / email / IPv4 / phone-like spans
    (``n_url``/``n_email``/``n_ip``/``n_phone``), counted independently on
    the RAW text (a URL embedding an address counts as both — the counts
    answer "how much of this shape is present", not "what would scrubbing
    remove"). Heuristic by design: ``phone`` is any 9+-digit dash/space
    run, which also fires on ids — a recall-first audit signal, not a
    validator. NULL text → NULL counts."""
    t = F.col(text_column)
    # regexp_count: same non-overlapping match count as
    # size(regexp_extract_all(...)) without materializing the match array
    return df.withColumns({
        f"n_{k}": F.when(t.isNotNull(), F.regexp_count(t, F.lit(p)))
        for k, p in PII_PATTERNS.items()
    })


def scrub_pii(
    df: DataFrame,
    text_column: str = "text",
    scrubbed_column: str = "text_scrubbed",
) -> DataFrame:
    """Mask every PII span with its typed placeholder (``<URL>``,
    ``<EMAIL>``, ``<IP>``, ``<PHONE>``), applying the patterns in the
    PII_PATTERNS order — the standard pre-training redaction pass. Pure
    regexp_replace chain: map-only, no shuffle, one pipeline stage (the
    text is regex-scanned once PER PATTERN — four passes)."""
    t = F.col(text_column)
    for k, p in PII_PATTERNS.items():
        t = F.regexp_replace(t, p, f"<{k.upper()}>")
    return df.withColumn(scrubbed_column, t)


def dup_line_stats(
    df: DataFrame,
    text_column: str = "text",
) -> DataFrame:
    """Gopher-style duplicate-line signal: ``dup_line_ratio`` = fraction of
    non-blank lines that are repeats of an earlier line (0.0 = all lines
    distinct). Documents with fewer than 2 non-blank lines score 0.0 —
    "no repetition", not "undefined" — matching the reference rule's
    intent that single-line docs pass; NULL text stays NULL."""
    # blank = nothing but intra-line whitespace, spelled as an explicit
    # class (NOT trim, which strips spaces only — a CRLF document's '\r'
    # carrier lines would count as repeated non-blank lines and inflate
    # the ratio toward 0.5; NOT \s, whose meaning differs between Java
    # regex and RE2 on \x0B)
    lines = F.filter(
        F.split(F.col(text_column), "\n"),
        lambda x: F.regexp_replace(x, r"[ \t\x0B\f\r]", "") != "",
    )
    n = F.size(lines)
    ratio = F.when(n >= 2, 1.0 - F.size(F.array_distinct(lines)) / n.cast("double"))
    return df.withColumn(
        "dup_line_ratio",
        F.when(F.col(text_column).isNotNull(), F.coalesce(ratio, F.lit(0.0))),
    )


def dup_segment_stats(
    df: DataFrame,
    text_column: str = "text",
    granularities: tuple[str, ...] = ("line", "paragraph"),
) -> DataFrame:
    """The duplicate-SEGMENT half of Gopher's repetition table (Rae et
    al. 2021, A1) — completes :func:`dup_line_stats` (which keeps its
    original ratio for compatibility) with the four standard signals:

    - ``dup_line_frac`` / ``dup_para_frac`` — repeat occurrences of an
      identical non-blank line/paragraph over the segment count
      (``sum(count-1) / n``);
    - ``dup_line_char_frac`` / ``dup_para_char_frac`` — characters in
      those repeat occurrences (``(count-1)*len``) over ``length(text)``.

    Segmentation is :func:`~sed_binning_spark.pipeline.dedup.
    segment_array` (shared with ``dedup_segments``: blank residue
    dropped, paragraphs split on blank lines). Same conventions as the
    n-gram signals: NULL text → NULL; blank text or a single segment →
    0.0 ("no repetition", not "undefined"). One map-only fold per
    granularity over the sorted segment array — no explode, no shuffle.
    """
    from sed_binning_spark.pipeline.dedup import segment_array

    names = {"line": "line", "paragraph": "para"}
    for g in granularities:
        if g not in names:
            raise ValueError(
                f"granularities must be drawn from {sorted(names)}, got {g!r}",
            )
    text = F.col(text_column)
    pre = "__dseg"
    while any(c.startswith(pre) for c in df.columns):
        pre = "_" + pre
    n_chars = F.length(text).cast("double")
    out = df
    temps = []
    for g in granularities:
        # the fold struct materializes as a temp column: its two field
        # reads (dupn, dup) would otherwise each carry a full copy of the
        # interpreted fold tree (see repetition_stats)
        scol, acol = f"{pre}_s{names[g]}", f"{pre}_a{names[g]}"
        temps += [scol, acol]
        out = out.withColumn(scol, segment_array(text, g)).withColumn(
            acol, _run_length_fold(F.array_sort(F.col(scol))),
        )
        agg = F.col(acol)
        n = F.size(F.col(scol))
        frac = F.when(
            n >= 2, agg["dupn"].cast("double") / n.cast("double"),
        ).otherwise(F.lit(0.0))
        char_frac = F.when(
            (n >= 2) & (n_chars > 0),
            F.least(agg["dup"].cast("double"), n_chars) / n_chars,
        ).otherwise(F.lit(0.0))
        out = out.withColumn(
            f"dup_{names[g]}_frac", F.when(text.isNotNull(), frac),
        ).withColumn(
            f"dup_{names[g]}_char_frac", F.when(text.isNotNull(), char_frac),
        )
    return out.drop(*temps)


def _run_length_fold(sorted_shingles: Column) -> Column:
    """Fold a SORTED shingle array into repetition aggregates: a struct of
    ``best`` (occurrence count of the most frequent shingle), ``blen``
    (that shingle's character length), ``dup`` (total characters
    ``(count-1)*len`` over shingles occurring more than once — repeat
    occurrences only, the Gopher/DataTrove convention) and ``dupn``
    (the repeat-occurrence count, ``sum(count-1)``).

    Sorting turns "frequency of the mode" into "longest run of equal
    neighbours", which one left fold computes with O(1) state — no
    per-document map, no explode/shuffle, stays in codegen. Ties on the
    max count resolve to the FIRST shingle in sort order (strict ``>``
    never displaces an earlier winner) — deterministic and reproducible
    by a ``min(gram)``-among-argmax SQL twin. The empty-string ``prev``
    sentinel cannot collide: shingles join non-empty tokens."""
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("blen"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("dupn"),
    )

    def merge(acc: Column, x: Column) -> Column:
        new_run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        is_repeat = new_run >= 2
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.when(new_run > acc["best"], new_run).otherwise(acc["best"]).alias("best"),
            F.when(new_run > acc["best"], F.length(x).cast("long"))
            .otherwise(acc["blen"]).alias("blen"),
            (
                acc["dup"]
                # (count-1)*len: only REPEAT occurrences count, matching the
                # common Gopher implementations (DataTrove/NeMo) — the first
                # occurrence of a later-duplicated gram contributes nothing
                + F.when(is_repeat, F.length(x).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("dup"),
            # repeat-occurrence COUNT (sum of count-1), same convention
            (
                acc["dupn"]
                + F.when(is_repeat, F.lit(1).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("dupn"),
        )

    return F.aggregate(sorted_shingles, acc0, merge)


def repetition_stats(
    df: DataFrame,
    text_column: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Gopher-style n-gram repetition signals (Rae et al. 2021, table A1),
    completing the rule set next to :func:`dup_line_stats`:

    - ``top_{n}gram_char_frac`` (n in ``top_ns``): characters attributable
      to the single most frequent word ``n``-gram — ``count * len(gram)``,
      capped at the document length (overlapping occurrences can exceed
      it), divided by ``length(text)``;
    - ``dup_{n}gram_char_frac`` (n in ``dup_ns``): characters in REPEAT
      occurrences — ``(count-1) * len(gram)`` summed over every ``n``-gram
      occurring more than once (the Gopher/DataTrove convention: the first
      occurrence is not a duplicate).

    Pure expression fold over the sorted shingle array (see
    :func:`_run_length_fold`) — map-only at any scale. NULL text yields
    NULL fractions (matching :func:`dup_line_stats`); blank or
    shorter-than-``n`` documents yield 0.0 for BOTH signal families (a
    document with no full ``n``-gram has no repetition evidence, so it
    passes Gopher-style filters — matching implementations that skip such
    documents rather than scoring their single partial shingle). Filter
    like Gopher: ``top_2gram_char_frac <= 0.2 AND dup_5gram_char_frac <=
    0.15 ...``.

    Data-flow: the shingle tokenizer runs ONCE for all ``n`` (temp
    column), and each fold struct materializes as a temp column before
    its fields are read — an inline ``agg["best"] * agg["blen"]`` holds
    TWO copies of the whole interpreted fold tree (HOF aggregates are
    CodegenFallback, outside codegen subexpression elimination; measured
    1.02 s -> 0.72 s per top-``n`` on the gate corpus).
    """
    from sed_binning_spark.pipeline.dedup import _tokens, word_shingles

    text = F.col(text_column)
    pre = "__rep"
    while any(c.startswith(pre) for c in df.columns):
        pre = "_" + pre
    n_chars = F.length(text).cast("double")
    temps = [f"{pre}_tk", f"{pre}_n"]
    out = df.withColumn(f"{pre}_tk", _tokens(text)).withColumn(
        f"{pre}_n", F.size(whitespace_tokens(text)).cast("long"),
    )
    n_toks = F.col(f"{pre}_n")
    for n, kind in [(n, "top") for n in top_ns] + [(n, "dup") for n in dup_ns]:
        acol = f"{pre}_{kind}{n}"
        temps.append(acol)
        out = out.withColumn(
            acol,
            _run_length_fold(F.array_sort(
                word_shingles(text, n, tokens=F.col(f"{pre}_tk")),
            )),
        )
        agg = F.col(acol)
        chars = agg["best"] * agg["blen"] if kind == "top" else agg["dup"]
        frac = F.when(
            (n_chars > 0) & (n_toks >= n),
            F.least(chars.cast("double"), n_chars) / n_chars,
        ).otherwise(F.lit(0.0))
        out = out.withColumn(
            f"{kind}_{n}gram_char_frac",
            F.when(text.isNotNull(), frac),
        )
    return out.drop(*temps)


# ---------------------------------------------------------------------------
# HTML stripping (raw crawl -> text)
# ---------------------------------------------------------------------------

# Patterns written in the Java-regex ∩ RE2 dialect (same discipline as
# PII_PATTERNS): inline (?is) flags and lazy quantifiers are common to
# both; NO backreferences (RE2 has none), so script and style get
# separate patterns instead of <(script|style)>...</\1>; NO \s (its
# meaning differs between the engines on \x0B) — whitespace is the
# explicit class. Order matters and is part of the contract:
# comments/CDATA go FIRST (a commented-out '<script>' opener must not
# start a script span that swallows real body text), then closed
# script/style pairs, then UNCLOSED script/style openers to
# end-of-document (truncated crawl captures must not leak raw JS into
# the text), then declarations (<!DOCTYPE ...>), then generic tags.
_HTML_WS = " \t\x0B\f\r\n"
# paragraph-level elements: their tags become BLANK LINES so real HTML
# paragraph structure reaches segment-grain dedup (a '<p>' corpus has no
# literal '\n\n' anywhere — replacing block tags with spaces would fuse
# every page into one paragraph and make dedup_segments a no-op); <br>
# becomes a single newline (line break, not a paragraph break)
_HTML_BLOCK_TAGS = (
    "p|div|li|ul|ol|dl|dt|dd|h1|h2|h3|h4|h5|h6|tr|table|thead|tbody|"
    "blockquote|pre|section|article|aside|header|footer|nav|figure|form|hr"
)
HTML_STRIP_PATTERNS = (
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<!\[CDATA\[.*?\]\]>", " "),
    (rf"(?is)<script\b[^>]*>.*?</script[{_HTML_WS}]*>", " "),
    (rf"(?is)<style\b[^>]*>.*?</style[{_HTML_WS}]*>", " "),
    (r"(?is)<script\b[^>]*>.*", " "),
    (r"(?is)<style\b[^>]*>.*", " "),
    (r"(?s)<![^>]*>", " "),
    (rf"(?is)</?(?:{_HTML_BLOCK_TAGS})\b[^>]*>", "\n\n"),
    (r"(?is)<br\b[^>]*>", "\n"),
    (r"(?s)</?[A-Za-z][^>]*>", " "),
)
# decoded in THIS order; &amp; must be LAST — decoding it earlier would
# turn double-encoded '&amp;lt;' into '&lt;' and then into '<' (a
# classic double-decode); amp-last leaves exactly one level decoded
HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def strip_html(
    df: DataFrame,
    text_column: str = "text",
    output_column: str = "text_clean",
) -> DataFrame:
    """Regex-based HTML → text for raw crawl input: drop comments/CDATA,
    script/style payloads (incl. unclosed ones to end-of-document) and
    declarations; BLOCK-level tags (``<p>``, ``<div>``, headings, list
    items, ...) become blank lines and ``<br>`` a newline — real HTML
    paragraph structure reaches ``dedup_segments``, which sees nothing
    if tags collapse to spaces — while inline tags become spaces; decode
    the common named entities (one level, amp-last); then normalize
    whitespace — CRLF and bare-CR line endings become ``\\n`` first
    (old-Mac line structure survives), runs of spaces/tabs collapse to
    one space, 3+ newlines collapse to a blank line, and the result is
    trimmed of every whitespace class (not just spaces).

    Pure ``regexp_replace``/``replace`` chain — map-only, one pipeline
    stage, no shuffle; NULL text stays NULL. Regex-based stripping has
    the standard documented limits (a literal ``>`` inside an attribute
    value ends the tag early, and a ``</script>`` literal inside a JS
    string closes the script span); it is the C4/CCNet-grade cleanup,
    not a browser-grade parser.
    """
    if text_column not in df.columns:
        raise ValueError(
            f"text column {text_column!r} not in dataframe (columns: {df.columns})",
        )
    t = F.col(text_column)
    for p, repl in HTML_STRIP_PATTERNS:
        t = F.regexp_replace(t, p, repl)
    for ent, ch in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, r"\r\n?", "\n")
    t = F.regexp_replace(t, r"[ \t\x0B\f]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    t = F.regexp_replace(t, r"^[ \t\x0B\f\r\n]+|[ \t\x0B\f\r\n]+$", "")
    return df.withColumn(output_column, t)


# C4's line-level cleaning rules (Raffel et al. 2020, §2.2 — the cleanup
# that turned Common Crawl into C4). Defaults mirror the paper: lines
# must end in terminal punctuation and carry >= 5 words; boilerplate
# phrases kill the line; "javascript"-bearing lines and docs containing
# "{" or the placeholder phrase drop.
C4_BAD_LINE_PHRASES = (
    "javascript", "cookie policy", "terms of use", "privacy policy",
    "uses cookies", "use of cookies",
)
C4_BAD_DOC_PHRASES = ("lorem ipsum",)


def c4_line_filter(
    df: DataFrame,
    text_column: str = "text",
    output_column: str = "text_clean",
    min_words_per_line: int = 5,
    min_lines: int = 3,
    bad_line_phrases: tuple[str, ...] = C4_BAD_LINE_PHRASES,
    bad_doc_phrases: tuple[str, ...] = C4_BAD_DOC_PHRASES,
    drop_brace_docs: bool = True,
) -> DataFrame:
    """C4-style line-level cleanup as one map-only expression chain:

    - keep only lines ending in terminal punctuation (``. ! ? "``),
      carrying at least ``min_words_per_line`` whitespace words, and not
      containing any ``bad_line_phrases`` (case-insensitive) — each line
      judged independently via ``filter`` over the ``split`` lines array,
      surviving lines rejoined with ``\\n``;
    - ``keep`` is False for documents left with fewer than ``min_lines``
      surviving lines, containing a curly brace (code, per the paper), or
      containing a ``bad_doc_phrases`` entry anywhere in the ORIGINAL
      text.

    NULL text stays NULL with keep=False. No shuffle, no Python — at
    100 TB this is one pruned scan, same posture as quality_score, and
    the line verdicts are engine-portable string predicates."""
    t = F.col(text_column)
    lines = F.split(t, "\n")

    def line_ok(line: Column) -> Column:
        trimmed = F.trim(line)
        ok = trimmed.rlike(r'[.!?"]$')
        ok = ok & (F.size(F.array_remove(
            F.split(trimmed, f"[{WHITESPACE_CLASS}]+"), "",
        )) >= min_words_per_line)
        low = F.lower(trimmed)
        for phrase in bad_line_phrases:
            ok = ok & ~low.contains(phrase.lower())
        return ok

    kept_lines = F.filter(lines, line_ok)
    cleaned = F.when(t.isNotNull(), F.array_join(kept_lines, "\n"))
    doc_ok = F.when(t.isNotNull(), F.size(kept_lines) >= min_lines) \
        .otherwise(F.lit(False))
    if drop_brace_docs:
        doc_ok = doc_ok & ~F.coalesce(t.contains("{"), F.lit(False))
    low_doc = F.lower(t)
    for phrase in bad_doc_phrases:
        doc_ok = doc_ok & ~F.coalesce(
            low_doc.contains(phrase.lower()), F.lit(False),
        )
    return df.withColumns({output_column: cleaned, "keep": doc_ok})
