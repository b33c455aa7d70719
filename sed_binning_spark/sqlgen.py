"""Helpers for generating engine-portable SQL twins of Column expressions.

The one subtlety: DuckDB parses bare decimal literals ('0.968912...') as
DECIMAL and then does DECIMAL arithmetic, which rounds differently from
IEEE double. A literal with an exponent ('...e0') is a DOUBLE. Every float
literal emitted into an oracle SQL string must go through :func:`fsql`.
"""

from __future__ import annotations


def fsql(v: float) -> str:
    """Render a float as a SQL literal that parses as DOUBLE (IEEE-exact:
    repr round-trips, the e-suffix forces double typing). Non-finite values
    render as a CAST both DuckDB and Spark parse — a bare ``inf``/``nan``
    is not a valid literal in either (it would bind to a column name or
    fail to parse)."""
    f = float(v)
    if f != f:
        return "CAST('NaN' AS DOUBLE)"
    if f == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if f == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    s = repr(f)
    if "e" in s or "E" in s:
        return s
    return s + "e0"


def hex_to_bigint_sql(hex_expr: str, start: int, n_chars: int = 13) -> str:
    """SQL expression turning ``n_chars`` lowercase hex characters of a hex
    string (1-based ``start``) into a BIGINT — portably, via per-character
    strpos against the hex alphabet (no engine-specific conv/from_hex).

    13 chars = 52 bits is the sweet spot: the largest hex count whose
    integer range (< 2^52) stays exactly representable in a double, which
    is what lets a hash-derived uniform ``n / 2^52`` round-trip bit-exactly
    across engines (see core.dfops.apply_jitter method='hash')."""
    if n_chars > 15:
        raise ValueError("more than 15 hex chars overflows BIGINT")
    terms = [
        f"(strpos('0123456789abcdef', substr({hex_expr}, {start + j}, 1)) - 1)"
        f" * {16 ** (n_chars - 1 - j)}"
        for j in range(n_chars)
    ]
    return "(" + " + ".join(terms) + ")"


def rk_window_hashes_sql(tk_expr: str, window: int) -> str:
    """DuckDB twin of :func:`pipeline.text.rk_window_hashes`: the 62-bit
    combined double-31-bit Rabin-Karp polynomial hash of every ``window``-
    token span of the VARCHAR[] expression ``tk_expr``, as a BIGINT[]
    (empty for sub-window documents — the same shape the Spark side
    emits). Computed the direct O(n*w) way — one ``list_reduce`` left
    fold per window per track — which is the definitional form of the
    polynomial the Spark side assembles with O(log w) doubling zips; the
    oracle runs at tiny scale, so the asymptotic gap is irrelevant and
    the redundancy is the point (an independent evaluation order must
    agree value-for-value). ``list_reduce`` raises on empty input, so the
    ``len >= window`` guard is load-bearing, not cosmetic."""
    from sed_binning_spark.pipeline.text import (
        RK_BASE1, RK_BASE2, RK_MOD1, RK_MOD2, _RK_COMBINE,
    )
    w = int(window)
    if w < 1:
        raise ValueError(f"window must be >= 1 token, got {window}")

    def track(start: int, base: int, mod: int) -> str:
        tok_h = f"({hex_to_bigint_sql('md5(t)', start, 13)} % {mod})"
        return (
            f"list_reduce(list_transform(({tk_expr})[j:j+{w - 1}], "
            f"t -> {tok_h}), (a, b) -> (a * {base} + b) % {mod})"
        )

    h = (
        f"{track(1, RK_BASE1, RK_MOD1)} * {_RK_COMBINE} "
        f"+ {track(14, RK_BASE2, RK_MOD2)}"
    )
    return (
        f"CASE WHEN len({tk_expr}) >= {w} THEN "
        f"list_transform(range(1, len({tk_expr}) - {w - 2}), j -> {h}) "
        f"ELSE CAST([] AS BIGINT[]) END"
    )


def rk_whole_doc_hash_sql(tk_expr: str) -> str:
    """DuckDB twin of :func:`pipeline.text._rk_whole_doc_hash`: the 62-bit
    Rabin-Karp hash of the WHOLE token array (the single partial window
    the winnow family emits for sub-window documents). ``list_reduce``
    seeds with the first element where the Spark fold seeds 0 — identical
    polynomials, since ``0*B + h_0 = h_0``. Raises on empty lists like
    every ``list_reduce``; callers guard ``len > 0``."""
    from sed_binning_spark.pipeline.text import (
        RK_BASE1, RK_BASE2, RK_MOD1, RK_MOD2, _RK_COMBINE,
    )

    def track(start: int, base: int, mod: int) -> str:
        tok_h = f"({hex_to_bigint_sql('md5(t)', start, 13)} % {mod})"
        return (
            f"list_reduce(list_transform({tk_expr}, t -> {tok_h}), "
            f"(a, b) -> (a * {base} + b) % {mod})"
        )

    return (
        f"({track(1, RK_BASE1, RK_MOD1)} * {_RK_COMBINE} "
        f"+ {track(14, RK_BASE2, RK_MOD2)})"
    )
