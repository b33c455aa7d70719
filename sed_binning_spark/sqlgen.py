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
