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
