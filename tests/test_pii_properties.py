"""Property-based CROSS-ENGINE agreement of the PII regex operators.

PII_PATTERNS claims its patterns mean the same thing under Java regex
(Spark) and RE2 (DuckDB) — a claim a review already falsified once (\\s
includes vertical tab in Java but not RE2). This suite feeds both engines
hypothesis-generated hostile text (every ASCII whitespace variant
including \\x0B, separator/metacharacter soup, and embedded true PII
spans) and compares span counts, the scrubbed text itself, and the
duplicate-line ratio value-for-value.
"""

from __future__ import annotations

import atexit
import os
import shutil
import sys
import tempfile
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sed_binning_spark.pipeline.text import (  # noqa: E402
    PII_PATTERNS,
    dup_line_stats,
    pii_stats,
    scrub_pii,
)

_SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_TMP_ROOT = tempfile.mkdtemp(prefix="pii-props-")
atexit.register(shutil.rmtree, _TMP_ROOT, True)
_TMP_SEQ = [0]

# fragments hypothesis assembles into documents: real PII spans, near-miss
# shapes, every ASCII whitespace (VT \x0B is the known Java/RE2 \s
# divergence), pattern metacharacters, and placeholder-looking text
_FRAGMENTS = [
    "http://ex.io/a", "https://u:p@h.co/x?q=1#f", "http://",
    "bob@host.org", "a.b-c%d@e-f.gh.ij", "no@tld", "@@",
    "10.0.0.1", "999.999.999.999", "1.2.3", "1.2.3.4.5",
    "+1 555-010-9876", "+49 30-1234-5678", "12345678901", "1-2",
    "<URL>", "<EMAIL>", "plain words", "a:b;c", "x\\y", "(+)",
    " ", "\t", "\n", "\x0b", "\f", "\r", "", ".", "-", "_",
]


def _docs_strategy():
    return st.lists(
        st.one_of(
            st.sampled_from(_FRAGMENTS),
            st.text(
                alphabet="abcZ019 .@:/+-%\t\n\x0b\f\r;<>",
                max_size=12,
            ),
        ),
        min_size=0, max_size=12,
    ).map("".join)


def _write_docs(texts) -> str:
    _TMP_SEQ[0] += 1
    d = os.path.join(_TMP_ROOT, str(_TMP_SEQ[0]))
    os.makedirs(d)
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    pq.write_table(tbl, os.path.join(d, "part-0.parquet"))
    return d


@given(texts=st.lists(_docs_strategy(), min_size=1, max_size=6))
@_SET
def test_pii_twins_agree(spark, texts):
    texts = texts + [None]  # NULL text rides along every case
    path = _write_docs(texts)

    sdf = scrub_pii(dup_line_stats(pii_stats(spark.read.parquet(path))))
    s = sdf.toPandas().sort_values("doc_id").reset_index(drop=True)

    counts = ", ".join(
        f"len(regexp_extract_all(text, '{p}')) AS n_{k}"
        for k, p in PII_PATTERNS.items()
    )
    lines = "list_filter(string_split(text, chr(10)), x -> regexp_replace(x, '[ \t\x0B\f\r]', '', 'g') != '')"
    scrub = "text"
    for k, p in PII_PATTERNS.items():
        scrub = f"regexp_replace({scrub}, '{p}', '<{k.upper()}>', 'g')"
    con = duckdb.connect()
    o = con.execute(
        f"SELECT doc_id, {counts}, "
        f"CASE WHEN text IS NULL THEN NULL WHEN len({lines}) >= 2 THEN "
        f"1.0e0 - len(list_distinct({lines})) / CAST(len({lines}) AS DOUBLE) "
        f"ELSE 0.0e0 END AS dup_line_ratio, {scrub} AS text_scrubbed "
        f"FROM read_parquet('{path}/*.parquet') ORDER BY doc_id",
    ).df()

    for col in [f"n_{k}" for k in PII_PATTERNS] + ["dup_line_ratio"]:
        sv = [None if pd.isna(x) else float(x) for x in s[col]]
        ov = [None if pd.isna(x) else float(x) for x in o[col]]
        assert sv == ov, (
            f"{col} diverged: "
            + str([(t, a, b) for t, a, b in zip(texts, sv, ov) if a != b][:3])
        )
    sv = [None if x is None else x for x in s["text_scrubbed"]]
    ov = [None if pd.isna(x) else x for x in o["text_scrubbed"]]
    assert sv == ov, (
        "scrub diverged: "
        + str([(t, a, b) for t, a, b in zip(texts, sv, ov) if a != b][:3])
    )
