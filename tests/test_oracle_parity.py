"""Engine-vs-oracle parity on a DIRTY corpus.

The driver's selfcheck gate runs on its generated documents table, which
contains no NULL/blank/whitespace-edge text — exactly the rows where
Spark and DuckDB semantics diverge most easily (md5(NULL), concat_ws over
NULL arrays, CASE WHEN NULL). This suite re-runs the text-family
queries() entries against their oracle_sql() twins on a corpus that has
those rows, so a future regeneration of the driver dataset cannot
surprise the correctness gate.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# minhash_signatures was rotated out of queries() for seq_pack/decontam
# (round 6); its expression is exercised transitively by minhash_lsh_pairs
QUERIES = [
    "text_stats",
    "quality_score",
    "frame_sample",
    "lang_id",
    "doc_hashes",
    "rolling_hashes",
    "seq_pack",
    "decontam_stats",
    "minhash_lsh_pairs",
    "jaccard_pairs",
    "dedup_exact",
]


@pytest.fixture(scope="module")
def dirty_sf(tmp_path_factory):
    """An sf-dir whose documents.parquet includes every dirty-text class."""
    d = tmp_path_factory.mktemp("dirty_sf")
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the very lazy dog"),
        (3, None),
        (4, ""),
        (5, "   "),
        (6, "\n"),
        (7, "\t\r\n "),
        (8, "\nthe quick brown fox jumps over the lazy dog\t"),
        (9, "short"),
        (10, "zwei kurze worte"),
        # unicode classes the engines DO agree on (verified): accents,
        # CJK, emoji/ZWJ, ß simple folding, CRLF, vertical tab (the \x0B
        # tokenizer-class fix), very long tokens, presentation ligatures.
        # Deliberately ABSENT: Turkish İ (U+0130) — JVM full case mapping
        # lowers it to 'i' + COMBINING DOT ABOVE while DuckDB/utf8proc
        # simple-maps to 'i'; see test_known_case_folding_divergence.
        (11, "café résumé naïve"),
        (12, "日本語 の テスト 文書 です"),
        (13, "emoji 🎉 test 👍🏽 family 👨‍👩‍👧"),
        (14, "straße GROSS Straße"),
        (15, "mixed\r\nCRLF\r\nlines"),
        (16, "vertical\x0Btab doc"),
        (17, "a" * 5000 + " end"),
        (18, "ﬁ ligature ﬂ"),
        # NBSP is NOT whitespace to either engine's tokenizer (it is to
        # python str.split — keep it out of python-reference fixtures)
        (19, "non breaking space"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    # the driver table carries a precomputed n_chars used by frame_sample
    # as the media duration; NULL text -> NULL duration and empty text ->
    # duration 0, and BOTH sample nothing (duration > 0 filter): a 0 ms
    # video has no frames, and greatest() alone would skip the NULL and
    # fabricate a frame at t=0
    pdf["n_chars"] = pdf["text"].str.len().astype("Int64")
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def oracle_con(dirty_sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dirty_sf}/documents.parquet')",
    )
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_dirty_corpus_parity(spark, dirty_sf, oracle_con, name):
    import __spark_entry__ as entry_mod
    from tools.selfcheck import value_hash

    sdf = entry_mod.queries()[name](spark, dirty_sf).toPandas()
    odf = oracle_con.execute(entry_mod.oracle_sql()[name]).df()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), name
    if value_hash(sdf) != value_hash(odf):
        # readable diff: align on doc_id-ish key when present
        key = next((c for c in ("doc_id", "id_a") if c in sdf.columns), None)
        if key is not None:
            s = sdf.sort_values(key).reset_index(drop=True)
            o = odf.sort_values(key).reset_index(drop=True)
            for c in sorted(sdf.columns):
                sv, ov = list(s[c]), list(o[c])
                if [repr(x) for x in sv] != [repr(x) for x in ov]:
                    raise AssertionError(f"{name}.{c}: spark={sv} oracle={ov}")
        raise AssertionError(f"{name}: value mismatch")


def test_known_case_folding_divergence(spark):
    """DOCUMENTED ENGINE LIMIT, pinned so a behavior change in either
    engine is noticed: the JVM lowercases Turkish İ (U+0130) with the
    FULL Unicode mapping ('i' + U+0307 COMBINING DOT ABOVE, one extra
    code point) while DuckDB/utf8proc uses the SIMPLE mapping ('i').
    Any case-folded operator (dedup tokens, fingerprints, LM grams)
    therefore diverges cross-engine on İ-bearing text — such characters
    must stay out of oracle fixtures, and mixed-engine deployments must
    case-fold upstream if they matter."""
    import duckdb

    from pyspark.sql import functions as F

    s = (
        spark.createDataFrame([("İ",)], "t string")
        .select(F.lower("t")).collect()[0][0]
    )
    d = duckdb.connect().execute("SELECT lower('İ')").fetchone()[0]
    assert s == "i̇" and d == "i", (
        f"case-folding behavior changed (spark={s!r}, duck={d!r}) — "
        f"revisit the oracle-fixture guidance in this test's docstring"
    )
