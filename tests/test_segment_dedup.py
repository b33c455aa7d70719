"""Segment-level exact dedup (pipeline.dedup.dedup_segments): reference
parity, keep-first semantics, layout independence, and DuckDB parity."""

from pathlib import Path

import pytest

from sed_binning_spark.pipeline.dedup import dedup_segments, segment_array

DOCS = [
    (1, "alpha body one\n\nSHARED BOILERPLATE\n\nunique tail 1"),
    (2, "SHARED BOILERPLATE\n\nalpha body two"),
    (3, "self dup\n\nself dup\n\nmiddle\n\nself dup"),
    (4, None),
    (5, ""),
    (6, "\n\n  \n\n\t\n\n"),        # only blank segments
    (7, "SHARED BOILERPLATE"),       # whole doc is an already-seen segment
    (8, "solo paragraph"),
]


def _ref(docs, joiner="\n\n"):
    """Pure-Python reference: global keep-first over (id, pos)."""
    import re

    segs = {}
    for did, text in docs:
        if text is None:
            continue
        parts = [
            s for s in re.split(r"\n{2,}", text)
            if re.sub(r"[ \t\x0B\f\r\n]", "", s) != ""
        ]
        segs[did] = parts
    seen = {}
    for did in sorted(segs):
        for pos, s in enumerate(segs[did]):
            if s not in seen:
                seen[s] = (did, pos)
    out = {}
    for did, text in docs:
        if text is None:
            out[did] = (None, 0, 0, 0)
            continue
        parts = segs[did]
        kept = [s for pos, s in enumerate(parts) if seen.get(s) == (did, pos)]
        out[did] = (joiner.join(kept), len(parts), len(kept), len(parts) - len(kept))
    return out


def test_paragraph_dedup_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_dedup, r.n_segments, r.n_kept, r.n_removed)
        for r in dedup_segments(df).collect()
    }
    want = _ref(DOCS)
    assert got == want
    # the shared paragraph survives only in doc 1 (global first)
    assert "SHARED BOILERPLATE" in got[1][0]
    assert "SHARED BOILERPLATE" not in got[2][0]
    assert got[7][0] == ""          # doc 7 is emptied entirely
    assert got[3][0] == "self dup\n\nmiddle"  # within-doc repeats removed


def test_line_granularity(spark):
    docs = [(1, "a\nb\na"), (2, "b\nc")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_dedup, r.n_kept) for r in
        dedup_segments(df, granularity="line").collect()
    }
    assert got == {1: ("a\nb", 2), 2: ("c", 1)}


def test_layout_independence(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = {tuple(r) for r in dedup_segments(df).collect()}
    b = {tuple(r) for r in dedup_segments(df.repartition(7)).collect()}
    assert a == b


def test_null_id_passthrough(spark):
    df = spark.createDataFrame(
        [(None, "x\n\ny"), (1, "x")], "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dedup_segments(df).collect()}
    assert got[None].text_dedup is None
    assert (got[None].n_segments, got[None].n_kept, got[None].n_removed) == (0, 0, 0)
    # the NULL-id doc's segments never claimed 'x', so doc 1 keeps it
    assert got[1].text_dedup == "x"


def test_validation(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="granularity"):
        dedup_segments(df, granularity="sentence")
    with pytest.raises(ValueError, match="granularity"):
        segment_array(F.col("text"), "word")
    with pytest.raises(ValueError, match="text column"):
        dedup_segments(df, text_column="nope")
    with pytest.raises(ValueError, match="id column"):
        dedup_segments(df, id_column="nope")


def test_duckdb_parity(spark):
    """Cross-engine on the driver documents table with a synthesized
    paragraph-y twin (the corpus itself has no newlines): shared + per-doc
    paragraphs, then full dedup on both engines."""
    import duckdb

    path = "/root/testdata/sf0.001/documents.parquet"
    if not Path(path).exists():
        pytest.skip("driver testdata not present")
    from pyspark.sql import functions as F

    df = spark.read.parquet(path).select(
        "doc_id",
        F.concat(
            F.lit("shared header"), F.lit("\n\n"),
            F.col("text"), F.lit("\n\n"),
            F.lit("group "), (F.col("doc_id") % 5).cast("string"),
        ).alias("text"),
    )
    got = {
        (r.doc_id, r.text_dedup, r.n_segments, r.n_kept, r.n_removed)
        for r in dedup_segments(df).select(
            "doc_id", "text_dedup", "n_segments", "n_kept", "n_removed",
        ).collect()
    }
    blank = "[ \t\x0B\f\r\n]"
    sql = f"""
    WITH base AS (
      SELECT doc_id,
             'shared header' || chr(10) || chr(10) || text || chr(10) || chr(10)
             || 'group ' || CAST(doc_id % 5 AS VARCHAR) AS text
      FROM read_parquet('{path}')),
    lists AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '\n{{2,}}'),
                         s -> regexp_replace(s, '{blank}', '', 'g') != '') AS l
      FROM base),
    segs AS (
      SELECT doc_id, u.pos, u.seg FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(l) + 1),
                                     i -> {{'pos': i, 'seg': l[i]}})) AS u
        FROM lists)),
    kept AS (
      SELECT doc_id, pos, seg FROM (
        SELECT doc_id, pos, seg,
               row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
        FROM segs) WHERE rn = 1),
    agg AS (
      SELECT doc_id,
             string_agg(seg, chr(10) || chr(10) ORDER BY pos) AS text_dedup,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id)
    SELECT l.doc_id,
           CASE WHEN l.text IS NULL THEN NULL
                ELSE coalesce(agg.text_dedup, '') END AS text_dedup,
           CASE WHEN l.text IS NULL THEN 0 ELSE len(l.l) END AS n_segments,
           CASE WHEN l.text IS NULL THEN 0 ELSE coalesce(agg.n_kept, 0) END AS n_kept,
           CASE WHEN l.text IS NULL THEN 0
                ELSE len(l.l) - coalesce(agg.n_kept, 0) END AS n_removed
    FROM lists l LEFT JOIN agg ON agg.doc_id = l.doc_id
    """
    want = {tuple(row) for row in duckdb.connect().execute(sql).fetchall()}
    assert got == want


# ---------------------------------------------------------------------------
# property tests (hypothesis): idempotence + reference parity on fuzzed docs
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# segments drawn from a tiny alphabet so cross-doc collisions are common;
# whitespace-only entries exercise the blank-residue filter
_SEG = st.sampled_from(["aa", "bb b", "cc", "  ", "", "d\re", "f"])
_DOC = st.lists(_SEG, min_size=0, max_size=6).map(lambda p: "\n\n".join(p))


@_SET
@given(texts=st.lists(st.one_of(st.none(), _DOC), min_size=1, max_size=10))
def test_segment_dedup_idempotent_and_matches_reference(spark, texts):
    """(1) equals the pure-Python keep-first reference on arbitrary corpora
    and (2) is idempotent: survivors are globally unique, so a second pass
    removes nothing."""
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup_segments(df)
    got = {
        r.doc_id: (r.text_dedup, r.n_segments, r.n_kept, r.n_removed)
        for r in out.collect()
    }
    assert got == _ref(docs)

    again = dedup_segments(
        out.select("doc_id", out.text_dedup.alias("text")),
    )
    for r in again.collect():
        first = got[r.doc_id]
        assert r.text_dedup == first[0], r.doc_id
        assert r.n_removed == 0, r.doc_id


def test_duplicate_ids_fail_loudly(spark):
    """The unique-id contract raises at execution time instead of
    interleaving two documents' segments into one reassembled text."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException, SparkRuntimeException

    df = spark.createDataFrame(
        [(1, "aa\n\nbb"), (1, "cc"), (2, "dd")], "doc_id long, text string",
    )
    with pytest.raises(
        (Py4JJavaError, SparkRuntimeException, PythonException),
        match="duplicate document id",
    ):
        dedup_segments(df).collect()


def test_check_unique_ids_flag_skips_the_guard_aggregation(spark):
    """check_unique_ids=False drops the id-only guard pass (one fewer
    aggregate pair in the plan) and returns identical results on a valid
    corpus — the escape hatch for pipelines that validated ids upstream."""
    df = spark.createDataFrame(
        [(1, "aa\n\nbb"), (2, "aa\n\ncc"), (3, None)],
        "doc_id long, text string",
    )
    guarded = dedup_segments(df)
    unguarded = dedup_segments(df, check_unique_ids=False)
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, unguarded.collect()),
    )
    on = guarded._jdf.queryExecution().executedPlan().toString()
    off = unguarded._jdf.queryExecution().executedPlan().toString()
    assert on.count("HashAggregate") > off.count("HashAggregate")
    # with the flag off, the guard branch constant-folds away entirely
    assert "raise_error" not in off.lower()
