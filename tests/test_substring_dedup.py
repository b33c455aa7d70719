"""Exact-substring dedup (pipeline.dedup.dedup_substrings): ExactSubstr
semantics (Lee et al. 2022) against a pure-Python reference — global
keep-first per duplicated token window, covered-token removal, rebuild —
plus layout invariance, the unique-id guard, and the plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sed_binning_spark.pipeline.dedup import dedup_substrings


def _ref(rows, w):
    toks = {
        did: (text.split() if text is not None else None) for did, text in rows
    }
    occ = {}
    for did, tk in sorted(toks.items()):
        if tk is None or len(tk) < w:
            continue
        for s in range(len(tk) - w + 1):
            occ.setdefault(" ".join(tk[s:s + w]), []).append((did, s))
    out = {}
    for did, tk in toks.items():
        if tk is None:
            out[did] = (None, 0, 0)
            continue
        covered = set()
        for key, places in occ.items():
            winner = min(places)
            for (d, s) in places:
                if d == did and (d, s) != winner:
                    covered.update(range(s, s + w))
        kept = [t for i, t in enumerate(tk) if i not in covered]
        out[did] = (" ".join(kept), len(tk), len(tk) - len(kept))
    return out


ROWS = [
    (1, "A B C D E unique tail one"),
    (2, "x y A B C D E z"),              # embeds doc 1's window
    (3, "A B C D E"),                     # exactly one window, duplicated
    (4, "short doc"),                     # < window: untouched
    (5, None),
    (6, "A B C D E A B C D E"),           # self-repetition
    (7, "p q r s t u v w p q r s t"),     # overlapping self-dup windows
    (8, "x y A B C D E z"),               # exact duplicate of doc 2
    (9, ""),                              # blank: zero tokens
]


@pytest.mark.parametrize("w", [2, 3, 5])
def test_matches_reference(spark, w):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_dedup, r.n_tokens, r.n_removed_tokens)
        for r in dedup_substrings(df, window=w).collect()
    }
    assert got == _ref(ROWS, w)


def test_layout_invariance(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    a = {tuple(r) for r in dedup_substrings(df, window=3).collect()}
    b = {
        tuple(r)
        for r in dedup_substrings(df.repartition(7), window=3).collect()
    }
    assert a == b


def test_null_id_passes_through_and_validation(spark):
    df = spark.createDataFrame(
        [(None, "A B C D E"), (1, "A B C D E")], "doc_id long, text string",
    )
    got = {r.doc_id: r.text_dedup for r in dedup_substrings(df, window=5).collect()}
    # the NULL-id row never participates: doc 1 is the only occurrence
    assert got[1] == "A B C D E" and got[None] is None
    with pytest.raises(ValueError, match="window"):
        dedup_substrings(df, window=1)
    with pytest.raises(ValueError, match="text column"):
        dedup_substrings(df.drop("text"), window=5)


def test_duplicate_ids_fail_loudly_and_flag_skips(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException, SparkRuntimeException

    dup = spark.createDataFrame(
        [(1, "a b c"), (1, "d e f"), (2, "g h i")], "doc_id long, text string",
    )
    with pytest.raises(
        (Py4JJavaError, SparkRuntimeException, PythonException),
        match="duplicate document id",
    ):
        dedup_substrings(dup, window=2).collect()

    clean = spark.createDataFrame(ROWS, "doc_id long, text string")
    guarded = dedup_substrings(clean, window=3)
    unguarded = dedup_substrings(clean, window=3, check_unique_ids=False)
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, unguarded.collect()),
    )
    on = guarded._jdf.queryExecution().executedPlan().toString()
    off = unguarded._jdf.queryExecution().executedPlan().toString()
    assert on.count("HashAggregate") > off.count("HashAggregate")


def test_plan_shape_is_one_hash_shuffle_and_no_python(spark):
    """Winner selection partial-aggregates map-side on the window hash;
    the window/md5 pipeline runs ONCE (losers derive row-locally from
    all-starts minus winning starts — no occurrence-level join); nothing
    crosses the Python boundary, and no window function appears (a window
    over the hash key would serialize hot windows)."""
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    plan = (
        dedup_substrings(df, window=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_min" in plan, plan
    assert plan.count("md5(") == 1, plan
    assert "Window" not in plan, plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan


def test_idempotence(spark):
    """Re-running over the deduped text removes nothing further."""
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    once = dedup_substrings(df, window=3).select(
        "doc_id", F.col("text_dedup").alias("text"),
    )
    twice = dedup_substrings(once, window=3)
    assert twice.agg(F.sum("n_removed_tokens")).first()[0] == 0


def test_xxhash_path_matches_md5_on_real_text(spark):
    """The cheap production hash gives identical results on collision-free
    corpora (any divergence would be a birthday collision, impossible at
    fixture scale)."""
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    a = sorted(map(tuple, dedup_substrings(df, window=3).collect()))
    b = sorted(map(tuple, dedup_substrings(
        df, window=3, hash_function="xxhash64",
    ).collect()))
    assert a == b
    with pytest.raises(ValueError, match="hash_function"):
        dedup_substrings(df, window=3, hash_function="sha1")


def test_rolling_path_matches_md5_on_real_text(spark):
    """The Rabin-Karp path (one md5 per token + doubling zips) forms the
    same duplicate classes as per-window md5 on collision-free corpora."""
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    a = sorted(map(tuple, dedup_substrings(df, window=3).collect()))
    b = sorted(map(tuple, dedup_substrings(
        df, window=3, hash_function="rolling",
    ).collect()))
    assert a == b


def test_rolling_plan_shape(spark):
    """The rolling path keeps the batch contract: one map-side-combined
    winner shuffle, md5 evaluated exactly once per token array (the
    residue layer), no InferFiltersFromGenerate re-evaluation of the hash
    pipeline inside a Filter, nothing in Python."""
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    plan = (
        dedup_substrings(df, window=3, hash_function="rolling")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_min" in plan, plan
    assert plan.count("md5(") == 1, plan
    assert "Window" not in plan, plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan


@pytest.mark.parametrize("w", [1, 2, 3, 5, 7, 50])
def test_rk_window_hashes_cross_engine(spark, w):
    """The doubling-zip Spark form and the per-window left-fold DuckDB
    form compute the identical 62-bit polynomial for every window width
    shape (single bit, w-1 partial tails, multi-bit combines)."""
    import duckdb

    from sed_binning_spark.pipeline.text import (
        rk_window_hashes, whitespace_tokens,
    )
    from sed_binning_spark.sqlgen import rk_window_hashes_sql

    rows = [
        ("a", "the quick brown fox jumps over the lazy dog the quick fox"),
        ("b", "one two three four five"),
        ("c", "tiny"),
        ("d", ""),
        ("e", None),
        ("f", " ".join(f"t{i % 7}" for i in range(130))),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r.doc_id: r.wh
        for r in rk_window_hashes(
            df.select("doc_id", whitespace_tokens(F.col("text")).alias("tk")),
            "tk", "wh", w,
        ).select("doc_id", "wh").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join("(?, ?)" for _ in rows) + ") v(doc_id, text)",
        [x for r in rows for x in r],
    )
    want = {
        d: (list(v) if v is not None else None)
        for d, v in con.execute(
            "SELECT doc_id, " + rk_window_hashes_sql("tk", w)
            + " AS wh FROM (SELECT doc_id, list_filter(string_split_regex("
            "trim(text), '[ \t\n\x0b\f\r]+'), x -> x != '') AS tk FROM t)",
        ).fetchall()
    }
    assert got == want


def test_strict_raises_on_partial_winner_frame(spark):
    """strict=True aborts when a windowed doc has no winners row (a
    corpus-superset / partial-drain mismatch); the default silently
    rebuilds it empty per the documented contract."""
    from pyspark.sql.utils import PythonException

    from sed_binning_spark.pipeline.dedup import apply_substring_winners

    corpus = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "p q r s t u")], "doc_id long, text string",
    )
    # winners drained from a run that never saw doc 2
    winners = spark.createDataFrame(
        [(1, s) for s in range(4)], "doc_id long, start int",
    )
    lax = {
        r.doc_id: r.text_dedup
        for r in apply_substring_winners(corpus, winners, window=3).collect()
    }
    assert lax == {1: "a b c d e f", 2: ""}
    with pytest.raises(Exception, match="no winners row"):
        apply_substring_winners(
            corpus, winners, window=3, strict=True,
        ).collect()
    # a COMPLETE frame over a unique corpus passes strict untouched
    from sed_binning_spark.pipeline.dedup import dedup_substrings as dd
    full = spark.createDataFrame(
        [(1, s) for s in range(4)] + [(2, s) for s in range(4)],
        "doc_id long, start int",
    )
    ok = {
        r.doc_id: r.text_dedup
        for r in apply_substring_winners(
            corpus, full, window=3, strict=True,
        ).collect()
    }
    assert ok == {1: "a b c d e f", 2: "p q r s t u"}


def test_oversized_window_stats(spark):
    """The skew probe counts hot window hashes above the threshold the
    way minhash_lsh_bucket_stats counts hot LSH buckets."""
    from sed_binning_spark.pipeline.dedup import oversized_window_stats

    rows = [(i, "A B C D unique%d" % i) for i in range(10)] + [
        (100, "x y z w"), (101, None), (102, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # w=3: 'A B C'/'B C D' occur 10x each; 'C D unique%d' unique; x y z/y z w once
    row = oversized_window_stats(
        df, window=3, max_occurrences=5,
    ).first()
    assert row.n_oversized_buckets == 2
    assert row.n_oversized_members == 20
    assert row.max_bucket_size_seen == 10
    # distinct hashes: 2 hot + 10 unique + 2 from doc 100
    assert row.n_buckets == 14
    # the stats describe the keys the dedup actually shuffles: rolling
    # forms the same classes here
    roll = oversized_window_stats(
        df, window=3, max_occurrences=5, hash_function="rolling",
    ).first()
    assert tuple(roll) == tuple(row)


def test_packed_winner_selection_hash_aggregates(spark):
    """Integral ids pack (id, start) into one bigint so the winner
    selection HashAggregates; string ids keep the struct-min
    SortAggregate path; both orders agree."""
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    plan = (
        dedup_substrings(df, window=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortAggregate" not in plan, plan
    sdf = spark.createDataFrame(
        [(str(i), t) for i, t in ROWS], "doc_id string, text string",
    )
    splan = (
        dedup_substrings(sdf, window=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortAggregate" in splan, splan
    # identical decisions across the two paths (single-digit string ids
    # sort like their numeric values)
    got_l = {r.doc_id: (r.text_dedup, r.n_removed_tokens)
             for r in dedup_substrings(df, window=3).collect()}
    got_s = {int(r.doc_id): (r.text_dedup, r.n_removed_tokens)
             for r in dedup_substrings(sdf, window=3).collect()}
    assert got_l == got_s


def test_packed_winner_selection_range_guards(spark):
    """Ids outside [0, 2^40) abort loudly instead of silently mis-ranking
    the packed winner order."""
    df = spark.createDataFrame(
        [(1 << 40, "a b c d"), (1, "a b c d")], "doc_id long, text string",
    )
    with pytest.raises(Exception, match="winner packing"):
        dedup_substrings(df, window=3).collect()
    neg = spark.createDataFrame(
        [(-1, "a b c d"), (1, "a b c d")], "doc_id long, text string",
    )
    with pytest.raises(Exception, match="winner packing"):
        dedup_substrings(neg, window=3).collect()


def test_winner_packing_opt_out(spark):
    """winner_packing=False keeps the struct-min sort path even for
    integral ids — the escape hatch for negative/huge numeric ids —
    and produces identical results (here a negative id that the packed
    path would refuse)."""
    df = spark.createDataFrame(
        [(-5, "a b c d e f"), (1, "a b c d e f")], "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text_dedup, r.n_removed_tokens)
        for r in dedup_substrings(
            df, window=3, winner_packing=False,
        ).collect()
    }
    # -5 < 1 so the negative id wins everything; doc 1 is fully covered
    assert got == {-5: ("a b c d e f", 0), 1: ("", 6)}
    plan = (
        dedup_substrings(df, window=3, winner_packing=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortAggregate" in plan, plan


def test_png_fixture_n_bytes_domain():
    """The closed form covers exactly the single-stored-block domain and
    refuses beyond it (zlib's multi-block chunking is irregular and
    implementation-dependent — there is no honest formula)."""
    from sed_binning_spark.pipeline.multimodal import png_fixture_n_bytes

    assert png_fixture_n_bytes(4, 2) == 94
    with pytest.raises(ValueError, match="stored deflate block"):
        png_fixture_n_bytes(21845, 1)  # raw_len 65536 > one block


def test_loser_filtered_plan_matches_default(spark):
    """loser_filtered=True (the cluster-scale plan: corpus joins a
    losers-only build side, untouched docs pass through row-locally)
    produces byte-identical output to the default single-join plan on a
    corpus mixing full duplicates, partial overlaps, clean docs, short
    docs, NULL id and NULL text."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # full dup
        (3, "intro words the quick brown fox jumps over closing words"),
        (4, "completely unique text with no shared windows at all"),
        (5, "too short"),
        (6, None),
        (None, "null id never wins anything here"),
        (7, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for hf in ("md5", "rolling"):
        a = sorted(
            map(tuple, dedup_substrings(df, window=3, hash_function=hf)
                .collect()),
            key=lambda t: (t[0] is None, t[0]),
        )
        b = sorted(
            map(tuple, dedup_substrings(
                df, window=3, hash_function=hf, loser_filtered=True,
            ).collect()),
            key=lambda t: (t[0] is None, t[0]),
        )
        assert a == b, hf
    # and through the public apply with an externally supplied frame
    from sed_binning_spark.pipeline.dedup import apply_substring_winners

    winners = spark.createDataFrame(
        [(1, s) for s in range(7)] + [(3, 0), (3, 1), (3, 7), (3, 8)],
        "doc_id long, start int",
    )
    corpus = spark.createDataFrame(rows[:4], "doc_id long, text string")
    a = sorted(map(tuple, apply_substring_winners(
        corpus, winners, window=3).collect()))
    b = sorted(map(tuple, apply_substring_winners(
        corpus, winners, window=3, loser_filtered=True).collect()))
    assert a == b


def test_loser_filtered_plan_shape(spark):
    """The loser-filtered plan keeps the batch contract (no Python, no
    window functions, map-side-combined winner selection) and its corpus
    join is keyed on the filtered loser frame."""
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    plan = (
        dedup_substrings(df, window=3, loser_filtered=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_min" in plan, plan
    assert "Window" not in plan, plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan
    # the loser filter gates the corpus join's build side
    assert "__n_windows" in plan, plan


def test_substring_winner_manifest(spark):
    """The manifest counts every participating doc's windows and wins —
    including zero-win full duplicates, and excluding short/NULL docs."""
    from sed_binning_spark.pipeline.dedup import (
        dedup_substrings as _,  # noqa: F401 (import parity)
        substring_winner_manifest,
    )
    from sed_binning_spark.pipeline.dedup import (
        _keep_first_winners, _occ_window_explode,
    )
    from sed_binning_spark.pipeline.text import whitespace_tokens

    rows = [
        (1, "a b c d e"),
        (2, "a b c d e"),       # full dup: participates, wins 0
        (3, "x y z a b c"),     # wins its unique windows, loses 'a b c'
        (4, "uv"),              # too short: no manifest row
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    occ = _occ_window_explode(
        df.where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .select("doc_id", whitespace_tokens(F.col("text")).alias("__tk")),
        [F.col("doc_id")], 3, "md5", "h",
    )
    winners = _keep_first_winners(occ, df.schema["doc_id"].dataType, "doc_id")
    man = {
        r.doc_id: (r.n_windows, r.n_windows_won)
        for r in substring_winner_manifest(df, winners, window=3).collect()
    }
    assert man == {1: (3, 3), 2: (3, 0), 3: (4, 3)}


def test_strict_manifest_distinguishes_full_dup_from_drain(spark):
    """With a manifest, strict mode keeps working on corpora that contain
    exact full duplicates (the case bare strict false-positives on), and
    still aborts on a genuinely partial winner frame, a missing manifest
    row, and a corpus edited since the manifest was cut."""
    from sed_binning_spark.pipeline.dedup import (
        apply_substring_winners, substring_winner_manifest,
        substring_winners,
    )

    rows = [
        (1, "a b c d e"),
        (2, "a b c d e"),       # exact full duplicate of doc 1
        (3, "p q r s t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    winners = substring_winners(df, window=3)
    manifest = substring_winner_manifest(df, winners, window=3)

    for lf in (False, True):
        # bare strict false-positives on the full duplicate...
        with pytest.raises(Exception, match="no winners row"):
            apply_substring_winners(
                df, winners, window=3, strict=True, loser_filtered=lf,
            ).collect()
        # ...the manifest resolves it: doc 2 rebuilds empty, no raise
        got = {
            r.doc_id: r.text_dedup
            for r in apply_substring_winners(
                df, winners, window=3, strict=True, manifest=manifest,
                loser_filtered=lf,
            ).collect()
        }
        assert got == {1: "a b c d e", 2: "", 3: "p q r s t"}

        # partial frame: drop doc 3's winner rows -> win-count mismatch
        partial = winners.where(F.col("doc_id") != 3)
        with pytest.raises(Exception, match="disagrees with the manifest"):
            apply_substring_winners(
                df, partial, window=3, strict=True, manifest=manifest,
                loser_filtered=lf,
            ).collect()

        # corpus superset: doc 4 never participated -> no manifest row
        wider = spark.createDataFrame(
            rows + [(4, "never seen by the stream at all")],
            "doc_id long, text string",
        )
        with pytest.raises(Exception, match="NO manifest row"):
            apply_substring_winners(
                wider, winners, window=3, strict=True, manifest=manifest,
                loser_filtered=lf,
            ).collect()

        # corpus edited since the manifest was cut: doc 3 grew a token
        edited = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d e"), (3, "p q r s t EXTRA")],
            "doc_id long, text string",
        )
        with pytest.raises(Exception, match="corpus window count"):
            apply_substring_winners(
                edited, winners, window=3, strict=True, manifest=manifest,
                loser_filtered=lf,
            ).collect()

    with pytest.raises(ValueError, match="strict"):
        apply_substring_winners(df, winners, window=3, manifest=manifest)
    with pytest.raises(ValueError, match="manifest must have"):
        apply_substring_winners(
            df, winners, window=3, strict=True,
            manifest=manifest.drop("n_windows_won"),
        )


def test_hot_hash_winner_is_layout_independent(spark):
    """A single boilerplate window occurring in every document (the
    hot-hash skew case) selects the same global keep-first winner on any
    partition layout — the two-phase shape is Spark's own partial_min
    HashAggregate (one surviving row per map task per hash, pinned by
    test_plan_shape), so no explicit salting stage is needed."""
    rows = [(i, f"lead{i} HOT SPAN HERE tail{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expected = None
    for parts in (1, 7, 32):
        got = {
            r.doc_id: (r.text_dedup, r.n_removed_tokens)
            for r in dedup_substrings(
                df.repartition(parts), window=3,
            ).collect()
        }
        # doc 0 keeps the hot span; every other doc loses exactly it
        assert got[0] == ("lead0 HOT SPAN HERE tail0", 0)
        assert all(got[i] == (f"lead{i} tail{i}", 3) for i in range(1, 500))
        expected = expected or got
        assert got == expected


def test_dedup_substrings_property_invariance(spark):
    """Property sweep (hypothesis): over random corpora mixing shared
    templates, unique tails, short docs, empty/NULL text, the output is
    invariant to (a) partition layout, (b) loser_filtered plan choice,
    (c) hash function family — and token-count bookkeeping always
    balances (n_removed = n_tokens - surviving tokens)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    templates = ["alpha beta gamma delta", "one two three four five",
                 "lorem ipsum dolor sit amet"]

    @st.composite
    def _corpus(draw):
        n = draw(st.integers(2, 14))
        rows = []
        for i in range(n):
            kind = draw(st.integers(0, 4))
            if kind == 0:
                rows.append((i, draw(st.sampled_from(templates))))
            elif kind == 1:
                t = draw(st.sampled_from(templates))
                rows.append((i, f"u{i} {t} tail{i}"))
            elif kind == 2:
                rows.append((i, f"only{i} two{i} little{i} words{i}"))
            elif kind == 3:
                rows.append((i, draw(st.sampled_from(["", "tiny", None]))))
            else:
                rows.append((i, f"{templates[0]} {templates[1]}"))
        return rows

    @given(rows=_corpus(), w=st.integers(2, 5),
           hf=st.sampled_from(["md5", "rolling"]))
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def _run(rows, w, hf):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        ref = sorted(
            map(tuple, dedup_substrings(df, window=w, hash_function=hf)
                .collect()),
            key=lambda t: (t[0] is None, t[0]),
        )
        for variant in (
            dedup_substrings(df.repartition(5), window=w, hash_function=hf),
            dedup_substrings(df, window=w, hash_function=hf,
                             loser_filtered=True),
        ):
            got = sorted(map(tuple, variant.collect()),
                         key=lambda t: (t[0] is None, t[0]))
            assert got == ref
        for _, text, dedup, n_tok, n_rm in ref:
            if dedup is not None:
                assert n_tok - n_rm == len(dedup.split()) if dedup else n_tok == n_rm

    _run()


def test_strict_manifest_catches_shrunken_corpus_in_loser_plan(spark):
    """Regression (round-10 review): a document whose text SHRANK since
    the manifest was cut can show wins >= windows — it is not a loser, so
    the loser-filtered build side must include manifest disagreements
    explicitly or the check silently never fires."""
    from sed_binning_spark.pipeline.dedup import (
        apply_substring_winners, substring_winner_manifest,
        substring_winners,
    )

    orig = spark.createDataFrame(
        [(1, "a b c d e"), (3, "p q r s t u")], "doc_id long, text string",
    )
    winners = substring_winners(orig, window=3)
    manifest = substring_winner_manifest(orig, winners, window=3)
    shrunk = spark.createDataFrame(
        [(1, "a b c d e"), (3, "p q r s t")],  # doc 3 lost a token
        "doc_id long, text string",
    )
    for lf in (False, True):
        with pytest.raises(Exception, match="corpus window count"):
            apply_substring_winners(
                shrunk, winners, window=3, strict=True, manifest=manifest,
                loser_filtered=lf,
            ).collect()
    # a doc that shrank BELOW the window, lost its text, or was deleted
    # leaves the corpus's windowed projection entirely — no corpus row
    # carries its mismatch, so the MANIFEST-side orphan guard must raise
    cases = [
        [(1, "a b c d e"), (3, "p q")],    # below window
        [(1, "a b c d e"), (3, None)],     # text nulled
        [(1, "a b c d e")],                # deleted outright
    ]
    for lf in (False, True):
        for rows in cases:
            bad = spark.createDataFrame(rows, "doc_id long, text string")
            with pytest.raises(Exception, match="no windows in this corpus"):
                apply_substring_winners(
                    bad, winners, window=3, strict=True, manifest=manifest,
                    loser_filtered=lf,
                ).collect()
    # the new public API validates its window like its siblings
    with pytest.raises(ValueError, match="window"):
        substring_winners(orig, window=1)


def test_substring_winners_public_api_matches_stream_contract(spark):
    """substring_winners (the persistable batch winner pass) feeds
    apply_substring_winners to reproduce dedup_substrings exactly — the
    round-trip the curation guide's manifest workflow relies on."""
    from sed_binning_spark.pipeline.dedup import (
        apply_substring_winners, substring_winners,
    )

    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    winners = substring_winners(df, window=3)
    assert set(winners.columns) == {"doc_id", "start"}
    via_api = sorted(map(tuple, apply_substring_winners(
        df, winners, window=3).collect()))
    direct = sorted(map(tuple, dedup_substrings(df, window=3).collect()))
    assert via_api == direct
