"""Streaming binning correctness: the streaming sparse histogram must equal
the batch one on the same data once the stream drains (kernel-vs-oracle at
the streaming boundary), including incremental multi-batch accumulation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sed_binning_spark.binning.binning import bin_dataframe_sparse
from sed_binning_spark.streaming import bin_stream, stream_events


@pytest.fixture()
def event_files(tmp_path, spark):
    """Three parquet 'acquisition chunks' with known values."""
    rng = np.random.default_rng(7)
    root = tmp_path / "stream_in"
    root.mkdir()
    frames = []
    for i in range(3):
        pdf = pd.DataFrame({
            "X": rng.uniform(0, 2048, 500),
            "t": rng.uniform(55000, 125000, 500),  # some rows out of range
        })
        frames.append(pdf)
        pdf.to_parquet(root / f"chunk_{i}.parquet")  # plain files, like a DAQ
    return str(root), pd.concat(frames, ignore_index=True)


def _drain(stream_df, spark, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def test_stream_binning_equals_batch(event_files, spark):
    root, pdf = event_files
    batch_df = spark.createDataFrame(pdf)
    want = (
        bin_dataframe_sparse(
            batch_df, bins=[20, 25], axes=["X", "t"],
            ranges=[(0.0, 2048.0), (60000.0, 120000.0)],
        )
        .toPandas().sort_values(["X", "t"]).reset_index(drop=True)
    )

    stream = stream_events(spark, root, max_files_per_trigger=1)
    got = (
        _drain(
            bin_stream(stream, bins=[20, 25], axes=["X", "t"],
                       ranges=[(0.0, 2048.0), (60000.0, 120000.0)]),
            spark, "stream_hist",
        )
        .sort_values(["X", "t"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"count": "int64"}), want.astype({"count": "int64"}),
    )


def test_stream_binning_windowed_runs(event_files, spark):
    """Event-time windowed variant: watermark + tumbling window plumbing
    produces per-window cells whose total equals the in-range row count."""
    from pyspark.sql import functions as F

    root, pdf = event_files
    stream = stream_events(spark, root).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + (F.col("X") < 1024).cast("int") * 60),
    )
    out = _drain(
        bin_stream(stream, bins=[10], axes=["t"], ranges=[(60000.0, 120000.0)],
                   event_time_column="ts", window_duration="60 seconds"),
        spark, "stream_hist_win",
    )
    assert set(out.columns) == {"window_start", "t", "count"}
    assert out["window_start"].nunique() == 2
    in_range = ((pdf.t > 57000) & (pdf.t < 123000)).sum()  # loose sanity bound
    assert 0 < out["count"].sum() <= in_range
    # exact: matches the batch histogram total
    batch_total = (
        bin_dataframe_sparse(
            spark.createDataFrame(pdf), bins=[10], axes=["t"],
            ranges=[(60000.0, 120000.0)],
        ).agg(F.sum("count")).collect()[0][0]
    )
    assert out["count"].sum() == batch_total


# ---------------------------------------------------------------------------
# stateful operators (streaming/stateful.py)


def test_forward_fill_stream_carries_state_across_batches(tmp_path, spark):
    """Leading NaNs of a later micro-batch must be seeded from the carry
    state of earlier batches — the whole point of applyInPandasWithState."""
    from sed_binning_spark.streaming import forward_fill_stream

    root = tmp_path / "ff_in"
    root.mkdir()
    # two files (groups), rows split across two chunks; chunk 1 starts with
    # NaN for both files so the fill value must come from chunk 0's state
    chunk0 = pd.DataFrame({
        "file_id": [0, 0, 1, 1],
        "row_id": [0, 1, 0, 1],
        "ch": [1.0, np.nan, 5.0, np.nan],
    })
    chunk1 = pd.DataFrame({
        "file_id": [0, 0, 1, 1],
        "row_id": [2, 3, 2, 3],
        "ch": [np.nan, 2.0, np.nan, np.nan],
    })
    chunk0.to_parquet(root / "chunk_0.parquet")
    chunk1.to_parquet(root / "chunk_1.parquet")

    stream = stream_events(spark, str(root), max_files_per_trigger=1)
    q = (
        forward_fill_stream(stream, "ch")
        .writeStream.format("memory").queryName("ff_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM ff_stream").toPandas()
        .sort_values(["file_id", "row_id"]).reset_index(drop=True)
    )
    want = (
        pd.concat([chunk0, chunk1], ignore_index=True)
        .sort_values(["file_id", "row_id"]).reset_index(drop=True)
    )
    want["ch"] = want.groupby("file_id")["ch"].ffill()
    pd.testing.assert_frame_equal(got, want)


def test_forward_fill_stream_rejects_non_double(spark):
    from sed_binning_spark.streaming import forward_fill_stream

    df = spark.createDataFrame(
        pd.DataFrame({"file_id": [0], "row_id": [0], "ch": [1]}),
    )
    with pytest.raises(ValueError, match="double"):
        forward_fill_stream(df, "ch")


def test_exact_dedup_stream_drops_cross_batch_duplicates(tmp_path, spark):
    from sed_binning_spark.streaming import exact_dedup_stream

    root = tmp_path / "dd_in"
    root.mkdir()
    pd.DataFrame({"doc_id": [0, 1, 2], "text": ["aa", "bb", "cc"]}).to_parquet(
        root / "chunk_0.parquet",
    )
    pd.DataFrame({"doc_id": [3, 4, 5], "text": ["bb", "dd", "aa"]}).to_parquet(
        root / "chunk_1.parquet",
    )

    stream = stream_events(spark, str(root), max_files_per_trigger=1)
    q = (
        exact_dedup_stream(stream)
        .writeStream.format("memory").queryName("dd_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dd_stream").toPandas()
    # duplicates in a LATER batch lose against the digest state
    assert sorted(map(tuple, got.values.tolist())) == [
        (0, "aa"), (1, "bb"), (2, "cc"), (4, "dd"),
    ]


def test_forward_fill_stream_global_mode_crosses_file_boundaries(tmp_path, spark):
    """file_column=None: one sequential stream, carry crosses every chunk
    boundary (the batch cross-file-handoff semantics, in arrival order)."""
    from sed_binning_spark.streaming import forward_fill_stream

    root = tmp_path / "ffg_in"
    root.mkdir()
    pd.DataFrame({"row_id": [0, 1], "ch": [7.0, np.nan]}).to_parquet(
        root / "chunk_0.parquet",
    )
    # second chunk is ALL NaN: must fill entirely from chunk 0's state
    pd.DataFrame({"row_id": [2, 3], "ch": [np.nan, np.nan]}).to_parquet(
        root / "chunk_1.parquet",
    )
    stream = stream_events(spark, str(root), max_files_per_trigger=1)
    q = (
        forward_fill_stream(stream, "ch", file_column=None)
        .writeStream.format("memory").queryName("ffg_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM ffg_stream").toPandas()
        .sort_values("row_id").reset_index(drop=True)
    )
    assert list(got.columns) == ["row_id", "ch"]  # helper group column dropped
    assert got["ch"].tolist() == [7.0, 7.0, 7.0, 7.0]


def test_exact_dedup_stream_preserves_user_digest_column(tmp_path, spark):
    from sed_binning_spark.streaming import exact_dedup_stream

    root = tmp_path / "ddc_in"
    root.mkdir()
    pd.DataFrame({
        "doc_id": [0, 1], "text": ["aa", "aa"], "__digest": ["keep0", "keep1"],
    }).to_parquet(root / "chunk_0.parquet")
    stream = stream_events(spark, str(root))
    q = (
        exact_dedup_stream(stream)
        .writeStream.format("memory").queryName("ddc_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ddc_stream").toPandas()
    assert "__digest" in got.columns          # user column survives
    assert len(got) == 1 and got["__digest"].iloc[0] in ("keep0", "keep1")


def test_stream_binning_windowed_keeps_watermark(event_files, spark):
    """The grouping must keep the window struct's event-time watermark tag:
    append mode refuses to start at all when the watermark is stripped
    (and update mode would then never evict closed-window state)."""
    from pyspark.sql import functions as F

    root, _ = event_files
    stream = stream_events(spark, root).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + (F.col("X") < 1024).cast("int") * 60),
    )
    binned = bin_stream(
        stream, bins=[10], axes=["t"], ranges=[(60000.0, 120000.0)],
        event_time_column="ts", window_duration="60 seconds",
    )
    q = (
        binned.writeStream.format("memory")
        .queryName("stream_hist_append")
        .outputMode("append")          # only legal with a watermarked key
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_binning_windowed_drops_null_event_time(event_files, spark):
    """Rows with NULL event time belong to no window: they must not form a
    phantom window_start=NULL aggregate."""
    from pyspark.sql import functions as F

    root, _ = event_files
    stream = stream_events(spark, root).withColumn(
        "ts",
        F.when(F.col("X") < 1024, F.timestamp_seconds(F.lit(1700000000))),
    )
    out = _drain(
        bin_stream(stream, bins=[10], axes=["t"], ranges=[(60000.0, 120000.0)],
                   event_time_column="ts", window_duration="60 seconds"),
        spark, "stream_hist_nullts",
    )
    assert out["window_start"].notna().all()


def test_exact_dedup_stream_null_text_not_duplicate(tmp_path, spark):
    """Streaming exact dedup matches the batch contract: NULL-text rows all
    pass through (md5(NULL)=NULL must not collapse them into one class)."""
    import pandas as pd

    from sed_binning_spark.streaming import exact_dedup_stream

    root = tmp_path / "docs_in"
    root.mkdir()
    pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": [None, None, "x", "x"]}) \
        .to_parquet(root / "chunk_0.parquet")
    stream = stream_events(spark, str(root))
    q = (
        exact_dedup_stream(stream)
        .writeStream.format("memory").queryName("stream_dedup_null")
        .outputMode("append")          # dropDuplicates streams use append
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM stream_dedup_null").toPandas()
    kept = sorted(out["doc_id"])
    assert kept == [0, 1, 2]


def test_exact_dedup_stream_null_key_is_deterministic(spark):
    """The NULL-text fallback digest must be derived from the row (not
    uuid()/rand()): on a replayed micro-batch a non-deterministic key gives
    the same row a fresh state key and the replay re-emits it. Assert the
    plan carries no non-deterministic expression."""
    from sed_binning_spark.streaming import exact_dedup_stream

    df = spark.createDataFrame(
        [(0, None), (1, None), (2, "x")], "doc_id long, text string",
    )
    out = exact_dedup_stream(df)
    plan = out._jdf.queryExecution().analyzed().toString().lower()
    assert "uuid" not in plan and "rand(" not in plan
    # batch semantics unchanged: NULL-text rows with distinct ids all pass
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 1, 2]


def test_minhash_dedup_stream_flags_near_dups_of_static_corpus(tmp_path, spark):
    """Stream docs near-duplicating a static corpus get dup_of = min
    matching corpus id; novel / NULL / blank docs pass through NULL.
    Stateless stream-static joins, so append mode needs no watermark."""
    from sed_binning_spark.streaming import minhash_dedup_stream

    corpus = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "the quick brown fox jumps over the lazy dog"),  # dup class
            (102, "completely different content about spark query engines"),
        ],
        "doc_id long, text string",
    )
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),   # exact hit
        (1, "an entirely novel document with fresh words only"),
        (2, None),                                            # NULL text
        (3, "  \n\t "),                                       # blank text
    ]
    root = tmp_path / "mh_in"
    root.mkdir()
    pd.DataFrame(rows[:2], columns=["doc_id", "text"]).to_parquet(
        root / "chunk_0.parquet",
    )
    pd.DataFrame(rows[2:], columns=["doc_id", "text"]).to_parquet(
        root / "chunk_1.parquet",
    )

    stream = stream_events(spark, str(root), max_files_per_trigger=1)
    q = (
        minhash_dedup_stream(stream, corpus)
        .writeStream.format("memory").queryName("mh_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT doc_id, dup_of FROM mh_stream")
        .toPandas().set_index("doc_id")["dup_of"]
    )
    assert got.loc[0] == 100  # min id of the matching dup class
    assert pd.isna(got.loc[1]) and pd.isna(got.loc[2]) and pd.isna(got.loc[3])

    # batch equivalence: the same function on a batch frame gives the
    # same flags (the joins are identical plans)
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    bt = (
        minhash_dedup_stream(batch, corpus)
        .toPandas().set_index("doc_id")["dup_of"]
    )
    assert bt.loc[0] == 100 and pd.isna(bt.loc[1])
    # column order/passthrough preserved
    assert list(minhash_dedup_stream(batch, corpus).columns) == [
        "doc_id", "text", "dup_of",
    ]


def test_curation_chain_runs_unchanged_on_a_stream(tmp_path, spark):
    """The curation operators (hash sampling, split assignment, PII scrub,
    quality stats) are stateless Column expressions, so the SAME calls must
    run on a readStream frame and emit exactly the batch result once the
    stream drains — the 'one pipeline, batch or streaming' contract."""
    from sed_binning_spark.pipeline.sample import assign_splits, deterministic_sample
    from sed_binning_spark.pipeline.text import scrub_pii

    root = tmp_path / "docs_in"
    root.mkdir()
    for i in range(3):
        pd.DataFrame({
            "doc_id": range(100 * i, 100 * (i + 1)),
            "text": [f"doc {j} mail u{j}@x.io" for j in range(100 * i, 100 * (i + 1))],
        }).to_parquet(root / f"chunk_{i}.parquet")

    from sed_binning_spark.pipeline.text import repetition_stats

    def chain(df):
        out = deterministic_sample(df, 0.5, key_columns=("doc_id",), seed=3)
        out = assign_splits(out, {"train": 0.9, "holdout": 0.1},
                            key_columns=("doc_id",), seed=4)
        # repetition_stats is a per-row fold — stateless, stream-safe
        out = repetition_stats(out, top_ns=(2,), dup_ns=(5,))
        return scrub_pii(out).select(
            "doc_id", "split", "text_scrubbed",
            "top_2gram_char_frac", "dup_5gram_char_frac",
        )

    batch = chain(spark.read.parquet(str(root))).toPandas()
    stream_in = (
        spark.readStream.schema("doc_id bigint, text string")
        .parquet(str(root))
    )
    q = (
        chain(stream_in).writeStream.format("memory")
        .queryName("curation_stream").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM curation_stream").toPandas()
    b = batch.sort_values("doc_id").reset_index(drop=True)
    g = got.sort_values("doc_id").reset_index(drop=True)
    assert len(b) and b.equals(g)
    assert (b["text_scrubbed"].str.contains("<EMAIL>")).all()


def test_exact_dedup_stream_keep_min_is_deterministic(tmp_path, spark):
    """With keep_min_column, the in-batch winner is the min-id row under
    ANY partitioning (dropDuplicates alone keeps a shuffle-order-dependent
    winner), and later batches still drop cross-batch duplicates."""
    from sed_binning_spark.streaming.stateful import exact_dedup_stream

    root = tmp_path / "dedup_min_in"
    root.mkdir()
    pd.DataFrame({
        "doc_id": [5, 1, 9, 3],
        "text": ["same", "same", "same", "other"],
    }).to_parquet(root / "chunk_0.parquet")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1).parquet(str(root))
    )
    q = (
        exact_dedup_stream(stream, keep_min_column="doc_id")
        .writeStream.format("memory").queryName("dedup_min")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_min").toPandas()
    assert sorted(got["doc_id"]) == [1, 3]  # min of the dup class, not 5
    # second batch: the digest is already seen -> nothing re-emitted
    pd.DataFrame({"doc_id": [0], "text": ["same"]}).to_parquet(root / "chunk_1.parquet")
    q2 = (
        exact_dedup_stream(stream, keep_min_column="doc_id")
        .writeStream.format("memory").queryName("dedup_min2")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q2.awaitTermination(120)
    with pytest.raises(ValueError, match="does not combine"):
        exact_dedup_stream(stream, keep_min_column="doc_id",
                           event_time_column="ts")


def test_minhash_gate_refuses_colliding_columns(spark):
    from sed_binning_spark.streaming.stateful import minhash_dedup_stream

    corpus = spark.createDataFrame([(0, "ref text")], "doc_id long, text string")
    stream = spark.createDataFrame(
        [(1, "x", "meta")], "doc_id long, text string, band_0 string",
    )
    with pytest.raises(ValueError, match="collide"):
        minhash_dedup_stream(stream, corpus)


def test_forward_fill_stream_global_multi_column_order(tmp_path, spark):
    """Global mode over loader-minted chunks: row_id restarts per file, so
    ordering must be (file_id, row_id) — the fill then matches the batch
    fill over the concatenated files in that order."""
    import numpy as np

    from sed_binning_spark.streaming.stateful import forward_fill_stream

    root = tmp_path / "ffg_in"
    root.mkdir()
    # file 0: value set at row 0 then NaNs; file 1: all NaN -> must fill
    # from file 0's LAST row (3.0), not an interleaved row
    pd.DataFrame({
        "file_id": [0, 0, 0], "row_id": [0, 1, 2],
        "v": [1.0, np.nan, 3.0],
    }).to_parquet(root / "chunk_0.parquet")
    pd.DataFrame({
        "file_id": [1, 1], "row_id": [0, 1], "v": [np.nan, np.nan],
    }).to_parquet(root / "chunk_1.parquet")
    stream = (
        spark.readStream.schema("file_id bigint, row_id bigint, v double")
        .parquet(str(root))  # one trigger spans BOTH files
    )
    out = forward_fill_stream(
        stream, "v", file_column=None, row_column=("file_id", "row_id"),
    )
    q = (
        out.writeStream.format("memory").queryName("ffg")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM ffg").toPandas()
        .sort_values(["file_id", "row_id"]).reset_index(drop=True)
    )
    assert list(got["v"]) == [1.0, 1.0, 3.0, 3.0, 3.0]


def test_dedup_segments_stream_matches_batch_winners(tmp_path, spark):
    """Drained keep-first segment winners equal the batch dedup_segments
    winner set when arrival order agrees with id order (crawl-order ids),
    and sink-side reassembly rebuilds the batch operator's text_dedup."""
    from sed_binning_spark.pipeline.dedup import dedup_segments
    from sed_binning_spark.streaming import dedup_segments_stream, reassemble_segments

    root = tmp_path / "segdd_in"
    root.mkdir()
    chunk0 = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["A\n\nB", "B\n\nC"],
    })
    chunk1 = pd.DataFrame({
        "doc_id": [3, 4],
        # A and C repeat from chunk 0; D and E are new; doc 4 also repeats
        # its own paragraph (in-batch dup at a later pos)
        "text": ["A\n\nD\n\nC", "E\n\nE"],
    })
    chunk0.to_parquet(root / "chunk_0.parquet")
    chunk1.to_parquet(root / "chunk_1.parquet")

    stream = stream_events(spark, str(root), max_files_per_trigger=1)
    q = (
        dedup_segments_stream(stream)
        .writeStream.format("memory").queryName("segdd_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.pos, r.seg)
        for r in spark.sql("SELECT * FROM segdd_stream").collect()
    }
    assert got == {
        (1, 0, "A"), (1, 1, "B"), (2, 1, "C"), (3, 1, "D"), (4, 0, "E"),
    }

    # sink-side reassembly == the batch operator's text_dedup
    batch = spark.createDataFrame(
        pd.concat([chunk0, chunk1], ignore_index=True),
    )
    want = {
        r.doc_id: r.text_dedup
        for r in dedup_segments(batch).collect()
        if r.n_kept > 0
    }
    winners = spark.sql("SELECT * FROM segdd_stream")
    rebuilt = {
        r.doc_id: r.text_dedup for r in reassemble_segments(winners).collect()
    }
    assert rebuilt == want


def test_dedup_segments_stream_watermark_prunes_state(tmp_path, spark):
    """With an event-time column, segment state expires once the watermark
    passes its last sighting + delay: an old segment recurring AFTER the
    horizon is emitted again (dedup within the horizon only)."""
    from sed_binning_spark.streaming import dedup_segments_stream

    root = tmp_path / "segttl_in"
    root.mkdir()
    # tz-aware (instant) timestamps: a watermark needs TIMESTAMP, and the
    # parquet reader maps naive µs to TIMESTAMP_NTZ
    t = pd.Timestamp("2026-01-01 10:00:00", tz="UTC")
    mins = pd.Timedelta(minutes=1)
    # X first seen at 10:00; later chunks advance the watermark (delay 10
    # min) past X's horizon WITHOUT carrying X (state removal needs a
    # batch where the timed-out group has no data), then X returns
    chunks = [
        pd.DataFrame({"doc_id": [1], "text": ["X"], "ts": [t]}),
        pd.DataFrame({"doc_id": [2], "text": ["Y"], "ts": [t + 90 * mins]}),
        pd.DataFrame({"doc_id": [3], "text": ["Z"], "ts": [t + 100 * mins]}),
        pd.DataFrame({"doc_id": [4], "text": ["X"], "ts": [t + 110 * mins]}),
    ]
    for i, c in enumerate(chunks):
        # µs timestamps: the engine session reads NANOS columns as bigint
        # (nanosAsLong), which a watermark cannot ride on
        c.to_parquet(
            root / f"chunk_{i}.parquet",
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )

    stream = stream_events(spark, str(root), max_files_per_trigger=1)
    q = (
        dedup_segments_stream(
            stream, event_time_column="ts", watermark_delay="10 minutes",
        )
        .writeStream.format("memory").queryName("segttl_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.doc_id, r.seg)
        for r in spark.sql("SELECT * FROM segttl_stream").collect()
    )
    # X appears TWICE: its first state expired before doc 4 arrived
    assert got == [(1, "X"), (2, "Y"), (3, "Z"), (4, "X")]


def test_rowwise_lm_scoring_runs_on_a_stream(tmp_path, spark):
    """The map-only LM scorer is stateless and append-safe: a drained
    stream scores identically to the batch frame — the ingest-time
    quality gate (readStream -> score -> filter -> writeStream)."""
    from sed_binning_spark.pipeline.lm import (
        unigram_logprob_rowwise,
        unigram_model,
    )

    root = tmp_path / "lmrow_in"
    root.mkdir()
    pd.DataFrame({"doc_id": [1, 2], "text": ["the cat sat", "zz qq"]}).to_parquet(
        root / "chunk_0.parquet",
    )
    pd.DataFrame({"doc_id": [3], "text": ["the cat"]}).to_parquet(
        root / "chunk_1.parquet",
    )
    ref = spark.createDataFrame(
        [(0, "the cat sat on the mat")], "doc_id long, text string",
    )
    model = unigram_model(ref)

    stream = stream_events(spark, str(root), max_files_per_trigger=1)
    q = (
        unigram_logprob_rowwise(stream, model)
        .writeStream.format("memory").queryName("lmrow_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: r.unigram_logprob
        for r in spark.sql("SELECT * FROM lmrow_stream").collect()
    }
    batch = spark.read.parquet(str(root))
    want = {
        r.doc_id: r.unigram_logprob
        for r in unigram_logprob_rowwise(batch, model).collect()
    }
    assert got == want and got[1] > got[2]  # in-vocab beats junk


def test_perplexity_buckets_stream_matches_batch(tmp_path, spark):
    """CCNet bucket ASSIGNMENT is a map-only CASE, so with PRE-FIT
    literal thresholds (a global quantile is impossible on a stream by
    construction — the docstring contract) a drained stream labels
    identically to the batch frame, NULL scores included."""
    from sed_binning_spark.pipeline.lm import assign_perplexity_buckets

    root = tmp_path / "ppl_in"
    root.mkdir()
    pd.DataFrame({
        "doc_id": [1, 2, 3], "unigram_logprob": [-1.0, -5.0, -9.0],
    }).to_parquet(root / "chunk_0.parquet")
    pd.DataFrame({
        "doc_id": [4, 5], "unigram_logprob": [-6.0, None],
    }).to_parquet(root / "chunk_1.parquet")
    cuts = [-8.0, -4.0]  # pre-fit, the stream posture

    stream = stream_events(spark, str(root), max_files_per_trigger=1)
    q = (
        assign_perplexity_buckets(stream, cuts)
        .writeStream.format("memory").queryName("ppl_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: r.ppl_bucket
        for r in spark.sql("SELECT * FROM ppl_stream").collect()
    }
    batch = spark.read.parquet(str(root))
    want = {
        r.doc_id: r.ppl_bucket
        for r in assign_perplexity_buckets(batch, cuts).collect()
    }
    assert got == want
    assert got == {1: "head", 2: "middle", 3: "tail", 4: "middle", 5: None}


@pytest.mark.parametrize("hf", ["md5", "rolling"])
def test_dedup_substrings_stream_matches_batch_with_sink_rebuild(tmp_path, spark, hf):
    """Drained keep-first window winners, applied to the corpus via
    apply_substring_winners, reproduce the batch dedup_substrings output
    when arrival order agrees with id order (crawl-order ids) — under
    both the md5 and the Rabin-Karp window-hash paths (the winner set is
    hash-value-independent, and the rolling path's layered zip pipeline
    must behave inside a streaming micro-batch plan too)."""
    from sed_binning_spark.pipeline.dedup import (
        apply_substring_winners,
        dedup_substrings,
    )
    from sed_binning_spark.streaming import dedup_substrings_stream

    root = tmp_path / "subdd_in"
    root.mkdir()
    chunk0 = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["A B C D E unique tail", "x y A B C D E z"],
    })
    chunk1 = pd.DataFrame({
        "doc_id": [3, 4],
        "text": ["A B C D E", "fresh words only here"],
    })
    chunk0.to_parquet(root / "chunk_0.parquet")
    chunk1.to_parquet(root / "chunk_1.parquet")

    stream = stream_events(spark, str(root), max_files_per_trigger=1)
    q = (
        dedup_substrings_stream(stream, window=5, hash_function=hf)
        .writeStream.format("memory").queryName(f"subdd_stream_{hf}")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    winners = spark.sql(f"SELECT * FROM subdd_stream_{hf}")
    # doc 1 wins its three windows; doc 2's "A B C D E" window (start 2)
    # loses to (1, 0) in the same batch; doc 3's only window loses across
    # batches; doc 4 is shorter than the window and emits none
    assert {(r.doc_id, r.start) for r in winners.collect()} == {
        (1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (2, 3),
    }

    batch = spark.createDataFrame(
        pd.concat([chunk0, chunk1], ignore_index=True),
    )
    via_stream = {
        r.doc_id: (r.text_dedup, r.n_removed_tokens)
        for r in apply_substring_winners(batch, winners, window=5).collect()
    }
    via_batch = {
        r.doc_id: (r.text_dedup, r.n_removed_tokens)
        for r in dedup_substrings(batch, window=5, hash_function=hf).collect()
    }
    assert via_stream == via_batch
    assert via_stream[3] == ("", 5)  # doc 3 fully covered by doc 1's window


def test_dedup_substrings_stream_apply_modes_match(tmp_path, spark):
    """The batch apply's plan and verification options work UNCHANGED on
    a DRAINED stream winner frame, so the two surfaces cannot drift:
    ``loser_filtered=True`` rebuilds byte-identical texts from the same
    winners; ``strict=True`` with a manifest cut at drain time accepts
    the legitimate cross-batch full duplicate (doc 3 rebuilds empty, no
    raise) and still aborts when the corpus gains a document the stream
    never saw — the exact partial-drain hazard the apply contract
    documents."""
    import pytest

    from sed_binning_spark.pipeline.dedup import (
        apply_substring_winners,
        substring_winner_manifest,
    )
    from sed_binning_spark.streaming import dedup_substrings_stream

    root = tmp_path / "subdd_modes_in"
    root.mkdir()
    chunk0 = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["A B C D E unique tail", "x y A B C D E z"],
    })
    chunk1 = pd.DataFrame({
        "doc_id": [3, 4],
        "text": ["A B C D E", "fresh words only here"],
    })
    chunk0.to_parquet(root / "chunk_0.parquet")
    chunk1.to_parquet(root / "chunk_1.parquet")

    stream = stream_events(spark, str(root), max_files_per_trigger=1)
    q = (
        dedup_substrings_stream(stream, window=5)
        .writeStream.format("memory").queryName("subdd_modes")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    winners = spark.sql("SELECT * FROM subdd_modes")

    batch = spark.createDataFrame(
        pd.concat([chunk0, chunk1], ignore_index=True),
    )
    default_plan = {
        r.doc_id: (r.text_dedup, r.n_removed_tokens)
        for r in apply_substring_winners(batch, winners, window=5).collect()
    }
    loser_plan = {
        r.doc_id: (r.text_dedup, r.n_removed_tokens)
        for r in apply_substring_winners(
            batch, winners, window=5, loser_filtered=True,
        ).collect()
    }
    assert default_plan == loser_plan

    # manifest cut at drain time (the winner frame is known complete for
    # exactly this corpus): doc 3 is a true full duplicate and rebuilds
    # empty under strict, under BOTH plans
    manifest = substring_winner_manifest(batch, winners, window=5)
    for lf in (False, True):
        strict_out = {
            r.doc_id: r.text_dedup
            for r in apply_substring_winners(
                batch, winners, window=5, strict=True, manifest=manifest,
                loser_filtered=lf,
            ).collect()
        }
        assert strict_out[3] == "" and strict_out == {
            k: v[0] for k, v in default_plan.items()
        }

    # a document the stream never saw: missing manifest row -> abort
    # instead of silently emptying it
    grown = batch.unionByName(spark.createDataFrame(
        pd.DataFrame({"doc_id": [5], "text": ["never reached the stream q r s t u"]}),
    ))
    with pytest.raises(Exception, match="manifest"):
        apply_substring_winners(
            grown, winners, window=5, strict=True, manifest=manifest,
        ).collect()


def test_extract_features_runs_on_a_structured_stream(tmp_path, spark):
    """The multimodal featurizer is a stateless mapInPandas stage, so the
    SAME plan ingests a live media stream unchanged: real codec decode
    (PNG + PPM + byte-stats fallback) per micro-batch, one batch per
    file, results identical to the batch run over the union."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        encode_image_png,
        encode_image_ppm,
        extract_features,
    )

    img = np.full((3, 5, 3), 64, np.uint8)
    root = tmp_path / "media_in"
    root.mkdir()
    pd.DataFrame({
        "media_id": [0, 1],
        "payload": [bytes(encode_image_ppm(img)), b"plain text"],
    }).to_parquet(root / "chunk_0.parquet")
    pd.DataFrame({
        "media_id": [2],
        "payload": [bytes(encode_image_png(img, interlace=True))],
    }).to_parquet(root / "chunk_1.parquet")

    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1).parquet(str(root))
    )
    q = (
        extract_features(stream, feature_dim=8)
        .writeStream.format("memory").queryName("media_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (spark.sql("SELECT * FROM media_stream").toPandas()
           .set_index("media_id").sort_index())
    batch = (extract_features(
        spark.read.parquet(str(root)), feature_dim=8,
    ).toPandas().set_index("media_id").sort_index())
    assert list(got.index) == [0, 1, 2]
    for mid in got.index:
        assert list(got.loc[mid, "feat"]) == list(batch.loc[mid, "feat"])
    # PNG (interlaced) and PPM decode to the same raster stats
    assert list(got.loc[2, "feat"]) == list(got.loc[0, "feat"])
    assert got.loc[1, "feat"][0] == 0.0  # byte-stats fallback


def test_sample_frames_runs_on_a_structured_stream(tmp_path, spark):
    """Frame sampling is the same stateless mapInPandas shape as the
    featurizer, so a live media stream decodes frame timelines per
    micro-batch unchanged — animated GIF in one file, an undecodable
    payload in the other contributing no rows, results identical to the
    batch run over the union."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        encode_gif_animation,
        sample_frames,
    )

    a = np.full((2, 3, 3), 10, np.uint8)
    b = np.full((2, 3, 3), 40, np.uint8)
    anim = encode_gif_animation(
        [dict(img=a, delay_ms=20), dict(img=b, delay_ms=50)],
        screen_size=(3, 2),
    )
    root = tmp_path / "frames_in"
    root.mkdir()
    pd.DataFrame({"media_id": [0], "payload": [bytes(anim)]}) \
        .to_parquet(root / "chunk_0.parquet")
    pd.DataFrame({"media_id": [1], "payload": [b"not a video"]}) \
        .to_parquet(root / "chunk_1.parquet")

    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1).parquet(str(root))
    )
    q = (
        sample_frames(stream)
        .writeStream.format("memory").queryName("frame_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM frame_stream").toPandas() \
        .sort_values(["media_id", "frame_index"]).reset_index(drop=True)
    batch = sample_frames(spark.read.parquet(str(root))).toPandas() \
        .sort_values(["media_id", "frame_index"]).reset_index(drop=True)
    assert got.equals(batch)
    assert list(got.media_id) == [0, 0]
    assert list(got.frame_ms) == [0, 20] and list(got.delay_ms) == [20, 50]


def test_sample_audio_windows_runs_on_a_structured_stream(tmp_path, spark):
    """Audio windowing is the same stateless mapInPandas shape: a live
    media stream windows per micro-batch unchanged — WAV in one file, a
    non-audio payload in the other contributing no rows, results
    identical to the batch run over the union."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        encode_audio_wav,
        sample_audio_windows,
    )

    wav = encode_audio_wav(
        np.array([16384, 16384, -16384, -16384, 8192, 8192], "<i2"),
        sample_rate=1000,
    )
    root = tmp_path / "audio_in"
    root.mkdir()
    pd.DataFrame({"media_id": [0], "payload": [bytes(wav)]}) \
        .to_parquet(root / "chunk_0.parquet")
    pd.DataFrame({"media_id": [1], "payload": [b"not audio"]}) \
        .to_parquet(root / "chunk_1.parquet")

    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1).parquet(str(root))
    )
    q = (
        sample_audio_windows(stream, window_ms=2)
        .writeStream.format("memory").queryName("audio_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM audio_stream").toPandas() \
        .sort_values(["media_id", "window_index"]).reset_index(drop=True)
    batch = sample_audio_windows(
        spark.read.parquet(str(root)), window_ms=2,
    ).toPandas().sort_values(["media_id", "window_index"]) \
        .reset_index(drop=True)
    assert got.equals(batch)
    assert list(got.media_id) == [0, 0, 0]
    assert list(got.start_ms) == [0, 2, 4]
    assert list(got["rms"]) == [0.5, 0.5, 0.25]


def test_transcode_audio_runs_on_a_structured_stream(tmp_path, spark):
    """transcode_audio is the same stateless mapInPandas shape: a live
    stream normalizes per micro-batch (downmix + integral-ratio
    resample), the non-audio payload degrades to a NULL-payload row
    with its id preserved, results identical to the batch run."""
    import numpy as np

    from sed_binning_spark.pipeline.multimodal import (
        encode_audio_wav,
        transcode_audio,
    )

    wav = encode_audio_wav(
        np.array([[1000, 3000], [2000, 4000], [-1000, -3000],
                  [0, 0], [500, 1500], [600, 1400]], "<i2"),
        sample_rate=1000,
    )
    root = tmp_path / "transcode_in"
    root.mkdir()
    pd.DataFrame({"media_id": [0], "payload": [bytes(wav)]}) \
        .to_parquet(root / "chunk_0.parquet")
    pd.DataFrame({"media_id": [1], "payload": [b"not audio"]}) \
        .to_parquet(root / "chunk_1.parquet")

    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1).parquet(str(root))
    )
    q = (
        transcode_audio(stream, target_rate=500, mono=True)
        .writeStream.format("memory").queryName("transcode_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM transcode_stream").toPandas() \
        .sort_values("media_id").reset_index(drop=True)
    batch = transcode_audio(
        spark.read.parquet(str(root)), target_rate=500, mono=True,
    ).toPandas().sort_values("media_id").reset_index(drop=True)
    assert got.equals(batch)
    assert got.payload[1] is None  # id preserved, payload degraded
    from sed_binning_spark.pipeline.multimodal import decode_audio_wav

    dec, rate = decode_audio_wav(bytes(got.payload[0]))
    assert rate == 500
    # mono means of samples 0, 2, 4 (integral-ratio picks)
    np.testing.assert_array_equal(dec.ravel(), [2000, -2000, 1000])


def test_round14_media_on_a_structured_stream(tmp_path, spark):
    """The round-14 additions inherit the stateless mapInPandas
    streaming shape: a FLAC payload windows per micro-batch (real
    lossless decode inside the stream) and a LACED WebM audio payload
    yields its per-frame timeline rows, both identical to the batch
    run over the same files."""
    import numpy as np

    from sed_binning_spark.pipeline.flac import encode_flac
    from sed_binning_spark.pipeline.multimodal import (
        sample_audio_windows,
        sample_frames,
    )
    from sed_binning_spark.pipeline.webm import encode_webm

    t = np.arange(8)
    flac = encode_flac(((t * 911) % 3001 - 1500).astype(np.int64),
                       1000, block_size=8)
    laced = encode_webm(
        [b"a" * 4, b"b" * 6, b"c" * 5], [0, 20, 40], track_type=2,
        codec_id="A_OPUS", default_duration_ms=20, lacing="xiph",
        frames_per_block=3,
    )
    root = tmp_path / "r14_in"
    root.mkdir()
    pd.DataFrame({"media_id": [0], "payload": [bytes(flac)]}) \
        .to_parquet(root / "chunk_0.parquet")
    pd.DataFrame({"media_id": [1], "payload": [bytes(laced)]}) \
        .to_parquet(root / "chunk_1.parquet")

    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1).parquet(str(root))
    )
    q = (
        sample_audio_windows(stream, window_ms=2)
        .writeStream.format("memory").queryName("r14_audio")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM r14_audio").toPandas() \
        .sort_values(["media_id", "window_index"]).reset_index(drop=True)
    batch = sample_audio_windows(
        spark.read.parquet(str(root)), window_ms=2,
    ).toPandas().sort_values(["media_id", "window_index"]) \
        .reset_index(drop=True)
    assert got.equals(batch)
    assert list(got.media_id) == [0] * 4  # the WebM row has no PCM

    q2 = (
        sample_frames(stream, media="audio")
        .writeStream.format("memory").queryName("r14_frames")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    got2 = spark.sql("SELECT * FROM r14_frames").toPandas() \
        .sort_values(["media_id", "frame_index"]).reset_index(drop=True)
    batch2 = sample_frames(
        spark.read.parquet(str(root)), media="audio",
    ).toPandas().sort_values(["media_id", "frame_index"]) \
        .reset_index(drop=True)
    assert got2.equals(batch2)
    assert list(got2.n_bytes) == [4, 6, 5]  # the laced extents
    assert list(got2.frame_ms) == [0, 20, 40]


def test_extract_media_tags_on_a_structured_stream(tmp_path, spark):
    """extract_media_tags is the same stateless mapInPandas shape: tag
    rows stream per micro-batch (ID3 and ilst walks inside the
    stream), an unrecognized payload degrades to zero rows, results
    identical to the batch run over the same files."""
    from sed_binning_spark.pipeline.tags import (
        encode_id3v2,
        encode_mp4_tags_fixture,
        extract_media_tags,
    )

    id3 = encode_id3v2(
        [("TIT2", "Stream Song"), ("TPE1", "Streamer")], version=3,
    )
    ilst = encode_mp4_tags_fixture([(b"\xa9nam", "Stream Vid")])
    root = tmp_path / "tags_in"
    root.mkdir()
    pd.DataFrame({"media_id": [0], "payload": [bytes(id3)]}) \
        .to_parquet(root / "chunk_0.parquet")
    pd.DataFrame({"media_id": [1, 2],
                  "payload": [bytes(ilst), b"not a container"]}) \
        .to_parquet(root / "chunk_1.parquet")

    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1).parquet(str(root))
    )
    q = (
        extract_media_tags(stream)
        .writeStream.format("memory").queryName("tags_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM tags_stream").toPandas() \
        .sort_values(["media_id", "key"]).reset_index(drop=True)
    batch = extract_media_tags(spark.read.parquet(str(root))) \
        .toPandas().sort_values(["media_id", "key"]) \
        .reset_index(drop=True)
    assert got.equals(batch)
    assert [tuple(r) for r in got.itertuples(index=False)] == [
        (0, "mp3", "artist", "Streamer"),
        (0, "mp3", "title", "Stream Song"),
        (1, "mp4", "title", "Stream Vid"),
    ]


def test_extract_subtitle_cues_on_a_structured_stream(tmp_path, spark):
    """extract_subtitle_cues is the same stateless mapInPandas shape:
    cue rows stream per micro-batch (SubRip and Matroska walks inside
    the stream), an unparseable payload degrades to zero rows, results
    identical to the batch run over the same files."""
    from sed_binning_spark.pipeline.subtitles import (
        encode_matroska_subtitles,
        encode_srt,
        extract_subtitle_cues,
    )

    srt = encode_srt([(0, 1000, "first"), (1500, 2500, "second")])
    mkv = encode_matroska_subtitles([(0, 2000, "muxed cue")])
    root = tmp_path / "subs_in"
    root.mkdir()
    pd.DataFrame({"media_id": [0], "payload": [bytes(srt)]}) \
        .to_parquet(root / "chunk_0.parquet")
    pd.DataFrame({"media_id": [1, 2],
                  "payload": [bytes(mkv), b"not subtitles \x00"]}) \
        .to_parquet(root / "chunk_1.parquet")

    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1).parquet(str(root))
    )
    q = (
        extract_subtitle_cues(stream)
        .writeStream.format("memory").queryName("subs_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM subs_stream").toPandas() \
        .sort_values(["media_id", "cue_index"]).reset_index(drop=True)
    batch = extract_subtitle_cues(spark.read.parquet(str(root))) \
        .toPandas().sort_values(["media_id", "cue_index"]) \
        .reset_index(drop=True)
    assert got.equals(batch)
    assert [tuple(r) for r in got.itertuples(index=False)] == [
        (0, "srt", 1, 0, 1000, "first"),
        (0, "srt", 2, 1500, 2500, "second"),
        (1, "mkv", 1, 0, 2000, "muxed cue"),
    ]


def test_media_manifest_on_a_structured_stream(tmp_path, spark):
    """media_manifest is the same stateless mapInPandas shape: triage
    rows stream per micro-batch, the keep-the-row error posture
    included, identical to the batch run."""
    from sed_binning_spark.pipeline.manifest import media_manifest
    from sed_binning_spark.pipeline.mp3 import encode_mp3_frames

    root = tmp_path / "man_in"
    root.mkdir()
    pd.DataFrame({"media_id": [0],
                  "payload": [bytes(encode_mp3_frames(2))]}) \
        .to_parquet(root / "chunk_0.parquet")
    pd.DataFrame({"media_id": [1], "payload": [b"garbage \x00"]}) \
        .to_parquet(root / "chunk_1.parquet")

    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1).parquet(str(root))
    )
    q = (
        media_manifest(stream)
        .writeStream.format("memory").queryName("man_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM man_stream").toPandas() \
        .sort_values("media_id").reset_index(drop=True)
    batch = media_manifest(spark.read.parquet(str(root))).toPandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert got.equals(batch)
    assert got.container[0] == "mp3" and got.error[0] is None
    assert got.container[1] is None and got.error[1]


def test_image_dhash_on_a_structured_stream(tmp_path, spark):
    """image_dhash is the same stateless mapInPandas shape: hashes
    stream per micro-batch, non-image payloads degrade to zero rows,
    identical to the batch run."""
    import numpy as np

    from sed_binning_spark.pipeline.imagehash import image_dhash
    from sed_binning_spark.pipeline.multimodal import encode_image_png

    img = np.arange(27, dtype=np.uint8).reshape(3, 3, 3) * 9
    root = tmp_path / "dh_in"
    root.mkdir()
    pd.DataFrame({"media_id": [0],
                  "payload": [bytes(encode_image_png(img))]}) \
        .to_parquet(root / "chunk_0.parquet")
    pd.DataFrame({"media_id": [1], "payload": [b"not an image"]}) \
        .to_parquet(root / "chunk_1.parquet")

    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1).parquet(str(root))
    )
    q = (
        image_dhash(stream)
        .writeStream.format("memory").queryName("dh_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dh_stream").toPandas() \
        .sort_values("media_id").reset_index(drop=True)
    batch = image_dhash(spark.read.parquet(str(root))).toPandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert got.equals(batch)
    assert list(got.media_id) == [0]
