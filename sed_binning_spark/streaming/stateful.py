"""Stateful streaming operators: custom per-group state that must survive
across micro-batches.

Streaming aggregations (``bin_stream``) cover the histogram side; these
cover the two operators whose semantics are inherently *sequential*:

- :func:`forward_fill_stream` — the streaming twin of
  ``core.dfops.forward_fill``. Slow-channel columns (temperatures, bias
  voltages) arrive sparsely; each new micro-batch must seed its leading
  NULLs with the last value seen in PREVIOUS batches. That carry value is
  exactly per-group streaming state: ``applyInPandasWithState`` keyed by
  file/stream id, state = last non-null per column.
- :func:`exact_dedup_stream` — streaming exact dedup: emit only the first
  occurrence of each content digest. Spark's ``dropDuplicates`` (state
  keyed by digest) does this natively; with an event-time watermark the
  digest state is pruned instead of growing forever.

Scale notes: state lives in the executors' state store, partitioned by the
group key — per-file carry values are O(files x columns), digest-dedup
state is O(distinct digests in the watermark horizon). Neither ever
concentrates on the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def forward_fill_stream(
    df: DataFrame,
    columns: str | Sequence[str],
    file_column: str | None = "file_id",
    row_column: str | Sequence[str] = "row_id",
) -> DataFrame:
    """Forward-fill NaN/NULL in ``columns`` across micro-batch boundaries.

    Grouped by ``file_column``; within each micro-batch the group's rows
    are sorted by ``row_column`` and filled, leading gaps seeded from the
    carry state left by earlier batches. Each file group fills
    INDEPENDENTLY — unlike the batch
    :func:`~sed_binning_spark.core.dfops.forward_fill`, no value crosses
    from one file into the next (a stream cannot know file N is "before"
    file N+1 when their batches interleave). For the sequential-acquisition
    semantics — one logical stream whose chunks arrive in order, carry
    crossing every boundary — pass ``file_column=None``: all rows share one
    state and the drained result equals the batch fill in that order.

    ``row_column`` may be a SEQUENCE of columns and must totally order the
    rows WITHIN one state group: the loaders mint ``row_id`` restarting at
    0 per file, so with ``file_column=None`` over loader-minted chunks pass
    ``row_column=("file_id", "row_id")`` — sorting by the per-file index
    alone would interleave two files that land in one micro-batch and fill
    from the wrong rows. The sort is stable (mergesort), so equal keys keep
    their input order deterministically rather than shuffle-arrival order.

    Fill columns must be double (the carry state is a double per column —
    matching the instrument use case of float slow-channels).
    """
    if isinstance(columns, str):
        columns = [columns]
    columns = list(columns)
    row_columns = [row_column] if isinstance(row_column, str) else list(row_column)
    if file_column is None:
        file_column = "__ff_stream_group"
        while file_column in df.columns:  # never clobber a caller's column
            file_column = "_" + file_column
        df = df.withColumn(file_column, F.lit(0))
        return forward_fill_stream(df, columns, file_column, row_columns).drop(
            file_column,
        )
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise KeyError(f"columns not in dataframe: {missing}")
    # validate the sort/group columns too — a typo'd row_column would
    # otherwise only surface as a bare pandas KeyError inside an executor
    # task after the streaming query has started
    for col, role in (
        *[(rc, "row_column") for rc in row_columns],
        (file_column, "file_column"),
    ):
        if col not in df.columns:
            raise KeyError(f"{role} {col!r} not in dataframe columns {df.columns}")
    dtypes = dict(df.dtypes)
    non_double = [c for c in columns if dtypes[c] != "double"]
    if non_double:
        raise ValueError(
            f"forward_fill_stream needs double fill columns, got "
            f"{{{', '.join(f'{c}: {dtypes[c]}' for c in non_double)}}}",
        )

    out_schema = df.schema
    state_schema = StructType(
        [StructField(f"c{i}", DoubleType(), True) for i in range(len(columns))],
    )
    cols = list(columns)
    row_cols = row_columns

    def _fill(key, pdf_iter, state):
        # sanitize state on read: a never-seen column may round-trip as
        # None OR NaN depending on the state-store serialization
        carry = (
            [None if v is None or (isinstance(v, float) and np.isnan(v)) else v
             for v in state.get]
            if state.exists
            else [None] * len(cols)
        )
        # concat the group's chunks before sorting: the iterator may split
        # one group into several frames whose row ranges interleave
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if len(pdf):
            # stable sort: equal keys keep concat order deterministically
            pdf = pdf.sort_values(row_cols, ignore_index=True, kind="mergesort")
            for i, c in enumerate(cols):
                filled = pdf[c].ffill()
                if carry[i] is not None:
                    filled = filled.fillna(carry[i])
                pdf[c] = filled
                last = filled.iloc[-1]
                if pd.notna(last):
                    carry[i] = float(last)
            yield pdf
        state.update(tuple(carry))

    return (
        df.groupBy(file_column)
        .applyInPandasWithState(
            _fill,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


def exact_dedup_stream(
    df: DataFrame,
    text_column: str = "text",
    event_time_column: str | None = None,
    watermark_delay: str = "10 minutes",
    keep_min_column: str | None = None,
) -> DataFrame:
    """Streaming exact dedup: pass through only the FIRST row of each
    distinct text (by content digest, same md5 as the batch
    ``pipeline.dedup.exact_dedup``).

    Without ``event_time_column`` the digest state grows with the number of
    distinct documents (fine for bounded corpora); with it, state older
    than the watermark horizon is dropped — the unbounded-stream form,
    which deduplicates within the horizon only.

    When BOTH duplicates land in the same micro-batch, ``dropDuplicates``
    keeps an arbitrary shuffle-order-dependent winner — a replayed failed
    batch can emit a DIFFERENT row to a non-idempotent sink, and the
    result diverges from the batch ``exact_dedup``'s deterministic
    ``min(doc_id)``. Pass ``keep_min_column`` (e.g. ``"doc_id"``) to pin
    the in-batch winner to the row with the smallest value in that column
    via per-digest state (``applyInPandasWithState``); this form does not
    combine with ``event_time_column`` (its digest state is unpruned —
    bounded corpora only).
    """
    if keep_min_column is not None:
        if event_time_column is not None:
            raise ValueError(
                "keep_min_column does not combine with event_time_column "
                "(the per-digest state has no watermark pruning)",
            )
        return _exact_dedup_stream_keep_min(df, text_column, keep_min_column)
    dcol = "__digest"
    while dcol in df.columns:  # never clobber a caller's column
        dcol = "_" + dcol
    # missing text is not duplicate text (the batch exact_dedup contract):
    # md5(NULL) = NULL and dropDuplicates treats NULL == NULL, so without a
    # per-row fallback every NULL-text document after the first would be
    # silently swallowed as a "duplicate". The fallback must be
    # DETERMINISTIC (not uuid()/rand()): on a failed-and-replayed
    # micro-batch a non-deterministic key gives the same row a fresh dedup
    # state key, so the replay re-emits it to a non-idempotent sink. Derive
    # it from the row's other columns instead; two NULL-text rows identical
    # in every other column are indistinguishable and collapse, which is
    # the only replay-safe reading of "keep NULL-text rows".
    other = [c for c in df.columns if c != text_column]
    null_key = (
        F.concat(F.lit("__null__"), F.md5(F.to_json(F.struct(*other))))
        if other else F.lit("__null__")
    )
    digest = F.when(
        F.col(text_column).isNotNull(), F.md5(F.col(text_column)),
    ).otherwise(null_key)
    out = df.withColumn(dcol, digest)
    if event_time_column is not None:
        out = out.withWatermark(event_time_column, watermark_delay)
        out = out.dropDuplicatesWithinWatermark([dcol])
    else:
        out = out.dropDuplicates([dcol])
    return out.drop(dcol)


def _exact_dedup_stream_keep_min(
    df: DataFrame, text_column: str, keep_min_column: str,
) -> DataFrame:
    """Deterministic-winner streaming dedup: state keyed by content digest
    (one 'seen' byte per digest); the first micro-batch containing a digest
    emits ONLY its min-``keep_min_column`` row — partitioning- and
    replay-independent — and every later batch emits nothing for it."""
    from pyspark.sql.types import IntegerType

    if keep_min_column not in df.columns:
        raise KeyError(
            f"keep_min_column {keep_min_column!r} not in dataframe "
            f"columns {df.columns}",
        )
    dcol = "__digest"
    while dcol in df.columns:
        dcol = "_" + dcol
    other = [c for c in df.columns if c != text_column]
    null_key = (
        F.concat(F.lit("__null__"), F.md5(F.to_json(F.struct(*other))))
        if other else F.lit("__null__")
    )
    digest = F.when(
        F.col(text_column).isNotNull(), F.md5(F.col(text_column)),
    ).otherwise(null_key)
    keyed = df.withColumn(dcol, digest)
    out_schema = df.schema
    state_schema = StructType([StructField("seen", IntegerType(), True)])
    out_cols = list(df.columns)
    kcol = keep_min_column

    def _dedup(key, pdf_iter, state):
        if not state.exists:
            pdf = pd.concat(list(pdf_iter), ignore_index=True)
            if len(pdf):
                winner = pdf.loc[[pdf[kcol].idxmin()], out_cols]
                yield winner
                state.update((1,))
        else:
            for _ in pdf_iter:  # drain: later occurrences emit nothing
                pass

    return keyed.groupBy(dcol).applyInPandasWithState(
        _dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def minhash_dedup_stream(
    stream: DataFrame,
    corpus: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_size: int = 3,
    broadcast_corpus: bool = True,
    hash_function: str = "md5",
    persist_lookup: bool = True,
) -> DataFrame:
    """Flag documents that near-duplicate a STATIC reference corpus at
    ingest time (the "don't re-crawl what we already have" gate).

    Band keys are appended to the stream side as pure per-row expressions
    (``pipeline.dedup.append_band_keys`` — no shuffle, no state), then one
    LEFT equi-join per band probes the corpus's precomputed
    ``(band key -> min id)`` lookup. Stream-static equi-joins are
    STATELESS in Structured Streaming — no state store, no watermark
    needed, throughput stays map-like.

    Returns the stream's rows plus ``dup_of``: the smallest corpus id
    sharing any band key, NULL when nothing collides (including NULL/blank
    text, whose band keys are NULL and therefore never match).

    At 100 TB: the lookup carries ``bands`` short strings per corpus doc —
    broadcast it while it fits (default); for a corpus too large to
    broadcast, ``broadcast_corpus=False`` shuffle-joins instead, which
    Structured Streaming also supports against static sides. The same
    function works on a batch ``stream`` frame unchanged (the joins are
    identical), which is how the batch-equivalence test pins it.
    """
    from pyspark.sql.functions import broadcast as _broadcast

    from sed_binning_spark.pipeline.dedup import _band_keys_stacked, append_band_keys

    # the band-key columns are working columns of THIS gate: a caller frame
    # already carrying one (or a previous gate's dup_of) would be silently
    # clobbered by append_band_keys' withColumns and then dropped — refuse
    # loudly instead (the module's never-clobber discipline)
    reserved = (
        [f"band_{b}" for b in range(bands)]
        + [f"__dup_{b}" for b in range(bands)]
        + ["dup_of"]
    )
    clash = [c for c in stream.columns if c in reserved]
    if clash:
        raise ValueError(
            f"stream columns {clash} collide with minhash_dedup_stream's "
            f"working/output columns; rename them before the gate",
        )
    s = append_band_keys(
        stream, text_column, id_column, num_hashes, bands, shingle_size,
        hash_function,
    )
    lut = _band_keys_stacked(
        corpus, text_column, id_column, num_hashes, bands, shingle_size,
        hash_function,
    ).groupBy("band", "key").agg(F.min(id_column).alias("__dup"))
    # Structured Streaming re-evaluates the static join side EVERY trigger;
    # without this persist each micro-batch would re-run the corpus-wide
    # shingle+md5+minhash scan and the (band,key) aggregation shuffle just
    # to rebuild an unchanged lookup. The cache entry lives until
    # spark.catalog.clearCache() — a long-lived driver constructing many
    # gates (one per corpus refresh) should pass persist_lookup=False or
    # clear the cache between them.
    if persist_lookup:
        lut = lut.persist()
    out = s
    for b in range(bands):
        lut_b = lut.where(F.col("band") == b).select(
            F.col("key").alias(f"band_{b}"), F.col("__dup").alias(f"__dup_{b}"),
        )
        if broadcast_corpus:
            lut_b = _broadcast(lut_b)
        out = out.join(lut_b, on=f"band_{b}", how="left")
    # F.least asserts on a single column — bands=1 is a legitimate config
    dup_cols = [F.col(f"__dup_{b}") for b in range(bands)]
    dup = dup_cols[0] if bands == 1 else F.least(*dup_cols)
    return out.withColumn("dup_of", dup).drop(
        *[f"band_{b}" for b in range(bands)],
        *[f"__dup_{b}" for b in range(bands)],
    )


def _delay_to_ms(delay: str) -> int:
    """Parse the common '10 minutes' CalendarInterval shorthand into ms
    (seconds/minutes/hours/days — the units watermark delays use)."""
    parts = delay.strip().split()
    if len(parts) != 2:
        raise ValueError(f"cannot parse delay {delay!r} (want 'N unit')")
    n = float(parts[0])
    unit = parts[1].rstrip("s").lower()
    scale = {"millisecond": 1, "second": 1000, "minute": 60_000,
             "hour": 3_600_000, "day": 86_400_000}.get(unit)
    if scale is None:
        raise ValueError(f"cannot parse delay unit in {delay!r}")
    return int(n * scale)


def dedup_segments_stream(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    granularity: str = "paragraph",
    event_time_column: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of :func:`~sed_binning_spark.pipeline.dedup.
    dedup_segments`' winner pass: emit each distinct segment's keep-first
    occurrence as an ``(id, pos, seg)`` row — the surviving-segment stream.

    State is keyed by the segment digest (``applyInPandasWithState``, one
    'seen' flag per distinct segment): the first micro-batch containing a
    segment emits exactly its min-``(id, pos)`` occurrence — the batch
    operator's deterministic winner, partitioning- and replay-independent —
    and every later sighting emits nothing. Drained over a bounded corpus
    this equals the batch ``dedup_segments`` winner set exactly (the
    batch-equivalence pin), modulo ARRIVAL order deciding "first" when the
    same segment lands in two different micro-batches: a stream cannot know
    a later chunk carried a smaller id, exactly like
    ``exact_dedup_stream``'s contract.

    Without ``event_time_column`` the per-segment state grows with the
    number of distinct segments (bounded corpora only); with it, a state
    entry is dropped once the watermark passes its LAST sighting plus
    ``watermark_delay`` — the unbounded-stream form, deduplicating within
    the horizon only (a boilerplate segment that keeps recurring keeps its
    state alive, which is what boilerplate removal wants).

    Rows with NULL id are excluded (they cannot reproducibly win — the
    batch contract); blank segments are separator residue, not content.
    Reassembly of surviving documents is a SINK-side batch concern:
    :func:`reassemble_segments` on the drained output (a per-document
    groupBy cannot follow per-segment state inside one streaming query
    without a second stateful stage).
    """
    from pyspark.sql.types import IntegerType, StringType

    from sed_binning_spark.pipeline.dedup import segment_array

    for col, what in [(text_column, "text"), (id_column, "id")]:
        if col not in df.columns:
            raise ValueError(
                f"{what} column {col!r} not in dataframe (columns: {df.columns})",
            )
    cols = [F.col(id_column)]
    if event_time_column is not None:
        if event_time_column not in df.columns:
            raise ValueError(
                f"event time column {event_time_column!r} not in dataframe "
                f"(columns: {df.columns})",
            )
        cols.append(F.col(event_time_column))
    segs = (
        df.where(F.col(id_column).isNotNull())
        .select(
            *cols,
            F.posexplode(segment_array(F.col(text_column), granularity)).alias(
                "pos", "seg",
            ),
        )
        .withColumn("__seg_d", F.md5(F.col("seg")))
    )
    id_type = df.schema[id_column].dataType
    out_schema = StructType([
        StructField(id_column, id_type, True),
        StructField("pos", IntegerType(), True),
        StructField("seg", StringType(), True),
    ])
    return _keep_first_stream(
        segs, "__seg_d", id_column, "pos", out_schema,
        event_time_column, watermark_delay,
    )


def _keep_first_stream(
    keyed: DataFrame,
    key_column: str,
    id_column: str,
    pos_column: str,
    out_schema: StructType,
    event_time_column: str | None,
    watermark_delay: str,
) -> DataFrame:
    """The shared keep-first state machine of the dedup stream twins
    (segments, substrings): per distinct ``key_column`` value, the first
    micro-batch emits its min-``(id, pos)`` occurrence's ``out_schema``
    columns and every later sighting emits nothing; with an event-time
    column, state expires at the watermark horizon past the LAST sighting
    (monotonic anchor). The group fold never materializes the group —
    bounded by the Arrow batch size even when the hottest boilerplate key
    occurs millions of times in one micro-batch."""
    from pyspark.sql.types import IntegerType, LongType

    timed = event_time_column is not None
    if timed:
        keyed = keyed.withWatermark(event_time_column, watermark_delay)
        ttl_ms = _delay_to_ms(watermark_delay)
    # anchor_ms = the max event time ever seen for this key — the
    # monotonic base of the timeout (a LATE-but-accepted re-sighting must
    # never shorten the horizon an earlier sighting established)
    state_schema = StructType([
        StructField("seen", IntegerType(), True),
        StructField("anchor_ms", LongType(), True),
    ])
    out_cols = [f.name for f in out_schema.fields]
    idc, posc = id_column, pos_column
    etc = event_time_column

    def _keep_first(key, pdf_iter, state):
        if timed and state.hasTimedOut:
            state.remove()
            return
        # fold chunk-by-chunk: per-chunk work is one sort index + one max;
        # memory stays bounded by the Arrow batch size (the streaming
        # analogue of the batch twins' map-side partial min(struct))
        emitted = state.exists
        best = None  # out_cols tuple of the min-(id, pos) occurrence
        ts_max_ms = None
        seen_any = False
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            seen_any = True
            if timed:
                ts = pdf[etc].dropna()
                if len(ts):
                    m = int(pd.Timestamp(ts.max()).value // 1_000_000)
                    ts_max_ms = m if ts_max_ms is None else max(ts_max_ms, m)
            if not emitted:
                i = pdf.sort_values([idc, posc], kind="mergesort").index[0]
                cand = tuple(pdf[c][i] for c in out_cols)
                ko = (cand[out_cols.index(idc)], cand[out_cols.index(posc)])
                if best is None or ko < best[0]:
                    best = (ko, cand)
        if best is not None:
            yield pd.DataFrame([best[1]], columns=out_cols)
        if not seen_any:
            return
        if timed:
            # monotonic refresh: max of the previous anchor and this
            # batch's max event time (recurring boilerplate stays deduped;
            # a late duplicate can only extend, never shorten). Anchored on
            # EVENT time — the current watermark is 0 on the first batch,
            # which would expire everything immediately; max_event + ttl is
            # always ahead of the watermark because the watermark itself
            # trails max_event by the same delay. All-NULL event times fall
            # back to watermark + ttl (degenerate rows; soonest legal
            # expiry).
            prev = state.get[1] if state.exists else None
            cands = [v for v in (prev, ts_max_ms) if v is not None]
            anchor = max(cands) if cands else None
            state.update((1, anchor))
            state.setTimeoutTimestamp(
                (anchor if anchor is not None else state.getCurrentWatermarkMs())
                + ttl_ms,
            )
        elif not emitted:
            state.update((1, None))

    return keyed.groupBy(key_column).applyInPandasWithState(
        _keep_first,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="EventTimeTimeout" if timed else "NoTimeout",
    )


def dedup_substrings_stream(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    window: int = 50,
    event_time_column: str | None = None,
    watermark_delay: str = "10 minutes",
    hash_function: str = "md5",
) -> DataFrame:
    """Streaming twin of :func:`~sed_binning_spark.pipeline.dedup.
    dedup_substrings`' winner pass: emit each distinct ``window``-token
    span's keep-first occurrence as an ``(id, start)`` row.

    Same state machine and contracts as :func:`dedup_segments_stream`
    (keyed by the window hash; arrival order decides "first" across
    micro-batches, min-``(id, start)`` within one; watermark-pruned
    monotonic horizons with ``event_time_column``). Documents shorter
    than ``window`` tokens emit no windows. Apply the drained winners to
    the corpus at the sink with :func:`~sed_binning_spark.pipeline.dedup.
    apply_substring_winners` (the batch operator's own second phase) to
    rebuild the deduplicated texts.
    """
    from pyspark.sql.types import IntegerType

    from sed_binning_spark.pipeline.dedup import _occ_window_explode
    from sed_binning_spark.pipeline.text import whitespace_tokens

    for col, what in [(text_column, "text"), (id_column, "id")]:
        if col not in df.columns:
            raise ValueError(
                f"{what} column {col!r} not in dataframe (columns: {df.columns})",
            )
    w = int(window)
    cols = [F.col(id_column)]
    if event_time_column is not None:
        if event_time_column not in df.columns:
            raise ValueError(
                f"event time column {event_time_column!r} not in dataframe "
                f"(columns: {df.columns})",
            )
        cols.append(F.col(event_time_column))
    # the SHARED occurrence builder: stream winners are only applicable
    # to the batch corpus because both sides hash through the same path
    occ = _occ_window_explode(
        df.where(F.col(id_column).isNotNull() & F.col(text_column).isNotNull())
        .select(*cols, whitespace_tokens(F.col(text_column)).alias("__tk")),
        [F.col(c) for c in (id_column, event_time_column) if c is not None],
        w, hash_function, "__win_d",
    )
    out_schema = StructType([
        StructField(id_column, df.schema[id_column].dataType, True),
        StructField("start", IntegerType(), True),
    ])
    return _keep_first_stream(
        occ, "__win_d", id_column, "start", out_schema,
        event_time_column, watermark_delay,
    )


def reassemble_segments(
    winners: DataFrame,
    id_column: str = "doc_id",
    granularity: str = "paragraph",
) -> DataFrame:
    """Rebuild ``(id, text_dedup, n_kept)`` from a surviving-segment frame
    — the sink-side batch half of :func:`dedup_segments_stream` (one
    ``groupBy(id)``; ``array_sort(collect_list(struct(pos, seg)))`` makes
    the rebuilt text independent of row order, exactly like the batch
    operator's reassembly)."""
    from sed_binning_spark.pipeline.dedup import _SEG_JOINERS

    if granularity not in _SEG_JOINERS:
        raise ValueError(
            f"granularity must be one of {sorted(_SEG_JOINERS)}, "
            f"got {granularity!r}",
        )
    return winners.groupBy(id_column).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            _SEG_JOINERS[granularity],
        ).alias("text_dedup"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )
