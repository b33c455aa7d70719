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
    assert 0 < out["count"].sum() <= len(pdf)
    # exact: matches the batch histogram total
    batch_total = (
        bin_dataframe_sparse(
            spark.createDataFrame(pdf), bins=[10], axes=["t"],
            ranges=[(60000.0, 120000.0)],
        ).agg(F.sum("count")).collect()[0][0]
    )
    assert out["count"].sum() == batch_total
