from sed_binning_spark.streaming.binning import bin_stream, stream_events
from sed_binning_spark.streaming.stateful import (
    dedup_segments_stream,
    dedup_substrings_stream,
    exact_dedup_stream,
    forward_fill_stream,
    minhash_dedup_stream,
    reassemble_segments,
)

__all__ = [
    "bin_stream",
    "dedup_segments_stream",
    "dedup_substrings_stream",
    "exact_dedup_stream",
    "forward_fill_stream",
    "minhash_dedup_stream",
    "reassemble_segments",
    "stream_events",
]
