from sed_binning_spark.streaming.binning import bin_stream, stream_events
from sed_binning_spark.streaming.stateful import (
    exact_dedup_stream,
    forward_fill_stream,
    minhash_dedup_stream,
)

__all__ = [
    "bin_stream",
    "exact_dedup_stream",
    "forward_fill_stream",
    "minhash_dedup_stream",
    "stream_events",
]
