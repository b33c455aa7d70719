from sed_binning_spark.streaming.binning import bin_stream, stream_events

__all__ = ["bin_stream", "stream_events"]
