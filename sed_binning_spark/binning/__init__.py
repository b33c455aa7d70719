from sed_binning_spark.binning.binning import (
    bin_dataframe,
    normalization_histogram_from_timed_dataframe,
    normalization_histogram_from_timestamps,
)
from sed_binning_spark.binning.expressions import bin_index_expr, bin_index_expr_edges
from sed_binning_spark.binning.utils import (
    bin_centers_to_bin_edges,
    bin_edges_to_bin_centers,
    simplify_binning_arguments,
)

__all__ = [
    "bin_dataframe",
    "bin_index_expr",
    "bin_index_expr_edges",
    "bin_centers_to_bin_edges",
    "bin_edges_to_bin_centers",
    "simplify_binning_arguments",
    "normalization_histogram_from_timed_dataframe",
    "normalization_histogram_from_timestamps",
]
