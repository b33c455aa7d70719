from sed_binning_spark.loaders.generic import GenericLoader
from sed_binning_spark.loaders.utils import (
    gather_files,
    split_channel_bitwise,
    split_dld_time_from_sector_id,
)

__all__ = [
    "GenericLoader",
    "gather_files",
    "split_channel_bitwise",
    "split_dld_time_from_sector_id",
]
