from sed_binning_spark.loaders.base import BaseLoader
from sed_binning_spark.loaders.generic import GenericLoader
from sed_binning_spark.loaders.interface import get_loader, read_dataframe
from sed_binning_spark.loaders.utils import (
    gather_files,
    split_channel_bitwise,
    split_dld_time_from_sector_id,
)

__all__ = [
    "BaseLoader",
    "GenericLoader",
    "get_loader",
    "read_dataframe",
    "gather_files",
    "split_channel_bitwise",
    "split_dld_time_from_sector_id",
]
