"""Loader registry + one-call read surface (the reference's
sed/loader/loader_interface.py:11-43 ``get_loader``/``read_dataframe``
entry, with a static registry instead of filesystem module discovery —
there are exactly four loaders and a dict keeps failure modes obvious).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from sed_binning_spark.loaders.flash import FlashLoader
from sed_binning_spark.loaders.generic import GenericLoader
from sed_binning_spark.loaders.mpes import MpesLoader
from sed_binning_spark.loaders.sxp import SXPLoader

LOADER_REGISTRY = {
    "generic": GenericLoader,
    "mpes": MpesLoader,
    "flash": FlashLoader,
    "sxp": SXPLoader,
}


def get_loader(loader_name: str, spark: SparkSession, config: dict | None = None):
    """Loader name -> constructed loader (raises with the available names,
    matching the reference's error shape)."""
    try:
        cls = LOADER_REGISTRY[loader_name]
    except KeyError:
        raise ValueError(
            f"Invalid loader {loader_name!r}. Available loaders are: "
            f"{sorted(LOADER_REGISTRY)}",
        ) from None
    return cls(spark, config=config)


def read_dataframe(
    spark: SparkSession,
    loader: str = "generic",
    config: dict | None = None,
    **kwds,
):
    """One-call form: ``read_dataframe(spark, loader="mpes", runs=[30], ...)``
    -> (event_df, timed_df, metadata)."""
    return get_loader(loader, spark, config=config).read_dataframe(**kwds)
