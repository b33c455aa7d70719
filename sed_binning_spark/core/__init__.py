from sed_binning_spark.core import dfops

__all__ = ["dfops"]
