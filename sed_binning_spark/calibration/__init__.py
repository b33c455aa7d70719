from sed_binning_spark.calibration import delay, energy, momentum

__all__ = ["delay", "energy", "momentum"]
