"""Quick sf0.1 probe of binning_4d / workflow_4d routing + phases."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import __spark_entry__ as entry_mod
from bench import _workflow_chain
from sed_binning_spark.binning import binning as B
from sed_binning_spark.binning.binning import bin_dataframe
from sed_binning_spark.session import get_spark

spark = get_spark(app_name="probe-sf01")
spark.sparkContext.setLogLevel("ERROR")
ev = entry_mod._events(spark, sf_dir).cache()
print("n:", ev.count())

for name, fn in (
    ("binning_4d", lambda: bin_dataframe(
        ev, bins=[100, 100, 100, 100], axes=["X", "Y", "t", "ADC"],
        ranges=[(0.0, 2048.0), (0.0, 2048.0), (60000.0, 120000.0), (2000.0, 20000.0)])),
    ("workflow_4d", lambda: bin_dataframe(
        _workflow_chain(ev), bins=[100, 100, 100, 100],
        axes=["kx", "ky", "energy", "delay"],
        ranges=[(-12.0, 12.0), (-12.0, 12.0), (20.0, 60.0), (-6.0, 6.0)])),
):
    for rep in range(4):
        t0 = time.perf_counter()
        fn()
        t = time.perf_counter() - t0
        print(f"{name} rep{rep}: {t:.3f}s  {dict(B.LAST_RUN_INFO)}", flush=True)
