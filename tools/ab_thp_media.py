"""Interleaved A/B: media-heavy queries with/without the JVM THP flag.

Two child runs alternate in one wall-clock window; each child builds its
own session (the flag is a JVM option, so it needs a fresh JVM).
Usage: python tools/ab_thp_media.py <query> [reps]
"""
import json
import os
import subprocess
import sys

QUERY = sys.argv[1] if len(sys.argv) > 1 else "multimodal_features"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

CHILD = r"""
import sys, time, json, os
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod
from sed_binning_spark.session import get_spark

flag = sys.argv[1]
extra = {} if flag == "thp" else {"spark.driver.extraJavaOptions": ""}
spark = get_spark(app_name=f"ab-thp-{flag}", extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
q = entry_mod.queries()[sys.argv[2]]
runs = []
for i in range(3):
    t0 = time.perf_counter()
    df = q(spark, "/root/testdata/sf0.1")
    df.write.format("noop").mode("overwrite").save()
    runs.append(round(time.perf_counter() - t0, 2))
print("RESULT " + json.dumps({"flag": flag, "runs": runs}), flush=True)
"""


def one(flag):
    r = subprocess.run([sys.executable, "-c", CHILD, flag, QUERY],
                       capture_output=True, text=True, timeout=900)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT"):
            return line
    return "FAILED " + r.stderr[-300:]


for rep in range(REPS):
    for flag in ("nothp", "thp"):
        print(f"rep{rep} {one(flag)}", flush=True)
