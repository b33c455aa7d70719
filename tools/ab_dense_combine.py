"""Interleaved A/B of the dense-driver histogram combine forms at ref scale.

VERDICT r14 item 1: binning_4d's driver-run ref-scale median regressed
3.5 -> 71.7 s after `496064e` replaced the mask-scan combine with the
per-file sorted-spill combine, but both driver runs spanned documented
host-degradation episodes, so the A/B that decides keep-vs-revert must be
interleaved in ONE session with per-run host-health evidence.

Forms (both live in binning.py):
  old  = _spill_collect_arrow (one pq.read_table) + _range_partitioned_bincount
         over zero-copy chunk views (the r13 shape)
  new  = _sorted_spill_histogram (per-file threaded read+sort, binary-search
         sliced bincount — the r14 shape)

Per run we record wall, process CPU (user+sys via os.times), and the
/proc/stat steal+iowait delta, so host episodes are visible in the output.

Usage: python tools/ab_dense_combine.py [n_rows] [n_reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
N_REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 6


def _stat_counters():
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    # cpu user nice system idle iowait irq softirq steal
    vals = [int(x) for x in parts[1:9]]
    return {"sys": vals[2], "idle": vals[3], "iowait": vals[4], "steal": vals[7],
            "total": sum(vals)}


def main() -> None:
    from pyspark.sql import functions as F

    from sed_binning_spark.binning import binning as B
    from sed_binning_spark.session import get_spark

    spark = get_spark(app_name="ab-dense-combine")
    spark.sparkContext.setLogLevel("ERROR")

    ev = (
        spark.range(N_ROWS, numPartitions=64)
        .select(
            (F.rand(1) * 2048.0).alias("X"),
            (F.rand(2) * 2048.0).alias("Y"),
            (60000.0 + F.rand(3) * 60000.0).alias("t"),
            (2000.0 + F.rand(4) * 18000.0).alias("ADC"),
        )
        .cache()
    )
    ev.agg(F.sum("X")).collect()

    bins = [100, 100, 100, 100]
    axes = ["X", "Y", "t", "ADC"]
    ranges = [(0.0, 2048.0), (0.0, 2048.0), (60000.0, 120000.0), (2000.0, 20000.0)]

    # Build the flat-cell select once (identical for both forms)
    df2, idx_cols, coords, exprs = B.bin_index_columns(ev, bins, axes, ranges)
    shape = [coords[ax].size for ax in axes]
    flat = exprs[0]
    for d in range(1, len(exprs)):
        flat = flat * F.lit(shape[d]) + exprs[d]
    n_cells = int(np.prod(shape))
    cell_type = "int" if n_cells + 1 <= np.iinfo(np.int32).max else "bigint"
    cell = F.coalesce(flat, F.lit(n_cells)).cast(cell_type).alias("cell")
    sel = df2.select(cell)
    scratch = B._resolve_scratch_dir(spark)

    def run_old() -> np.ndarray:
        tbl = B._spill_collect_arrow(sel)
        col = tbl.column("cell")
        arrays = [c.to_numpy(zero_copy_only=False) for c in col.chunks]
        return B._range_partitioned_bincount(
            arrays, n_cells + 1, reuse_workspace=True,
        )[:n_cells].astype(np.float32)

    def run_new() -> np.ndarray:
        return B._sorted_spill_histogram(sel, scratch, n_cells, cell_type)

    # parity check once (cheap relative to the timing runs)
    ha = run_old()
    hb = run_new()
    assert np.array_equal(ha, hb), "combine forms disagree!"
    print(f"# parity OK, sum={ha.sum():.0f}, n_cells={n_cells}", flush=True)
    del ha, hb

    results = {"old": [], "new": []}
    for rep in range(N_REPS):
        for name, fn in (("old", run_old), ("new", run_new)):
            B.LAST_RUN_INFO.clear()
            s0 = _stat_counters()
            c0 = os.times()
            t0 = time.perf_counter()
            fn()
            wall = time.perf_counter() - t0
            c1 = os.times()
            s1 = _stat_counters()
            dt_total = max(1, s1["total"] - s0["total"])
            rec = {
                "wall": round(wall, 3),
                "cpu_user": round(c1.user - c0.user, 2),
                "cpu_sys": round(c1.system - c0.system, 2),
                "host_steal_pct": round(100 * (s1["steal"] - s0["steal"]) / dt_total, 2),
                "host_iowait_pct": round(100 * (s1["iowait"] - s0["iowait"]) / dt_total, 2),
                "phases": dict(B.LAST_RUN_INFO),
            }
            results[name].append(rec)
            print(f"rep{rep} {name}: {json.dumps(rec)}", flush=True)

    for name in ("old", "new"):
        walls = sorted(r["wall"] for r in results[name])
        print(f"# {name}: min={walls[0]:.3f} median={walls[len(walls)//2]:.3f} "
              f"all={[round(w, 2) for w in walls]}", flush=True)


if __name__ == "__main__":
    main()
