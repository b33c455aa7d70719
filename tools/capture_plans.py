"""Capture ``.explain("formatted")`` for every declared query.

Writes ``plans/<round>/<query>_<tag>.txt`` (round via SPARK_GRAFT_PLAN_DIR,
default r15). Run: ``python tools/capture_plans.py <tag> [sf_dir] [query ...]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])

    import __spark_entry__ as entry_mod
    from sed_binning_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r15"))
    os.makedirs(out_dir, exist_ok=True)

    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"),
            )
        except Exception as exc:  # capture the failure instead of dying
            plan = f"ERROR building plan: {exc!r}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
