#!/usr/bin/env python
"""Dump .explain('formatted') for named queries into a directory.

Usage: python tools/dump_plans.py OUT_DIR SUFFIX q1 [q2 ...]
Writes OUT_DIR/<query>_<SUFFIX>.txt. Runs against sf0.1 (the bench
scale) on a small local session; plans only — no jobs beyond what
query CONSTRUCTION itself triggers (index builds are cached per
sf_dir). The repo root the script lives under is the code that runs,
so a worktree copy dumps that worktree's plans.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cpx_etl_spark.queries import load_registry
    from cpx_etl_spark.session import get_spark

    queries, _ = load_registry()
    spark = get_spark("cpx-etl-plandump", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Scan parquet')} parquet scans, "
              f"{plan.count('Scan ExistingRDD')} rdd scans)")


if __name__ == "__main__":
    main()
