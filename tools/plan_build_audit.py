#!/usr/bin/env python
"""Measure per-query PLAN-BUILD cost: DataFrame construction (Python
DSL + analysis probes) and Catalyst optimization/physical planning,
separately from execution. VERDICT r17 item 6: the unrolled-kernel
experiment proved analysis time is material (~0.5 s per 64-dim dot
instance); this tool makes the plan-build share of the sub-second tail
measurable instead of guessed.

Usage: python tools/plan_build_audit.py [query ...]   (default: all
headline bench queries). Prints one line per query, slowest
plan-build first:

  name  construct_s  plan_s  total_s

construct_s: time for queries[name](spark, sf_dir) to return (includes
any schema probes / index-cache checks the construction performs).
plan_s: time for queryExecution().executedPlan() to materialize —
analysis + optimization + physical planning, no job execution.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import HEADLINE
    from cpx_etl_spark.queries import load_registry
    from cpx_etl_spark.session import get_spark

    queries, _ = load_registry()
    names = sys.argv[1:] or list(HEADLINE)
    spark = get_spark("cpx-etl-planaudit", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in names:
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        t1 = time.time()
        df._jdf.queryExecution().executedPlan()
        t2 = time.time()
        rows.append((name, t1 - t0, t2 - t1, t2 - t0))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':38s} {'construct_s':>11s} {'plan_s':>8s} {'total_s':>8s}")
    for name, c, p, t in rows:
        print(f"{name:38s} {c:11.3f} {p:8.3f} {t:8.3f}")
    print(f"{'TOTAL':38s} {sum(r[1] for r in rows):11.3f} "
          f"{sum(r[2] for r in rows):8.3f} {sum(r[3] for r in rows):8.3f}")


if __name__ == "__main__":
    main()
