"""Bitwise-exact Spark-vs-DuckDB diff for one or more registered queries.

The driver's hash compare is exact (post-canonicalization), so rtol-based
checks can pass while the gate fails. This prints full-repr cell diffs.

    python tools/exact_diff.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from tools.verify_oracles import canon, duck_con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    from cpx_etl_spark.queries import load_registry
    from cpx_etl_spark.session import get_spark

    queries, oracles = load_registry()
    spark = get_spark("exact-diff", master="local[8]", shuffle_partitions=8)
    con = duck_con(sf_dir)

    if not names or names == ["all"]:
        names = [n for n in queries if n in oracles]

    bad_queries = []
    for name in names:
        if name not in oracles:
            print(f"\n=== {name} === (rows-only, skipped)")
            continue
        try:
            sdf = canon(queries[name](spark, sf_dir).toPandas())
            ddf = canon(con.execute(oracles[name]).fetch_df())
        except Exception as e:
            print(f"\n=== {name} === RAISED {type(e).__name__}: {e}")
            bad_queries.append(name)
            continue
        print(f"\n=== {name} ===")
        sdt, ddt = dict(sdf.dtypes.astype(str)), dict(ddf.dtypes.astype(str))
        if sdt != ddt:
            print(f"DTYPE MISMATCH:\n  spark: {sdt}\n  duck:  {ddt}")
            bad_queries.append(name)
            continue
        if len(sdf) != len(ddf):
            print(f"ROW COUNT spark={len(sdf)} duck={len(ddf)}")
            bad_queries.append(name)
            continue
        ndiff = 0
        for i in range(len(sdf)):
            for c in sdf.columns:
                a, b = sdf.at[i, c], ddf.at[i, c]
                same = (a == b) or (pd.isna(a) and pd.isna(b))
                if isinstance(a, float) and isinstance(b, float) and not pd.isna(a) and not pd.isna(b):
                    same = a.hex() == b.hex() if hasattr(a, "hex") else a == b
                if not same:
                    ndiff += 1
                    if ndiff <= 20:
                        ra = a.hex() if isinstance(a, float) else repr(a)
                        rb = b.hex() if isinstance(b, float) else repr(b)
                        print(f"row {i} col {c}: spark={a!r} ({ra})  duck={b!r} ({rb})")
        print(f"{name}: {ndiff} exact cell diffs over {len(sdf)} rows")
        if ndiff:
            bad_queries.append(name)
    print(f"\nBAD: {bad_queries}" if bad_queries else "\nALL EXACT")
    return 1 if bad_queries else 0


if __name__ == "__main__":
    raise SystemExit(main())
