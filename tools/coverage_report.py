"""Evidence-freshness report: per registered query, the most recent
round with driver gate evidence (CORRECTNESS_r*.json) and the sweep
position the automatic rotation assigns it next round.

Usage: python tools/coverage_report.py [budget]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from cpx_etl_spark.queries import _last_driver_round, load_registry

    q, o = load_registry()
    latest = _last_driver_round()
    by_round = Counter(latest.get(name, 0) for name in q)
    print(f"registry: {len(q)} queries, {len(o)} oracled, "
          f"{len(q) - len(o)} rows-only by design")
    print("driver evidence by round (0 = new this round):")
    for rnd in sorted(by_round):
        print(f"  r{rnd}: {by_round[rnd]} queries")
    print(f"next sweep (budget {budget}) covers:")
    for i, name in enumerate(q):
        if i >= budget:
            break
        print(f"  {i + 1:3d}. {name} (last confirmed r{latest.get(name, 0)})")


if __name__ == "__main__":
    main()
