#!/usr/bin/env python
"""Physical-plan audit across the ENTIRE query registry — the
repeatable version of ".explain every operator and iterate".

For every QUERIES_ALL entry, build the DataFrame at the given sf and
inspect the executed plan string for anti-patterns:

- BatchEvalPython / ArrowEvalPython  -> row-pickling or scalar-UDF
  Python in the plan: always a defect here (Arrow kernels must show
  up as MapInPandas / FlatMapGroupsInPandas);
- CartesianProduct                   -> an unintended cross join
  (the documented broadcast cross joins compile to
  BroadcastNestedLoopJoin, which is fine for a tiny side);
- per-plan Exchange count            -> printed so shuffle-count
  regressions are visible round over round.

tests/test_plans.py pins the strongest per-query invariants; this
audit catches the query nobody wrote a guard for. Exit 1 on any
flagged plan.

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORBIDDEN = ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct")


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from big_data_spark.queries import QUERIES_ALL
    from big_data_spark.session import get_spark, quiet_logs, stop_spark

    spark = get_spark(app_name="plan-audit", shuffle_partitions=8)
    quiet_logs(spark)
    bad = []
    for name, fn in sorted(QUERIES_ALL.items()):
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # streaming rows materialize a table
            print(f"skip {name}: {type(exc).__name__}")
            continue
        hits = [p for p in FORBIDDEN if p in plan]
        n_ex = plan.count("Exchange ")
        n_arrow = plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas")
        tag = "FLAG " + ",".join(hits) if hits else "ok"
        print(f"{tag:28s} {name:28s} exchanges={n_ex} arrow_kernels={n_arrow}")
        if hits:
            bad.append((name, hits))
    stop_spark(spark)
    if bad:
        print(f"\nFLAGGED: {bad}")
        return 1
    print("\nALL PLANS CLEAN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
