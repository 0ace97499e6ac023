#!/usr/bin/env python
"""Dump .explain("formatted") for every registry query (plus the
bench-local lakehouse rows) into plans/<tag>/<name>_<suffix>.txt —
the optimization round's before/after plan evidence.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
  e.g. python tools/dump_plans.py r14 before
Env: SPARK_GRAFT_SF_DIR (default sf0.001 — plan SHAPE is sf-invariant
for the registry queries; fixture-building rows build tiny fixtures).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_spark.session import get_spark, quiet_logs, stop_spark  # noqa: E402


def main() -> None:
    import bench

    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    from big_data_spark.queries import QUERIES_ALL

    runners = {**QUERIES_ALL, **bench.LAKE_ROWS}
    if not names:
        names = sorted(runners)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    quiet_logs(spark)
    for name in names:
        try:
            df = runners[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"skip {name}: {type(exc).__name__}: {exc}"[:200])
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")
    stop_spark(spark)


if __name__ == "__main__":
    main()
