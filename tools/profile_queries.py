#!/usr/bin/env python
"""Per-query cost anatomy for the headline bench rows (round-14
optimization measurement, guide §1): split each timed body into
CONSTRUCTION (Python plan building incl. any eager checkpoint jobs)
vs ACTION (the noop save), and count Spark jobs + summed job wall per
query via the UI REST API — the round-6 technique, packaged.

Usage: python tools/profile_queries.py [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1).
Prints one line per query: construct_s action_s jobs job_wall_s gap_s
(gap = wall not covered by any job = driver-side planning/py4j).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_spark.session import get_spark, quiet_logs, stop_spark  # noqa: E402


def _jobs(ui: str, app: str, group: str) -> list[dict]:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs") as r:
        alljobs = json.load(r)
    return [j for j in alljobs if j.get("jobGroup") == group]


def main() -> None:
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or bench.HEADLINE
    runners = {**bench.QUERIES, **bench.LAKE_ROWS}
    spark = get_spark(
        app_name="profile-queries", extra_conf={"spark.ui.enabled": "true"}
    )
    quiet_logs(spark)
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app = sc.applicationId
    # Warm exactly like bench.py.
    try:
        runners["pricing_summary"](spark, sf_dir).count()
    except Exception:
        pass
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    warm_sf = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    for name in names:
        try:
            runners[name](spark, warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    print(f"{'query':26s} {'constr':>7s} {'action':>7s} {'total':>7s} "
          f"{'jobs':>4s} {'jobwall':>8s} {'gap':>7s}")
    for name in names:
        # one untimed priming run at the target sf (bench parity)
        try:
            runners[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            print(f"{name:26s} PRIME-FAIL {type(exc).__name__}: {exc}"[:160])
            continue
        spark._jvm.System.gc()
        time.sleep(0.2)
        group = f"prof-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = runners[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        sc.setJobGroup(None, None)
        jobs = _jobs(ui, app, group)
        job_wall = 0.0
        for j in jobs:
            try:
                st = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                en = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                ms_s = float(j["submissionTime"][20:23]) / 1000.0
                ms_e = float(j["completionTime"][20:23]) / 1000.0
                job_wall += (time.mktime(en) + ms_e) - (time.mktime(st) + ms_s)
            except Exception:
                pass
        total = t2 - t0
        print(
            f"{name:26s} {t1 - t0:7.3f} {t2 - t1:7.3f} {total:7.3f} "
            f"{len(jobs):4d} {job_wall:8.3f} {max(0.0, total - job_wall):7.3f}"
        )
    stop_spark(spark)


if __name__ == "__main__":
    main()
