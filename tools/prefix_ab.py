#!/usr/bin/env python
"""A/B: distributed global prefix sum (operators/prefix.py
running_total) vs the naive single-partition ORDER BY window — the
measured evidence behind the operator's reason to exist.

Both compute SUM(x) OVER (ORDER BY k) for every row of
lineitem(sf_dir) (k = a unique synthetic key, x = l_quantity), checked
equal row-for-row, timed paired and alternating in ONE session so JIT
drift cancels. The naive plan funnels the whole table through one
task (Spark warns "No Partition Defined for Window operation"); the
distributed plan is range-partition + within-partition window + an
O(#partitions) driver offset list.

Usage: python tools/prefix_ab.py [sf_dir] [reps] [multiplier]
Defaults: /root/testdata/sf0.1  3  1
``multiplier`` M explodes each row into M distinct keys, scaling the
input toward the regime the operator exists for.
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from big_data_spark.io.readers import read_table  # noqa: E402
from big_data_spark.operators.prefix import running_total  # noqa: E402
from big_data_spark.session import get_spark, quiet_logs, stop_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_spark(app_name="prefix-ab")
    quiet_logs(spark)
    # Group to UNIQUE keys first — running_total's order must be a
    # total order (the synthetic lineitem carries duplicate
    # (orderkey, linenumber) pairs).
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
            F.col("l_quantity").cast("double").alias("x"),
        )
        .groupBy("k")
        .agg(F.sum("x").alias("x"))
    )
    if mult > 1:
        li = li.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(mult - 1)),
                    lambda i: F.struct(
                        (F.col("k") * mult + i).alias("k"),
                        (F.col("x") + i).alias("x"),
                    ),
                )
            ).alias("s")
        ).select("s.k", "s.x")
    li = li.persist()
    n = li.count()
    print(f"rows: {n}")

    def run_distributed():
        return running_total(li, ["k"], "x", out_col="r")

    def run_naive():
        w = Window.orderBy("k").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return li.withColumn("r", F.sum("x").over(w))

    # Equality check once (full row-for-row, via checksum of (k, r)).
    chk = lambda df: df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("r") * F.col("k")).alias("s"),
    ).collect()[0]
    a, b = chk(run_distributed()), chk(run_naive())
    assert a["n"] == b["n"] and abs(a["s"] - b["s"]) <= abs(a["s"]) * 1e-9, (
        a,
        b,
    )
    print("row-for-row checksum equal")

    times: dict[str, list[float]] = {"distributed": [], "naive": []}
    for _ in range(reps):
        for name, fn in (("distributed", run_distributed), ("naive", run_naive)):
            t0 = time.time()
            fn().agg(F.sum("r")).collect()
            times[name].append(time.time() - t0)
    print("| variant | " + " | ".join(f"run {i+1}" for i in range(reps)) + " |")
    print("|---|" + "---|" * reps)
    for name, ts in times.items():
        print(f"| {name} | " + " | ".join(f"{t:.2f} s" for t in ts) + " |")
    stop_spark(spark)


if __name__ == "__main__":
    main()
