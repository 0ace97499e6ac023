#!/usr/bin/env python
"""A/B: chunked bounded-group pair kernel (operators/blockpairs.py)
vs the unchunked one-group-per-cell shape, on a deliberately HOT
cell — the measured evidence that closing the round-7 `weak`
(unbounded applyInPandas cell block) does not trade away speed.

Builds n vectors that all land in ONE IVF cell (single centroid) so
the block kernel faces its worst case, then times
chunked_pair_candidates twice in ONE session, alternating:

- budget = BLOCK_ROW_BUDGET (4096): the hot cell splits into
  ceil(n/4096) chunks -> bounded chunk-pair groups;
- budget = 10^9: one group holds the whole cell (the round-7 shape).

Both candidate sets are checked EQUAL (sorted row-for-row), and the
max rows any applyInPandas group receives is reported for each —
the number that decides whether a 100 TB hot cell can kill a task.

Usage: python tools/hotcell_ab.py [n_vectors] [dim] [reps]
Defaults: 24000 64 3  (dim >= 64 keeps random cross-cluster cosines
far below NEARDUP_COSINE, so the candidate set stays the planted
near-dup clusters, not O(n^2) noise)
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from big_data_spark.operators.blockpairs import (  # noqa: E402
    BLOCK_ROW_BUDGET,
    chunked_pair_candidates,
)
from big_data_spark.session import (  # noqa: E402
    ensure_executor_package,
    get_spark,
    quiet_logs,
    stop_spark,
)


def max_group_rows(df, budget: int) -> int:
    counts = df.groupBy("cell").agg(
        F.ceil(F.count(F.lit(1)) / F.lit(budget)).cast("int").alias("_n")
    )
    return (
        df.join(counts, "cell")
        .withColumn("_chunk", F.pmod(F.xxhash64("vec_id"), F.col("_n")))
        .withColumn(
            "_cc",
            F.expr(
                "explode(transform(sequence(0, _n - 1), x -> "
                "if(x <= _chunk, struct(x AS ci, _chunk AS cj), "
                "struct(_chunk AS ci, x AS cj))))"
            ),
        )
        .groupBy("cell", "_cc.ci", "_cc.cj")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="hotcell_ab", shuffle_partitions=32)
    quiet_logs(spark)
    ensure_executor_package(spark)

    # Clusters of ~8 planted near-dups: the pair count stays O(n),
    # so the A/B times the KERNEL work, not a pathological output.
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(max(8, n // 8), dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        c = centers[i % len(centers)]
        v = c + rng.normal(scale=0.02, size=dim)
        rows.append((i, [float(x) for x in v], 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cell int"
    ).repartition(32).cache()
    df.count()

    budgets = {"chunked": BLOCK_ROW_BUDGET, "unchunked": 10**9}
    times: dict[str, list[float]] = {k: [] for k in budgets}
    sets: dict[str, int] = {}
    for r in range(reps):
        for name in ("chunked", "unchunked") if r % 2 == 0 else (
            "unchunked",
            "chunked",
        ):
            t0 = time.monotonic()
            got = chunked_pair_candidates(
                df, ["cell"], budget=budgets[name]
            ).count()
            times[name].append(time.monotonic() - t0)
            sets[name] = got
    assert sets["chunked"] == sets["unchunked"], sets
    eq = (
        chunked_pair_candidates(df, ["cell"], budget=budgets["chunked"])
        .exceptAll(
            chunked_pair_candidates(
                df, ["cell"], budget=budgets["unchunked"]
            )
        )
        .count()
    )
    assert eq == 0, f"{eq} pairs differ"

    n_chunks = math.ceil(n / BLOCK_ROW_BUDGET)
    print(f"\nhot cell: {n} vectors x {dim} dims, ONE cell; "
          f"pairs = {sets['chunked']}; reps = {reps} (medians)")
    print("| plan | max rows/applyInPandas group | wall (s) |")
    print("|---|---|---|")
    for name, budget in budgets.items():
        mg = max_group_rows(df, budget)
        med = sorted(times[name])[len(times[name]) // 2]
        print(f"| {name} (budget={budget}) | {mg} | {med:.2f} |")
    print(f"(chunked splits the cell into {n_chunks} chunks -> "
          f"{n_chunks * (n_chunks + 1) // 2} bounded groups)")
    stop_spark(spark)


if __name__ == "__main__":
    main()
