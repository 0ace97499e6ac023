"""Key-skew diagnosis — the measurement that decides between a plain
join, a broadcast, and a salted join (operators/skew.py).

A skewed shuffle key means one reducer carries the hot key's entire
partition while the rest idle; at 100 TB that is the difference
between a 20-minute and a 9-hour stage. The report is two cheap
aggregations over (key, count):

- a 1-row summary: total rows, distinct keys, max/avg/approx-p99
  per-key counts, and ``skew_ratio`` = max/avg — the dial: ~1 means
  uniform, >> 1 means salt the hot keys or broadcast the other side;
- the top-N hottest keys with their row share, which is exactly the
  list a targeted salting pass needs.

Map-side combinable throughout; the only full shuffle is the
(key, count) aggregation itself, which any skew investigation pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(
    df: DataFrame, key_cols: list[str], top: int = 10
) -> tuple[DataFrame, DataFrame]:
    """(summary, hot_keys): a 1-row skew summary and the ``top``
    hottest keys by row count (share = fraction of all rows)."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    summary = counts.agg(
        F.sum("n").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_key_rows"),
        (F.sum("n") / F.count(F.lit(1))).alias("avg_key_rows"),
        F.percentile_approx("n", 0.99).alias("p99_key_rows"),
        (F.max("n") / (F.sum("n") / F.count(F.lit(1)))).alias("skew_ratio"),
    )
    total = counts.agg(F.sum("n").alias("t"))
    hot = (
        counts.crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            F.col("n").alias("n_rows"),
            F.round(F.col("n") / F.col("t"), 6).alias("share"),
        )
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top)
    )
    return summary, hot
