"""Distributed dense id assignment.

Replaces the two id-generation shapes that don't scale or aren't
deterministic:

- the reference's ``monotonically_increasing_id``
  (Src/processes.py:232) — distributed but partitioning-dependent, so
  ids change run to run;
- a global ``dense_rank`` window — deterministic but moves every key
  to ONE partition (Spark warns "No Partition Defined for Window"),
  the classic single-reducer bottleneck at scale.

Here: hash keys into buckets, rank within each bucket (parallel
windows), then add per-bucket offsets computed from bucket counts —
the only global window runs over ``n_buckets`` rows, not the data.
Ids are dense in [0, #keys) and deterministic (ordered by
(bucket, key)), at the cost of not being globally key-ordered —
none of our callers need that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dense_ids(
    keys: DataFrame,
    key_col: str,
    out_col: str = "id",
    n_buckets: int = 1024,
) -> DataFrame:
    """(key, id) with dense deterministic ids for the distinct keys.

    ``keys`` may contain duplicates; they are dropped. Output columns:
    ``key_col``, ``out_col``.
    """
    distinct = keys.select(key_col).distinct()
    bucketed = distinct.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    )
    in_bucket = Window.partitionBy("_bucket").orderBy(key_col)
    ranked = bucketed.withColumn("_rank", F.row_number().over(in_bucket))
    counts = bucketed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_n"))
    over_buckets = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_n").over(over_buckets), F.lit(0))
    ).select("_bucket", "_offset")
    return (
        ranked.join(F.broadcast(offsets), "_bucket")
        .select(
            key_col,
            (F.col("_rank") + F.col("_offset") - 1).cast("long").alias(out_col),
        )
    )
