"""Deterministic training-shard export — the last step of a corpus
pipeline: write the corpus as N shards that are (a) globally
shuffled, (b) perfectly size-balanced, (c) bit-identical across
re-runs, so a training job can resume, re-shard, or audit against a
re-export.

Policy: rows are ordered by ``md5(key)`` (a deterministic pseudo-
shuffle — adjacent source rows scatter, yet the order is a pure
function of the keys), numbered with the DISTRIBUTED global prefix
sum (operators/prefix.py — no single-task window), and dealt
round-robin ``row_number % n_shards``. Round-robin on a global
numbering makes shard sizes differ by at most one row — no
hash-modulo variance — and the whole policy is plain ANSI SQL
(ROW_NUMBER over md5 order), so an oracle can replay it.

Scale: one range-partitioned sort on the md5 key + one partitioned
write; the only driver-side structure is the per-partition offset
list. Shard files land under ``out_dir/shard=<i>/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_spark.operators.prefix import running_total


def shard_assignments(
    df: DataFrame, key_col: str, n_shards: int
) -> DataFrame:
    """``df`` plus ``shard`` (round-robin over the md5-shuffled
    global row number, in [0, n_shards)). Keys must be unique — the
    numbering (and thus the deal) is undefined under ties."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    keyed = df.withColumn(
        "_shuf", F.md5(F.col(key_col).cast("string"))
    ).withColumn("_one", F.lit(1))
    numbered = running_total(keyed, ["_shuf"], "_one", out_col="_rn")
    return (
        numbered.withColumn(
            "shard", F.pmod(F.col("_rn") - 1, F.lit(n_shards)).cast("int")
        )
        .drop("_shuf", "_one", "_rn")
    )


def write_training_shards(
    df: DataFrame, out_dir: str, key_col: str, n_shards: int
) -> dict:
    """Export ``df`` as ``n_shards`` deterministic shards under
    ``out_dir/shard=<i>/`` (one file per shard, rows in SHUFFLE-key
    order inside each — a job streaming one shard sequentially sees
    decorrelated data, not source order). Returns bounded bookkeeping
    {n_rows, n_shards, max_skew} where max_skew is the largest
    shard-size deviation from the mean (<= 1 row by construction)."""
    assigned = shard_assignments(df, key_col, n_shards)
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions(
            F.col("shard"), F.md5(F.col(key_col).cast("string"))
        )
        .write.mode("error")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    spark = df.sparkSession
    # Explicit schema on the read-back: an EMPTY export writes no
    # part files under partitionBy, and schema inference would raise
    # after the write already succeeded.
    sizes = (
        spark.read.schema(assigned.schema)
        .parquet(out_dir)
        .groupBy("shard")
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    total = sum(counts)
    mean = total / max(1, len(counts))
    return {
        "n_rows": total,
        "n_shards": len(counts),
        "max_skew": max(abs(c - mean) for c in counts) if counts else 0.0,
    }
