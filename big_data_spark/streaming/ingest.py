"""Streaming dedup ingest — the production loop that grows a
deduplicated lake from a live stream.

Per micro-batch (foreachBatch):

1. dedup WITHIN the batch (``dropDuplicates`` on the key);
2. dedup AGAINST the lake via the Bloom-gated incremental path
   (operators/incremental.py): keys probing false against the lake's
   filter are admitted with no join; only suspects pay the exact
   anti-join against the lake's key column;
3. append the admitted rows to the lake, partitioned by
   ``_batch_id`` with dynamic overwrite — a replayed batch
   (at-least-once delivery, restart after crash) overwrites exactly
   its own partition, so the sink is idempotent;
4. write the admitted keys' Bloom filter next to the data, also per
   batch — filters are merge-on-read (``bloom_merge`` of every
   batch's rows), so keeping the filter current never re-scans the
   lake.

Replay safety detail: when batch N re-runs, the lake already holds
its rows — so the dedup pass EXCLUDES partition ``_batch_id = N``
from the lake side; otherwise the replay would classify its own rows
as duplicates and dynamic-overwrite the partition with nothing
(silent data loss). The same exclusion applies to the filter side.

At 100 TB: the filter is a few MB per billion keys and broadcasts;
the lake-side anti-join only ever sees the suspect slice of a batch;
and the per-batch filter partitions compact like any small-file
problem (io/compact.py) if batch count grows large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from big_data_spark.lineage import truncate_lineage
from big_data_spark.operators.bloom import bloom_merge
from big_data_spark.operators.incremental import incremental_dedup, seen_filter


def run_dedup_ingest(
    stream_df: DataFrame,
    key_col: str,
    lake_dir: str,
    checkpoint: str,
    m: int = 1 << 20,
    k: int = 4,
) -> None:
    """Drain ``stream_df`` (availableNow) into ``lake_dir`` keeping
    only first-seen ``key_col`` values. Layout:
    ``lake_dir/data/_batch_id=*/`` (rows) and
    ``lake_dir/bloom/_batch_id=*/`` (per-batch filters)."""
    data_path = f"{lake_dir}/data"
    bloom_path = f"{lake_dir}/bloom"

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates([key_col])
        try:
            lake = spark.read.parquet(data_path).filter(
                F.col("_batch_id") != batch_id
            )
        except AnalysisException:
            # First batch: no lake yet — everything is new.
            admitted = batch
        else:
            try:
                filters = (
                    spark.read.parquet(bloom_path)
                    .filter(F.col("_batch_id") != batch_id)
                    .drop("_batch_id")
                )
                blm = bloom_merge(filters, key_cols=[])
                admitted = incremental_dedup(
                    batch, lake.select(key_col), key_col, blm, m=m, k=k
                )
            except AnalysisException:
                # Data exists but no filter (crash between the two
                # writes): stay CORRECT without the accelerator —
                # plain anti-join for this batch; its own filter
                # write below restores the fast path.
                admitted = batch.join(
                    lake.select(key_col).where(F.col(key_col).isNotNull()),
                    on=key_col,
                    how="left_anti",
                )
        # Materialize BEFORE writing: the admitted rows are derived
        # from a scan of data_path, and the dynamic overwrite below
        # writes into that same root.
        admitted = truncate_lineage(admitted)
        (
            admitted.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(data_path)
        )
        (
            seen_filter(admitted.select(key_col), key_col, m=m, k=k)
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(bloom_path)
        )

    query = (
        stream_df.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def read_lake(spark, lake_dir: str) -> DataFrame:
    """The deduplicated lake as one DataFrame (ingest bookkeeping
    column dropped)."""
    return spark.read.parquet(f"{lake_dir}/data").drop("_batch_id")
