"""Streaming CDC mirror — keep a parquet mirror of an OLTP table
current from a live change feed (the Debezium -> lakehouse loop),
composing latest-wins folding (operators/cdc.py) with MERGE
(operators/merge.py) inside foreachBatch.

Design decisions that carry to 100 TB:

- **Bucketed layout, touched-partition rewrites.** The mirror is
  hash-partitioned on the key (``_kb = pmod(xxhash64(keys),
  n_buckets)``). Each micro-batch prunes its read to the buckets its
  winners touch (broadcast semi-join -> partition pruning) and
  dynamic-overwrites only those buckets: per-batch cost scales with
  the CHANGE SET, never with the table.
- **Monotone merge.** The mirror stores each row's last-applied
  ``(seq, tie)``; an incoming change only lands if strictly newer.
  Replays and out-of-order redeliveries are no-ops — idempotency is
  a merge predicate, not a checkpoint-ordering hope.
- **Delete tombstones, not physical deletes.** A winning delete
  flips ``_deleted`` (keeping its seq) instead of removing the row,
  so a STALE update redelivered after the delete is rejected by the
  monotone guard rather than resurrecting the key — the classic CDC
  resurrection bug is structurally impossible. ``read_mirror``
  filters tombstones; ``purge_tombstones`` reclaims them once the
  feed's redelivery horizon has passed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from big_data_spark.io.compact import hadoop_fs
from big_data_spark.lineage import truncate_lineage
from big_data_spark.operators.cdc import latest_changes
from big_data_spark.operators.merge import merge_into

_BUCKET = "_kb"
_DELETED = "_deleted"


def run_cdc_mirror(
    change_stream: DataFrame,
    keys: list[str],
    seq_col: str,
    tie_col: str,
    mirror_dir: str,
    checkpoint: str,
    op_col: str = "op",
    delete_op: str = "D",
    n_buckets: int = 16,
    checks: list | None = None,
) -> None:
    """Drain ``change_stream`` (availableNow) into the mirror at
    ``mirror_dir/data``. The feed carries the mirrored columns plus
    ``op_col`` / ``seq_col`` / ``tie_col``; ``(seq, tie)`` must be
    unique per change (commit LSN + change index).

    ``checks`` (operators/dq.py Check list) gates every batch BEFORE
    it folds: a failing batch raises inside foreachBatch, the
    streaming query stops, and — because nothing was written — the
    checkpoint does not advance, so fixing the feed and restarting
    re-processes the same batch. Bad data halts the mirror loudly
    instead of landing in it.
    """
    data_path = f"{mirror_dir}/data"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if checks:
            from big_data_spark.operators.dq import assert_suite

            assert_suite(batch_df, checks)
        winners = latest_changes(batch_df, keys, seq_col, tie_col)
        incoming = (
            winners.withColumn(
                _BUCKET,
                F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int"),
            )
            .withColumn(_DELETED, F.col(op_col) == F.lit(delete_op))
            .drop(op_col)
        )
        try:
            mirror = spark.read.parquet(data_path)
        except AnalysisException:
            new = incoming  # first batch: the winners ARE the mirror
        else:
            touched = incoming.select(_BUCKET).distinct()
            pruned = mirror.join(F.broadcast(touched), _BUCKET, "left_semi")
            newer = (F.col(f"s.{seq_col}") > F.col(f"t.{seq_col}")) | (
                (F.col(f"s.{seq_col}") == F.col(f"t.{seq_col}"))
                & (F.col(f"s.{tie_col}") > F.col(f"t.{tie_col}"))
            )
            payload = [
                c for c in pruned.columns if c not in keys and c != _BUCKET
            ]
            new = merge_into(
                pruned,
                incoming,
                keys + [_BUCKET],
                update_cols=payload,
                update_condition=newer,
                insert=True,
                strict=True,
            )
        # Materialize before the dynamic overwrite reads-and-writes
        # the same root.
        (
            truncate_lineage(new)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(_BUCKET)
            .parquet(data_path)
        )

    query = (
        change_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def read_mirror(spark: SparkSession, mirror_dir: str) -> DataFrame:
    """The live rows of the mirror (tombstones filtered, bookkeeping
    dropped; the feed's seq/tie columns remain — they are the row
    version, often wanted downstream)."""
    return (
        spark.read.parquet(f"{mirror_dir}/data")
        .filter(~F.col(_DELETED))
        .drop(_BUCKET, _DELETED)
    )


def purge_tombstones(
    spark: SparkSession, mirror_dir: str, seq_col: str, seq_watermark
) -> None:
    """Physically remove tombstones whose delete seq is older than
    ``seq_watermark`` — safe once the feed can no longer redeliver
    changes that old (its retention horizon); a younger tombstone
    stays so the monotone guard keeps rejecting stale updates.
    Rewrites only the buckets that actually hold purgeable tombstones
    (dynamic overwrite after a semi-join prune, like the ingest
    path); run as table maintenance, not per batch."""
    data_path = f"{mirror_dir}/data"
    df = spark.read.parquet(data_path)
    purgeable = F.col(_DELETED) & (F.col(seq_col) < F.lit(seq_watermark))
    touched = {
        r[_BUCKET]
        for r in df.filter(purgeable).select(_BUCKET).distinct().collect()
    }
    if not touched:
        return
    rewritten = truncate_lineage(
        df.filter(F.col(_BUCKET).isin(list(touched))).filter(~purgeable)
    )
    survivors = {
        r[_BUCKET] for r in rewritten.select(_BUCKET).distinct().collect()
    }
    (
        rewritten.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(_BUCKET)
        .parquet(data_path)
    )
    # Dynamic overwrite only replaces partitions PRESENT in the
    # written data; a bucket whose every row was a purgeable
    # tombstone produces no output rows, so its old files would
    # survive. Remove those emptied partition dirs explicitly.
    for b in touched - survivors:
        fs, hpath = hadoop_fs(spark, f"{data_path}/{_BUCKET}={b}")
        fs.delete(hpath, True)


def run_scd2_mirror(
    change_stream: DataFrame,
    keys: list[str],
    seq_col: str,
    tie_col: str,
    mirror_dir: str,
    checkpoint: str,
    op_col: str = "op",
    delete_op: str = "D",
    n_buckets: int = 16,
    checks: list | None = None,
) -> None:
    """TYPE-2 twin of ``run_cdc_mirror``: maintain a versioned
    history table (operators/cdc.scd2_apply — validity intervals,
    delete-closes, per-key high-water) from a live change feed,
    under the same bucketed layout and touched-bucket rewrites.

    Replay safety comes from scd2_apply itself: its high-water mark
    over every recorded interval boundary makes redelivered batches
    no-ops, so the dynamic overwrite of a replayed batch rewrites
    identical bucket contents. Read the current rows with
    ``read_scd2_mirror(..., current_only=True)`` or the full history
    with ``current_only=False``.
    """
    data_path = f"{mirror_dir}/data"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from big_data_spark.operators.cdc import scd2_apply

        spark = batch_df.sparkSession
        if checks:
            from big_data_spark.operators.dq import assert_suite

            assert_suite(batch_df, checks)
        bucket = F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int")
        batch = batch_df.withColumn(_BUCKET, bucket)
        try:
            history = spark.read.parquet(data_path)
        except AnalysisException:
            history = None
        else:
            touched = batch.select(_BUCKET).distinct()
            history = history.join(F.broadcast(touched), _BUCKET, "left_semi")
        new = scd2_apply(
            history,
            batch,
            keys + [_BUCKET],
            seq_col,
            tie_col,
            op_col=op_col,
            delete_op=delete_op,
        )
        (
            truncate_lineage(new)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(_BUCKET)
            .parquet(data_path)
        )

    query = (
        change_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def read_scd2_mirror(
    spark: SparkSession, mirror_dir: str, current_only: bool = True
) -> DataFrame:
    """The SCD2 history (bookkeeping bucket dropped); with
    ``current_only`` just the open versions."""
    df = spark.read.parquet(f"{mirror_dir}/data").drop(_BUCKET)
    return df.filter(F.col("is_current")) if current_only else df
