"""CDC apply: fold an ordered change stream (insert/update/delete
rows tagged with an op and a sequence number) into a snapshot table —
the Debezium/"apply changes into" shape that keeps a lakehouse mirror
of an OLTP table current.

Two stages, both single-shuffle:

1. ``latest_changes``: per key, the change with the highest
   ``(seq, tie-break)`` wins — a max_by/row_number reduction over the
   change batch only (the snapshot is not touched). Sequence ties are
   broken deterministically by the caller-named tie column, so replays
   and reorderings of the same batch always fold to the same state.
2. ``apply_changes``: MERGE the winners into the snapshot
   (operators/merge.py): winner op == delete removes the key, any
   other op upserts it (update when present, insert when absent —
   upsert semantics deliberately ignore the I/U distinction because
   CDC feeds routinely deliver an UPDATE for a key the mirror has not
   seen, e.g. after a snapshot gap).

Scale: stage 1 shuffles only the change batch (hours of changes, not
the table); stage 2 is the merge join, broadcast when the winner set
is small. Nothing rescans or reshuffles the snapshot beyond the one
merge join. Deletes physically remove rows; feeds that need delete
tombstones retained (late joiners) should keep the change log itself,
which is the usual practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_spark.operators.merge import merge_into


def latest_changes(
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    tie_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Per-key winning change: max ``(seq_col, tie_col)``. The pair
    must be unique per key (true for (commit_lsn, change_index)-style
    feeds); uniqueness is the caller's feed contract and duplicates of
    the SAME pair are collapsed arbitrarily-but-consistently by the
    final dropDuplicates on the full ordering tuple."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), F.col(tie_col).desc()
    )
    return (
        changes.dropDuplicates(keys + [seq_col, tie_col])
        .withColumn("_cdc_rn", F.row_number().over(w))
        .filter(F.col("_cdc_rn") == 1)
        .drop("_cdc_rn")
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    tie_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Snapshot after folding ``changes`` in: per key the latest
    change wins; a winning delete removes the key, any other winner
    upserts the change row's payload columns (every snapshot column
    the change feed carries, minus keys and the op/seq bookkeeping).

    Returns the new snapshot with exactly the snapshot's columns.
    """
    winners = latest_changes(changes, keys, seq_col, tie_col, op_col)
    payload = [
        c
        for c in snapshot.columns
        if c not in keys and c in winners.columns and c not in (op_col, seq_col, tie_col)
    ]
    # merge_into(insert=True) requires the source to carry every
    # target column; CDC feeds do (they mirror the table schema plus
    # op/seq). Columns the feed lacks would make inserts undefined.
    lacking = [c for c in snapshot.columns if c not in winners.columns]
    if lacking:
        raise ValueError(f"change feed lacks snapshot columns: {lacking}")
    if op_col in snapshot.columns:
        raise ValueError(f"op column {op_col!r} collides with the snapshot")
    src = winners.select(*snapshot.columns, op_col)
    is_delete = F.col(f"s.{op_col}") == F.lit(delete_op)
    return merge_into(
        snapshot,
        src,
        keys,
        update_cols=payload,
        insert=True,
        delete_condition=is_delete,
        # A delete for a key the snapshot never had is a no-op, not an
        # insert of the tombstone's payload.
        insert_condition=~is_delete,
        strict=True,
    )
