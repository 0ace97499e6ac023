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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, MapType
from pyspark.sql.window import Window

from big_data_spark.operators.merge import merge_into


def _contains_map(dt: DataType) -> bool:
    if isinstance(dt, MapType):
        return True
    if hasattr(dt, "elementType"):
        return _contains_map(dt.elementType)
    if hasattr(dt, "fields"):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _payload_hash(df: DataFrame, cols: list[str]) -> Column:
    """Deterministic 64-bit hash of payload columns for tie-breaking.
    xxhash64 rejects MAP-typed inputs (Debezium-style feeds routinely
    carry map payload columns), so map-bearing columns hash via their
    canonical JSON rendering instead."""
    parts = []
    types = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        col = F.col(c)
        parts.append(F.to_json(F.struct(col)) if _contains_map(types[c]) else col)
    return F.xxhash64(*parts) if parts else F.lit(0)


def latest_changes(
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    tie_col: str,
) -> DataFrame:
    """Per-key winning change: max ``(seq_col, tie_col)``. The pair
    being unique per key is the feed contract ((commit_lsn,
    change_index)-style); if a feed nonetheless delivers conflicting
    rows at the SAME position, the winner is still DETERMINISTIC — a
    payload-hash tie-break, so reruns and both sides of any parity
    test agree (Spark's dropDuplicates keeps whichever row a scan
    meets first, which varies with partitioning, and is deliberately
    not used here)."""
    others = [
        c for c in changes.columns if c not in keys + [seq_col, tie_col]
    ]
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        F.col(tie_col).desc(),
        _payload_hash(changes, others).desc(),
    )
    return (
        changes.withColumn("_cdc_rn", F.row_number().over(w))
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
    winners = latest_changes(changes, keys, seq_col, tie_col)
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


def scd2_apply(
    history: DataFrame | None,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    tie_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Fold a change batch into a TYPE-2 history table (the versioned
    companion to ``apply_changes``): every non-delete change OPENS a
    new validity interval and CLOSES the key's previous one; a delete
    closes without opening. Batching is transparent — applying a feed
    in any number of batches yields the same history as one batch
    (tested), because closing is a lead() over the per-key version
    sequence, not a property of batch boundaries.

    History schema: the feed's payload columns plus
    ``valid_from_seq``/``valid_from_tie`` (the opening change's
    position), ``valid_to_seq``/``valid_to_tie`` (the closing
    change's position — NULL while current; a delete's position lands
    here and nowhere else) and ``is_current``. Pass ``history=None``
    to bootstrap from nothing.

    Stale protection: each key's HIGH-WATER mark is the max
    (seq, tie) across every interval boundary it has ever recorded —
    including the closing positions of deleted keys — and incoming
    changes at-or-below it are dropped. Redelivered batches are
    therefore no-ops even for keys whose every version is closed
    (the guard an open-row-only check would miss). A delete that
    closes no real open version — the key's first event, or one
    following another delete — leaves a closed zero-width MARKER row
    (``valid_to == valid_from``, ``is_current=false``) so even ITS
    position enters the high-water; otherwise a stale update
    redelivered after it would resurrect the key.

    Ordering contract (same as refresh_aggregate): per-key delivery
    must be in order ACROSS batches — within a batch any order is
    fine (the window sorts). An out-of-order cross-batch feed cannot
    reproduce the single-batch fold with any online algorithm that
    drops stale changes; what IS guaranteed under disorder is the
    safety property above (no resurrection, no double-apply).

    Scale shape: closed history of untouched keys streams through
    with no shuffle; touched keys pay one semi-join, one small agg
    (high-water) and one window over (open rows + batch). Pair with
    a key-bucketed layout and dynamic overwrite exactly like
    streaming/cdc_mirror.py when materializing.
    """
    payload = [
        c
        for c in changes.columns
        if c not in keys and c not in (seq_col, tie_col, op_col)
    ]
    hist_cols = keys + payload + [
        "valid_from_seq",
        "valid_from_tie",
        "valid_to_seq",
        "valid_to_tie",
        "is_current",
    ]
    if history is None:
        schema_src = changes.select(
            *keys,
            *payload,
            F.col(seq_col).alias("valid_from_seq"),
            F.col(tie_col).alias("valid_from_tie"),
            F.col(seq_col).alias("valid_to_seq"),
            F.col(tie_col).alias("valid_to_tie"),
            F.lit(True).alias("is_current"),
        )
        history = changes.sparkSession.createDataFrame([], schema_src.schema)
    missing = [c for c in hist_cols if c not in history.columns]
    if missing:
        raise ValueError(f"history lacks columns: {missing}")

    ch_keys = changes.select(*keys).distinct()
    touched_hist = history.join(ch_keys, keys, "left_semi")
    untouched = history.join(ch_keys, keys, "left_anti").unionByName(
        # Closed versions of touched keys pass through unchanged.
        touched_hist.filter(~F.col("is_current"))
    )

    # High-water per touched key: max boundary position ever recorded.
    hw = touched_hist.groupBy(*keys).agg(
        F.max(
            F.struct(
                F.coalesce(
                    F.col("valid_to_seq"), F.col("valid_from_seq")
                ).alias("s"),
                F.coalesce(
                    F.col("valid_to_tie"), F.col("valid_from_tie")
                ).alias("t"),
            )
        ).alias("_hw")
    )
    fresh = (
        changes.join(hw, keys, "left")
        .filter(
            F.col("_hw").isNull()
            | (F.col(seq_col) > F.col("_hw.s"))
            | (
                (F.col(seq_col) == F.col("_hw.s"))
                & (F.col(tie_col) > F.col("_hw.t"))
            )
        )
        .select(*changes.columns)
    )

    # Version events: open rows re-enter the window as their own
    # interval start, followed by the fresh changes.
    as_event = fresh.select(
        *keys,
        *payload,
        F.col(seq_col).alias("valid_from_seq"),
        F.col(tie_col).alias("valid_from_tie"),
        (F.col(op_col) == F.lit(delete_op)).alias("_is_del"),
    )
    open_event = touched_hist.filter(F.col("is_current")).select(
        *keys,
        *payload,
        "valid_from_seq",
        "valid_from_tie",
        F.lit(False).alias("_is_del"),
    )
    # Tie-break duplicate (seq, tie) positions deterministically by
    # payload hash — the same contract-violation tolerance as
    # latest_changes; without it, which conflicting row becomes the
    # surviving version would vary with partitioning, breaking
    # replay-identical rewrites in run_scd2_mirror.
    events = open_event.unionByName(as_event)
    w = Window.partitionBy(*keys).orderBy(
        "valid_from_seq",
        "valid_from_tie",
        _payload_hash(events, payload + ["_is_del"]).asc(),
    )
    # A delete whose in-window predecessor is a NON-delete closes that
    # version, which records the delete's position in its valid_to.
    # Every other delete (first event for the key, or following
    # another delete) has nothing to close — it leaves a ZERO-WIDTH
    # marker (valid_to = own position, is_current=false) so its
    # position always enters the high-water. Markers are never
    # lead()-stretched: a later event would widen them in the
    # single-batch fold but not in a split fold where the marker is
    # already closed history.
    prev_is_del = F.lag("_is_del").over(w)
    marker = F.col("_is_del") & (prev_is_del.isNull() | prev_is_del)
    versions = (
        events
        .withColumn("_marker", marker)
        .withColumn(
            "valid_to_seq",
            F.when(
                F.col("_marker"), F.col("valid_from_seq")
            ).otherwise(F.lead("valid_from_seq").over(w)),
        )
        .withColumn(
            "valid_to_tie",
            F.when(
                F.col("_marker"), F.col("valid_from_tie")
            ).otherwise(F.lead("valid_from_tie").over(w)),
        )
        .filter(~F.col("_is_del") | F.col("_marker"))
        .withColumn(
            "is_current",
            F.col("valid_to_seq").isNull() & ~F.col("_is_del"),
        )
        .drop("_is_del", "_marker")
    )
    return untouched.select(*hist_cols).unionByName(
        versions.select(*hist_cols)
    )
