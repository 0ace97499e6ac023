"""MERGE INTO / CDC apply: semantics, clause interactions, the
cardinality contract, and the partitioned-merge pruning shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401

from big_data_spark.operators.cdc import apply_changes, latest_changes
from big_data_spark.operators.merge import merge_into, touched_partitions


def _target(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", 30.0),
            (4, None, 40.0),  # legitimately-NULL payload survives merge
        ],
        "k int, name string, v double",
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_update_insert_delete(spark):
    src = spark.createDataFrame(
        [
            (2, "B", 200.0, "U"),  # matched -> update
            (3, "c", 30.0, "D"),  # matched -> delete
            (9, "z", 90.0, "I"),  # unmatched -> insert
        ],
        "k int, name string, v double, op string",
    )
    out = merge_into(
        _target(spark),
        src,
        ["k"],
        update_cols=["name", "v"],
        delete_condition=F.col("s.op") == "D",
    )
    assert _rows(out) == {
        (1, "a", 10.0),
        (2, "B", 200.0),
        (4, None, 40.0),
        (9, "z", 90.0),
    }


def test_merge_update_condition_gates_update(spark):
    src = spark.createDataFrame(
        [(1, "A", 1.0, "U"), (2, "B", 2.0, "skip")],
        "k int, name string, v double, op string",
    )
    out = merge_into(
        _target(spark),
        src,
        ["k"],
        update_condition=F.col("s.op") == "U",
        insert=False,
    )
    rows = _rows(out)
    assert (1, "A", 1.0) in rows  # updated
    assert (2, "b", 20.0) in rows  # matched but gated -> unchanged
    assert len(rows) == 4


def test_merge_insert_condition_drops_unmatched(spark):
    src = spark.createDataFrame(
        [(8, "x", 1.0, "D"), (9, "y", 2.0, "U")],
        "k int, name string, v double, op string",
    )
    out = merge_into(
        _target(spark),
        src,
        ["k"],
        delete_condition=F.col("s.op") == "D",
        insert_condition=F.col("s.op") != "D",
    )
    rows = _rows(out)
    assert (9, "y", 2.0) in rows
    assert not any(r[0] == 8 for r in rows)  # delete-for-absent-key: no-op


def test_merge_null_keys_never_match(spark):
    tgt = spark.createDataFrame(
        [(None, "t", 1.0)], "k int, name string, v double"
    )
    src = spark.createDataFrame(
        [(None, "s", 2.0)], "k int, name string, v double"
    )
    out = merge_into(tgt, src, ["k"])
    # target NULL-key row kept unchanged; source NULL-key row inserted.
    assert _rows(out) == {(None, "t", 1.0), (None, "s", 2.0)}


def test_merge_cardinality_violation_raises(spark):
    src = spark.createDataFrame(
        [(2, "B1", 1.0), (2, "B2", 2.0)], "k int, name string, v double"
    )
    out = merge_into(_target(spark), src, ["k"])
    with pytest.raises(Exception, match="cardinality"):
        out.collect()


def test_merge_duplicate_unmatched_keys_allowed(spark):
    # SQL MERGE: multiple NOT MATCHED source rows insert independently.
    src = spark.createDataFrame(
        [(8, "x", 1.0), (8, "y", 2.0)], "k int, name string, v double"
    )
    out = merge_into(_target(spark), src, ["k"])
    assert out.filter(F.col("k") == 8).count() == 2


def test_merge_idempotent_on_replay(spark):
    src = spark.createDataFrame(
        [(1, "A", 100.0), (9, "z", 90.0)], "k int, name string, v double"
    )
    once = merge_into(_target(spark), src, ["k"])
    twice = merge_into(once, src, ["k"])
    assert _rows(once) == _rows(twice)


def test_touched_partitions_prunes_scan(spark, tmp_path):
    path = str(tmp_path / "ptable")
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("ds"),
        (F.col("id") * 2.0).alias("v"),
    )
    df.write.partitionBy("ds").parquet(path)
    changes = spark.createDataFrame([(3, 3, -1.0)], "k long, ds long, v double")

    target = spark.read.parquet(path)
    parts = touched_partitions(changes, ["ds"])
    pruned = target.join(F.broadcast(parts), ["ds"], "left_semi")
    merged = merge_into(pruned, changes, ["k", "ds"], update_cols=["v"])

    plan = merged._jdf.queryExecution().executedPlan().toString()
    # the semi join against partition values must reach the scan as
    # dynamic/partition pruning or at minimum a partition filter —
    # the scan must not read all 10 partitions' files.
    assert merged.count() == 10  # ds=3 partition only
    assert _rows(merged.filter(F.col("k") == 3)) == {(3, 3, -1.0)}
    assert "left_semi" in plan.lower() or "LeftSemi" in plan


def test_latest_changes_picks_max_seq_with_tiebreak(spark):
    ch = spark.createDataFrame(
        [
            (1, "v1", 10, 0, "U"),
            (1, "v2", 20, 0, "U"),
            (1, "v2-late", 20, 1, "U"),  # same seq, higher tie wins
            (2, "x", 5, 0, "D"),
        ],
        "k int, name string, seq int, idx int, op string",
    )
    winners = latest_changes(ch, ["k"], "seq", "idx")
    got = {(r.k, r.name, r.op) for r in winners.collect()}
    assert got == {(1, "v2-late", "U"), (2, "x", "D")}


def test_apply_changes_end_to_end(spark):
    snap = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "k int, name string, v double",
    )
    ch = spark.createDataFrame(
        [
            (1, "a1", 10.0, 1, 0, "U"),
            (1, "a2", 11.0, 2, 0, "U"),  # latest wins
            (2, "b", 2.0, 1, 0, "D"),  # delete
            (2, "b9", 9.0, 0, 0, "U"),  # stale update loses to delete
            (5, "e", 5.0, 1, 0, "U"),  # insert via upsert
            (6, "f", 6.0, 1, 0, "D"),  # delete for absent key: no-op
        ],
        "k int, name string, v double, seq int, idx int, op string",
    )
    out = apply_changes(snap, ch, ["k"], "seq", "idx")
    assert _rows(out) == {
        (1, "a2", 11.0),
        (3, "c", 3.0),
        (5, "e", 5.0),
    }


def test_apply_changes_replay_idempotent(spark):
    snap = spark.createDataFrame([(1, "a", 1.0)], "k int, name string, v double")
    ch = spark.createDataFrame(
        [(1, "a1", 2.0, 1, 0, "U"), (2, "b", 3.0, 1, 0, "U")],
        "k int, name string, v double, seq int, idx int, op string",
    )
    once = apply_changes(snap, ch, ["k"], "seq", "idx")
    twice = apply_changes(once, ch, ["k"], "seq", "idx")
    assert _rows(once) == _rows(twice) == {(1, "a1", 2.0), (2, "b", 3.0)}


# ---------------------------------------------------------------- scd2


SCD_SCHEMA = "k int, name string, seq int, idx int, op string"
SCD_FEED = [
    (1, "a1", 10, 0, "U"),
    (1, "a2", 20, 0, "U"),
    (1, "a3", 30, 0, "U"),
    (2, "b1", 10, 0, "U"),
    (2, "b1", 25, 0, "D"),  # delete closes without opening
    (2, "b2", 40, 0, "U"),  # revival opens a fresh version
    (3, "c1", 15, 0, "U"),
]


def _scd2(spark, history, rows):
    from big_data_spark.operators.cdc import scd2_apply

    ch = spark.createDataFrame(rows, SCD_SCHEMA)
    return scd2_apply(history, ch, ["k"], "seq", "idx")


def _hist_rows(df):
    return {tuple(r) for r in df.collect()}


EXPECTED_FULL = {
    # k, name, from_seq, from_tie, to_seq, to_tie, is_current
    (1, "a1", 10, 0, 20, 0, False),
    (1, "a2", 20, 0, 30, 0, False),
    (1, "a3", 30, 0, None, None, True),
    (2, "b1", 10, 0, 25, 0, False),
    (2, "b2", 40, 0, None, None, True),
    (3, "c1", 15, 0, None, None, True),
}


def test_scd2_bootstrap_full_feed(spark):
    hist = _scd2(spark, None, SCD_FEED)
    assert _hist_rows(hist) == EXPECTED_FULL


def test_scd2_batch_split_parity(spark):
    h1 = _scd2(spark, None, SCD_FEED[:3])
    h2 = _scd2(spark, h1, SCD_FEED[3:])
    assert _hist_rows(h2) == EXPECTED_FULL
    # split at a different boundary, same result
    h1b = _scd2(spark, None, SCD_FEED[:5])
    h2b = _scd2(spark, h1b, SCD_FEED[5:])
    assert _hist_rows(h2b) == EXPECTED_FULL


def test_scd2_replay_is_noop(spark):
    h = _scd2(spark, None, SCD_FEED)
    again = _scd2(spark, h, SCD_FEED)
    assert _hist_rows(again) == EXPECTED_FULL


def test_scd2_stale_change_for_deleted_key_dropped(spark):
    # key 9: single version then delete; a stale update (seq between
    # open and delete) redelivered later must NOT reopen the key —
    # the high-water lives in the closed row's valid_to.
    h = _scd2(
        spark, None, [(9, "x", 10, 0, "U"), (9, "x", 50, 0, "D")]
    )
    h2 = _scd2(spark, h, [(9, "ghost", 30, 0, "U")])
    assert _hist_rows(h2) == {(9, "x", 10, 0, 50, 0, False)}
    # A genuinely newer change DOES reopen it.
    h3 = _scd2(spark, h2, [(9, "back", 60, 0, "U")])
    assert (9, "back", 60, 0, None, None, True) in _hist_rows(h3)


def test_merge_fill_missing_inserts_typed_nulls(spark):
    # feed lacks `name`: updates touch only v; inserts get NULL name.
    src = spark.createDataFrame([(2, 99.0), (8, 8.0)], "k int, v double")
    with pytest.raises(ValueError, match="fill_missing"):
        merge_into(_target(spark), src, ["k"])
    out = merge_into(_target(spark), src, ["k"], fill_missing=True)
    rows = _rows(out)
    assert (2, "b", 99.0) in rows  # update keeps existing name
    assert (8, None, 8.0) in rows  # insert fills NULL
    assert dict(out.dtypes)["name"] == "string"


def test_merge_null_clause_predicate_keeps_row(spark):
    """SQL MERGE: a NULL clause predicate means the clause does not
    apply — a NULL op must upsert, never silently delete."""
    src = spark.createDataFrame(
        [(1, "A", 2.0, None)], "k int, name string, v double, op string"
    )
    out = merge_into(
        _target(spark),
        src,
        ["k"],
        delete_condition=F.col("s.op") == "D",
        insert_condition=F.col("s.op") != "D",
    )
    rows = _rows(out)
    assert (1, "A", 2.0) in rows  # updated, not deleted
    assert len(rows) == 4


def test_merge_duplicate_deletes_still_raise_cardinality(spark):
    """The strict guard must fire even when every duplicate source
    row takes the DELETE clause (keep=false must not short-circuit
    past the guard)."""
    src = spark.createDataFrame(
        [(2, "x", 0.0, "D"), (2, "y", 0.0, "D")],
        "k int, name string, v double, op string",
    )
    out = merge_into(
        _target(spark), src, ["k"], delete_condition=F.col("s.op") == "D"
    )
    with pytest.raises(Exception, match="cardinality"):
        out.collect()


def test_scd2_orphan_delete_blocks_stale_resurrection(spark):
    """A delete for a NEVER-SEEN key must leave a high-water marker:
    a stale update redelivered after it stays dropped instead of
    resurrecting the key."""
    h = _scd2(spark, None, [(7, "gone", 28, 2, "D")])
    rows = _hist_rows(h)
    assert rows == {(7, "gone", 28, 2, 28, 2, False)}  # zero-width marker
    h2 = _scd2(spark, h, [(7, "ghost", 10, 0, "U")])  # stale
    assert not any(r[6] for r in _hist_rows(h2)), "no current row"
    h3 = _scd2(spark, h2, [(7, "back", 99, 0, "U")])  # newer
    assert (7, "back", 99, 0, None, None, True) in _hist_rows(h3)


def test_cdc_fold_accepts_map_payload(spark):
    """Debezium-style feeds carry map payload columns; the
    deterministic tie-break must hash them via JSON, not choke on
    xxhash64's MAP-type rejection."""
    ch = spark.createDataFrame(
        [
            (1, {"a": "1"}, 1, 0, "U"),
            (1, {"a": "2"}, 2, 0, "U"),
        ],
        "k int, props map<string,string>, seq int, idx int, op string",
    )
    win = latest_changes(ch, ["k"], "seq", "idx").collect()
    assert len(win) == 1 and win[0].props == {"a": "2"}
    from big_data_spark.operators.cdc import scd2_apply

    h = scd2_apply(None, ch, ["k"], "seq", "idx")
    rows = h.collect()
    assert len(rows) == 2
    assert {r.is_current for r in rows} == {True, False}


def test_merge_reserved_marker_names_raise(spark):
    for bad in ("_merge_t_present", "_merge_s_present", "_merge_s_keydup"):
        tgt = spark.createDataFrame([(1, "a")], f"k int, `{bad}` string")
        src = spark.createDataFrame([(1, "b")], "k int, v string")
        with pytest.raises(ValueError, match="reserved"):
            merge_into(tgt, src, ["k"])
        with pytest.raises(ValueError, match="reserved"):
            merge_into(src, tgt, ["k"])
