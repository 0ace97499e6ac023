"""Incremental dedup: always equals the plain anti-join; the Bloom
filter only decides which rows PAY for the join."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_spark.io.readers import read_table
from big_data_spark.operators.incremental import incremental_dedup, seen_filter
from tests.conftest import SF_SMOKE


def _keyed_docs(spark):
    return read_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.md5("text").alias("text_hash")
    )


def test_equals_plain_anti_join(spark):
    docs = _keyed_docs(spark)
    corpus = docs.filter("doc_id < 300")
    batch = docs.filter("doc_id >= 200")  # 100 rows overlap
    bloom = seen_filter(corpus.select("text_hash"), "text_hash", m=4096, k=3)
    got = incremental_dedup(
        batch, corpus.select("text_hash"), "text_hash", bloom, m=4096, k=3
    )
    want = batch.join(corpus.select("text_hash"), "text_hash", "left_anti")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_exact_even_with_saturated_filter(spark):
    # m=64 saturates: almost everything becomes a suspect — the
    # exact join must still produce the anti-join answer.
    docs = _keyed_docs(spark)
    corpus = docs.filter("doc_id < 300")
    batch = docs.filter("doc_id >= 200")
    bloom = seen_filter(corpus.select("text_hash"), "text_hash", m=64, k=2)
    got = incremental_dedup(
        batch, corpus.select("text_hash"), "text_hash", bloom, m=64, k=2
    )
    want = batch.join(corpus.select("text_hash"), "text_hash", "left_anti")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_null_keys_admitted_and_batch_dups_preserved(spark):
    corpus = spark.createDataFrame([("k1",)], "h string")
    batch = spark.createDataFrame(
        [(1, "k1"), (2, "k2"), (3, "k2"), (4, None)], "id bigint, h string"
    )
    bloom = seen_filter(corpus, "h", m=256, k=2)
    got = incremental_dedup(batch, corpus, "h", bloom, m=256, k=2)
    rows = sorted((r.id, r.h) for r in got.collect())
    # k1 dropped (seen); both k2 rows kept (within-batch dup is not
    # this operator's job); NULL admitted.
    assert rows == [(2, "k2"), (3, "k2"), (4, None)]


def test_filter_probe_broadcasts(spark):
    docs = _keyed_docs(spark)
    corpus = docs.filter("doc_id < 300")
    batch = docs.filter("doc_id >= 200")
    bloom = seen_filter(corpus.select("text_hash"), "text_hash", m=4096, k=3)
    plan = (
        incremental_dedup(
            batch, corpus.select("text_hash"), "text_hash", bloom, m=4096, k=3
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------- refresh_aggregate


def _recompute(spark, rows):
    """Ground truth: full aggregate over surviving base rows."""
    from collections import defaultdict

    alive = defaultdict(list)
    for k, v, op in rows:
        if op == "D":
            alive[k].remove(v)
        else:
            alive[k].append(v)
    return {
        (k, float(sum(vs)), len(vs)) for k, vs in alive.items() if vs
    }


def _mv_rows(df):
    return {tuple(r) for r in df.collect()}


def test_refresh_aggregate_matches_recompute(spark):
    from big_data_spark.operators.incremental import refresh_aggregate

    base = [(1, 10.0, "I"), (1, 5.0, "I"), (2, 7.0, "I")]
    batch = [
        (1, 5.0, "D"),  # retract one of key 1's rows
        (2, 7.0, "D"),  # key 2 empties out -> group deleted
        (3, 1.0, "I"),  # new group
        (3, 2.0, "I"),
    ]
    schema = "k int, v double, op string"
    from pyspark.sql import functions as F

    mv = (
        spark.createDataFrame(base, schema)
        .groupBy("k")
        .agg(F.sum("v").alias("v"), F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    out = refresh_aggregate(
        mv, spark.createDataFrame(batch, schema), ["k"], ["v"], op_col="op"
    )
    assert _mv_rows(out) == _recompute(spark, base + batch)


def test_refresh_aggregate_batch_split_invariant(spark):
    from pyspark.sql import functions as F

    from big_data_spark.operators.incremental import refresh_aggregate

    schema = "k int, v double, op string"
    base = [(1, 1.0, "I"), (2, 2.0, "I")]
    b1 = [(1, 3.0, "I"), (3, 4.0, "I")]
    b2 = [(2, 2.0, "D"), (3, 4.0, "D"), (3, 9.0, "I")]
    mv = (
        spark.createDataFrame(base, schema)
        .groupBy("k")
        .agg(F.sum("v").alias("v"), F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    once = refresh_aggregate(
        mv, spark.createDataFrame(b1 + b2, schema), ["k"], ["v"], op_col="op"
    )
    twice = refresh_aggregate(
        refresh_aggregate(
            mv, spark.createDataFrame(b1, schema), ["k"], ["v"], op_col="op"
        ),
        spark.createDataFrame(b2, schema),
        ["k"],
        ["v"],
        op_col="op",
    )
    expected = _recompute(spark, base + b1 + b2)
    assert _mv_rows(once) == _mv_rows(twice) == expected


def test_refresh_aggregate_pure_retraction_for_unseen_group_skipped(spark):
    from pyspark.sql import functions as F

    from big_data_spark.operators.incremental import refresh_aggregate

    schema = "k int, v double, op string"
    mv = (
        spark.createDataFrame([(1, 1.0, "I")], schema)
        .groupBy("k")
        .agg(F.sum("v").alias("v"), F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    batch = spark.createDataFrame([(9, 4.0, "D")], schema)
    out = refresh_aggregate(mv, batch, ["k"], ["v"], op_col="op")
    assert _mv_rows(out) == {(1, 1.0, 1)}


def test_sync_aggregate_tracks_base_table_through_commit_kinds(
    spark, tmp_path
):
    """The closed MV loop: bootstrap, append, multi-commit catch-up,
    full rewrite, compaction no-op — after every sync the MV equals
    the from-scratch aggregate of the current base, and the MV's
    snapshot id mirrors the base commit it applied through."""
    from big_data_spark.io.compact import compact_snapshot
    from big_data_spark.io.snapshot import (
        append_snapshot,
        read_snapshot,
        snapshot_ids,
        write_snapshot,
    )
    from big_data_spark.operators.incremental import sync_aggregate

    t = str(tmp_path / "base")
    mv = str(tmp_path / "mv")

    def check():
        got = {
            tuple(r)
            for r in read_snapshot(spark, mv)
            .select("g", "amt", "n_rows")
            .collect()
        }
        want = {
            tuple(r)
            for r in read_snapshot(spark, t)
            .groupBy("g")
            .agg(F.sum("amt").alias("amt"), F.count("*").alias("n_rows"))
            .collect()
        }
        assert got == want
        assert snapshot_ids(spark, mv)[-1] == snapshot_ids(spark, t)[-1]

    write_snapshot(
        spark.createDataFrame(
            [("a", 10), ("a", 5), ("b", 7)], "g string, amt long"
        ),
        t,
        0,
    )
    st = sync_aggregate(spark, t, mv, ["g"], ["amt"])
    assert st["bootstrapped"] and st["applied_through"] == 0
    check()
    # Two appends, ONE catch-up sync spanning both commits.
    append_snapshot(
        spark.createDataFrame([("b", 3), ("c", 1)], "g string, amt long"),
        t,
        1,
    )
    append_snapshot(
        spark.createDataFrame([("c", 4)], "g string, amt long"), t, 2
    )
    st = sync_aggregate(spark, t, mv, ["g"], ["amt"])
    assert st == {"bootstrapped": False, "applied_through": 2, "from": 0}
    check()
    # Full rewrite: group a shrinks, b disappears, d appears.
    write_snapshot(
        spark.createDataFrame(
            [("a", 2), ("c", 5), ("d", 9)], "g string, amt long"
        ),
        t,
        3,
    )
    sync_aggregate(spark, t, mv, ["g"], ["amt"])
    check()
    # Compaction is maintenance: the sync advances the MV id but the
    # feed is empty — contents unchanged.
    compact_snapshot(spark, t)
    before = {
        tuple(r) for r in read_snapshot(spark, mv).collect()
    }
    st = sync_aggregate(spark, t, mv, ["g"], ["amt"])
    assert st["applied_through"] == snapshot_ids(spark, t)[-1]
    assert {tuple(r) for r in read_snapshot(spark, mv).collect()} == before
    check()
    # Fresh MV: sync is a no-op.
    st = sync_aggregate(spark, t, mv, ["g"], ["amt"])
    assert st["from"] == st["applied_through"]


def test_sync_aggregate_decimal_measures_keep_schema(spark, tmp_path):
    """DECIMAL sums widen through the merge's t.m + s.m fold
    (28,2 -> 38,2); the sync pins the MV's committed types so the
    snapshot schema-evolution guard never trips and values stay
    exact."""
    from big_data_spark.io.snapshot import (
        append_snapshot,
        read_snapshot,
        write_snapshot,
    )
    from big_data_spark.operators.incremental import sync_aggregate

    t = str(tmp_path / "decbase")
    mv = str(tmp_path / "decmv")
    mk = lambda rows: spark.createDataFrame(
        rows, "g string, amt string"
    ).select("g", F.col("amt").cast("decimal(18,2)").alias("amt"))
    write_snapshot(mk([("a", "10.50"), ("b", "0.25")]), t, 0)
    sync_aggregate(spark, t, mv, ["g"], ["amt"])
    append_snapshot(mk([("a", "0.01")]), t, 1)
    sync_aggregate(spark, t, mv, ["g"], ["amt"])
    out = read_snapshot(spark, mv)
    assert dict(out.dtypes)["amt"] == "decimal(28,2)"
    got = {(r["g"], str(r["amt"])) for r in out.collect()}
    assert got == {("a", "10.51"), ("b", "0.25")}
