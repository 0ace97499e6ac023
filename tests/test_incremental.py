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
