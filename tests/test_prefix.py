"""Distributed prefix sum + sequence packing (operators/prefix.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_spark.operators.prefix import pack_sequences, running_total


def test_running_total_matches_single_partition_window(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 101 + 1).alias("x")
    )
    got = {
        (r["k"], r["running"])
        for r in running_total(df, ["k"], "x", n_partitions=8).collect()
    }
    rows = sorted((r["k"], r["x"]) for r in df.collect())
    acc, want = 0, set()
    for k, x in rows:
        acc += x
        want.add((k, acc))
    assert got == want


def test_running_total_is_distributed(spark):
    """The plan must not funnel through a single-partition global
    window: the within-partition window partitions by _pid."""
    df = spark.range(100).select(
        F.col("id").alias("k"), F.lit(1).alias("x")
    )
    plan = running_total(df, ["k"], "x", n_partitions=8)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "partitionBy=[_pid]" in plan or "_pid" in plan
    # A global window would show an empty partition spec with a
    # SinglePartition exchange feeding it.
    assert "SinglePartition" not in plan


def test_pack_sequences_offset_binning(spark):
    docs = spark.createDataFrame(
        [(1, 40), (2, 40), (3, 40), (4, 250), (5, 10), (6, 10)],
        "doc_id long, n long",
    )
    got = {
        (r["bin_id"], r["n_docs"], r["total_n"], tuple(r["ids"]))
        for r in pack_sequences(docs, "n", 100, ["doc_id"]).collect()
    }
    # Offsets: d1@0,d2@40,d3@80,d4@120,d5@370,d6@380
    assert got == {
        (0, 3, 120, (1, 2, 3)),   # d3 straddles -> overflow by one doc
        (1, 1, 250, (4,)),        # oversized doc alone; bins 2 skipped
        (3, 2, 20, (5, 6)),
    }


def test_pack_sequences_matches_sql_window_oracle(spark):
    import duckdb

    rows = [(i, int((i * 53) % 400) + 1) for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, n long")
    got = sorted(
        (r["bin_id"], r["n_docs"], r["total_n"], tuple(r["ids"]))
        for r in pack_sequences(docs, "n", 1024, ["doc_id"]).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs AS SELECT * FROM (VALUES %s) t(doc_id, n)"
                % ",".join(f"({i},{n})" for i, n in rows))
    want = con.execute("""
        WITH pref AS (
          SELECT doc_id, n,
                 SUM(n) OVER (ORDER BY doc_id) - n AS excl
          FROM docs
        )
        SELECT CAST(excl // 1024 AS BIGINT) AS bin_id,
               COUNT(*) AS n_docs, SUM(n) AS total_n,
               LIST(doc_id ORDER BY doc_id) AS ids
        FROM pref GROUP BY 1 ORDER BY 1
    """).fetchall()
    assert got == [(b, nd, tn, tuple(ids)) for b, nd, tn, ids in want]


def test_pack_capacity_validation(spark):
    docs = spark.createDataFrame([(1, 5)], "doc_id long, n long")
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(docs, "n", 0, ["doc_id"])


def test_running_total_double_and_decimal_measures(spark):
    """The offset column must carry the window sum's own type —
    float and decimal measures, not just integers."""
    df = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id").cast("double") / 3.0).alias("x"),
    )
    got = sorted(
        (r["k"], r["running"])
        for r in running_total(df, ["k"], "x", n_partitions=8).collect()
    )
    acc = 0.0
    for i, (k, run) in enumerate(got):
        acc += i / 3.0
        assert abs(run - acc) < 1e-6 * max(1.0, acc)
    dec = spark.range(100).select(
        F.col("id").alias("k"),
        F.col("id").cast("decimal(10,2)").alias("x"),
    )
    out = running_total(dec, ["k"], "x", n_partitions=4)
    assert dict(out.dtypes)["running"].startswith("decimal")
    last = out.orderBy(F.desc("k")).first()
    assert int(last["running"]) == sum(range(100))
