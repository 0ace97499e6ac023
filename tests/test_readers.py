"""Read-time schema assertions: a physical-type drift in the driver
testdata must fail LOUDLY at read time, never coerce into silently
wrong rows (the round-3 failure mode: a LongType stream schema
swallowed microsecond timestamps and compressed event time 1000x
without a single exception)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from big_data_spark.io.readers import read_table
from tests.conftest import SF_SMOKE


def _write_events_variant(spark, tmp_path, ts_expr: str) -> str:
    src = read_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_dir")
    src.withColumn("ts", F.expr(ts_expr)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(out)
    # read_table addresses {dir}/events.parquet; the sink wrote
    # part files, so point a sf_dir-shaped layout at them.
    import glob
    import os
    import shutil

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    part = glob.glob(f"{out}/part-*.parquet")[0]
    shutil.copy(part, f"{sf_dir}/events.parquet")
    return sf_dir


def test_read_table_normalizes_ts_to_nanos(spark):
    """Whatever the on-disk encoding, callers see epoch-nano longs."""
    events = read_table(spark, SF_SMOKE, "events")
    assert isinstance(events.schema["ts"].dataType, LongType)
    low, high = events.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    # Epoch nanos for any modern date are ~1.5e18; epoch micros would
    # be ~1.5e15 — three orders of magnitude apart, so this bound
    # catches a unit mistake regardless of the generator's date range.
    assert low > 10**17, f"ts={low} is not nanoseconds"
    assert high < 10**19


def test_read_table_accepts_micros_timestamp(spark, tmp_path):
    """timestamp[us] on disk (the current generator) normalizes to the
    same nanos the original table carries, sub-second precision kept."""
    sf_dir = _write_events_variant(
        spark, tmp_path, "timestamp_micros(ts div 1000)"
    )
    reread = read_table(spark, sf_dir, "events")
    orig = read_table(spark, SF_SMOKE, "events")
    want = {r.event_id: r.ts for r in orig.select("event_id", "ts").collect()}
    got = {r.event_id: r.ts for r in reread.select("event_id", "ts").collect()}
    # Micros on disk -> nanos floor to the micro; original nanos are
    # micro-aligned or not, so compare at micro resolution.
    assert got == {k: (v // 1000) * 1000 for k, v in want.items()}


def test_read_table_rejects_mistyped_column(spark, tmp_path):
    """A drifted physical type (ts as string) raises, never misparses."""
    sf_dir = _write_events_variant(spark, tmp_path, "cast(ts as string)")
    with pytest.raises(ValueError, match="refusing to misparse"):
        read_table(spark, sf_dir, "events")


def test_read_table_rejects_column_drift(spark, tmp_path):
    """A renamed/missing column raises with both shapes in the message."""
    import glob
    import os
    import shutil

    src = read_table(spark, SF_SMOKE, "events").withColumnRenamed(
        "ts", "event_ts"
    )
    out = str(tmp_path / "events_renamed")
    src.coalesce(1).write.mode("overwrite").parquet(out)
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    part = glob.glob(f"{out}/part-*.parquet")[0]
    shutil.copy(part, f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError, match="column drift"):
        read_table(spark, sf_dir, "events")


def test_parallelize_small_scan_gate(spark):
    """Tiny single-split scans spread to cluster parallelism; the
    size gate (the 100 TB safety) leaves anything over budget alone."""
    from big_data_spark.io.readers import parallelize_small_scan

    docs = read_table(spark, SF_SMOKE, "documents")
    want = spark.sparkContext.defaultParallelism
    spread = parallelize_small_scan(docs)
    assert spread.rdd.getNumPartitions() == want
    # Same rows either way — partitioning is never allowed to change
    # results.
    assert spread.count() == docs.count()
    # Over-budget input (gate forced to 1 byte): untouched plan.
    same = parallelize_small_scan(docs, max_bytes=1)
    assert same is docs


def test_events_stream_rejects_mistyped_column(spark, tmp_path):
    """The stream reader shares the assertion: the silent-wrong-answer
    mode (declared schema coercing a drifted type) is structurally
    impossible."""
    from big_data_spark.streaming import read_events_stream

    sf_dir = _write_events_variant(spark, tmp_path, "cast(ts as string)")
    with pytest.raises(ValueError, match="refusing to misparse"):
        read_events_stream(spark, sf_dir)


def test_read_csv_explicit_schema_and_quarantine(spark, tmp_path):
    """CSV source: explicit schema, clean rows parse typed, malformed
    rows (wrong arity / unparseable numerics) raise by default and are
    droppable explicitly."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from big_data_spark.io.readers import read_csv

    path = str(tmp_path / "t.csv")
    with open(path, "w") as f:
        f.write("id,name,score\n")
        f.write("1,alpha,1.5\n")
        f.write("2,beta,2.5\n")
        f.write("3,gamma,not_a_number\n")  # corrupt: bad double

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    with pytest.raises(ValueError, match="malformed csv"):
        read_csv(spark, path, schema).collect()

    ok = read_csv(spark, path, schema, fail_on_corrupt=False)
    rows = {tuple(r) for r in ok.collect()}
    assert rows == {(1, "alpha", 1.5), (2, "beta", 2.5)}
    assert ok.schema["score"].dataType.simpleString() == "double"


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC sink/source round-trip; predicate pushdown reaches the
    ORC scan like parquet."""
    from pyspark.sql import functions as F

    from big_data_spark.io.readers import read_table
    from big_data_spark.io.writers import write_orc

    path = str(tmp_path / "orders_orc")
    orders = read_table(spark, SF_SMOKE, "orders")
    write_orc(orders, path, partition_by=["o_orderstatus"])
    back = spark.read.orc(path)
    assert back.count() == orders.count()
    q = back.filter(F.col("o_orderstatus") == "F").filter(
        F.col("o_totalprice") > 1000.0
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "o_orderstatus" in plan
    assert "PushedFilters" in plan
    got = q.agg(F.count(F.lit(1))).collect()[0][0]
    want = orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000.0)
    ).count()
    assert got == want


def test_catalog_sql_door_matches_dataframe(spark):
    """register_views exposes the same canonical tables spark-side
    SQL and DataFrame code see (one contract, two doors): a raw SQL
    aggregate equals its DataFrame twin, events.ts arrives as the
    canonical epoch-nanosecond BIGINT in SQL too, and re-registration
    is idempotent."""
    from pyspark.sql import functions as F

    from big_data_spark.catalog import register_views, run_sql
    from big_data_spark.io.readers import read_table

    sf = "/root/testdata/sf0.001"
    names = register_views(spark, sf)
    assert "lineitem" in names and "events" in names
    got = run_sql(
        spark,
        sf,
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag",
    ).collect()
    want = (
        read_table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    ts_type = dict(spark.sql("SELECT ts FROM events").dtypes)["ts"]
    assert ts_type == "bigint"
    register_views(spark, sf)  # replace, not fail


def test_table_footer_rows_matches_count(spark):
    """Driver-side footer num_rows must equal the distributed count
    (it feeds chunked_pair_candidates' total_rows fast path), and
    unprovable locations must decline to None."""
    from big_data_spark.io.readers import read_table, table_footer_rows

    sf = "/root/testdata/sf0.001"
    for name in ("embeddings", "documents"):
        n = table_footer_rows(sf, name)
        assert n is not None
        assert n == read_table(spark, sf, name).count()
    assert table_footer_rows("s3a://bucket", "embeddings") is None
    assert table_footer_rows("/nonexistent-dir", "embeddings") is None
