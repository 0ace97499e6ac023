"""Approximate (sketch) aggregates — the 100 TB path for distinct
counts and percentiles. No DuckDB oracle (sketches differ by engine);
instead: bounded relative error against the exact answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_spark.io.readers import read_table
from tests.conftest import SF_SMOKE


def test_approx_count_distinct_within_5pct(spark):
    li = read_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_approx_percentile_brackets_exact(spark):
    li = read_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.9)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.02
