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


def test_hll_estimate_within_error_bound(spark):
    """Custom mergeable HLL: per-source distinct-token estimates land
    within 4 standard errors of exact (sigma = 1.04/sqrt(m))."""
    from big_data_spark.operators.hll import (
        hll_error_bound,
        hll_estimate,
        hll_registers,
    )

    p = 12
    tokens = (
        read_table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    exact = {
        r.source: r.n
        for r in tokens.groupBy("source")
        .agg(F.countDistinct("tok").alias("n"))
        .collect()
    }
    est = {
        r.source: r.approx_distinct
        for r in hll_estimate(
            hll_registers(tokens, ["source"], "tok", p=p), ["source"], p=p
        ).collect()
    }
    assert set(est) == set(exact)
    tol = 4 * hll_error_bound(p)
    for src, n in exact.items():
        assert abs(est[src] - n) <= max(tol * n, 3), (src, n, est[src])


def test_hll_merge_equals_direct_sketch(spark):
    """Register-merge is EXACT: sketching a union equals max-merging
    the parts' sketches, row for row — the property that lets daily
    sketches roll up without raw data."""
    from big_data_spark.operators.hll import hll_merge, hll_registers

    docs = read_table(spark, SF_SMOKE, "documents")
    tokens = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    part1 = tokens.filter(F.col("tok") < "m")
    part2 = tokens.filter(F.col("tok") >= "m")
    direct = hll_registers(tokens, ["source"], "tok")
    merged = hll_merge(
        hll_registers(part1, ["source"], "tok"),
        hll_registers(part2, ["source"], "tok"),
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_hll_registers_over_a_stream(spark):
    """The register build is a plain max-aggregation, so it runs
    unchanged as a streaming stateful aggregate — the sketch of a
    fully-drained stream equals the batch sketch exactly."""
    from big_data_spark.operators.hll import hll_registers
    from big_data_spark.streaming import read_events_stream, run_stream_to_table

    stream = read_events_stream(spark, SF_SMOKE)
    streamed = run_stream_to_table(
        hll_registers(stream, ["event_type"], "user_id"),
        "hll_stream_regs",
        output_mode="complete",
    )
    batch = hll_registers(
        read_table(spark, SF_SMOKE, "events"), ["event_type"], "user_id"
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_cms_never_undercounts_and_is_tight_here(spark):
    """Count-Min: estimate >= exact always (one-sided error), and
    with w far above the distinct-item count the estimates are exact."""
    from big_data_spark.operators.cms import cms_lookup, cms_sketch

    tokens = (
        read_table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    exact = {
        (r.source, r.tok): r.n
        for r in tokens.groupBy("source", "tok").count().withColumnRenamed("count", "n").collect()
    }
    sketch = cms_sketch(tokens, ["source"], "tok", d=4, w=2048)
    distinct_items = tokens.distinct()
    est = {
        (r.source, r.tok): r.approx_count
        for r in cms_lookup(
            sketch, distinct_items, ["source"], "tok", d=4, w=2048
        ).collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, (k, n, est[k])
    # ~650 distinct (source, tok) pairs into 4x2048 buckets: exact.
    assert est == exact


def test_cms_merge_equals_direct_sketch(spark):
    from big_data_spark.operators.cms import cms_merge, cms_sketch

    tokens = (
        read_table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    direct = cms_sketch(tokens, ["source"], "tok")
    merged = cms_merge(
        cms_sketch(tokens.filter(F.col("tok") < "m"), ["source"], "tok"),
        cms_sketch(tokens.filter(F.col("tok") >= "m"), ["source"], "tok"),
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_approx_percentile_brackets_exact(spark):
    li = read_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.9)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.02
