"""Deterministic PPS sampling (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_spark.operators.sampling import pps_sample


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 17) % 97 + 1).alias("w"),
    )


def test_pps_membership_is_deterministic_and_partition_independent(
    spark,
):
    df = _docs(spark)
    a = {r["doc_id"] for r in pps_sample(df, "doc_id", "w", 200).collect()}
    b = {
        r["doc_id"]
        for r in pps_sample(df.repartition(17), "doc_id", "w", 200).collect()
    }
    assert a == b and a


def test_pps_expected_size_and_weight_bias(spark):
    df = _docs(spark)
    kept = pps_sample(df, "doc_id", "w", 300).collect()
    n = len(kept)
    # Poisson design: |kept| concentrates around expected_n.
    assert 200 < n < 400, n
    # Weight bias: the kept set's mean weight must exceed the
    # population's (heavier rows are likelier kept).
    pop_mean = sum(
        ((i * 17) % 97 + 1) for i in range(2000)
    ) / 2000.0
    kept_mean = sum(r["w"] for r in kept) / n
    assert kept_mean > pop_mean * 1.2


def test_pps_inclusion_probability_and_ht_estimate(spark):
    df = _docs(spark)
    kept = pps_sample(df, "doc_id", "w", 300)
    rows = kept.collect()
    W = sum(((i * 17) % 97 + 1) for i in range(2000))
    for r in rows[:50]:
        assert abs(r["_p"] - min(1.0, 300 * r["w"] / W)) < 1e-12
    # Horvitz-Thompson: sum(w/p) over kept estimates total weight.
    ht = sum(r["w"] / r["_p"] for r in rows)
    assert abs(ht - W) / W < 0.15


def test_pps_zero_weight_never_kept_and_huge_weight_always(spark):
    df = spark.createDataFrame(
        [(i, 0) for i in range(100)] + [(1000, 10**9)],
        "doc_id long, w long",
    )
    kept = pps_sample(df, "doc_id", "w", 10).collect()
    assert {r["doc_id"] for r in kept} == {1000}
    assert kept[0]["_p"] == 1.0


def test_pps_validation(spark):
    with pytest.raises(ValueError, match="expected_n"):
        pps_sample(_docs(spark, 10), "doc_id", "w", 0)


def test_pps_overflow_guard_raises_loudly(spark):
    """Weights whose decimal(38,0) gate products would overflow past
    38 digits raise instead of silently dropping rows (overflow ->
    NULL -> filter drop would bias the sample membership)."""
    from pyspark.errors import SparkRuntimeException

    df = spark.range(10).select(
        F.col("id").alias("k"),
        F.lit("1" + "0" * 30).cast("decimal(38,0)").alias("w"),
    )
    big = pps_sample(df, "k", "w", expected_n=10**6)
    with pytest.raises(SparkRuntimeException, match="pps_sample"):
        big.count()
    # Same shape under the bound: no raise, sane membership.
    ok = pps_sample(
        spark.range(10).select(
            F.col("id").alias("k"), F.lit(100).alias("w")
        ),
        "k",
        "w",
        expected_n=5,
    )
    assert ok.count() <= 10
