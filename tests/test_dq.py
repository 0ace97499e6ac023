"""Data-quality suite: each check kind's semantics, the single-pass
plan contract, and NULL handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_spark.operators import dq


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.io", "US", 10.0),
            (2, "b@x.io", "DE", -5.0),  # range violation
            (2, "nope", "FR", 20.0),  # dup id + bad email
            (None, "c@x.io", "XX", 30.0),  # null id + bad country
            (4, None, "US", None),  # NULL email/score pass (NULL ok)
        ],
        "id int, email string, country string, score double",
    )


def _by_name(report):
    return {r["check"]: r for r in report.collect()}


def test_row_checks(spark, df):
    rep = _by_name(
        dq.check_suite(
            df,
            [
                dq.not_null("id"),
                dq.in_set("country", ["US", "DE", "FR"]),
                dq.in_range("score", lo=0.0, hi=100.0),
                dq.matches("email", r"^[^@]+@[^@]+$"),
            ],
        )
    )
    assert rep["not_null(id)"]["violations"] == 1
    assert rep["in_set(country)"]["violations"] == 1  # XX
    assert rep["in_range(score)"]["violations"] == 1  # -5; NULL passes
    assert rep["matches(email)"]["violations"] == 1  # nope; NULL passes
    assert all(r["n_rows"] == 5 for r in rep.values())
    assert not rep["not_null(id)"]["passed"]


def test_unique_counts_dups_not_nulls(spark, df):
    rep = _by_name(dq.check_suite(df, [dq.unique("id")]))
    # ids: 1,2,2,NULL,4 -> 4 non-null, 3 distinct -> 1 duplicate;
    # the NULL is not a uniqueness violation (pair with not_null).
    assert rep["unique(id)"]["violations"] == 1


def test_referential_fk(spark, df):
    ref = spark.createDataFrame([("US",), ("DE",)], "code string")
    rep = _by_name(
        dq.check_suite(df, [dq.referential("country", ref, "code")])
    )
    assert rep["referential(country)"]["violations"] == 2  # FR, XX
    assert rep["referential(country)"]["n_rows"] == 5


def test_satisfies_cross_column(spark, df):
    rep = _by_name(
        dq.check_suite(
            df,
            [
                dq.satisfies(
                    F.col("score") >= 0,
                    "score_nonneg",
                    column="score",
                )
            ],
        )
    )
    # NULL predicate counts as violated for satisfies (must HOLD).
    assert rep["score_nonneg"]["violations"] == 2


def test_single_pass_plan(spark, df):
    """All row-local + unique checks share ONE aggregate over ONE
    scan: no join, no extra exchange per check."""
    rep = dq.check_suite(
        df,
        [
            dq.not_null("id"),
            dq.in_set("country", ["US"]),
            dq.in_range("score", lo=0.0),
            dq.unique("id"),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # referential is the only join-bearing kind
    assert plan.count("Scan") <= 2  # one scan (+ reused exchange repr)


def test_duplicate_names_rejected(spark, df):
    with pytest.raises(ValueError, match="duplicate"):
        dq.check_suite(df, [dq.not_null("id"), dq.not_null("id")])


def test_all_green_suite(spark):
    clean = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    rep = dq.check_suite(clean, [dq.not_null("id"), dq.unique("id")])
    assert all(r["passed"] for r in rep.collect())


def test_assert_suite_passes_through_or_raises(spark, df):
    clean_checks = [dq.in_range("score", lo=-100.0)]
    out = dq.assert_suite(df, clean_checks)
    assert out is df  # unchanged plan on success
    with pytest.raises(ValueError, match="not_null\\(id\\): 1 violations"):
        dq.assert_suite(df, [dq.not_null("id")])


def test_profile_table_one_pass(spark, df):
    prof = dq.profile_table(df)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    rows = {r["column"]: r for r in prof.collect()}
    assert rows["id"]["n"] == 4 and rows["id"]["n_null"] == 1
    assert rows["score"]["n_null"] == 1
    assert rows["score"]["min"] == "-5.0" and rows["score"]["max"] == "30.0"
    assert rows["email"]["mean"] is None  # non-numeric
    assert abs(rows["score"]["mean"] - (10.0 - 5.0 + 20.0 + 30.0) / 4) < 1e-9
    # approx_count_distinct is exact at this cardinality
    assert rows["country"]["approx_distinct"] == 4


def test_check_stream_matches_batch(spark, tmp_path):
    """Streaming DQ == the same windowed conditional sums run in
    batch; only row-local checks are accepted."""
    from pyspark.sql.types import (
        DoubleType,
        StructField,
        StructType,
        TimestampType,
    )

    from big_data_spark.streaming.events import run_stream_to_table

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(minutes=m), float(v))
        for m, v in [(0, 1.0), (10, -2.0), (70, 3.0), (80, -4.0), (90, -5.0)]
    ]
    schema = StructType(
        [StructField("ts", TimestampType()), StructField("v", DoubleType())]
    )
    src = str(tmp_path / "dq_stream_src")
    spark.createDataFrame(rows, schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)

    checks = [dq.in_range("v", lo=0.0)]
    rep = dq.check_stream(stream, checks, "ts", "1 hour", "2 hours")
    got = {
        (r["window_start"].minute + r["window_start"].hour * 60, r["violations"], r["n_rows"])
        for r in run_stream_to_table(rep, "dq_stream_tbl").collect()
    }
    assert got == {(0, 1, 2), (60, 2, 3)}

    with pytest.raises(ValueError, match="row-local"):
        dq.check_stream(stream, [dq.unique("v")], "ts")
