"""Structured Streaming: batch parity + stateful operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_spark.io.readers import read_table
from big_data_spark.streaming import (
    read_events_stream,
    run_stream_to_table,
    user_totals_stateful,
)
from big_data_spark.queries.relational import q_events_hourly
from big_data_spark.queries.streaming_q import q_stream_hourly
from tests.conftest import SF_SMOKE


def test_stream_hourly_matches_batch(spark):
    stream_rows = sorted(
        tuple(r) for r in q_stream_hourly(spark, SF_SMOKE).collect()
    )
    batch_rows = sorted(
        tuple(r) for r in q_events_hourly(spark, SF_SMOKE).collect()
    )
    assert stream_rows == batch_rows


def test_stream_is_streaming_plan(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    assert stream.isStreaming


def test_stateful_user_totals(spark):
    events = read_events_stream(spark, SF_SMOKE)
    got = run_stream_to_table(
        user_totals_stateful(events), "user_totals_result", output_mode="update"
    )
    # Update mode re-emits a row per user per micro-batch; the final
    # state per user is the max n_events row.
    final = (
        got.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    )
    batch = (
        read_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    assert {r.user_id: r.n_events for r in final} == {
        r.user_id: r.n_events for r in batch
    }
