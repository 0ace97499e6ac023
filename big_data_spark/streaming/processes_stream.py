"""Streaming part-1 pipeline (SURVEY.md §7.2 step 9 — the stretch
extension the reference lacks entirely): process encodings computed
over a LIVE log stream with per-process session windows.

A process is one request tree whose events are contiguous in time;
as a stream, that is a session per (process_id): the session closes
once no event arrives for ``gap``. The aggregation collects the
session's events, and the SAME post-aggregation expressions as the
batch encoder (functions.tree.request_path_expr / euler_string_expr)
derive the encodings — batch/stream parity is by construction, and
tested in tests/test_streaming.py.

Output semantics: session-window streaming aggregation is
append-only — a session emits exactly once, after the watermark
passes its end. Tail sessions of a finite replay only flush when
later events advance the watermark; the test uses a far-future
heartbeat event for that, which is also the production pattern for
draining a finite backlog.

Downstream grouping (equal-process groups) is a second aggregation,
which one streaming query cannot chain; run it per-batch via
foreachBatch or on the sink table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_spark.functions.tree import euler_string_expr, request_path_expr
from big_data_spark.schemas import LOGS_SCHEMA


def read_logs_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of LOGS_SCHEMA parquet with an event_time
    derived from the integer tick (1 tick = 1 second)."""
    reader = spark.readStream.schema(LOGS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path).withColumn(
        "event_time", F.timestamp_seconds(F.col("time"))
    )


def process_encodings_stream(
    logs_stream: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-process request_path / euler_string over session windows."""
    sessions = (
        logs_stream.withWatermark("event_time", watermark)
        .groupBy("process_id", F.session_window("event_time", gap))
        .agg(
            F.sort_array(
                F.collect_list(F.struct("time", "action", "state_from", "state_to"))
            ).alias("events")
        )
    )
    return sessions.select(
        "process_id",
        F.unix_timestamp(F.col("session_window.start")).alias("session_start_epoch"),
        request_path_expr(F.col("events")).alias("request_path"),
        euler_string_expr(F.col("events")).alias("euler_string"),
    )
