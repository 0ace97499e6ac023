"""Process-tree encodings: request path, Euler string, server depths.

Semantics match the reference exactly (docstrings cite file:line) but
the implementation is pure DataFrame:

- The reference drops to RDDs and a per-group Python fold for the
  encodings (reference: Src/processes.py:10-44) — opaque to Catalyst,
  one pickled-row round trip per event. We use
  ``sort_array(collect_list(struct(...)))`` + higher-order array
  functions: one shuffle, whole-stage codegen, no Python workers.
- The reference computes server depth by re-parsing the request-path
  string in a row UDF (reference: Src/processes.py:66-99). We compute
  the running stack depth with a window over the raw events: when a
  Request X->Y fires, the events-so-far stack depth equals depth(X)
  and depth(Y) = depth(X)+1. First occurrence wins (the reference's
  dict only inserts unseen servers), which ``min_by(depth, time)``
  reproduces.

Scale: everything partitions by ``process_id`` — analysis is
embarrassingly parallel across processes; no driver materialization,
no per-key jobs. A 100 TB log corpus shuffles once per stage on
``process_id`` and AQE handles skewed (very deep/hot) processes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "process_encodings",
    "logs_with_depth",
    "server_first_depths",
    "request_path_expr",
    "euler_string_expr",
]


def _sorted_events(logs_df: DataFrame):
    """Per-process time-ordered event structs.

    ``time`` leads the struct so ``sort_array`` orders chronologically
    (times are strictly increasing within a process — FIXTURES.md §1 —
    so the tie-break fields never matter, but they make the sort total
    and deterministic anyway).
    """
    return F.sort_array(
        F.collect_list(F.struct("time", "action", "state_from", "state_to"))
    )


def request_path_expr(events_col) -> F.Column:
    """request_path from a time-sorted event-struct array column —
    shared by the batch encoder and the streaming session-window
    encoder (the post-aggregation expression is identical)."""
    return F.array_join(
        F.transform(
            F.filter(events_col, lambda e: e["action"] == F.lit("Request")),
            lambda e: F.concat_ws(":", e["state_from"], e["state_to"]),
        ),
        "-",
    )


def euler_string_expr(events_col) -> F.Column:
    """euler_string from a time-sorted event-struct array column."""
    return F.array_join(
        F.transform(
            events_col,
            lambda e: F.when(
                e["action"] == "Request", F.concat(F.lit("1"), e["state_to"])
            ).otherwise(F.concat(F.lit("0"), e["state_from"])),
        ),
        "-",
    )


def process_encodings(logs_df: DataFrame) -> DataFrame:
    """One row per process with ``request_path`` and ``euler_string``.

    Encodings (reference: Src/processes.py:12-33):
    - request_path: time-ordered Request edges ``from:to`` joined by
      ``-``, e.g. ``user:S1-S1:S2``.
    - euler_string: ``1``+callee on each Request, ``0``+responder on
      each Response, joined by ``-``, e.g. ``1S1-1S2-0S2-0S1``.
    """
    events = _sorted_events(logs_df).alias("events")
    grouped = logs_df.groupBy("process_id").agg(events)
    return grouped.select(
        "process_id",
        request_path_expr(F.col("events")).alias("request_path"),
        euler_string_expr(F.col("events")).alias("euler_string"),
    )


def server_first_depths(logs_df: DataFrame) -> DataFrame:
    """Per (process_id, server) first-request depth.

    depth(user)=0; a Request X->Y assigns depth(Y)=stack_depth+1 where
    stack_depth = #Requests - #Responses strictly before the row. The
    first assignment in time order wins, matching the reference's
    insert-if-absent dict walk over the request path (reference:
    Src/processes.py:86-94).
    """
    w = (
        Window.partitionBy("process_id")
        .orderBy("time")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stack_depth = F.coalesce(
        F.sum(
            F.when(F.col("action") == "Request", F.lit(1)).otherwise(F.lit(-1))
        ).over(w),
        F.lit(0),
    )
    # Materialize the window column BEFORE filtering to Requests —
    # the running sum must see Response rows too.
    requested = (
        logs_df.withColumn("_stack_depth", stack_depth)
        .filter(F.col("action") == "Request")
        .select(
            "process_id",
            F.col("state_to").alias("server"),
            (F.col("_stack_depth") + 1).alias("depth"),
            "time",
        )
        .groupBy("process_id", "server")
        .agg(F.min_by("depth", "time").alias("depth"))
    )
    user_rows = logs_df.select("process_id").distinct().select(
        "process_id",
        F.lit("user").alias("server"),
        F.lit(0).cast("long").alias("depth"),
    )
    return requested.unionByName(user_rows)


def logs_with_depth(logs_df: DataFrame) -> DataFrame:
    """Logs plus ``depth_from`` = first-request depth of ``state_from``.

    Replaces the reference's join + map-lookup UDF (reference:
    Src/processes.py:134-144) with an equi-join on
    (process_id, server); unmatched servers get -1 to preserve the
    reference's sentinel (Src/processes.py:139).
    """
    depths = server_first_depths(logs_df).withColumnRenamed("server", "state_from")
    joined = logs_df.join(depths, on=["process_id", "state_from"], how="left")
    return joined.withColumn(
        "depth_from", F.coalesce(F.col("depth").cast("int"), F.lit(-1))
    ).drop("depth")


def depth_to_servers(logs_df: DataFrame) -> DataFrame:
    """Per process: map depth -> list of servers first seen at it.

    Reference builds this by exploding its UDF map then two groupBys
    (Src/processes.py:108-126); same shape here from the window-based
    depths. Server lists are sorted for determinism (the reference
    inherits whatever order collect_list sees).
    """
    return (
        server_first_depths(logs_df)
        .groupBy("process_id", "depth")
        .agg(F.array_sort(F.collect_list("server")).alias("servers"))
        .groupBy("process_id")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("depth", "servers")))
            ).alias("depth_to_servers")
        )
    )
