"""Process-tree encodings: request path, Euler string, server depths.

Semantics match the reference exactly (docstrings cite file:line) but
the implementation is pure DataFrame:

- The reference drops to RDDs and a per-group Python fold for the
  encodings (reference: Src/processes.py:10-44) — opaque to Catalyst,
  one pickled-row round trip per event. We use
  ``sort_array(collect_list(struct(...)))`` + higher-order array
  functions: one shuffle, whole-stage codegen, no Python workers.
- The reference computes server depth by walking the request path in
  a row UDF with an insert-if-absent dict (reference:
  Src/processes.py:66-99): depth(user)=0 and the FIRST Request X->Y
  assigns depth(Y) = first_seen_depth(X) + 1 — NOT the running stack
  depth (the two diverge when a server reappears deeper and then
  requests an unseen server). We reproduce the walk exactly as a
  JVM-side ``aggregate`` fold over the time-sorted request array:
  still one shuffle, whole-stage codegen, no Python workers, and
  embarrassingly parallel across processes.

Scale: everything partitions by ``process_id`` — analysis is
embarrassingly parallel across processes; no driver materialization,
no per-key jobs. A 100 TB log corpus shuffles once per stage on
``process_id`` and AQE handles skewed (very deep/hot) processes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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


_BAD = "__walk_violation__"


def server_first_depths(logs_df: DataFrame) -> DataFrame:
    """Per (process_id, server) first-request depth, by the
    reference's insert-if-absent dict walk (Src/processes.py:86-94):
    depth(user)=0; the FIRST Request X->Y (time order) assigns
    depth(Y) = first_seen_depth(X) + 1. A walk violation — any
    Request whose X is not yet in the dict, which subsumes the
    reference's path-starts-at-user assert, or a process with no
    Requests at all — yields NO rows for that process (the reference
    UDF returns ``{}``; downstream the -1 sentinel appears instead).

    The walk is inherently sequential per process, so it is expressed
    as a JVM-side ``aggregate`` fold over the time-sorted Request
    structs: one shuffle on process_id, codegen end-to-end, no Python
    workers, parallel across processes (the per-process request list
    is session-sized — the same boundedness the reference's row UDF
    assumes)."""
    reqs = F.sort_array(
        F.collect_list(
            F.when(
                F.col("action") == "Request",
                F.struct("time", "state_from", "state_to"),
            )
        )
    )
    grouped = logs_df.groupBy("process_id").agg(reqs.alias("reqs"))

    def step(acc: F.Column, r: F.Column) -> F.Column:
        return (
            F.when(F.map_contains_key(acc, F.lit(_BAD)), acc)
            .when(
                ~F.map_contains_key(acc, r["state_from"]),
                F.create_map(F.lit(_BAD), F.lit(-1)),
            )
            .when(F.map_contains_key(acc, r["state_to"]), acc)
            .otherwise(
                F.map_concat(
                    acc,
                    F.create_map(
                        r["state_to"],
                        F.element_at(acc, r["state_from"]) + F.lit(1),
                    ),
                )
            )
        )

    fold = F.aggregate(
        F.col("reqs"),
        F.create_map(F.lit("user"), F.lit(0)),
        step,
        # finish: poison -> NULL map, so explode() emits zero rows
        lambda acc: F.when(
            F.map_contains_key(acc, F.lit(_BAD)), F.lit(None)
        ).otherwise(acc),
    )
    depth_map = F.when(F.size("reqs") > 0, fold)
    return grouped.select(
        "process_id", F.explode(depth_map).alias("server", "depth")
    ).select("process_id", "server", F.col("depth").cast("long").alias("depth"))


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
