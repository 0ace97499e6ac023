"""Distributed synthetic workload generator.

Re-expresses the reference generator's semantics (reference:
Src/data.py:67-161 + Src/states.py:35-52 — random rooted service-call
trees, instantiated many times, serialized as interleaved
request/response event logs) as a *distributed* generator: the
reference builds every process in a driver loop and writes local
JSON; here each Python worker builds its processes from a
deterministic per-tree seed inside ``mapInPandas``, so generating
10^9 processes is one narrow pass over ``spark.range`` — no driver
materialization, no shuffle.

Determinism: tree shape depends only on (seed, tree_id); timing only
on proc_idx — identical output for any partitioning or cluster size.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_spark.schemas import LOGS_SCHEMA


def _build_tree(
    rng: random.Random, n_servers: int, max_branch: int, max_depth: int
) -> list:
    """One rooted call tree as nested [server, children] lists."""

    def node(depth: int):
        server = f"S{rng.randrange(n_servers)}"
        children = []
        if depth < max_depth:
            for _ in range(rng.randint(0, max_branch)):
                children.append(node(depth + 1))
        return [server, children]

    return node(1)


def _euler_events(tree: list) -> list[tuple[str, str, str]]:
    """Interleaved request/response rows (state_from, state_to, action)
    for one process: the Euler tour of its tree — exactly the event
    order the reference's generator emits (Src/data.py:41-56)."""
    events: list[tuple[str, str, str]] = []

    def walk(parent: str, node: list) -> None:
        server, children = node
        events.append((parent, server, "Request"))
        for child in children:
            walk(server, child)
        events.append((server, parent, "Response"))

    walk("user", tree)
    return events


def generate_logs(
    spark: SparkSession,
    n_trees: int = 100,
    n_processes: int = 1000,
    max_branch: int = 2,
    max_depth: int = 3,
    n_servers: int = 50,
    seed: int = 42,
) -> DataFrame:
    """Event-log DataFrame in LOGS_SCHEMA: ``n_processes`` instances
    drawn round-robin from ``n_trees`` distinct trees."""
    # Upper bound on events per process: full (max_branch)-ary tree of
    # max_depth levels, 2 events per node — gives each process a
    # disjoint, monotonically increasing time range.
    max_nodes = sum(max_branch**d for d in range(max_depth)) + 1
    slot = 2 * max_nodes + 2

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tree_cache: dict[int, list[tuple[str, str, str]]] = {}
        for pdf in batches:
            sf, st, act, tm, pid = [], [], [], [], []
            for proc_idx, tree_id in zip(pdf["proc_idx"], pdf["tree_id"]):
                tid = int(tree_id)
                if tid not in tree_cache:
                    rng = random.Random(f"{seed}|{tid}")
                    tree_cache[tid] = _euler_events(
                        _build_tree(rng, n_servers, max_branch, max_depth)
                    )
                base = int(proc_idx) * slot
                name = f"process{int(proc_idx)}"
                for off, (a, b, action) in enumerate(tree_cache[tid]):
                    sf.append(a)
                    st.append(b)
                    act.append(action)
                    tm.append(base + off)
                    pid.append(name)
            yield pd.DataFrame(
                {
                    "state_from": sf,
                    "state_to": st,
                    "action": act,
                    "time": pd.Series(tm, dtype="int64"),
                    "process_id": pid,
                }
            )

    procs = spark.range(n_processes).select(
        F.col("id").alias("proc_idx"), (F.col("id") % n_trees).alias("tree_id")
    )
    return procs.mapInPandas(kernel, LOGS_SCHEMA)
