"""Distributed workload generator: invariants, determinism, and an
opt-in scale check (SPARK_GRAFT_SCALE_TEST=1) driving part-1 grouping
over ~1M generated rows."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from big_data_spark.datagen import generate_logs
from big_data_spark.functions.tree import process_encodings
from big_data_spark.pipeline.processes import equal_process_groups


def test_generator_schema_and_counts(spark):
    logs = generate_logs(spark, n_trees=5, n_processes=20, seed=7)
    rows = logs.collect()
    assert {r.action for r in rows} == {"Request", "Response"}
    assert logs.select("process_id").distinct().count() == 20
    # Euler balance: every process has equal requests and responses,
    # starts from user and returns to user.
    per = (
        logs.groupBy("process_id")
        .agg(
            F.sum(F.when(F.col("action") == "Request", 1).otherwise(-1)).alias(
                "balance"
            ),
            F.min("time").alias("t0"),
            F.max("time").alias("t1"),
        )
        .collect()
    )
    assert all(r.balance == 0 for r in per)


def test_generator_deterministic_and_tree_shared(spark):
    a = sorted(tuple(r) for r in generate_logs(spark, 3, 9, seed=11).collect())
    b = sorted(tuple(r) for r in generate_logs(spark, 3, 9, seed=11).collect())
    assert a == b
    # Processes from the same tree_id have identical euler strings.
    logs = generate_logs(spark, n_trees=3, n_processes=9, seed=11)
    enc = process_encodings(logs).collect()
    by_tree: dict[int, set] = {}
    for r in enc:
        idx = int(r.process_id.removeprefix("process"))
        by_tree.setdefault(idx % 3, set()).add(r.euler_string)
    assert all(len(v) == 1 for v in by_tree.values())
    # Distinct trees (with 3 seeds) are overwhelmingly distinct shapes.
    assert len({next(iter(v)) for v in by_tree.values()}) >= 2


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TEST") != "1",
    reason="opt-in scale check (SPARK_GRAFT_SCALE_TEST=1)",
)
def test_scale_group_one_million_rows(spark):
    """Part-1 grouping over generated rows. Default ~0.73M rows;
    SPARK_GRAFT_SCALE_PROCESSES raises the point (8_000_000 procs =
    ~48M rows, the largest point of the PERF.md scale curve: 66x the
    default's rows for 6.4x the wall on local[32])."""
    n_processes = int(
        os.environ.get("SPARK_GRAFT_SCALE_PROCESSES", "120000")
    )
    logs = generate_logs(
        spark,
        n_trees=max(500, n_processes // 4000),
        n_processes=n_processes,
        max_branch=2,
        max_depth=3,
    )
    enc = process_encodings(logs)
    groups = equal_process_groups(
        enc.select("process_id", F.col("euler_string").alias("cluster_euler_string"))
    )
    n = groups.agg(F.sum(F.size("equal_processes"))).collect()[0][0]
    assert n == n_processes


@pytest.mark.parametrize(
    "n_trees,n_processes,branch,depth",
    [(3, 12, 2, 3), (7, 21, 3, 2)],
)
def test_generated_workload_pipeline_invariants(
    spark, n_trees, n_processes, branch, depth
):
    """The full pipeline on generated workloads: every process lands
    in exactly one group, and same-tree processes (identical Euler
    strings by construction) always share a group."""
    from big_data_spark.pipeline.processes import run_pipeline

    logs = generate_logs(
        spark, n_trees, n_processes, max_branch=branch, max_depth=depth, seed=5
    )
    out = run_pipeline(spark, logs)
    group_of = {}
    for row in out["groups"].collect():
        for pid in row["equal_processes"]:
            assert pid not in group_of, f"{pid} in two groups"
            group_of[pid] = row["group_processes_id"]
    assert len(group_of) == n_processes
    for i in range(n_processes):
        same_tree = f"process{(i + n_trees) % n_processes}"
        if (i % n_trees) == ((i + n_trees) % n_processes) % n_trees and i + n_trees < n_processes:
            assert group_of[f"process{i}"] == group_of[same_tree]


def test_read_logs_json_quarantines_malformed(spark, tmp_path):
    from big_data_spark.io.readers import read_logs_json

    p = tmp_path / "bad.json"
    p.write_text(
        '{"state_from": "user", "state_to": "S1", "action": "Request",'
        ' "time": 1, "process_id": "p1"},\n'
        "this is not json at all\n"
    )
    with pytest.raises(ValueError, match="malformed"):
        read_logs_json(spark, str(p))
    ok = read_logs_json(spark, str(p), fail_on_corrupt=False)
    assert ok.count() == 1


def test_read_logs_json_rejects_partial_rows(spark, tmp_path):
    """A row whose process_id parses but whose time is corrupt must
    not slip through the fail_on_corrupt gate as silent nulls."""
    from big_data_spark.io.readers import read_logs_json

    p = tmp_path / "partial.json"
    p.write_text(
        '{"state_from": "user", "state_to": "S1", "action": "Request",'
        ' "time": "not-a-number", "process_id": "p1"}\n'
    )
    with pytest.raises(ValueError, match="malformed"):
        read_logs_json(spark, str(p))
    assert read_logs_json(spark, str(p), fail_on_corrupt=False).count() == 0


@pytest.mark.parametrize("seed", [1, 7, 23, 99])
def test_depth_walk_fuzz_many_shapes(spark, seed):
    """Depth fold vs the reference dict-walk replay across varied
    tree shapes/seeds in ONE Spark job per seed (deep narrow trees,
    wide shallow trees, heavy server reuse)."""
    from big_data_spark.functions.tree import server_first_depths

    logs = generate_logs(
        spark, n_trees=8, n_processes=24, max_branch=4, max_depth=5,
        n_servers=3 + seed % 4, seed=seed,
    )
    rows = sorted(logs.collect(), key=lambda r: (r.process_id, r.time))
    want = {}
    for r in rows:
        if r.action != "Request":
            continue
        want.setdefault(r.process_id, []).append(r)
    expected = {}
    for pid, reqs in want.items():
        d = {"user": 0}
        for r in reqs:
            assert r.state_from in d, "generator produced an invalid walk"
            if r.state_to not in d:
                d[r.state_to] = d[r.state_from] + 1
        for server, depth in d.items():
            expected[(pid, server)] = depth
    got = {
        (r.process_id, r.server): r.depth
        for r in server_first_depths(logs).collect()
    }
    assert got == expected


def test_depth_walk_matches_reference_spec(spark):
    """logs_with_depth vs a driver-side replay of the REFERENCE's
    insert-if-absent dict walk (Src/processes.py:86-94: d[state_to] =
    d[state_from] + 1 on first request) — on generated trees where
    servers repeat at different depths, which is exactly where the
    dict walk diverges from a running-stack-depth rule."""
    from big_data_spark.functions.tree import logs_with_depth

    logs = generate_logs(
        spark, n_trees=6, n_processes=18, max_branch=3, max_depth=4,
        n_servers=4, seed=23,  # few servers => repeats within a tree
    )
    rows = sorted(logs.collect(), key=lambda r: (r.process_id, r.time))
    want = {}
    saw_divergence = False
    for pid in {r.process_id for r in rows}:
        events = [r for r in rows if r.process_id == pid]
        depth = {"user": 0}
        stack = 0
        for r in events:
            if r.action == "Request":
                if r.state_to not in depth:
                    depth[r.state_to] = depth[r.state_from] + 1
                    if depth[r.state_to] != stack + 1:
                        saw_divergence = True
                stack += 1
            else:
                stack -= 1
        for r in events:
            want[(pid, r.time)] = depth.get(r.state_from, -1)
    # These params MUST produce at least one tree where the dict walk
    # and the stack rule disagree, or the test proves nothing.
    assert saw_divergence
    got = {
        (r.process_id, r.time): r.depth_from
        for r in logs_with_depth(logs).collect()
    }
    assert got == want
