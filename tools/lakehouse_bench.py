"""Fixed-fixture lakehouse micro-bench (round-11 verdict #10): time
the table-format hot paths the query bench deliberately excludes —
commit (with its stats sweep), row-CDF UPDATE, and the pruned read
BOTH ways (manifest stats vs forced footer sweep) so the
metadata-only pruning win is a measured number, not a claim.

Usage: python tools/lakehouse_bench.py [sf_dir]  (default sf0.1)
Prints one JSON line; PERF.md records the quiet-machine numbers.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_spark.session import get_spark, quiet_logs  # noqa: E402


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="lakehouse-bench", shuffle_partitions=32)
    quiet_logs(spark)
    import big_data_spark.io.snapshot as snap
    from big_data_spark.io.snapshot import (
        append_snapshot,
        latest_manifest,
        read_entries,
        read_snapshot,
        update_where,
        write_snapshot,
    )

    t = os.path.join(tempfile.gettempdir(), "bds_lakebench")
    shutil.rmtree(t, ignore_errors=True)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    # Clustered layout so range pruning has real teeth.
    base = orders.repartitionByRange(32, "o_orderkey")
    res: dict = {}
    res["write_snapshot"], _ = timed(lambda: write_snapshot(base, t))
    res["append_commit"], _ = timed(
        lambda: append_snapshot(
            orders.limit(10_000).coalesce(1), t, snapshot_id=1
        )
    )
    res["update_row_cdf"], st = timed(
        lambda: update_where(
            spark,
            t,
            "o_orderkey >= 1000 AND o_orderkey < 2000",
            {"o_totalprice": "o_totalprice + 1.0"},
            row_cdf=True,
        )
    )
    res["update_matched_rows"] = st["updated_rows"]
    man = latest_manifest(spark, t)
    pred = {"o_orderkey": (500_000.0, 520_000.0)}

    def pruned_read(stats):
        df = read_entries(
            spark,
            t,
            man["entries"],
            predicate=pred,
            deletes=man.get("deletes"),
            schema_fields=man.get("schema"),
            rename_log=man.get("rename_log"),
            stats=stats,
        )
        return df.agg(F.count(F.lit(1)), F.sum("o_totalprice")).collect()

    # Warm the scan paths once, then median-of-3 each way.
    pruned_read(man.get("stats"))

    def med3(fn):
        return sorted(timed(fn)[0] for _ in range(3))[1]

    res["pruned_read_manifest_stats"] = med3(
        lambda: pruned_read(man.get("stats"))
    )
    res["pruned_read_footer_sweep"] = med3(lambda: pruned_read(None))
    res["full_read"] = med3(
        lambda: read_snapshot(spark, t)
        .agg(F.count(F.lit(1)), F.sum("o_totalprice"))
        .collect()
    )

    # Typed skipping (round 11, second batch): an event-time range on
    # a ts-clustered events table, decided from manifest stats vs the
    # forced footer sweep — the dominant fact-table predicate shape.
    t2 = os.path.join(tempfile.gettempdir(), "bds_lakebench_ts")
    shutil.rmtree(t2, ignore_errors=True)
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "event_type", "value"
    )
    res["typed_write_snapshot"], _ = timed(
        lambda: write_snapshot(
            events.repartitionByRange(16, "ts").sortWithinPartitions(
                "ts"
            ),
            t2,
        )
    )
    man2 = latest_manifest(spark, t2)
    pred2 = {"ts": ("2024-01-08 00:00:00", "2024-01-15 00:00:00")}

    def typed_read(stats):
        df = read_entries(
            spark,
            t2,
            man2["entries"],
            predicate=pred2,
            schema_fields=man2.get("schema"),
            stats=stats,
        )
        return df.agg(F.count(F.lit(1)), F.sum("value")).collect()

    typed_read(man2.get("stats"))
    res["typed_pruned_read_manifest_stats"] = med3(
        lambda: typed_read(man2.get("stats"))
    )
    res["typed_pruned_read_footer_sweep"] = med3(lambda: typed_read(None))
    shutil.rmtree(t2, ignore_errors=True)

    # Commit-cost flatness + manifest size (round-12 directive #1):
    # sidecar stats keep the manifest O(#generations) and the commit
    # O(new files) — append a fixed-size batch onto a table whose
    # live file count keeps growing and the per-commit time and the
    # manifest byte growth must both stay flat.
    t3 = os.path.join(tempfile.gettempdir(), "bds_lakebench_flat")
    shutil.rmtree(t3, ignore_errors=True)
    batch = orders.limit(5_000).coalesce(4)
    append_snapshot(batch, t3, snapshot_id=0)
    n_commits = 12

    def man_bytes(sid):
        return os.path.getsize(
            f"{t3}/_manifests/manifest-{sid:012d}.json"
        )

    commit_times = []
    for i in range(1, n_commits):
        dt_, _ = timed(lambda: append_snapshot(batch, t3, snapshot_id=i))
        commit_times.append(dt_)
    res["append_commit_first3_avg"] = sum(commit_times[:3]) / 3
    res["append_commit_last3_avg"] = sum(commit_times[-3:]) / 3
    res["manifest_bytes_first"] = man_bytes(1)
    res["manifest_bytes_last"] = man_bytes(n_commits - 1)
    shutil.rmtree(t3, ignore_errors=True)
    res = {
        k: (round(v, 3) if isinstance(v, float) else v)
        for k, v in res.items()
    }
    print(json.dumps({"sf_dir": sf_dir, **res}))
    shutil.rmtree(t, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
