#!/usr/bin/env python
"""A/B: serial driver manifest walk vs the round-10 bulk scan
(io/snapshot._read_manifests) for resolve_as_of_ts / table_history
on a many-commit table — the round-9 verdict directive #4 evidence.

Builds N metadata-only commits in a temp table, then times each
operation both ways IN ONE SESSION (paired): the serial path is
forced by lifting the threshold above N; the bulk path is the
shipped default. On local disk the serial read is ~1ms, so the win
here is modest — on an object store each serial read is a full
round trip (tens of ms), which is the regime the bulk scan targets;
the printed per-read count is the portable number.

Usage: python tools/manifest_ab.py [n_commits]   (default 300)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    import big_data_spark.io.snapshot as snap
    from big_data_spark.io.snapshot import (
        commit_manifest,
        resolve_as_of_ts,
        table_history,
        write_snapshot,
    )
    from big_data_spark.session import get_spark, quiet_logs, stop_spark

    spark = get_spark(app_name="manifest-ab", shuffle_partitions=8)
    quiet_logs(spark)
    t = tempfile.mkdtemp(prefix="bds_manifest_ab_")
    try:
        write_snapshot(
            spark.createDataFrame([(1,)], "k int"), t, 0
        )
        prev = snap.read_manifest(spark, t, 0)
        for sid in range(1, n):
            commit_manifest(
                spark,
                t,
                sid,
                dict(prev["entries"]),
                schema_fields=prev["schema"],
                maintenance=True,
                prev_man=prev,
            )
            prev = snap.read_manifest(spark, t, sid)
        ts_last = prev["committed_at_ms"]

        reads = {"n": 0}
        real = snap.read_manifest

        def counted(s, d, i):
            reads["n"] += 1
            return real(s, d, i)

        snap.read_manifest = counted
        results = {}
        for label, threshold in (("serial", n + 1), ("bulk", 32)):
            snap._BULK_MANIFEST_THRESHOLD = threshold
            # warm + 3 timed runs, median; reads counted PER
            # OPERATION (a shared counter across both walks would
            # double-report the per-pass number).
            resolve_as_of_ts(spark, t, ts_last)
            times_r, times_h = [], []
            reads_r = reads_h = 0
            for _ in range(3):
                reads["n"] = 0
                t0 = time.perf_counter()
                assert resolve_as_of_ts(spark, t, ts_last) == n - 1
                times_r.append(time.perf_counter() - t0)
                reads_r = reads["n"]
                reads["n"] = 0
                t0 = time.perf_counter()
                assert table_history(spark, t).count() == n
                times_h.append(time.perf_counter() - t0)
                reads_h = reads["n"]
            results[label] = (
                sorted(times_r)[1],
                sorted(times_h)[1],
                reads_r,
                reads_h,
            )
        snap.read_manifest = real
        for label, (tr, th, nr, nh) in results.items():
            print(
                f"{label:7s} resolve_as_of_ts={tr*1000:8.1f}ms "
                f"(serial_reads={nr}) "
                f"table_history={th*1000:8.1f}ms (serial_reads={nh})"
            )
        s, b = results["serial"], results["bulk"]
        print(
            f"\n{n} commits: serial driver reads per operation "
            f"{s[2]} -> {b[2]}; at ~20ms/object-store round trip "
            f"each serial walk is ~{s[2] * 20 / 1000:.1f}s of pure "
            "latency vs one parallel job."
        )
    finally:
        shutil.rmtree(t, ignore_errors=True)
        stop_spark(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
