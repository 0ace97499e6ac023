#!/usr/bin/env python
"""Round-13 directive #6 probe: a many-generation table's metadata
aggregate before/after stats consolidation.

Builds an N-generation snapshot table (default 600 — past the
512-entry process sidecar cache), measures the sidecar file reads a
FRESH process pays for one metadata aggregate, consolidates
(`analyze_table`, which folds the live sidecars into one consolidated
JSON with a metadata-only commit), clears the cache to simulate a
fresh process again, and re-measures. Expected: N reads (or one bulk
scan) before; exactly 1 after; identical aggregate values.

Usage: python tools/consolidate_probe.py [n_generations] [table_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from big_data_spark.session import get_spark, quiet_logs, stop_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    t = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/bds_conprobe_p{os.getpid()}"
    )
    import big_data_spark.io.snapshot as snap
    from big_data_spark.io.snapshot import (
        analyze_table,
        append_snapshot,
        latest_manifest,
        metadata_aggregate,
    )

    spark = get_spark(app_name="consolidate-probe", shuffle_partitions=4)
    quiet_logs(spark)
    shutil.rmtree(t, ignore_errors=True)
    t0 = time.perf_counter()
    for i in range(n):
        append_snapshot(
            spark.range(i * 10, (i + 1) * 10).selectExpr(
                "id AS k", "CAST(id AS INT) AS v"
            ),
            t,
        )
    print(f"built {n} generations in {time.perf_counter() - t0:.1f}s")

    def fresh_aggregate():
        snap._SIDECAR_CACHE.clear()
        base = snap._SIDECAR_FS_READS
        t1 = time.perf_counter()
        agg = metadata_aggregate(spark, t, columns=["k", "v"])
        dt = time.perf_counter() - t1
        return agg, snap._SIDECAR_FS_READS - base, dt

    agg0, reads0, dt0 = fresh_aggregate()
    side0 = len(
        set((latest_manifest(spark, t)["stats"]["sidecars"]).values())
    )
    print(
        f"BEFORE: {side0} sidecar files; fresh-process aggregate = "
        f"{reads0} serial sidecar reads (bulk prefetch covers the "
        f"rest in one distributed scan), {dt0:.2f}s, "
        f"rows={agg0['rows']}"
    )
    st = analyze_table(spark, t)
    print(f"analyze_table merged_sidecars={st.get('merged_sidecars')}")
    agg1, reads1, dt1 = fresh_aggregate()
    side1 = len(
        set((latest_manifest(spark, t)["stats"]["sidecars"]).values())
    )
    print(
        f"AFTER:  {side1} sidecar file(s); fresh-process aggregate = "
        f"{reads1} sidecar read(s), {dt1:.2f}s, rows={agg1['rows']}"
    )
    same = all(agg0[k] == agg1[k] for k in ("rows", "min", "max", "sum"))
    ok = side1 == 1 and reads1 == 1 and same
    print("PROBE", "PASS" if ok else "FAIL")
    shutil.rmtree(t, ignore_errors=True)
    stop_spark(spark)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
