#!/usr/bin/env python
"""Round-13 directive #6 / round-14 directive #1 probe: a
many-generation table's metadata aggregate before/after SHARDED
stats consolidation.

Builds an N-generation snapshot table (default 600 — past the
512-entry process sidecar cache), measures the sidecar file reads a
FRESH process pays for one metadata aggregate, consolidates
(``consolidate_stats`` with a shard cap), simulates a fresh process,
and re-measures. Expected:

- consolidation yields ceil(N / shard_gens) shard files;
- a fresh-process aggregate pays at most that many sidecar reads
  (or one bulk scan when past the threshold), identical values;
- after appending a loose tail and re-consolidating, every SEALED
  full shard is carried by reference (same rel — only the tail was
  rewritten), and values still match.

Usage: python tools/consolidate_probe.py [n_generations]
    [shard_gens] [table_dir]
"""

from __future__ import annotations

import math
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
    shard_gens = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    t = (
        sys.argv[3]
        if len(sys.argv) > 3
        else f"/tmp/bds_conprobe_p{os.getpid()}"
    )
    import big_data_spark.io.snapshot as snap
    from big_data_spark.io.snapshot import (
        append_snapshot,
        consolidate_stats,
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

    def live_sidecars():
        man = latest_manifest(spark, t)
        return set((man["stats"]["sidecars"]).values())

    agg0, reads0, dt0 = fresh_aggregate()
    side0 = live_sidecars()
    print(
        f"BEFORE: {len(side0)} sidecar files; fresh-process aggregate"
        f" = {reads0} serial sidecar reads (bulk prefetch covers the "
        f"rest in one distributed scan), {dt0:.2f}s, "
        f"rows={agg0['rows']}"
    )
    st = consolidate_stats(spark, t, shard_gens=shard_gens)
    print(f"consolidate merged_sidecars={st.get('merged_sidecars')}")
    agg1, reads1, dt1 = fresh_aggregate()
    side1 = live_sidecars()
    want_shards = math.ceil(n / shard_gens)
    print(
        f"AFTER:  {len(side1)} shard file(s) (want {want_shards}); "
        f"fresh-process aggregate = {reads1} sidecar read(s), "
        f"{dt1:.2f}s, rows={agg1['rows']}"
    )
    same = all(agg0[k] == agg1[k] for k in ("rows", "min", "max", "sum"))
    ok = (
        len(side1) == want_shards
        and reads1 <= max(want_shards, 1)
        and same
    )
    # Incremental pass: a loose tail refolds WITHOUT rewriting any
    # sealed full shard.
    extra = snap._CONSOLIDATE_MAX_SIDECARS + 1
    for i in range(n, n + extra):
        append_snapshot(
            spark.range(i * 10, (i + 1) * 10).selectExpr(
                "id AS k", "CAST(id AS INT) AS v"
            ),
            t,
        )
    sealed = {r for r in side1 if "consolidated-f" in r}
    st2 = consolidate_stats(spark, t, shard_gens=shard_gens)
    side2 = live_sidecars()
    agg2, reads2, dt2 = fresh_aggregate()
    kept = sealed <= side2
    print(
        f"REPEAT: +{extra} loose gens -> merged "
        f"{st2.get('merged_sidecars')} file(s); {len(side2)} shards; "
        f"sealed fulls carried by reference: {kept}; "
        f"rows={agg2['rows']} (want {(n + extra) * 10})"
    )
    ok = ok and kept and agg2["rows"] == (n + extra) * 10
    print("PROBE", "PASS" if ok else "FAIL")
    shutil.rmtree(t, ignore_errors=True)
    stop_spark(spark)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
