#!/usr/bin/env python
"""Round-15 directive #3 probe: the `_changes` view's plan-build cost
as a function of table age.

Builds an N-append snapshot table (default 600 — the same age the
r13 sidecar probe used), then measures what the catalog's
`register_aux_views` pays on first reference after a DML:

- `read_changes(after_id=-1)` DataFrame CONSTRUCTION time (manifest
  walk + per-commit part plans + union);
- first-action time (count of the full feed — analysis + execution
  over the union);
- the same two numbers at N/4, N/2 and N so the growth curve is
  visible (flat vs linear is the pass/fail).

Usage: python tools/changes_probe.py [n_appends] [table_dir]
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
        else f"/tmp/bds_chprobe_p{os.getpid()}"
    )
    from big_data_spark.io.snapshot import append_snapshot, read_changes

    spark = get_spark(app_name="changes-probe", shuffle_partitions=4)
    quiet_logs(spark)
    shutil.rmtree(t, ignore_errors=True)

    checkpoints = sorted({n // 4, n // 2, n})
    t0 = time.perf_counter()
    done = 0
    for stop in checkpoints:
        while done < stop:
            append_snapshot(
                spark.range(done * 10, (done + 1) * 10).selectExpr(
                    "id", "id % 7 AS k"
                ),
                t,
            )
            done += 1
        built = time.perf_counter() - t0
        c0 = time.perf_counter()
        feed = read_changes(spark, t, after_id=-1)
        construct = time.perf_counter() - c0
        a0 = time.perf_counter()
        n_rows = feed.count()
        action = time.perf_counter() - a0
        print(
            f"appends={done:4d} build_table={built:7.1f}s "
            f"construct={construct:7.3f}s first_action={action:7.3f}s "
            f"rows={n_rows}",
            flush=True,
        )
    shutil.rmtree(t, ignore_errors=True)
    stop_spark(spark)


if __name__ == "__main__":
    main()
