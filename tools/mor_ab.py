"""Merge-on-read vs copy-on-write DELETE A/B — the round-8 verdict
asked for the O(matches) MOR claim to be MEASURED, not asserted.

Same table shape as the round-7 COW write-amp A/B (PERF.md): a
16-generation lineitem table at $SPARK_GRAFT_SF_DIR (default sf0.1),
predicate hitting ONE generation. Reports, paired in one session:

- write cost (bytes + files created) of `delete_where(mode="mor")`
  (the position vector) vs `mode="cow"` (the rewritten generation);
- read-side overhead of the masked table (full-scan count wall with
  the anti-join in the plan vs the pre-delete scan);
- `fold_deletes` cost (wall + bytes) to materialize the vector away,
  and the post-fold read wall (the overhead is gone).

Run: python tools/mor_ab.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tree_bytes(pat: str) -> tuple[int, int]:
    files = [p for p in glob.glob(pat, recursive=True) if os.path.isfile(p)]
    return sum(os.path.getsize(p) for p in files), len(files)


def main() -> None:
    from pyspark.sql import functions as F

    from big_data_spark import get_spark
    from big_data_spark.io.snapshot import (
        append_snapshot,
        delete_where,
        fold_deletes,
        read_snapshot,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="mor_ab", shuffle_partitions=32)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    pred = "l_orderkey % 16 = 3 AND l_quantity < 10"

    def build(tag: str) -> str:
        t = os.path.join(tempfile.gettempdir(), f"morab_{tag}")
        shutil.rmtree(t, ignore_errors=True)
        for g in range(16):
            append_snapshot(
                li.filter(F.col("l_orderkey") % 16 == g).coalesce(1),
                t,
                snapshot_id=g,
            )
        return t

    def timed_count(t: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        n = read_snapshot(spark, t).count()
        return time.perf_counter() - t0, n

    results: dict[str, object] = {}
    for mode in ("cow", "mor"):
        t = build(mode)
        pre_wall, pre_n = timed_count(t)
        data_before, files_before = _tree_bytes(f"{t}/_data/**/*")
        t0 = time.perf_counter()
        st = delete_where(spark, t, pred, mode=mode)
        wall = time.perf_counter() - t0
        data_after, files_after = _tree_bytes(f"{t}/_data/**/*")
        dv_bytes, dv_files = _tree_bytes(f"{t}/_deletes/**/*")
        post_wall, post_n = timed_count(t)
        row = {
            "deleted": st["deleted_rows"],
            "delete_wall_s": round(wall, 2),
            "data_bytes_written": data_after - data_before,
            "vector_bytes_written": dv_bytes,
            "files_written": (files_after - files_before) + dv_files,
            "scan_wall_pre_s": round(pre_wall, 2),
            "scan_wall_post_s": round(post_wall, 2),
            "rows_pre": pre_n,
            "rows_post": post_n,
        }
        if mode == "mor":
            t0 = time.perf_counter()
            fst = fold_deletes(spark, t)
            row["fold_wall_s"] = round(time.perf_counter() - t0, 2)
            fold_bytes, _ = _tree_bytes(
                f"{t}/_data/s={fst['snapshot_id']}/**/*"
            )
            row["fold_bytes_written"] = fold_bytes
            folded_wall, folded_n = timed_count(t)
            row["scan_wall_folded_s"] = round(folded_wall, 2)
            assert folded_n == post_n
        results[mode] = row
        shutil.rmtree(t, ignore_errors=True)
    assert results["cow"]["rows_post"] == results["mor"]["rows_post"]
    for mode, row in results.items():
        print(mode, row)
    cw = results["cow"]["data_bytes_written"]
    mw = results["mor"]["vector_bytes_written"]
    print(
        f"write-amp: COW wrote {cw/1024:.0f} KiB, "
        f"MOR vector {mw/1024:.0f} KiB -> {cw/max(mw,1):.1f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
