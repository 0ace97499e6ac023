"""Small-file compaction — the table-maintenance pass a 100 TB lake
runs constantly.

Streaming sinks, frequent micro-batch appends and over-parallel
writers all leave parquet directories with thousands of KB-sized
files; every subsequent scan then pays one task + one footer read +
one object-store GET per file, and the NameNode/manifest holds one
entry each. Compaction rewrites a directory to files near a target
size in ONE distributed job:

- file inventory via Hadoop's FileSystem API (works on local paths
  here and on HDFS/object stores unchanged — the same listing the
  scan planner uses);
- target partition count = ceil(total_bytes / target_file_bytes),
  scaled by an output/input size ratio (parquet re-encoding usually
  shrinks small files: bigger row groups, better dictionary reuse);
- ``coalesce`` when merely merging (narrow, NO shuffle — each output
  task concatenates a set of input splits), ``repartition`` only
  when asked to re-cluster by columns (one shuffle, buys
  partition-pruned or co-located downstream reads);
- optional ``sortWithinPartitions`` so min/max column statistics
  stay tight and downstream predicate pushdown keeps skipping row
  groups.

Writes go to a NEW directory: object stores have no atomic in-place
rewrite, so the swap (rename / manifest flip) stays with the caller
— the engine never deletes source data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def parquet_inventory(spark: SparkSession, path: str) -> dict:
    """File inventory of a parquet directory: n_files, total_bytes,
    and how many files sit under 1/4 of a healthy 128 MB target —
    the 'is this table fragmented?' probe."""
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n_files = 0
    total = 0
    small = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden metadata
        n_files += 1
        size = st.getLen()
        total += size
        if size < (128 << 20) // 4:
            small += 1
    return {"n_files": n_files, "total_bytes": total, "n_small_files": small}


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
    cluster_by: list[str] | None = None,
    sort_within: list[str] | None = None,
    size_ratio: float = 1.0,
) -> dict:
    """Rewrite the parquet directory at ``src`` into ``dst`` with
    files near ``target_file_bytes``.

    Without ``cluster_by`` the plan is scan -> coalesce(n) -> write:
    narrow, shuffle-free — each output task concatenates input
    splits, so compacting a 100 TB table moves every byte exactly
    once with no exchange. With ``cluster_by`` the rewrite
    repartitions on those columns (one shuffle) so equal keys land
    in the same files — that is a layout INVESTMENT: downstream
    joins/aggregations on the key read co-located data, and min/max
    stats prune hard. ``sort_within`` additionally orders rows inside
    each output file for tight row-group statistics.

    ``size_ratio`` estimates output/input bytes (re-encoded parquet
    from tiny files usually lands below 1.0); the returned dict
    reports the decision so callers can log it.
    """
    if target_file_bytes < 1 << 20:
        raise ValueError(f"target_file_bytes must be >= 1 MiB, got {target_file_bytes}")
    inv = parquet_inventory(spark, src)
    if inv["n_files"] == 0:
        raise ValueError(f"no parquet data files under {src!r}")
    n_out = max(1, math.ceil(inv["total_bytes"] * size_ratio / target_file_bytes))
    df: DataFrame = spark.read.parquet(src)
    if cluster_by:
        out = df.repartition(n_out, *cluster_by)
    else:
        out = df.coalesce(n_out)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode("error").parquet(dst)
    return {**inv, "n_output_files": n_out, "clustered": bool(cluster_by)}
