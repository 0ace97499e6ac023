"""Parquet footer statistics, read distributed — the data-skipping
audit tool.

Whether a layout investment (Z-order, sort_within, bucketing)
actually bought prunable files is a question about ROW-GROUP MIN/MAX
STATISTICS, and reading the data back to check defeats the point. So
this reads only footers: the file list comes from the same Hadoop FS
inventory compaction uses, and the footers are opened with pyarrow
ON EXECUTORS via mapInPandas — a driver loop over a million-file
table would serialize a million object-store round trips; here they
fan out across the cluster.

min/max land as strings (one schema fits every column type; callers
cast). The per-row-group grain is deliberate: a scan prunes row
groups, not just files, so that is the grain pruning math needs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATS_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("row_group", IntegerType()),
        StructField("column", StringType()),
        StructField("n_rows", LongType()),
        StructField("n_nulls", LongType()),
        StructField("min_value", StringType()),
        StructField("max_value", StringType()),
    ]
)


def _physical_name(
    logical: str, rename_log: list | None, gen_id: int | None
) -> str | None:
    """The physical column name ``logical`` had when a file of
    generation ``gen_id`` was written, walking the snapshot-table
    evolution event log BACKWARD through the events committed after
    that generation (rename events map new->old; hitting a 'drop' of
    the walked name means the column was re-added later, so it does
    not exist in this file at all -> None). Values are untouched by
    renames, so the old physical column's footer stats remain valid
    for the logical column."""
    name = logical
    for ev in reversed(rename_log or []):
        cid, kind, old, new = ev[0], ev[1], ev[2], ev[3]
        if gen_id is not None and cid <= gen_id:
            break  # log is commit-ordered; earlier events don't apply
        if kind == "rename" and new == name:
            name = old
        elif kind == "drop" and old == name:
            return None
    return name


def _file_gen_id(path: str) -> int | None:
    """Snapshot-generation id of a data file — delegates to the ONE
    parser of the ``_data/s=<id>`` layout (io/snapshot.py), so the
    evolution replay and the footer-sweep name resolution can never
    key generations differently. Function-level import: snapshot
    imports this module lazily, and the kernel closure must stay
    import-light for executors."""
    from big_data_spark.io.snapshot import _gen_id_of

    return _gen_id_of(path)


def parquet_column_stats(
    spark: SparkSession,
    path: str | list[str],
    columns: list[str],
    rename_log: list | None = None,
    missing_ok: bool = False,
) -> DataFrame:
    """(file, row_group, column, n_rows, n_nulls, min, max) for every
    row group of every data file under ``path`` (one directory, or a
    list of directories/files — the multi-generation snapshot case) —
    footers only, no data pages read.

    ``rename_log`` (a snapshot table's evolution event log) resolves
    each requested LOGICAL column to the physical name it carries in
    each file (keyed on the file's ``_data/s=<id>`` generation id);
    the output ``column`` stays the logical name. ``missing_ok=True``
    emits a no-stats row (null min/max -> unprunable downstream)
    instead of raising when a file lacks the column — the snapshot
    DML / predicate path, where pre-evolution files legitimately miss
    later-added columns."""
    jvm = spark._jvm
    files: list[str] = []
    for p in [path] if isinstance(path, str) else path:
        hpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        it = fs.listFiles(hpath, True)
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if name.startswith("_") or name.startswith("."):
                continue
            files.append(st.getPath().toString())
    if not files:
        raise ValueError(f"no parquet data files under {path!r}")
    paths = spark.createDataFrame([(f,) for f in files], "file string")
    cols = list(columns)

    log = [list(ev) for ev in rename_log or []]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        import pyarrow.parquet as pq

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in _STATS_SCHEMA.names}
            for f in pdf["file"]:
                # Hadoop returns file:/x or file:///x for local paths.
                local = re.sub(r"^file:(//)?", "", f)
                gen_id = _file_gen_id(f)
                meta = pq.ParquetFile(local).metadata
                name_to_idx = {
                    meta.schema.column(i).name: i
                    for i in range(meta.num_columns)
                }
                phys = {
                    c: _physical_name(c, log, gen_id) if log else c
                    for c in cols
                }
                for rg in range(meta.num_row_groups):
                    group = meta.row_group(rg)
                    for c in cols:
                        p = phys[c]
                        if p is None or p not in name_to_idx:
                            if not missing_ok:
                                raise ValueError(
                                    f"{local}: column {c!r} not in "
                                    "file schema"
                                )
                            # no-stats row: the column is absent from
                            # this (pre-evolution) file — unprunable,
                            # never a false drop.
                            out["file"].append(f)
                            out["row_group"].append(rg)
                            out["column"].append(c)
                            out["n_rows"].append(group.num_rows)
                            out["n_nulls"].append(None)
                            out["min_value"].append(None)
                            out["max_value"].append(None)
                            continue
                        col = group.column(name_to_idx[p])
                        stats = col.statistics
                        try:
                            # pyarrow raises ArrowNotImplementedError
                            # extracting min/max for some physical
                            # types (fixed-len-byte-array decimals) —
                            # emit a no-stats row (unprunable), never
                            # a job failure.
                            mn = (
                                str(stats.min)
                                if stats is not None and stats.has_min_max
                                else None
                            )
                            mx = (
                                str(stats.max)
                                if stats is not None and stats.has_min_max
                                else None
                            )
                        except Exception:
                            mn = mx = None
                        out["file"].append(f)
                        out["row_group"].append(rg)
                        out["column"].append(c)
                        out["n_rows"].append(group.num_rows)
                        out["n_nulls"].append(
                            stats.null_count if stats is not None else None
                        )
                        out["min_value"].append(mn)
                        out["max_value"].append(mx)
            yield pd.DataFrame(
                {
                    "file": pd.Series(out["file"], dtype="object"),
                    "row_group": pd.Series(out["row_group"], dtype="int32"),
                    "column": pd.Series(out["column"], dtype="object"),
                    "n_rows": pd.Series(out["n_rows"], dtype="int64"),
                    "n_nulls": pd.Series(out["n_nulls"], dtype="Int64"),
                    "min_value": pd.Series(out["min_value"], dtype="object"),
                    "max_value": pd.Series(out["max_value"], dtype="object"),
                }
            )

    return paths.repartition(min(len(files), 64)).mapInPandas(
        kernel, _STATS_SCHEMA
    )


def range_predicate(
    ranges: dict[str, tuple[float | None, float | None]],
):
    """The residual Column for a pruning range conjunction — shared
    by read_pruned and the snapshot reader so file-level skipping and
    the row-level filter can never disagree."""
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            cond = cond & (F.col(c) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(c) <= F.lit(hi))
    return cond


def prune_files_multi(
    spark: SparkSession,
    path: str | list[str],
    ranges: dict[str, tuple[float | None, float | None]],
    rename_log: list | None = None,
    missing_ok: bool = False,
) -> DataFrame:
    """Metadata-only data skipping over a CONJUNCTION of numeric
    range predicates ``lo_c <= c <= hi_c`` — the case Z-order layouts
    exist for: one clustered rewrite makes min/max narrow on SEVERAL
    columns at once, and a file is droppable when ANY predicate
    provably misses it (the AND semantics let each column veto
    independently).

    Returns one row per (file, column) with that column's folded
    [min, max] plus the file-level ``keep`` — false iff some column's
    interval provably misses its range. Losslessness per column
    implies losslessness of the conjunction, proven in
    tests/test_stats.py. A row group without stats for a column makes
    that column unprunable for the file (never a false drop).
    """
    if not ranges or all(
        lo is None and hi is None for lo, hi in ranges.values()
    ):
        raise ValueError("prune_files needs at least one bounded range")
    cols = list(ranges)
    stats = parquet_column_stats(
        spark, path, cols, rename_log=rename_log, missing_ok=missing_ok
    )
    per_file_col = (
        stats.withColumn("mn", F.col("min_value").cast("double"))
        .withColumn("mx", F.col("max_value").cast("double"))
        .groupBy("file", "column")
        .agg(
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
            # a row group without stats makes the column unprunable
            F.max(F.col("mn").isNull().cast("int")).alias("_nostats"),
        )
    )
    col_ok = F.col("_nostats") == 1
    for c in cols:
        lo, hi = ranges[c]
        ok = F.lit(True)
        if hi is not None:
            ok = ok & (F.col("min_value") <= F.lit(float(hi)))
        if lo is not None:
            ok = ok & (F.col("max_value") >= F.lit(float(lo)))
        col_ok = F.when(F.col("column") == c, col_ok | ok).otherwise(col_ok)
    flagged = per_file_col.withColumn("_col_keep", col_ok)
    keep_per_file = flagged.groupBy("file").agg(
        F.min(F.col("_col_keep").cast("int")).cast("boolean").alias("keep")
    )
    return (
        flagged.drop("_nostats", "_col_keep")
        .join(keep_per_file, "file")
        .orderBy("file", "column")
    )


def prune_files(
    spark: SparkSession,
    path: str,
    column: str,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Metadata-only data skipping: the files under ``path`` a
    numeric range predicate ``lo <= column <= hi`` could possibly
    touch, decided from parquet FOOTER min/max alone — the manifest
    pruning an Iceberg/Delta reader does, as an explicit operator.

    Returns (file, min_value, max_value, keep): ``keep`` is false iff
    the file's [min, max] interval provably misses the predicate
    range — reading only kept files is guaranteed lossless (rows
    matching the predicate can only live in kept files; proven in
    tests/test_stats.py against the full-scan answer). Feed the kept
    list to ``spark.read.parquet(*files)``. Pair with the z-order /
    repartitionByRange writers (io/compact.py) — pruning is only as
    good as the layout's min/max narrowness. Conjunctions over
    several clustered columns: ``prune_files_multi``.
    """
    return prune_files_multi(spark, path, {column: (lo, hi)}).select(
        "file", "min_value", "max_value", "keep"
    )
