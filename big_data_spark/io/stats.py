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


def parquet_column_stats(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """(file, row_group, column, n_rows, n_nulls, min, max) for every
    row group of every data file under ``path`` — footers only, no
    data pages read."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    files: list[str] = []
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

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        import pyarrow.parquet as pq

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in _STATS_SCHEMA.names}
            for f in pdf["file"]:
                # Hadoop returns file:/x or file:///x for local paths.
                local = re.sub(r"^file:(//)?", "", f)
                meta = pq.ParquetFile(local).metadata
                name_to_idx = {
                    meta.schema.column(i).name: i
                    for i in range(meta.num_columns)
                }
                for rg in range(meta.num_row_groups):
                    group = meta.row_group(rg)
                    for c in cols:
                        if c not in name_to_idx:
                            raise ValueError(
                                f"{local}: column {c!r} not in file schema"
                            )
                        col = group.column(name_to_idx[c])
                        stats = col.statistics
                        out["file"].append(f)
                        out["row_group"].append(rg)
                        out["column"].append(c)
                        out["n_rows"].append(group.num_rows)
                        out["n_nulls"].append(
                            stats.null_count if stats is not None else None
                        )
                        out["min_value"].append(
                            str(stats.min)
                            if stats is not None and stats.has_min_max
                            else None
                        )
                        out["max_value"].append(
                            str(stats.max)
                            if stats is not None and stats.has_min_max
                            else None
                        )
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
    good as the layout's min/max narrowness.
    """
    if lo is None and hi is None:
        raise ValueError("prune_files needs lo and/or hi")
    stats = parquet_column_stats(spark, path, [column])
    per_file = (
        stats.withColumn("mn", F.col("min_value").cast("double"))
        .withColumn("mx", F.col("max_value").cast("double"))
        .groupBy("file")
        .agg(
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
            # a row group without stats makes the file unprunable
            F.max(F.col("mn").isNull().cast("int")).alias("_nostats"),
        )
    )
    keep = F.col("_nostats") == 1
    cond = F.lit(True)
    if hi is not None:
        cond = cond & (F.col("min_value") <= F.lit(float(hi)))
    if lo is not None:
        cond = cond & (F.col("max_value") >= F.lit(float(lo)))
    return per_file.select(
        "file",
        "min_value",
        "max_value",
        (keep | cond).alias("keep"),
    ).orderBy("file")
