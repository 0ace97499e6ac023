"""Sinks (SURVEY.md §2.1 S5-S6).

Reference writes grouped logs as JSON (Src/processes.py:258-260) and
reports as single-column text (Src/processes.py:303,404). We keep
both and add Parquet (the scale-path default: columnar, statistics,
predicate pushdown on re-read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_text(df: DataFrame, column: str, path: str, mode: str = "overwrite") -> None:
    df.select(column).write.mode(mode).text(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) parquet table.

    The 100 TB co-location tool: two tables bucketed on the same join
    key with the same bucket count join WITHOUT a shuffle on either
    side (verified in tests/test_operators.py — the plan has no
    Exchange under the join). Pre-bucket the big facts once, pay the
    shuffle at write time, and every subsequent join/aggregation on
    that key is exchange-free."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink (native Spark datasource — columnar with stripe-level
    min/max like parquet's row groups; the interchange format for
    Hive-era lakes). Same pushdown/pruning behavior on re-read."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
