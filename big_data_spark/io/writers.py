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
