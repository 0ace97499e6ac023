"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus, where SQL-expressible, a
DuckDB oracle string over the same parquet tables.

This is the driver-contract backing store for ``__spark_entry__.py``
(queries()/oracle_sql()) and the per-operator correctness suite.
"""

from __future__ import annotations

from big_data_spark.queries import llm, multimodal, relational, streaming_q

QUERIES = {}
ORACLE_SQL = {}

for module in (relational, llm, multimodal, streaming_q):
    QUERIES.update(module.QUERIES)
    ORACLE_SQL.update(module.ORACLE_SQL)

__all__ = ["QUERIES", "ORACLE_SQL"]
