from big_data_spark.io.compact import compact_parquet, parquet_inventory
from big_data_spark.io.stats import parquet_column_stats
from big_data_spark.io.readers import read_logs_json, read_table, read_tables
from big_data_spark.io.writers import write_json, write_parquet, write_text

__all__ = [
    "read_logs_json",
    "read_table",
    "read_tables",
    "write_json",
    "write_parquet",
    "write_text",
    "compact_parquet",
    "parquet_inventory",
    "parquet_column_stats",
]
