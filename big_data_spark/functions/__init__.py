from big_data_spark.functions.tree import (
    depth_to_servers,
    logs_with_depth,
    process_encodings,
    server_first_depths,
)

__all__ = [
    "process_encodings",
    "logs_with_depth",
    "server_first_depths",
    "depth_to_servers",
]
