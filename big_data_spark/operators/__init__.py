from big_data_spark.operators.components import connected_components
from big_data_spark.operators.connections import server_connections
from big_data_spark.operators.dbscan import dbscan_from_edges

__all__ = ["server_connections", "connected_components", "dbscan_from_edges"]
