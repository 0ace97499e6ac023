"""big_data_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference log-analytics pipeline
(microservice request/response trace analysis: process tree encoding,
server similarity clustering, distributed DBSCAN process grouping)
plus large-scale training-data-pipeline operators (dedup, ANN search,
text analysis, multimodal columns) — all DataFrame/Catalyst-first.

Design stance (SURVEY.md §7.1): no RDDs, no row-scalar Python UDFs in
hot paths; pandas/Arrow UDFs only where built-in operators genuinely
cannot express the semantics (local DBSCAN kernel, edit distance).
"""

from big_data_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
