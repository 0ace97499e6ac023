from big_data_spark.operators.ann import (
    ivf_build,
    ivf_cell_expr,
    ivf_probe_cells,
    ivf_search,
)
from big_data_spark.operators.bloom import (
    bloom_build,
    bloom_fpp,
    bloom_merge,
    bloom_might_contain,
)
from big_data_spark.operators.cdc import apply_changes, latest_changes, scd2_apply
from big_data_spark.operators.cms import cms_lookup, cms_merge, cms_sketch
from big_data_spark.operators.components import connected_components
from big_data_spark.operators.connections import server_connections
from big_data_spark.operators.dbscan import dbscan_from_edges
from big_data_spark.operators.incremental import (
    incremental_dedup,
    refresh_aggregate,
    seen_filter,
)
from big_data_spark.operators.merge import merge_into, touched_partitions
from big_data_spark.operators.histogram import (
    hist_error_bound,
    hist_merge,
    hist_quantile,
    hist_sketch,
)
from big_data_spark.operators.hll import (
    hll_error_bound,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from big_data_spark.operators.ids import dense_ids
from big_data_spark.operators.pagerank import pagerank
from big_data_spark.operators.skew import salted_join
from big_data_spark.operators.timeseries import asof_join, sessionize
from big_data_spark.operators.skewreport import skew_report

__all__ = [
    "merge_into",
    "refresh_aggregate",
    "touched_partitions",
    "apply_changes",
    "scd2_apply",
    "latest_changes",
    "server_connections",
    "connected_components",
    "dbscan_from_edges",
    "dense_ids",
    "salted_join",
    "asof_join",
    "sessionize",
    "ivf_build",
    "ivf_search",
    "ivf_cell_expr",
    "ivf_probe_cells",
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "hll_error_bound",
    "cms_sketch",
    "cms_merge",
    "cms_lookup",
    "bloom_build",
    "bloom_merge",
    "bloom_might_contain",
    "bloom_fpp",
    "seen_filter",
    "incremental_dedup",
    "pagerank",
    "skew_report",
    "hist_sketch",
    "hist_merge",
    "hist_quantile",
    "hist_error_bound",
]
