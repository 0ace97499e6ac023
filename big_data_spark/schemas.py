"""Explicit schemas for every table the engine touches.

The reference infers its log schema from JSON at the single entry
point (reference: Src/main.py:20) and builds `Row`s ad hoc; we pin
every schema (SURVEY.md §1.3) so scans are FAILFAST and Catalyst can
prune columns against a known shape.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The reference's sole external input shape (reference:
# Src/data.py:142-147; FIXTURES.md §1).
LOGS_SCHEMA = StructType(
    [
        StructField("state_from", StringType(), False),
        StructField("state_to", StringType(), False),
        StructField("action", StringType(), False),  # 'Request' | 'Response'
        StructField("time", LongType(), False),  # integer ticks, not epoch
        StructField("process_id", StringType(), False),
    ]
)

# Derived contract: one row per process (reference: Src/processes.py:38-44).
PROCESSES_SCHEMA = StructType(
    [
        StructField("process_id", StringType(), False),
        StructField("request_path", StringType(), False),
        StructField("euler_string", StringType(), False),
    ]
)

# Derived contract: one row per server with its connection set
# (reference: Src/servers.py:73-80).
SERVERS_SCHEMA = StructType(
    [
        StructField("server_name", StringType(), False),
        StructField("connections", ArrayType(StringType()), False),
    ]
)

# Multimodal asset table: opaque binary payload + typed metadata
# (extension beyond the reference; BASELINE.json north star).
ASSETS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # 'image'|'audio'|'video'
        StructField("payload", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

# Driver-supplied TPC-H-ish testdata schemas (TESTDATA.md), pinned so
# tests fail loudly if the generator shape drifts.
TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
