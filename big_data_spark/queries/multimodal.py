"""Multimodal-column queries with DuckDB oracles.

The media path runs over binary content derived from ``documents``
(UTF-8 encode — the corpus is ASCII, so byte offsets == char offsets
and the VARCHAR-based oracle mirrors the blob math exactly). The
Spark side goes through the real binary plumbing in
``big_data_spark.multimodal`` (mapInPandas over Arrow batches); the
oracle recomputes the same arithmetic in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_spark.io.readers import read_table
from big_data_spark.multimodal import attach_media, media_stats, sample_frames
from big_data_spark.session import ensure_executor_package

FRAME_BYTES = 64
FRAME_STRIDE = 4


def q_media_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source rollup of binary payload stats: the mapInPandas
    checksum/length kernel feeding a plain columnar aggregate (the
    ingest-audit pass of a media lake)."""
    ensure_executor_package(spark)
    media = attach_media(read_table(spark, sf_dir, "documents"))
    stats = media_stats(media)
    return (
        stats.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("checksum").alias("n_distinct_payloads"),
        )
        .orderBy("source")
    )


ORACLE_MEDIA_BYTE_STATS = """
SELECT source, COUNT(*) AS n_items,
       -- CAST: DuckDB SUM(BIGINT) yields HUGEINT; Spark yields BIGINT
       CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT md5(text)) AS n_distinct_payloads
FROM documents GROUP BY source ORDER BY source
"""


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling over binary payloads (video-style):
    64-byte frames, every 4th kept, md5 fingerprint each. The kernel
    explodes one item into many frames inside mapInPandas."""
    ensure_executor_package(spark)
    media = attach_media(read_table(spark, sf_dir, "documents"))
    return sample_frames(
        media, frame_bytes=FRAME_BYTES, stride=FRAME_STRIDE
    ).orderBy("doc_id", "frame_idx")


ORACLE_MEDIA_FRAME_SAMPLE = f"""
SELECT doc_id, CAST(i AS INT) AS frame_idx,
       md5(substr(text, CAST(i AS INT) * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
FROM documents,
     unnest(list_filter(
       generate_series(0, CAST(floor(length(text) / {FRAME_BYTES}) AS INT) - 1),
       i -> i % {FRAME_STRIDE} = 0
     )) AS t(i)
ORDER BY doc_id, frame_idx
"""


QUERIES = {
    "media_byte_stats": q_media_byte_stats,
    "media_frame_sample": q_media_frame_sample,
}

ORACLE_SQL = {
    "media_byte_stats": ORACLE_MEDIA_BYTE_STATS,
    "media_frame_sample": ORACLE_MEDIA_FRAME_SAMPLE,
}
