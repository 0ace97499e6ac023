"""Streaming dedup ingest: the lake holds each key once, replays are
idempotent, and cross-batch duplicates are dropped."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_spark.io.readers import read_table
from big_data_spark.streaming.ingest import read_lake, run_dedup_ingest
from tests.conftest import SF_SMOKE


def _event_files(spark, tmp_path, dup_factor: int = 1):
    """events split into 4 files (4 micro-batches at
    maxFilesPerTrigger=1); dup_factor > 1 unions the data with itself
    so cross-batch duplicates are guaranteed."""
    ev = read_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    src = ev
    for _ in range(dup_factor - 1):
        src = src.unionByName(ev)
    path = str(tmp_path / "stream_src")
    src.repartition(4).write.parquet(path)
    return path, ev


def _stream(spark, path):
    schema = "event_id bigint, user_id bigint, event_type string, value double"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_ingest_dedups_across_batches(spark, tmp_path):
    src, ev = _event_files(spark, tmp_path, dup_factor=3)
    lake = str(tmp_path / "lake")
    run_dedup_ingest(
        _stream(spark, src),
        "event_id",
        lake,
        str(tmp_path / "ckpt"),
        m=1 << 16,
        k=4,
    )
    got = read_lake(spark, lake)
    # Every event admitted exactly once despite 3x duplication
    # scattered over 4 micro-batches.
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ev.collect()))


def test_ingest_replay_is_idempotent(spark, tmp_path):
    src, ev = _event_files(spark, tmp_path)
    lake = str(tmp_path / "lake")
    run_dedup_ingest(
        _stream(spark, src), "event_id", lake, str(tmp_path / "ckpt1")
    )
    n1 = read_lake(spark, lake).count()
    assert n1 == ev.count()
    # Fresh checkpoint = full redelivery of every file: the second
    # pass must admit nothing new and destroy nothing.
    run_dedup_ingest(
        _stream(spark, src), "event_id", lake, str(tmp_path / "ckpt2")
    )
    got = read_lake(spark, lake)
    assert got.count() == n1
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ev.collect()))


def test_ingest_survives_missing_filter_dir(spark, tmp_path):
    # Crash window: data written, filter write lost. The next run
    # must stay exact (anti-join fallback), not duplicate.
    import shutil

    src, ev = _event_files(spark, tmp_path)
    lake = str(tmp_path / "lake")
    run_dedup_ingest(
        _stream(spark, src), "event_id", lake, str(tmp_path / "ckpt1")
    )
    shutil.rmtree(f"{lake}/bloom")
    run_dedup_ingest(
        _stream(spark, src), "event_id", lake, str(tmp_path / "ckpt2")
    )
    got = read_lake(spark, lake)
    assert got.count() == ev.count()
    # And the filter side was rebuilt for subsequent fast-path runs.
    assert spark.read.parquet(f"{lake}/bloom").count() > 0


def test_lake_bloom_matches_lake_keys(spark, tmp_path):
    # Merge-on-read of the per-batch filters must claim every lake
    # key (no false negatives end to end).
    from big_data_spark.operators.bloom import bloom_merge, bloom_might_contain

    src, ev = _event_files(spark, tmp_path)
    lake = str(tmp_path / "lake")
    run_dedup_ingest(
        _stream(spark, src), "event_id", lake, str(tmp_path / "ckpt")
    )
    blm = bloom_merge(
        spark.read.parquet(f"{lake}/bloom").drop("_batch_id"), key_cols=[]
    )
    keys = read_lake(spark, lake).select("event_id")
    verdicts = bloom_might_contain(blm, keys, [], "event_id", m=1 << 20, k=4)
    assert verdicts.filter(~F.col("might_contain")).count() == 0
