"""Deterministic training-shard export (io/shards.py)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from big_data_spark.io.shards import shard_assignments, write_training_shards


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_shards_are_balanced_and_deterministic(spark, tmp_path):
    df = _docs(spark)
    a = {
        (r["doc_id"], r["shard"])
        for r in shard_assignments(df, "doc_id", 8).collect()
    }
    b = {
        (r["doc_id"], r["shard"])
        for r in shard_assignments(
            df.repartition(13), "doc_id", 8
        ).collect()
    }
    assert a == b, "assignment must not depend on input partitioning"
    sizes = {}
    for _, s in a:
        sizes[s] = sizes.get(s, 0) + 1
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_shards_scatter_adjacent_rows(spark):
    """md5 pseudo-shuffle: consecutive doc_ids spread across shards
    (a contiguous block must not land in one shard)."""
    got = dict(
        (r["doc_id"], r["shard"])
        for r in shard_assignments(_docs(spark, 64), "doc_id", 8).collect()
    )
    first_16 = {got[i] for i in range(16)}
    assert len(first_16) >= 5


def test_write_training_shards_layout_and_bookkeeping(spark, tmp_path):
    out = str(tmp_path / "shards")
    stats = write_training_shards(_docs(spark), out, "doc_id", 8)
    assert stats["n_rows"] == 500 and stats["n_shards"] == 8
    assert stats["max_skew"] <= 1
    assert len(glob.glob(f"{out}/shard=*")) == 8
    # One data file per shard.
    for d in glob.glob(f"{out}/shard=*"):
        assert len(glob.glob(f"{d}/*.parquet")) == 1
    back = spark.read.parquet(out)
    assert back.count() == 500
    assert back.select("doc_id").distinct().count() == 500


def test_shard_validation(spark):
    with pytest.raises(ValueError, match="n_shards"):
        shard_assignments(_docs(spark, 10), "doc_id", 0)
