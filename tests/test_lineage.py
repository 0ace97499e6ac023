"""The checkpoint-durability knob (big_data_spark.lineage): every mode
returns the same rows; misconfiguration fails loudly, never silently.
PERF.md documents the executor-loss semantics behind the modes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_spark.lineage import CHECKPOINT_MODE_KEY, truncate_lineage


@pytest.fixture
def df(spark):
    return spark.range(100).withColumn("x", F.col("id") * 2)


def _with_mode(spark, mode):
    spark.conf.set(CHECKPOINT_MODE_KEY, mode)


def test_modes_preserve_results(spark, df, tmp_path):
    base = sorted(map(tuple, df.collect()))
    try:
        for mode in ("local", "persist", "none"):
            _with_mode(spark, mode)
            for eager in (False, True):
                out = truncate_lineage(df, eager=eager)
                assert sorted(map(tuple, out.collect())) == base, (mode, eager)
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        _with_mode(spark, "reliable")
        out = truncate_lineage(df, eager=True)
        assert sorted(map(tuple, out.collect())) == base
    finally:
        spark.conf.unset(CHECKPOINT_MODE_KEY)


def test_unknown_mode_raises(spark, df):
    try:
        _with_mode(spark, "yolo")
        with pytest.raises(ValueError, match="checkpointMode"):
            truncate_lineage(df)
    finally:
        spark.conf.unset(CHECKPOINT_MODE_KEY)


def test_default_is_local_checkpoint(spark, df):
    # Unset conf -> localCheckpoint: the result is checkpointed (plan
    # truncated to an RDD scan), proving the default path engaged.
    out = truncate_lineage(df, eager=True)
    assert "Scan ExistingRDD" in out._jdf.queryExecution().executedPlan().toString()
