"""Lineage truncation with configurable durability.

Several hot paths truncate lineage mid-query (LSH band tables,
posting lists, the pipeline's cluster logs) because multiple
consumers would otherwise recompute the whole upstream chain. HOW
that truncation happens is a durability/latency trade-off that
depends on where you run:

- ``local`` (default): ``localCheckpoint`` — blocks stored on
  executors only. Fastest, and exactly right on local[N] where
  "executor loss" cannot happen. On a real cluster, losing an
  executor (failure OR dynamic deallocation) after the checkpoint
  kills the query instead of recomputing lineage.
- ``persist``: ``persist(MEMORY_AND_DISK)`` — keeps lineage, so an
  executor loss recomputes the lost partitions instead of failing.
  The recommended cluster setting.
- ``reliable``: ``DataFrame.checkpoint`` into the session's
  checkpoint directory (HDFS/object store). Survives any executor
  loss without recompute; costs a full write. For very expensive
  upstreams on large clusters.
- ``none``: no truncation — pure lineage. Debugging aid.

Select per session via ``spark.conf.set(CHECKPOINT_MODE_KEY, ...)``;
unset means ``local``. PERF.md discusses the executor-loss semantics.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

CHECKPOINT_MODE_KEY = "spark.bigDataSpark.checkpointMode"

_MODES = ("local", "persist", "reliable", "none")


def truncate_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate (or durably cache) ``df`` per the session's configured
    checkpoint mode. ``eager=True`` materializes immediately (the
    callers that reuse a result many times want the work done once,
    now); lazy callers pay on first use."""
    mode = df.sparkSession.conf.get(CHECKPOINT_MODE_KEY, "local")
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "persist":
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            # Same contract as localCheckpoint(eager=True): one job to
            # materialize, so every consumer hits the cache.
            out.count()
        return out
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                f"{CHECKPOINT_MODE_KEY}=reliable needs "
                "sparkContext.setCheckpointDir(<hdfs/object-store path>)"
            )
        return df.checkpoint(eager=eager)
    if mode == "none":
        return df
    raise ValueError(f"{CHECKPOINT_MODE_KEY}={mode!r}: use one of {_MODES}")
