"""Count-Min sketch as a pure DataFrame composition — the frequency
twin of the HLL distinct sketch (operators/hll.py).

The sketch is a plain DataFrame of (key, depth, bucket, n): ``d``
independent hash rows of width ``w``, counts summed per bucket. That
representation is:

- **mergeable**: union + ``groupBy(sum)`` is exact sketch merge, so
  per-batch sketches roll up across days/streams without raw data;
- **persistable**: write it to parquet like any table;
- **cheap**: one map-side-combinable shuffle of (key, depth, bucket)
  triples — d rows per item, at most ``d*w`` rows per key retained.

Lookups take the MIN over the d rows — the classic one-sided
guarantee: estimates never undercount, and overcount by more than
``2N/w`` with probability at most ``(1/2)^d``. Hash rows are
``xxhash64(item, depth)`` — seeding by the depth literal gives d
distinct hash functions from one JVM-side primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_sketch(
    df: DataFrame,
    key_cols: list[str],
    item_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Sketch table (key..., depth, bucket, n) from one pass over the
    items. NULL items are ignored (they are not a value; counting
    them would diverge from count()-by-item semantics)."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 hash rows and w >= 2 buckets, got {d=} {w=}")
    df = df.where(F.col(item_col).isNotNull())
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("depth"),
                    F.pmod(F.xxhash64(F.col(item_col), F.lit(i)), F.lit(w))
                    .cast("int")
                    .alias("bucket"),
                )
                for i in range(d)
            ]
        )
    ).alias("dr")
    return (
        df.select(*key_cols, rows)
        .select(*key_cols, "dr.depth", "dr.bucket")
        .groupBy(*key_cols, "depth", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Exact merge: union + per-(key, depth, bucket) sum. Mergeable
    because counts are additive — sketch(union) == merge(sketches)."""
    if not sketches:
        raise ValueError("nothing to merge")
    out = sketches[0]
    for other in sketches[1:]:
        out = out.unionByName(other)
    keys = [c for c in out.columns if c not in ("depth", "bucket", "n")]
    return out.groupBy(*keys, "depth", "bucket").agg(F.sum("n").alias("n"))


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    key_cols: list[str],
    item_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Frequency estimate for each (key, item) row in ``items``:
    min over the d hash rows of that item's bucket count. Missing
    buckets mean a count of 0. ``d``/``w`` must match the sketch's.

    The probe joins on (key, depth, bucket) — the sketch side is at
    most ``d*w`` rows per key, so for a bounded key universe it
    broadcasts and the items table never shuffles."""
    probes = items.select(
        *key_cols,
        F.col(item_col).alias("_item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth"),
                        F.pmod(F.xxhash64(F.col(item_col), F.lit(i)), F.lit(w))
                        .cast("int")
                        .alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("dr"),
    ).select(*key_cols, "_item", "dr.depth", "dr.bucket")
    joined = probes.join(sketch, on=[*key_cols, "depth", "bucket"], how="left")
    return (
        joined.groupBy(*key_cols, "_item")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("approx_count"))
        .select(*key_cols, F.col("_item").alias(item_col), "approx_count")
    )
