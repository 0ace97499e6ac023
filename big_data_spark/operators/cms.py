"""Count-Min sketch as a pure DataFrame composition — the frequency
twin of the HLL distinct sketch (operators/hll.py).

The sketch is a plain DataFrame of (key, depth, bucket, n, d, w):
``d`` independent hash rows of width ``w``, counts summed per bucket,
with the sketch parameters riding along as literal columns so readers
can validate them. That representation is:

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

Parameter safety: a lookup or merge against a sketch built with
different (d, w) silently inverts the one-sided guarantee (mismatched
buckets miss, coalesce to 0, the min undercounts) — so ``cms_lookup``
asserts the probe's (d, w) against the sketch's embedded columns
JVM-side (``assert_true``: the query FAILS instead of undercounting),
and ``cms_merge`` groups by (d, w) so mixed-parameter input can never
silently sum into one sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RESERVED = ("depth", "bucket", "n", "d", "w")


def cms_sketch(
    df: DataFrame,
    key_cols: list[str],
    item_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Sketch table (key..., depth, bucket, n, d, w) from one pass
    over the items. NULL items are ignored (they are not a value;
    counting them would diverge from count()-by-item semantics).

    Key columns may not use the reserved names {depth, bucket, n, d,
    w} — merge/lookup address those by name."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 hash rows and w >= 2 buckets, got {d=} {w=}")
    clash = set(key_cols) & set(_RESERVED)
    if clash:
        raise ValueError(f"key columns {sorted(clash)} collide with reserved sketch columns")
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
        # Post-agg literals: parameter provenance costs nothing in the
        # shuffle and makes mismatched reads detectable.
        .withColumn("d", F.lit(d))
        .withColumn("w", F.lit(w))
    )


def cms_merge(*sketches: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Exact merge: union + per-(key, depth, bucket) sum. Mergeable
    because counts are additive — sketch(union) == merge(sketches).

    ``key_cols`` names the key columns explicitly; when omitted they
    are inferred as every column outside the reserved sketch set
    (fine unless a key legitimately uses a reserved name — pass
    key_cols in that case). The (d, w) parameter columns stay in the
    grouping, so sketches built with different parameters never sum
    together — they surface as separate (d, w) rows for cms_lookup's
    assertion to catch."""
    if not sketches:
        raise ValueError("nothing to merge")
    out = sketches[0]
    for other in sketches[1:]:
        out = out.unionByName(other)
    if key_cols is None:
        key_cols = [c for c in out.columns if c not in _RESERVED]
    params = [c for c in ("d", "w") if c in out.columns]
    merged = out.groupBy(*key_cols, *params, "depth", "bucket").agg(
        F.sum("n").alias("n")
    )
    # Same column layout as cms_sketch, so merge(sketches) is row-
    # for-row comparable with sketch(union).
    return merged.select(*key_cols, "depth", "bucket", "n", *params)


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
    buckets mean a count of 0; NULL items are dropped (mirroring
    cms_sketch — a NULL was never counted, so probing it would
    return a spurious positive for the seed-derived buckets).

    ``d``/``w`` must match the sketch's; when the sketch carries its
    (d, w) columns (cms_sketch always emits them) the match is
    ASSERTED JVM-side and the query fails loudly on mismatch instead
    of silently undercounting to 0.

    The probe joins on (key, depth, bucket) — the sketch side is at
    most ``d*w`` rows per key, so for a bounded key universe it
    broadcasts and the items table never shuffles."""
    probes = (
        items.where(F.col(item_col).isNotNull())
        .select(
            *key_cols,
            F.col(item_col).alias("_item"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("depth"),
                            F.pmod(
                                F.xxhash64(F.col(item_col), F.lit(i)), F.lit(w)
                            )
                            .cast("int")
                            .alias("bucket"),
                        )
                        for i in range(d)
                    ]
                )
            ).alias("dr"),
        )
        .select(*key_cols, "_item", "dr.depth", "dr.bucket")
    )
    if "d" in sketch.columns and "w" in sketch.columns:
        # Validate on the SKETCH side, pre-join: a wrong w changes the
        # probe's bucketing so mismatched rows mostly MISS the join —
        # checking joined rows would let the error through. The assert
        # is folded INTO the n column (assert_true yields NULL on
        # success) so column pruning can never optimize it away; every
        # sketch row is asserted as the join scans it.
        check = F.assert_true(
            (F.col("d") == F.lit(d)) & (F.col("w") == F.lit(w)),
            F.format_string(
                "cms_lookup(d=%s, w=%s) probed a sketch built with "
                "(d=%s, w=%s) — estimates would undercount",
                F.lit(str(d)),
                F.lit(str(w)),
                F.col("d").cast("string"),
                F.col("w").cast("string"),
            ),
        )
        sketch = sketch.select(
            *key_cols,
            "depth",
            "bucket",
            F.when(check.isNull(), F.col("n")).alias("n"),
        )
    joined = probes.join(sketch, on=[*key_cols, "depth", "bucket"], how="left")
    return (
        joined.groupBy(*key_cols, "_item")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("approx_count"))
        .select(*key_cols, F.col("_item").alias(item_col), "approx_count")
    )
