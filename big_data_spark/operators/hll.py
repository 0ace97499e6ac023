"""HyperLogLog distinct-count sketch as a pure DataFrame composition.

Spark's ``approx_count_distinct`` gives a number but not the sketch:
you cannot persist it, merge two runs' sketches, or union streams of
them. This operator materializes the HLL REGISTER TABLE as a plain
DataFrame — (key, bucket, rho) with at most ``2**p`` rows per key —
which makes the sketch:

- **mergeable**: union register tables + ``groupBy(max)`` is exact
  register merge, so daily sketches roll up to monthly without
  touching raw data (the property that matters at 100 TB);
- **persistable**: it's just a table — write it to parquet;
- **cheap**: one shuffle of (key, bucket) pairs, map-side combinable
  (``max`` is associative), registers per key are tiny (2^p rows).

Everything is JVM expressions: xxhash64 for the 64-bit hash, ``bin()``
string length for the leading-zero rank (exact integer arithmetic —
no float log2 whose edge cases at exact powers of two would corrupt
ranks). Estimator is standard HLL with the linear-counting
small-range correction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame, key_cols: list[str], item_col: str, p: int = 12
) -> DataFrame:
    """Register table: per key, bucket j in [0, 2^p) with the max
    leading-zero rank rho of items hashing into j. Missing buckets
    (no item hashed there) are simply absent — readers treat absent
    as register value 0.
    """
    if not 4 <= p <= 18:
        raise ValueError(f"p={p} out of the sane HLL range [4, 18]")
    m = 1 << p
    # NULL items must not count: xxhash64(NULL) returns the seed
    # constant, which would register one phantom distinct value per
    # key — countDistinct/approx_count_distinct both ignore NULLs.
    df = df.where(F.col(item_col).isNotNull())
    h = F.xxhash64(F.col(item_col))
    # Bucket = low p bits (non-negative by construction); the rank
    # field uses the remaining 64-p bits as an unsigned value.
    bucket = F.pmod(h, F.lit(m)).cast("int")
    rest = F.shiftrightunsigned(h, p)
    # rho = leading zeros of `rest` within (64-p) bits, + 1.
    # bin(rest) has no leading zeros, so its length IS the bit width
    # of rest; rest == 0 means all (64-p) bits are zero.
    width = F.length(F.bin(rest))
    rho = F.when(rest == 0, F.lit(64 - p + 1)).otherwise(
        F.lit(64 - p) - width + 1
    )
    return (
        df.select(*key_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*key_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
        # Parameter provenance (post-agg literal): a register table
        # read back with the wrong p silently mis-estimates; carrying
        # p lets hll_estimate assert it.
        .withColumn("p", F.lit(p))
    )


_RESERVED = ("bucket", "rho", "p")


def hll_merge(
    *register_tables: DataFrame, key_cols: list[str] | None = None
) -> DataFrame:
    """Exact merge of register tables (same key schema, same p):
    union + per-bucket max. Sketch(merge) == merge(sketches), so
    partial sketches compose associatively across batches/streams.

    ``key_cols`` names the key columns explicitly; when omitted they
    are inferred as every column outside the reserved sketch set
    (fine unless a key legitimately uses a reserved name — pass
    key_cols in that case). The p column stays in the grouping, so
    tables built with different precisions never max-merge together —
    they surface as separate p rows for hll_estimate's assertion."""
    if not register_tables:
        raise ValueError("nothing to merge")
    out = register_tables[0]
    for other in register_tables[1:]:
        out = out.unionByName(other)
    if key_cols is None:
        key_cols = [c for c in out.columns if c not in _RESERVED]
    params = ["p"] if "p" in out.columns else []
    merged = out.groupBy(*key_cols, *params, "bucket").agg(
        F.max("rho").alias("rho")
    )
    # Same column layout as hll_registers, so merge(sketches) is row-
    # for-row comparable with sketch(union).
    return merged.select(*key_cols, "bucket", "rho", *params)


def hll_estimate(registers: DataFrame, key_cols: list[str], p: int = 12) -> DataFrame:
    """Distinct-count estimate per key from a register table.

    Standard HLL estimator with the linear-counting small-range
    correction (E <= 2.5m and empty registers present). One tiny
    aggregation — the raw data is long gone by this point. When the
    register table carries its p column (hll_registers always emits
    it), the caller's p is ASSERTED against it JVM-side — the query
    fails loudly instead of silently mis-correcting.
    """
    m = 1 << p
    alpha = _alpha(m)
    if "p" in registers.columns:
        check = F.assert_true(
            F.col("p") == F.lit(p),
            F.format_string(
                "hll_estimate(p=%s) over registers built with p=%s",
                F.lit(str(p)),
                F.col("p").cast("string"),
            ),
        )
        # Folded into rho so column pruning cannot drop the assert.
        registers = registers.select(
            *key_cols, "bucket", F.when(check.isNull(), F.col("rho")).alias("rho")
        )
    agg = registers.groupBy(*key_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_sum_pow"),
        F.count(F.lit(1)).alias("_nonzero"),
    )
    # Absent buckets contribute 2^0 = 1 each to the harmonic sum.
    zeros = F.lit(m) - F.col("_nonzero")
    harmonic = F.col("_sum_pow") + zeros.cast("double")
    raw = F.lit(alpha * m * m) / harmonic
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    estimate = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), small).otherwise(
        raw
    )
    return agg.select(
        *key_cols, F.round(estimate).cast("long").alias("approx_distinct")
    )


def hll_error_bound(p: int = 12) -> float:
    """Theoretical relative standard error: 1.04 / sqrt(2^p)."""
    return 1.04 / math.sqrt(1 << p)
