"""Deterministic probability-proportional-to-size (PPS) sampling —
the weighted companion to the hash-gated uniform mixer
(queries/llm.py deterministic_sample).

A training-data pipeline downsamples with WEIGHTS constantly: keep
high-quality documents with higher probability, sample interaction
logs proportional to duration, thin a corpus to a token budget while
favoring long documents. Engine-native ``sample()`` is seed- and
partitioning-dependent (unverifiable, unstable across retries); RNG
keyed per row is verifiable but float-fragile across engines.

This operator is EXACT-INTEGER Poisson/PPS sampling:

- u32(key) = first 8 md5 hex chars of the key as a uint32 — a
  deterministic uniform on [0, 2^32), identical in any engine;
- row i is kept iff  u32_i * W < w_i * n * 2^32  where W = sum of
  all weights and n = the expected sample size — i.e. with
  inclusion probability p_i = min(1, n * w_i / W), the textbook
  Poisson-PPS design;
- the comparison is evaluated in decimal(38,0)/HUGEINT arithmetic:
  NO floating point anywhere on the keep/drop path, so reruns,
  retries, Spark and any ANSI oracle agree row for row — the same
  reason the uniform mixer can be oracle-checked at all.

The returned frame carries ``_p`` (the inclusion probability, as a
double) for Horvitz-Thompson reweighting downstream: sum(x/p over
kept) is an unbiased estimate of sum(x) — the estimator that makes a
weighted SAMPLE usable as a corpus-statistics proxy. ``_p`` is
derived output, never an input to the keep decision.

Scale: one map-side-combinable 1-row weight-sum aggregate broadcast
back, then a narrow filter — the corpus pass stays a pure map, no
shuffle, column pruning intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_U32_SPACE = 1 << 32


def _u32(key_col: str) -> F.Column:
    return F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")


def pps_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    expected_n: int,
) -> DataFrame:
    """Keep each row with probability min(1, expected_n * w / W)
    (W = total weight), deterministically in the row's key. Weights
    must be non-negative integers (exactness contract — cast rational
    weights to a fixed scale first); zero-weight rows are never kept.
    """
    if expected_n < 1:
        raise ValueError(f"expected_n must be >= 1, got {expected_n}")
    w = F.col(weight_col).cast("decimal(38,0)")
    total = df.agg(F.sum(w).alias("_W"))
    # Overflow guard: both gate products must stay inside
    # decimal(38,0) — u32 * W < 2^32 * W and w * n * 2^32 <= W * n *
    # 2^32, so W <= (10^38 - 1) / (n * 2^32) bounds them BOTH (n >=
    # 1). Past 38 digits Spark's allowPrecisionLoss yields NULL and
    # the filter would silently drop rows — wrong sample membership;
    # raise loudly instead (JVM-side, no extra pass: the guard rides
    # the same broadcast 1-row total).
    w_bound = (10**38 - 1) // (max(expected_n, 1) << 32)
    overflow_msg = (
        f"pps_sample: sum({weight_col}) exceeds {w_bound} — the "
        f"decimal(38,0) keep gate would overflow to NULL for "
        f"expected_n={expected_n}; rescale the weights"
    )
    keep_expr = (
        _u32(key_col).cast("decimal(38,0)") * F.col("_W")
        < w * F.lit(expected_n) * F.lit(_U32_SPACE)
    )
    gated = (
        df.crossJoin(F.broadcast(total))
        .withColumn(
            "_keep",
            F.when(
                F.col("_W") <= F.lit(str(w_bound)).cast("decimal(38,0)"),
                keep_expr,
            ).otherwise(
                F.expr(
                    "cast(assert_true(false, "
                    f"{overflow_msg!r}) as boolean)"
                )
            ),
        )
        .filter(F.col("_keep"))
        .withColumn(
            "_p",
            F.least(
                F.lit(1.0),
                F.lit(float(expected_n))
                * F.col(weight_col).cast("double")
                / F.col("_W").cast("double"),
            ),
        )
        .drop("_W", "_keep")
    )
    return gated
