"""Fixed-bin histogram sketch — the numeric-distribution member of
the sketch family (HLL: distinct, CMS: frequency, Bloom: membership).

State is a plain DataFrame of (key..., bucket, n, lo, hi, n_bins):
values clamp into ``n_bins`` equal-width bins over [lo, hi), with
bucket 0 and n_bins-1 absorbing underflow/overflow. That gives the
usual sketch properties:

- **mergeable**: union + per-(key, bucket) sum is EXACT —
  sketch(union) == merge(sketches), so daily histograms roll up to
  monthly without raw data;
- **persistable**: parquet like any table;
- **cheap**: one map-side-combinable shuffle of (key, bucket) rows,
  at most n_bins rows per key retained;
- **bounded error**: any quantile estimate is within one bin width
  ((hi - lo) / n_bins) of the exact value, provided the data lies in
  [lo, hi] — out-of-range mass is pinned to the edge bins and the
  estimate degrades loudly toward lo/hi, never silently mid-range.

Quantiles come from the cumulative bin counts: the q-quantile lands
in the first bucket whose running mass reaches q*total, estimated at
that bucket's midpoint. The (lo, hi, n_bins) parameters ride along
as literal columns and mixed-parameter merges stay separated —
exactly the CMS/Bloom parameter-safety contract.

At 100 TB this is the profile-every-column primitive: numeric
distributions for data-quality dashboards cost one aggregation, and
per-partition histograms roll up across shards/streams for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_RESERVED = ("bucket", "n", "lo", "hi", "n_bins")


def hist_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Histogram table (key..., bucket, n, lo, hi, n_bins) in one
    pass. NULL values are ignored (not a number — counting them in
    an edge bin would corrupt quantiles)."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if n_bins < 2:
        raise ValueError(f"need n_bins >= 2, got {n_bins}")
    clash = set(key_cols) & set(_RESERVED)
    if clash:
        raise ValueError(
            f"key columns {sorted(clash)} collide with reserved sketch columns"
        )
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(n_bins))
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        df.where(v.isNotNull())
        .select(*key_cols, bucket.alias("bucket"))
        .groupBy(*key_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("lo", F.lit(float(lo)))
        .withColumn("hi", F.lit(float(hi)))
        .withColumn("n_bins", F.lit(n_bins))
    )


def hist_merge(*sketches: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Exact merge: union + per-(key, bucket) sum; the (lo, hi,
    n_bins) parameter columns stay in the grouping so differently
    binned sketches never sum together."""
    if not sketches:
        raise ValueError("nothing to merge")
    out = sketches[0]
    for other in sketches[1:]:
        out = out.unionByName(other)
    if key_cols is None:
        key_cols = [c for c in out.columns if c not in _RESERVED]
    params = [c for c in ("lo", "hi", "n_bins") if c in out.columns]
    merged = out.groupBy(*key_cols, *params, "bucket").agg(
        F.sum("n").alias("n")
    )
    return merged.select(*key_cols, "bucket", "n", *params)


def hist_quantile(
    sketch: DataFrame, key_cols: list[str], q: float
) -> DataFrame:
    """Per-key q-quantile estimate: midpoint of the first bucket
    whose cumulative count reaches q * total. Error is bounded by one
    bin width. The cumulative window partitions by key — parallel
    across keys, and n_bins rows per key is trivially window-sized."""
    if not 0.0 < q < 1.0:
        raise ValueError(f"need 0 < q < 1, got {q}")
    w = (
        Window.partitionBy(*[*key_cols, "lo", "hi", "n_bins"])
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*[*key_cols, "lo", "hi", "n_bins"])
    width = (F.col("hi") - F.col("lo")) / F.col("n_bins")
    mid = F.col("lo") + (F.col("bucket") + 0.5) * width
    ranked = sketch.select(
        *key_cols,
        "bucket",
        "lo",
        "hi",
        "n_bins",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(wtot).alias("total"),
        mid.alias("mid"),
    ).filter(F.col("cum") >= F.lit(q) * F.col("total"))
    first = Window.partitionBy(*[*key_cols, "lo", "hi", "n_bins"]).orderBy(
        "bucket"
    )
    return (
        ranked.withColumn("rk", F.row_number().over(first))
        .filter(F.col("rk") == 1)
        .select(*key_cols, F.col("mid").alias(f"q{q}"))
    )


def hist_error_bound(lo: float, hi: float, n_bins: int) -> float:
    """Worst-case quantile error: one bin width."""
    return (hi - lo) / n_bins


def hist_psi(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    key_cols: list[str],
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index per key between two histogram
    sketches built with IDENTICAL (lo, hi, n_bins):
    PSI = sum_buckets (pa - pb) * ln(pa / pb), with each bucket
    probability floored at ``eps`` so empty-on-one-side buckets
    contribute a large-but-finite term instead of infinity — the
    standard monitoring smoothing. Conventional reading: < 0.1
    stable, 0.1-0.25 drift warning, > 0.25 major shift.

    This is the drift-detection consumer of the sketch family: build
    one sketch per snapshot/day/partition (mergeable, streaming-safe
    like the other sketches), then PSI any two without touching raw
    data again — at 100 TB the comparison costs n_keys x n_bins
    rows, not a second scan.

    Determinism: counts are exact longs; per-bucket probabilities are
    single divisions and the ln of their ratio is one libm call per
    bucket — the PMI float discipline; callers round the output.
    """
    pa = sketch_a.groupBy(*key_cols).agg(F.sum("n").alias("_tot_a"))
    pb = sketch_b.groupBy(*key_cols).agg(F.sum("n").alias("_tot_b"))
    a = sketch_a.join(pa, key_cols).select(
        *key_cols, "bucket", (F.col("n") / F.col("_tot_a")).alias("_pa")
    )
    b = sketch_b.join(pb, key_cols).select(
        *key_cols, "bucket", (F.col("n") / F.col("_tot_b")).alias("_pb")
    )
    joined = a.join(b, [*key_cols, "bucket"], "full_outer").select(
        *key_cols,
        F.greatest(F.coalesce("_pa", F.lit(0.0)), F.lit(eps)).alias("_qa"),
        F.greatest(F.coalesce("_pb", F.lit(0.0)), F.lit(eps)).alias("_qb"),
    )
    return (
        joined.groupBy(*key_cols)
        .agg(
            F.sum(
                (F.col("_qa") - F.col("_qb"))
                * (F.log("_qa") - F.log("_qb"))
            ).alias("psi")
        )
    )
