"""PageRank as pure DataFrame iteration — the weighted-importance
twin of the label-propagation connected components
(operators/components.py), and the template for any fixed-point
computation done Spark-right:

- each iteration is ONE shuffle: contributions = ranks join
  out-degreed edges, grouped by destination (map-side combinable
  sum);
- dangling mass (vertices with no out-edges) is collected as a
  1-row aggregate and redistributed uniformly — without it the
  ranks leak and stop summing to 1;
- lineage is truncated every iteration through the session knob
  (big_data_spark.lineage) — an un-truncated 20-iteration plan is
  exponentially large and the reason naive DataFrame PageRank falls
  over;
- convergence is count-based (how many vertices moved more than
  ``tol``), checked every ``check_every`` rounds so the job isn't
  action-bound each step — a scalar count is the only thing that
  ever reaches the driver, same discipline as components().

At 100 TB the edge table is the big side: pre-partition edges by src
once (they are iteration-invariant), and every per-iteration join
co-locates on that partitioning; ranks are the small, changing side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_spark.lineage import truncate_lineage


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    check_every: int = 5,
) -> DataFrame:
    """(vertex, rank) with ranks summing to 1. Directed edges;
    duplicate edges count once (dedup is explicit below so callers
    can't silently double-weight).

    Stops at ``max_iter`` or when NO vertex's rank moved more than
    ``tol`` over one iteration (checked every ``check_every``
    iterations — each check is an extra action)."""
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    vertices = truncate_lineage(
        e.select(F.col("src").alias("v"))
        .union(e.select("dst"))
        .distinct()
    )
    n = vertices.count()
    if n == 0:
        return vertices.select(F.col("v"), F.lit(0.0).alias("rank"))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Edge table with degree rides along — built once, reused every
    # iteration (iteration-invariant: truncate so the scan+join isn't
    # replayed per round).
    ed = truncate_lineage(e.join(out_deg, "src"))
    ranks = truncate_lineage(
        vertices.select("v", F.lit(1.0 / n).alias("rank"))
    )
    base = (1.0 - damping) / n
    for it in range(max_iter):
        contribs = (
            ed.join(ranks, ed.src == ranks.v)
            .select(F.col("dst").alias("v"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("contrib"))
        )
        # Dangling vertices (no out-edges) spread their rank evenly.
        dangling = (
            ranks.join(out_deg, ranks.v == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        new_ranks = truncate_lineage(
            vertices.join(contribs, "v", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "v",
                (
                    base
                    + damping
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
        )
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            moved = (
                new_ranks.join(ranks.withColumnRenamed("rank", "prev"), "v")
                .filter(F.abs(F.col("rank") - F.col("prev")) > tol)
                .count()
            )
            ranks = new_ranks
            if moved == 0:
                break
        else:
            ranks = new_ranks
    return ranks.select(F.col("v").alias("vertex"), "rank")
