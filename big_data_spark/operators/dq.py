"""Data-quality constraint suite: declarative checks verified in as
few passes as possible — the Deequ/dbt-tests shape that gates every
serious ingest, absent from the reference (whose UDFs silently
swallowed bad rows into ``{}``/``-1`` sentinels; SURVEY §4.3).

All row-local checks (not_null / in_set / in_range / matches /
custom predicate) compile to ``sum(when(violated, 1))`` columns of
ONE aggregation over ONE scan — adding a check adds an expression,
not a pass. ``unique`` rides the same aggregation as a
count_distinct; ``referential`` (FK containment) is the one check
that genuinely needs a join per referenced table, built as a
broadcast-friendly anti-join count.

The report is a tall DataFrame (one row per check:
name, column, violations, n_rows, passed) produced by stacking the
single agg row — so the whole suite is itself one query, composable
into pipelines and oracle-checkable cross-engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint. ``kind`` selects the verifier; ``violated`` is
    a row predicate (row-local kinds only)."""

    name: str
    kind: str
    column: str
    violated: Column | None = None
    ref: DataFrame | None = field(default=None, compare=False)
    ref_col: str | None = None


def _validate_names(checks: list[Check]) -> None:
    """Check names are interpolated into the stack() SQL literal, so
    quote characters would break parsing at runtime — reject them at
    the boundary with a clear message instead. Also rejects
    duplicates (the report keys on the name)."""
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    bad = [n for n in names if "'" in n or "`" in n or "\\" in n]
    if bad:
        raise ValueError(
            f"check names must not contain quotes or backslashes: {bad}"
        )


def not_null(col: str, name: str | None = None) -> Check:
    return Check(name or f"not_null({col})", "row", col, F.col(col).isNull())


def in_set(col: str, values: list, name: str | None = None) -> Check:
    return Check(
        name or f"in_set({col})",
        "row",
        col,
        # NULL never violates in_set — pair with not_null to require
        # presence; mirrors SQL CHECK semantics (NULL passes CHECK).
        ~F.col(col).isin(values) & F.col(col).isNotNull(),
    )


def in_range(
    col: str, lo=None, hi=None, name: str | None = None
) -> Check:
    if lo is None and hi is None:
        raise ValueError("in_range needs lo and/or hi")
    v = F.lit(False)
    if lo is not None:
        v = v | (F.col(col) < F.lit(lo))
    if hi is not None:
        v = v | (F.col(col) > F.lit(hi))
    return Check(
        name or f"in_range({col})", "row", col, v & F.col(col).isNotNull()
    )


def matches(col: str, pattern: str, name: str | None = None) -> Check:
    return Check(
        name or f"matches({col})",
        "row",
        col,
        ~F.col(col).rlike(pattern) & F.col(col).isNotNull(),
    )


def satisfies(predicate: Column, name: str, column: str = "") -> Check:
    """Arbitrary row predicate that must HOLD; violations are rows
    where it is false or NULL."""
    return Check(name, "row", column, ~F.coalesce(predicate, F.lit(False)))


def unique(col: str, name: str | None = None) -> Check:
    return Check(name or f"unique({col})", "unique", col)


def referential(
    col: str, ref: DataFrame, ref_col: str, name: str | None = None
) -> Check:
    """Every non-NULL value of ``col`` exists in ``ref[ref_col]``."""
    return Check(
        name or f"referential({col})", "referential", col, None, ref, ref_col
    )


def check_suite(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run the suite; returns one row per check:
    ``check`` (name), ``column``, ``violations``, ``n_rows``,
    ``passed`` — ordered by check name for determinism.

    Cost model: one aggregation over one scan for every row-local and
    uniqueness check combined, plus one aggregated anti-join per
    ``referential`` check (broadcast the dim side when small — at
    scale FK checks against big tables shuffle by the key, which is
    the floor for that verification).
    """
    if not checks:
        raise ValueError("empty check suite")
    _validate_names(checks)

    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    stacked_cols: list[str] = []
    for c in checks:
        if c.kind == "row":
            aggs.append(
                # coalesce: an EMPTY input (e.g. a trailing empty
                # micro-batch in foreachBatch) sums to NULL, which
                # must read as zero violations, not a failure.
                F.coalesce(
                    F.sum(
                        F.when(c.violated, F.lit(1)).otherwise(F.lit(0))
                    ),
                    F.lit(0),
                ).alias(f"_v_{c.name}")
            )
            stacked_cols.append(c.name)
        elif c.kind == "unique":
            # duplicates = rows - distinct values - missing rows are
            # counted per NULL (NULLs are not compared equal; pair
            # with not_null if NULL keys must be absent).
            aggs.append(
                (
                    F.count(F.col(c.column))
                    - F.count_distinct(F.col(c.column))
                ).alias(f"_v_{c.name}")
            )
            stacked_cols.append(c.name)
        elif c.kind == "referential":
            continue  # joined below
        else:
            raise ValueError(f"unknown check kind {c.kind!r}")

    col_of = {c.name: c.column for c in checks}
    report = None
    if stacked_cols:
        one = df.agg(*aggs)
        # Tall report from the single agg row: stack(name, count, ...)
        stack_expr = "stack({n}, {pairs}) as (check, violations)".format(
            n=len(stacked_cols),
            pairs=", ".join(
                f"'{name}', `_v_{name}`" for name in stacked_cols
            ),
        )
        report = one.selectExpr("_n_rows", stack_expr).select(
            "check",
            F.col("violations").cast("long").alias("violations"),
            F.col("_n_rows").cast("long").alias("n_rows"),
        )

    # Row count for FK report rows: reuse the combined agg's _n_rows
    # when it exists; otherwise count ONCE for the whole suite — never
    # one extra full scan per referential check.
    n_rows_df = None
    if any(c.kind == "referential" for c in checks):
        if stacked_cols:
            n_rows_df = one.select(
                F.col("_n_rows").cast("long").alias("n_rows"),
                F.lit(1).alias("_j"),
            )
        else:
            n_rows_df = df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.lit(1).alias("_j"),
            )

    for c in checks:
        if c.kind != "referential":
            continue
        viol = (
            df.select(F.col(c.column))
            .filter(F.col(c.column).isNotNull())
            .join(
                c.ref.select(F.col(c.ref_col).alias(c.column)).distinct(),
                c.column,
                "left_anti",
            )
            .agg(
                F.lit(c.name).alias("check"),
                F.count(F.lit(1)).cast("long").alias("violations"),
                F.lit(1).alias("_j"),
            )
        )
        ref_row = viol.join(n_rows_df, "_j").drop("_j")
        report = ref_row if report is None else report.unionByName(ref_row)

    mapping = F.create_map(
        *[x for name in col_of for x in (F.lit(name), F.lit(col_of[name]))]
    )
    return (
        report.withColumn("column", mapping[F.col("check")])
        .withColumn("passed", F.col("violations") == 0)
        .select("check", "column", "violations", "n_rows", "passed")
        .orderBy("check")
    )


def assert_suite(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Gate a pipeline on the suite: returns ``df`` unchanged when
    every check passes, raises ``ValueError`` naming the failing
    checks and their violation counts otherwise — put it between a
    transform and its sink so bad batches fail LOUDLY instead of
    landing (the reference's silent ``{}``/``-1`` sentinel mode,
    SURVEY §4.3, inverted).

    The verification cost is the suite's one aggregation (+ FK
    joins); the returned ``df`` is the caller's original plan,
    unchanged.
    """
    failed = [
        (r["check"], r["violations"])
        for r in check_suite(df, checks).collect()
        if not r["passed"]
    ]
    if failed:
        detail = ", ".join(f"{name}: {n} violations" for name, n in failed)
        raise ValueError(f"data-quality gate failed — {detail}")
    return df


def check_stream(
    stream_df: DataFrame,
    checks: list[Check],
    ts_col: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """The suite over a STREAM: per event-time window, violation
    counts for every row-local check — data quality as a live metric
    feed (alert when a window's violations jump) instead of a batch
    gate. Row-local checks compile to the same conditional sums as
    the batch path, which are exactly the incremental aggregates
    Structured Streaming supports; ``unique``/``referential`` need
    global state and are rejected here (run them on the lake behind
    the stream).

    Returns one row per (window_start, check): append-mode capable
    (watermarked tumbling window), schema
    (window_start, check, column, violations, n_rows).
    """
    bad = [c.name for c in checks if c.kind != "row"]
    if bad:
        raise ValueError(
            f"streaming dq supports row-local checks only; not: {bad}"
        )
    if not checks:
        raise ValueError("empty check suite")
    _validate_names(checks)
    aggs = [F.count(F.lit(1)).alias("_n_rows")] + [
        F.sum(F.when(c.violated, F.lit(1)).otherwise(F.lit(0))).alias(
            f"_v_{c.name}"
        )
        for c in checks
    ]
    win = F.window(F.col(ts_col), window_duration)
    agged = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(win.alias("_w"))
        .agg(*aggs)
    )
    stack_expr = "stack({n}, {pairs}) as (check, violations)".format(
        n=len(checks),
        pairs=", ".join(f"'{c.name}', `_v_{c.name}`" for c in checks),
    )
    col_of = {c.name: c.column for c in checks}
    mapping = F.create_map(
        *[x for n in col_of for x in (F.lit(n), F.lit(col_of[n]))]
    )
    return agged.selectExpr("_w.start as window_start", "_n_rows", stack_expr).select(
        "window_start",
        "check",
        mapping[F.col("check")].alias("column"),
        F.col("violations").cast("long").alias("violations"),
        F.col("_n_rows").cast("long").alias("n_rows"),
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass column profile: per column —
    ``n`` (non-null count), ``n_null``, ``approx_distinct`` (HLL++
    sketch aggregate), ``min``/``max`` (rendered as strings so one
    tall schema fits every type), and ``mean`` (numeric columns,
    NULL otherwise). The whole profile is ONE aggregation over one
    scan regardless of column count — the first thing to run against
    an unknown 100 TB table, and the input that tunes the dq suite's
    thresholds.
    """
    from pyspark.sql.types import NumericType

    cols = columns or df.columns
    types = {f.name: f.dataType for f in df.schema.fields}
    unknown = [c for c in cols if c not in types]
    if unknown:
        raise ValueError(f"no such columns: {unknown}")

    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_n_{c}"),
            F.approx_count_distinct(F.col(c)).alias(f"_d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
            (
                F.avg(F.col(c))
                if isinstance(types[c], NumericType)
                else F.lit(None).cast("double")
            ).alias(f"_avg_{c}"),
        ]
    one = df.agg(*aggs)
    stack = "stack({n}, {q}) as (column, n, approx_distinct, min, max, mean)".format(
        n=len(cols),
        q=", ".join(
            f"'{c}', `_n_{c}`, `_d_{c}`, `_min_{c}`, `_max_{c}`, `_avg_{c}`"
            for c in cols
        ),
    )
    return one.selectExpr("_total", stack).select(
        "column",
        F.col("n").cast("long").alias("n"),
        (F.col("_total") - F.col("n")).cast("long").alias("n_null"),
        F.col("approx_distinct").cast("long").alias("approx_distinct"),
        "min",
        "max",
        "mean",
    )
