"""Reusable time-series operators: as-of join and gap sessionization
as library functions (the query registry's `asof_join` /
`events_sessionize` rows are instances of these shapes; cite
SURVEY.md §2.3 "+ as-of join" / §2.5).

Both are one-shuffle idioms keyed on the entity column — the shapes
that survive 100 TB because the sort happens within key partitions
and no range cross-join or per-key loop ever materializes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PROBE = "_asof_is_probe"
_MATCH_TS = "_asof_matched_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str] | None = None,
    how: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """For each ``left`` row, the ``right`` row with the greatest
    ``ts_col`` <= left's (``backward``, the default) or smallest
    >= (``forward``) within the same ``on`` keys — the point-in-time
    lookup vanilla Spark lacks.

    Implementation: union-marker + running ``last``/``first`` over a
    key-partitioned time-ordered window — ONE shuffle on the keys,
    never a range cross-join. Right rows order before (backward) /
    after (forward) probes at equal timestamps, so equality matches.

    Returns every ``left`` row + ``value_cols`` from the matched
    right row (NULL when none), each suffixed; plus
    ``{ts_col}{suffix}`` = the matched right timestamp.
    """
    if how not in ("backward", "forward"):
        raise ValueError("how must be 'backward' or 'forward'")
    # `is None`, not falsy: an explicit [] means "matched timestamp
    # only" — `or` would silently expand it to every right column.
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in on and c != ts_col
        ]
    clash = [
        f"{c}{suffix}"
        for c in value_cols + [ts_col]
        if f"{c}{suffix}" in left.columns
    ]
    if clash:
        raise ValueError(f"suffix collision on {clash}")
    if _MATCH_TS in value_cols or ts_col == _MATCH_TS:
        raise ValueError(
            f"column name {_MATCH_TS!r} is reserved by asof_join"
        )

    lhs = left.withColumn(_PROBE, F.lit(1))
    rhs_cols = [F.col(c) for c in on] + [F.col(ts_col)]
    rhs = right.select(*rhs_cols, *[F.col(c) for c in value_cols]).withColumn(
        _PROBE, F.lit(0)
    )
    # align schemas: left carries its own columns, right only its
    # payload; union needs one schema -> carry both sides' columns,
    # NULL-filled crosswise.
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in value_cols:
        if c not in lhs.columns:
            lhs = lhs.withColumn(
                c, F.lit(None).cast(dict(right.dtypes)[c])
            )
    rhs = rhs.select(*lhs.columns)

    asc = how == "backward"
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(ts_col).asc() if asc else F.col(ts_col).desc(),
            F.col(_PROBE).asc(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # The matched right row travels as ONE struct: taking ts and each
    # value column through separate last(..., ignorenulls) calls would
    # skip right rows whose VALUE is NULL and silently substitute a
    # stale earlier value for the matched timestamp. The struct is
    # non-NULL for every right row (even all-NULL fields), so
    # ignorenulls skips exactly the probe rows.
    picked = F.last(
        F.when(
            F.col(_PROBE) == 0,
            F.struct(
                F.col(ts_col).alias(_MATCH_TS),
                *[F.col(c) for c in value_cols],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    out = lhs.unionByName(rhs).withColumn("_asof_match", picked)
    return (
        out.filter(F.col(_PROBE) == 1)
        .select(
            *left.columns,
            F.col(f"_asof_match.{_MATCH_TS}").alias(f"{ts_col}{suffix}"),
            *[
                F.col(f"_asof_match.{c}").alias(f"{c}{suffix}")
                for c in value_cols
            ],
        )
    )


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: Column | int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when
    the time since the previous event exceeds ``gap`` (same units as
    ``ts_col``). One shuffle on the keys; session numbering is a
    running sum of start flags — no state machine, no loop.

    ``session_id`` is 1-based per key and deterministic given a
    unique (key, ts) ordering; add a tie-break column to ``ts_col``'s
    ordering upstream if timestamps can collide.
    """
    gap_col = F.lit(gap) if isinstance(gap, int) else gap
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_session = (
        prev.isNull() | ((F.col(ts_col) - prev) > gap_col)
    ).cast("long")
    run = Window.partitionBy(*key_cols).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(session_col, F.sum(new_session).over(run))
