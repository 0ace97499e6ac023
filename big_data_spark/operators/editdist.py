"""Edge-level Levenshtein distance between Euler strings.

The metric the reference *intends* (recursive spec, commented out at
reference: Src/utils.py:32-71): standard Levenshtein over the
'-'-separated edge tokens, substitution cost 1. The reference's active
NumPy implementation (Src/utils.py:74-110) is off-by-one — its DP
loops stop one row/column short, it indexes tokens instead of DP
cells for the substitution test, and it returns the never-written
corner of a zero-initialized matrix — so golden outputs from it are
untrustworthy (SURVEY.md §4.3). This module implements the spec.

Two forms:
- ``edit_distance`` — plain Python, for driver-side tests and the
  per-group kernels;
- ``pair_edit_distances`` — Arrow-batched pandas UDF over a pair
  DataFrame, the distributed hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def edit_distance(s: str, t: str) -> int:
    """Levenshtein over '-'-separated tokens (spec: Src/utils.py:32-71).

    Empty string counts as zero tokens (the spec's trivial cases).
    """
    a = s.split("-") if s else []
    b = t.split("-") if t else []
    if not a:
        return len(b)
    if not b:
        return len(a)
    # One-row DP.
    prev = list(range(len(b) + 1))
    for i, sa in enumerate(a, start=1):
        cur = [i] + [0] * len(b)
        for j, tb in enumerate(b, start=1):
            sub = prev[j - 1] + (0 if sa == tb else 1)
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub)
        prev = cur
    return prev[-1]


@F.pandas_udf(IntegerType())
def _edit_distance_udf(s: pd.Series, t: pd.Series) -> pd.Series:
    return pd.Series(
        [edit_distance(a or "", b or "") for a, b in zip(s, t)], dtype="int32"
    )


def pair_edit_distances(
    pairs: DataFrame, left_col: str, right_col: str, out_col: str = "edit_distance"
) -> DataFrame:
    """Append token-level Levenshtein distance to a pair DataFrame.

    Arrow-batched (pandas UDF): one Python roundtrip per batch, not
    per row. The quadratic DP runs per pair; callers bound pair counts
    via LSH pre-clustering (reference pattern, Src/processes.py:325)."""
    return pairs.withColumn(out_col, _edit_distance_udf(F.col(left_col), F.col(right_col)))
