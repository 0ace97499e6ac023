"""Every declared query hash-matches its DuckDB oracle (the driver's
t2 gate, run locally at sf0.001 for speed).

Comparison mirrors the driver: sort columns by name, sort rows, then
compare values (floats to 1e-9 relative)."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE


def _sort_key(value) -> str:
    # Floats participate in the row sort via round(6) so a last-ULP
    # engine difference cannot reorder near-tied rows and misalign
    # the pairwise comparison.
    if isinstance(value, float):
        return str(round(value, 6))
    return str(value)


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        out.append(tuple(row[i] for i in order))
    return sorted(out, key=lambda t: tuple(_sort_key(x) for x in t))


def _values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return a == b


from big_data_spark.queries import ORACLE_SQL_ALL, QUERIES_ALL  # noqa: E402

QUERY_NAMES = sorted(QUERIES_ALL)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES_ALL[name]
    sql = ORACLE_SQL_ALL.get(name)
    df = q(spark, SF_SMOKE)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    if sql is None:
        # Rows-only check for non-SQL-expressible ops (none currently
        # — every query ships an oracle; this guards future ones).
        assert len(spark_rows) > 0, f"{name}: rows-only query returned nothing"
        return
    rel = duck.sql(sql)
    duck_cols = rel.columns
    duck_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    mismatches = [
        (i, ra, rb)
        for i, (ra, rb) in enumerate(zip(a, b))
        if not all(_values_equal(x, y) for x, y in zip(ra, rb))
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    # The driver's gate is rows > 0 — mirror it, not a vacuous >= 0.
    assert df.count() > 0
    assert df.columns
