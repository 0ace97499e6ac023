"""Local simulation of the driver's correctness gate, type-strict.

Runs every ``queries()`` entry from ``__spark_entry__`` against its
``oracle_sql()`` twin in DuckDB at the given sf dir, then compares:

  * row counts,
  * column names (sorted, as the driver sorts before hashing),
  * **dtypes after pandas conversion** — the channel the round-1 sweep
    missed: DuckDB ``SUM(INTEGER)`` returns HUGEINT which lands in
    pandas as ``object``/``float64`` while Spark lands ``int64``; the
    driver's value hash is type-sensitive, so a dtype mismatch is a
    hash mismatch even when values print identically,
  * values, exact (ints/strings) or bit-equal (floats — the oracles
    are written with casts/round so exact equality is the contract).

Usage:  python tools/gate_sim.py [sf_dir ...]
Defaults to sf0.001 and sf0.01. Exit code 0 iff all queries match.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def build_spark():
    """A plain session like the driver's — NOT big_data_spark.session's
    tuned builder — so the contract can't depend on our own configs."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("gate-sim")
        .getOrCreate()
    )


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        return [f"rows {len(spark_pdf)} vs {len(oracle_pdf)}"]
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    if list(s.columns) != list(o.columns):
        return [f"columns {list(s.columns)} vs {list(o.columns)}"]
    for c in s.columns:
        sd, od = s[c].dtype, o[c].dtype
        if str(sd) != str(od):
            problems.append(f"dtype[{c}]: spark={sd} oracle={od}")
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype == object or ov.dtype == object:
            eq = sv.astype(str).equals(ov.astype(str))
        elif np.issubdtype(sv.dtype, np.floating) or np.issubdtype(
            ov.dtype, np.floating
        ):
            a = sv.to_numpy(dtype="float64")
            b = ov.to_numpy(dtype="float64")
            both_nan = np.isnan(a) & np.isnan(b)
            eq = bool(np.all((a == b) | both_nan))
        else:
            eq = sv.equals(ov)
        if not eq:
            bad = None
            try:
                mism = (sv.astype(str) != ov.astype(str)).to_numpy().nonzero()[0]
                if len(mism):
                    i = int(mism[0])
                    bad = f" first@{i}: {sv.iloc[i]!r} vs {ov.iloc[i]!r}"
            except Exception:
                pass
            problems.append(f"values[{c}] differ{bad or ''}")
    return problems


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    import __spark_entry__ as e
    from big_data_spark.queries import ORACLE_SQL_ALL, QUERIES_ALL

    assert len(e.queries()) == 50, "driver registry must stay at the 50-row cap"
    # Sweep EVERYTHING, including pytest-only entries (the pytest gate
    # only covers them at sf0.001).
    qs, oracles = QUERIES_ALL, ORACLE_SQL_ALL
    only = {n for n in os.environ.get("GATE_ONLY", "").split(",") if n}
    if only:
        unknown = only - set(qs)
        assert not unknown, f"GATE_ONLY names not in registry: {sorted(unknown)}"
        qs = {n: fn for n, fn in qs.items() if n in only}
    spark = build_spark()
    failures = 0
    for sf_dir in sf_dirs:
        con = duck_con(sf_dir)
        print(f"== {sf_dir} ==")
        for name, fn in qs.items():
            t0 = time.time()
            try:
                spark_pdf = fn(spark, sf_dir).toPandas()
            except Exception as ex:
                print(f"FAIL {name}: spark raised {type(ex).__name__}: {ex}")
                failures += 1
                continue
            if name not in oracles:
                print(f"SKIP {name}: no oracle ({len(spark_pdf)} rows)")
                continue
            try:
                oracle_pdf = con.execute(oracles[name]).df()
            except Exception as ex:
                print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
                failures += 1
                continue
            problems = compare(name, spark_pdf, oracle_pdf)
            dt = time.time() - t0
            if problems:
                failures += 1
                print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            else:
                print(f"ok   {name} ({dt:.1f}s, {len(spark_pdf)} rows)")
        con.close()
    from big_data_spark.session import stop_spark

    stop_spark(spark)
    print(f"\n{'ALL GREEN' if not failures else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
