"""DuckDB twin of bench.py — times the SAME headline oracle SQL over
the SAME parquet at $SPARK_GRAFT_SF_DIR (default sf0.1), median of 3,
one JSON line. This reproduces the judge's paired single-node-engine
comparison (`BENCH_r{N}` vs DuckDB) from one command, so the
"Spark suite vs the oracle engine at equal scale" ratio is a number
anyone can re-derive, not a hand-run.

Run both on a quiet machine, same session of measurements:

    python bench.py                  # Spark side
    python tools/duckdb_bench.py     # DuckDB side
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402
from big_data_spark.queries import ORACLE_SQL_ALL  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    per_query: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        sql = ORACLE_SQL_ALL.get(name)
        if sql is None:
            continue  # rows-only queries have no oracle twin
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            walls.append(time.perf_counter() - t0)
        walls.sort()
        runs[name] = [round(w, 3) for w in walls]
        per_query[name] = round(statistics.median(walls), 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_headline_suite_seconds",
                "value": round(sum(per_query.values()), 3),
                "unit": "sec",
                "queries": per_query,
                "query_runs": runs,
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
