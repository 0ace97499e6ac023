#!/usr/bin/env python
"""Round-15 directive #7: one demonstrable scale-out data point.

sf0.1 cannot show parallel speedup (every r14 8-vs-32-cpu ratio sat
at 0.5-1.3 against an ideal ~4 — the suite is fixed per-job overhead
at that size), so every task-storm/shuffle claim in the optimization
rounds has been argued from plan shape alone. This probe builds a
deterministic K-fold blow-up of the three heaviest bench rows' inputs
(default K=10 — a stand-in for sf1), then runs bench.py UNCHANGED
(same env contract: SPARK_GRAFT_SF_DIR + SPARK_GRAFT_CPUS +
SPARK_GRAFT_BENCH_ONLY) at 32 and at 8 cores, and prints the per-row
8->32 speedup ratio. The scaled inputs are rebuilt from the sf0.1
parquet every invocation (or reused only within one invocation) —
nothing here feeds the timed bench contract, and the bench itself
computes from the parquet inputs as always.

Blow-up construction (pure key-shifts, so each copy is a disjoint
subgraph / disjoint doc set):
- lineitem/orders: copy i shifts l_orderkey/o_orderkey and
  l_suppkey/o_custkey by i * (max_key + 1) — pagerank gets K disjoint
  isomorphic trade graphs (10x vertices, 10x edges);
- documents: copy i shifts doc_id and prefixes the text with a
  per-copy token, so shingle sets differ across copies and the
  near-dup pair structure replicates instead of exploding
  quadratically (10 identical copies of every doc would fabricate
  O(K^2) cross-copy duplicate pairs no real corpus has).

Usage: python tools/scaleout_probe.py [K] [outdir] [rows] [repeats]
  rows: comma list, default pagerank_topn,dedup_clusters,dedup_ngram_jaccard
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build(k: int, outdir: str) -> None:
    from big_data_spark.session import get_spark, quiet_logs, stop_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="scaleout-build", shuffle_partitions=32)
    quiet_logs(spark)
    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir, exist_ok=True)
    src = "/root/testdata/sf0.1"

    def copies(df, shifts: dict[str, int], text_tag: bool = False):
        parts = []
        for i in range(k):
            c = df
            for col, span in shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * span))
            if text_tag and i > 0:
                c = c.withColumn(
                    "text", F.concat(F.lit(f"copy{i} "), F.col("text"))
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    od = spark.read.parquet(f"{src}/orders.parquet")
    dc = spark.read.parquet(f"{src}/documents.parquet")
    spans = {
        "l_orderkey": od.agg(F.max("o_orderkey")).first()[0] + 1,
        "l_suppkey": li.agg(F.max("l_suppkey")).first()[0] + 1,
        "o_custkey": od.agg(F.max("o_custkey")).first()[0] + 1,
        "doc_id": dc.agg(F.max("doc_id")).first()[0] + 1,
    }
    copies(
        li, {"l_orderkey": spans["l_orderkey"], "l_suppkey": spans["l_suppkey"]}
    ).repartition(32).write.mode("overwrite").parquet(f"{outdir}/lineitem.parquet")
    copies(
        od, {"o_orderkey": spans["l_orderkey"], "o_custkey": spans["o_custkey"]}
    ).repartition(8).write.mode("overwrite").parquet(f"{outdir}/orders.parquet")
    copies(
        dc, {"doc_id": spans["doc_id"]}, text_tag=True
    ).repartition(8).write.mode("overwrite").parquet(f"{outdir}/documents.parquet")
    stop_spark(spark)


def run_bench(outdir: str, cpus: int, rows: str, repeats: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=outdir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_ONLY=rows,
        SPARK_GRAFT_BENCH_REPEATS=str(repeats),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [
        ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")
    ][-1]
    parsed = json.loads(line)
    if not parsed.get("queries"):
        raise RuntimeError(
            f"bench returned no query timings: {line[:600]} "
            f"stderr tail: {out.stderr[-800:]}"
        )
    return parsed


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    outdir = (
        sys.argv[2] if len(sys.argv) > 2 else f"/tmp/bds_scaleout_k{k}"
    )
    rows = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "pagerank_topn,dedup_clusters,dedup_ngram_jaccard"
    )
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    t0 = time.perf_counter()
    build(k, outdir)
    print(f"built K={k} inputs in {time.perf_counter() - t0:.0f}s", flush=True)
    res = {}
    for cpus in (32, 8, 32, 8):  # interleaved pairs: host drift guards
        r = run_bench(outdir, cpus, rows, repeats)
        res.setdefault(cpus, []).append(r["queries"])
        print(f"cpus={cpus}: {r['queries']}", flush=True)
    print("\nrow                     32cpu(best)  8cpu(best)  ratio(8/32)")
    for q in rows.split(","):
        t32 = min(run[q] for run in res[32])
        t8 = min(run[q] for run in res[8])
        print(f"{q:24s} {t32:10.2f} {t8:11.2f} {t8 / t32:11.2f}")
    shutil.rmtree(outdir, ignore_errors=True)


if __name__ == "__main__":
    main()
