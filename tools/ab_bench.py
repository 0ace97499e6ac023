#!/usr/bin/env python
"""Interleaved pinned-tree A/B bench driver (the r13-prescribed
methodology for round-over-round claims on a drifting host).

Alternates bench.py invocations across N working trees in one window
(tree1 rep1, tree2 rep1, ..., treeN rep1, tree1 rep2, ...), parses
each one-line JSON, and prints per-row paired results. Host drift
affects every tree's rep-k equally, so paired comparisons survive it.

Usage:
  python tools/ab_bench.py ROWS PAIRS label1=dir1 label2=dir2 [...]
e.g.
  python tools/ab_bench.py pagerank_topn,dedup_clusters 6 \
      r13=/tmp/wt_r13 head=/root/repo
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_once(tree: str, rows: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
        SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        SPARK_GRAFT_BENCH_ONLY=rows,
        SPARK_GRAFT_BENCH_REPEATS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=tree,
    )
    lines = [
        ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")
    ]
    if not lines:
        raise RuntimeError(
            f"no JSON from {tree}: {out.stdout[-500:]} {out.stderr[-500:]}"
        )
    return json.loads(lines[-1])["queries"]


def main() -> None:
    rows = sys.argv[1]
    pairs = int(sys.argv[2])
    trees = [a.split("=", 1) for a in sys.argv[3:]]
    results: dict[str, list[dict]] = {lbl: [] for lbl, _ in trees}
    for rep in range(pairs):
        for lbl, d in trees:
            q = run_once(d, rows)
            results[lbl].append(q)
            print(
                f"rep{rep} {lbl:8s} "
                + " ".join(f"{k}={v:.3f}" for k, v in q.items()),
                flush=True,
            )
    print()
    labels = [lbl for lbl, _ in trees]
    for q in rows.split(","):
        med = {
            lbl: statistics.median(r[q] for r in results[lbl])
            for lbl in labels
        }
        base = labels[0]
        wins = {
            lbl: sum(
                1
                for a, b in zip(results[base], results[lbl])
                if b[q] < a[q]
            )
            for lbl in labels[1:]
        }
        print(
            f"{q:24s} "
            + " ".join(f"{lbl}_med={med[lbl]:.3f}" for lbl in labels)
            + "  "
            + " ".join(
                f"{lbl}_wins_vs_{base}={wins[lbl]}/{pairs}"
                for lbl in labels[1:]
            )
        )


if __name__ == "__main__":
    main()
