"""End-to-end CLI — the reference's ``python main.py`` workflow
(reference: Src/main.py:13-51) on this engine:

    python -m big_data_spark.main Data/logs.json --out-dir out/

reads an event-log JSON, runs the full pipeline, and writes the
reference's three outputs:

- ``<name>_part1Output.txt``       grouped logs (JSON lines)
- ``<name>_part1Observations.txt`` identical-process group report
- ``<name>_part2Observations.txt`` similar-process group report —
  non-empty, unlike the reference, whose discarded union
  (Src/processes.py:402) ships an empty file (SURVEY.md §4.3)
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import functions as F

from big_data_spark.io.writers import write_json, write_text
from big_data_spark.io.readers import read_logs_json
from big_data_spark.operators.clustering import DEFAULT_SEED
from big_data_spark.pipeline.processes import run_pipeline
from big_data_spark.session import get_spark


def _part2_observations(out: dict):
    """Similar-process report: one line per edit-distance cluster with
    its member groups' processes (reference's intended part-2 shape,
    Src/processes.py:376-399)."""
    labels = out["part2_similar"]
    groups = out["groups"].select("group_processes_id", "equal_processes")
    joined = labels.join(groups, on="group_processes_id")
    return (
        joined.groupBy("ped_cluster")
        .agg(
            F.sort_array(F.collect_list("group_processes_id")).alias("member_groups"),
            F.array_sort(F.flatten(F.collect_list("equal_processes"))).alias(
                "processes"
            ),
        )
        .select(
            F.format_string(
                "Similar cluster %s: groups %s processes %s",
                F.col("ped_cluster").cast("string"),
                F.col("member_groups").cast("string"),
                F.col("processes").cast("string"),
            ).alias("text")
        )
    )


def main(argv: list[str] | None = None, spark=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("logs_json", help="event-log JSON path")
    parser.add_argument("--out-dir", default=".", help="output directory")
    parser.add_argument("--seed", type=int, default=DEFAULT_SEED, help="LSH seed")
    args = parser.parse_args(argv)

    # Only stop a session this invocation created — a caller-provided
    # session (tests, notebooks) outlives the call.
    owns_session = spark is None
    if owns_session:
        spark = get_spark(app_name="big_data_spark-main")
        spark.sparkContext.setLogLevel("WARN")
    logs = read_logs_json(spark, args.logs_json)
    out = run_pipeline(spark, logs, seed=args.seed)

    name = os.path.basename(args.logs_json)
    prefix = os.path.join(args.out_dir, name)
    write_json(out["part1_grouped_logs"], f"{prefix}_part1Output.txt")
    write_text(out["part1_observations"], "text", f"{prefix}_part1Observations.txt")
    part2 = _part2_observations(out)
    if part2.isEmpty():
        part2 = spark.createDataFrame(
            [("No similar-process clusters at the configured thresholds.",)],
            ["text"],
        )
    write_text(part2, "text", f"{prefix}_part2Observations.txt")
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
