#!/usr/bin/env python
"""Ingest-loop throughput curve: run the streaming dedup ingest
(streaming/ingest.py) over increasingly large duplicated event
streams and report rows/s — measured evidence that the Bloom-gated
path scales, to pair with the datagen pipeline curve in PERF.md.

Usage: python tools/ingest_scale.py [multipliers...]   (default 1 4 16)
Each multiplier M streams M x |events(sf0.1)| rows (half duplicates)
through 4 micro-batches into a fresh lake.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_spark.session import get_spark, quiet_logs, stop_spark  # noqa: E402
from big_data_spark.streaming.ingest import read_lake, run_dedup_ingest  # noqa: E402


def main() -> None:
    mults = [int(m) for m in sys.argv[1:]] or [1, 4, 16]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ingest-scale")
    quiet_logs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )
    base_n = ev.count()
    for m in mults:
        work = tempfile.mkdtemp(prefix="ingest_scale_")
        # M copies with distinct ids for half, duplicate ids for half:
        # every batch carries both fresh and already-seen keys.
        src = (
            spark.range(m)
            .crossJoin(ev)
            .select(
                F.when(
                    F.col("id") % 2 == 0,
                    F.col("event_id") + F.col("id") * base_n,
                )
                .otherwise(F.col("event_id"))
                .alias("event_id"),
                "user_id",
                "event_type",
                "value",
            )
        )
        src.repartition(4).write.parquet(f"{work}/src")
        stream = (
            spark.readStream.schema(
                "event_id bigint, user_id bigint, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{work}/src")
        )
        t0 = time.time()
        run_dedup_ingest(stream, "event_id", f"{work}/lake", f"{work}/ck")
        dt = time.time() - t0
        n_in = base_n * m
        n_out = read_lake(spark, f"{work}/lake").count()
        print(
            f"mult={m}: {n_in} rows in, {n_out} unique out, "
            f"{dt:.1f}s, {int(n_in / dt)} rows/s"
        )
        assert n_out == base_n * ((m + 1) // 2), (n_out, m, base_n)
    stop_spark(spark)


if __name__ == "__main__":
    main()
