"""Sources (SURVEY.md §2.1 S1-S4).

The reference reads schema-inferred JSON (reference: Src/main.py:20),
which costs a full extra pass over the data and silently tolerates
malformed rows. We always pass an explicit schema; JSON logs are read
PERMISSIVE-with-quarantine (the reference's committed sample files end
rows with ",\n" — Src/data.py:156-159 — so strict FAILFAST would
reject the reference's own data) and the quarantine column lets
callers fail loudly if anything else is malformed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from big_data_spark.schemas import LOGS_SCHEMA, TESTDATA_SCHEMAS

_CORRUPT = "_corrupt_record"


def read_logs_json(
    spark: SparkSession, path: str, fail_on_corrupt: bool = True
) -> DataFrame:
    """Read event-log JSON lines with the pinned LOGS_SCHEMA.

    Tolerates the reference's trailing-comma lines; any row that is
    malformed beyond that raises (default) or is dropped.
    """
    schema = StructType(
        list(LOGS_SCHEMA.fields) + [StructField(_CORRUPT, StringType(), True)]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    # Trailing-comma rows parse fine for all declared fields but are
    # flagged corrupt; treat "ALL declared fields present" as clean —
    # requiring just one field would let a row with a corrupt
    # time/action/state but valid process_id slip through as nulls.
    all_fields_present = F.lit(True)
    for field in LOGS_SCHEMA.fields:
        all_fields_present = all_fields_present & F.col(field.name).isNotNull()
    clean = F.col(_CORRUPT).isNull() | all_fields_present
    if fail_on_corrupt:
        bad = df.filter(~clean)
        if not bad.isEmpty():
            sample = [r[_CORRUPT] for r in bad.select(_CORRUPT).head(3)]
            raise ValueError(f"malformed log rows, e.g. {sample}")
    return df.filter(clean).drop(_CORRUPT)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata parquet table (TESTDATA.md).

    ``events.ts`` is INT64 TIMESTAMP(NANOS), which Spark 4 only reads
    via the nanosAsLong legacy conf (as raw nanosecond longs) — set it
    unconditionally so this works under any caller-provided session.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    use = names or tuple(TESTDATA_SCHEMAS)
    return {n: read_table(spark, sf_dir, n) for n in use}
