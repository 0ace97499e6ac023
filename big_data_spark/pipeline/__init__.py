from big_data_spark.pipeline.corpus import prepare_corpus
from big_data_spark.pipeline.processes import (
    equal_process_groups,
    grouped_logs,
    observations_text,
    process_elements,
    run_pipeline,
    similar_process_groups,
)

__all__ = [
    "process_elements",
    "equal_process_groups",
    "grouped_logs",
    "observations_text",
    "similar_process_groups",
    "run_pipeline",
    "prepare_corpus",
]
