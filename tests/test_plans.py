"""Physical-plan regression guards: the scale properties (pushdown,
broadcast dims, JVM-only relational paths, top-k without global sort)
must survive refactors, not just the result values."""

from __future__ import annotations

import re

import pytest

from big_data_spark.queries import QUERIES_ALL
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    # QUERIES_ALL, not the driver-capped QUERIES: plan guards must
    # survive driver-slot rotation (a query moved to pytest-only
    # keeps its physical-plan contract).
    df = QUERIES_ALL[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushed_to_parquet_scan(spark):
    plan = _plan(spark, "pricing_summary")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("LessThanOrEqual(l_shipdate" in p for p in pushed), plan[:2000]


def test_multiway_join_broadcasts_dims(spark):
    plan = _plan(spark, "join_multiway")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_relational_paths_stay_jvm_side(spark):
    for name in (
        "pricing_summary",
        "join_multiway",
        "window_running_sum",
        "events_sessionize",
        "dedup_exact",
        "text_stats",
        "lang_id",
        "asof_join",
        "rollup_revenue",
        "pivot_status",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, f"{name} fell back to Python"
        assert "ArrowEvalPython" not in plan, f"{name} fell back to Python"


def test_topk_avoids_global_sort(spark):
    plan = _plan(spark, "topk")
    assert "TakeOrderedAndProject" in plan


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "join_left")
    # The customer scan must read only the join key (+1 col), never
    # the full 8-column row.
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert len(cols) <= 3, cols


@pytest.mark.parametrize("name", ["media_byte_stats", "media_frame_sample"])
def test_media_kernels_are_arrow_batched(spark, name):
    # mapInPandas shows up as MapInPandas (Arrow), never the
    # row-pickling BatchEvalPython.
    plan = _plan(spark, name)
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_range_join_broadcasts_interval_table(spark):
    # Point-in-interval join: the band table must broadcast (nested
    # loop on the broadcast side), never a cartesian/sort-merge over
    # the fact table.
    plan = _plan(spark, "range_join_bands")
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("name", ["embedding_neardup", "ann_hyperplane_lsh"])
def test_similarity_kernels_are_arrow_batched(spark, name):
    # The block-matmul candidate kernels run as FlatMapGroupsInPandas
    # (Arrow applyInPandas), never row-pickling BatchEvalPython; the
    # exact re-score stays JVM-side (no other Python nodes).
    plan = _plan(spark, name)
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_ann_ivf_stays_jvm_and_prunes(spark):
    # Frozen-centroid IVF: pure expression arithmetic (no Python
    # anywhere), scan reads only (vec_id, embedding), top-k is
    # TakeOrderedAndProject — no global sort, no shuffle beyond it.
    from big_data_spark.queries import QUERIES_ALL

    df = QUERIES_ALL["ann_ivf"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",") if c) == {
        "vec_id",
        "embedding",
    }, m and m.group(1)


def test_quality_gopher_is_shuffle_free(spark):
    # The sorted-run fold counts bigram repetition inside one narrow
    # projection: no hash-partition exchange anywhere (the only
    # Exchange is the final orderBy's range partitioning) and no
    # Python.
    plan = _plan(spark, "quality_gopher")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan, plan[:2000]


def test_dedup_semantic_arrow_kernel_and_pruned_scan(spark):
    # Cell-blocked SemDeDup: the pair kernel is Arrow applyInPandas
    # (never row-pickling) and the exact re-score stays JVM-side.
    # (No ReadSchema assertion: the cell assignment is
    # lineage-truncated by design, so the executed plan reads the
    # checkpointed block, not the parquet scan.)
    plan = _plan(spark, "dedup_semantic")
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_pipeline_part1_groups_single_window_per_user(spark):
    # The derived log stream must not collapse to one partition: the
    # row_number window partitions by user_id, and the grouping runs
    # as hash aggregates, never a global (unpartitioned) window.
    plan = _plan(spark, "pipeline_part1_groups")
    assert "BatchEvalPython" not in plan
    assert re.search(r"Window.*user_id", plan), plan[:2000]


def test_temporal_join_is_one_union_window_not_range_join(spark):
    """The point-in-time join must compile to the as-of union+window
    shape: no BroadcastNestedLoopJoin / CartesianProduct (the range
    join would appear as one) and a Window over the key partition."""
    plan = _plan(spark, "temporal_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_sql_door_pushes_filters_like_dataframes(spark):
    """Raw spark.sql text gets the same Catalyst treatment: the
    mktsegment predicate reaches the customer parquet scan."""
    plan = _plan(spark, "sql_portable_revenue")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("EqualTo(c_mktsegment,BUILDING)" in p for p in pushed), plan[:3000]


def test_lm_perplexity_never_broadcasts_the_bigram_model(spark):
    """The bigram count table is billions of rows at scale — the plan
    must not carry a broadcast hint on it (the only broadcasts are
    the 1-row vocab scalar and whatever AQE proves small itself).
    Guarded structurally: no BatchEvalPython, and the explode feeding
    the model is present (JVM generate), i.e. the model is built
    in-plan, not collected."""
    plan = _plan(spark, "lm_perplexity")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate explode" in plan
