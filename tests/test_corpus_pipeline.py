"""End-to-end corpus preparation: stage monotonicity, dedup
invariants, deterministic reruns, and the partitioned write."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from big_data_spark.pipeline.corpus import prepare_corpus
from tests.conftest import SF_SMOKE


def _report_dict(report):
    return {r.stage: r.n_docs for r in report.collect()}


def test_funnel_is_monotone_and_plausible(spark):
    survivors, report = prepare_corpus(spark, SF_SMOKE)
    r = _report_dict(report)
    order = [
        "0_input",
        "1_quality",
        "2_gopher",
        "3_exact_dedup",
        "4_semantic_dedup",
        "5_mixed",
    ]
    vals = [r[k] for k in order]
    assert vals[0] == 500
    assert all(a >= b for a, b in zip(vals, vals[1:])), r
    assert vals[-1] > 0
    assert survivors.count() == r["5_mixed"]


def test_survivors_are_unique_and_redacted(spark):
    survivors, _ = prepare_corpus(spark, SF_SMOKE)
    got = survivors.collect()
    # exact dedup held: no two survivors share a text hash
    hashes = [r.text for r in got]
    assert len(set(hashes)) == len(hashes)
    # schema contract
    assert set(survivors.columns) == {
        "doc_id",
        "lang",
        "source",
        "text",
        "n_tokens",
    }
    # every survivor passed the length cut
    assert min(r.n_tokens for r in got) >= 20


def test_rerun_is_deterministic(spark):
    a, _ = prepare_corpus(spark, SF_SMOKE)
    b, _ = prepare_corpus(spark, SF_SMOKE)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_partitioned_write(spark, tmp_path):
    out = str(tmp_path / "corpus")
    survivors, _ = prepare_corpus(spark, SF_SMOKE, out_dir=out)
    assert glob.glob(f"{out}/lang=*/")
    back = spark.read.parquet(out)
    assert back.count() == survivors.count()
    # lang survives the partitioning round trip
    assert (
        back.select(F.countDistinct("lang")).collect()[0][0]
        == survivors.select(F.countDistinct("lang")).collect()[0][0]
    )
