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


def test_optional_perplexity_and_near_dedup_stages(spark):
    """With both optional gates on, the funnel renumbers itself, the
    perplexity stage drops the statistical outliers the heuristics
    keep, and near-dedup removes every non-canonical member of each
    LSH/Jaccard cluster while keeping the minimum doc_id."""
    from big_data_spark.operators.components import connected_components
    from big_data_spark.queries.llm import minhash_lsh_pairs

    survivors, report = prepare_corpus(
        spark, SF_SMOKE, max_ppl=2000.0, near_dedup=True
    )
    r = _report_dict(report)
    order = [
        "0_input",
        "1_quality",
        "2_gopher",
        "3_perplexity",
        "4_exact_dedup",
        "5_near_dedup",
        "6_semantic_dedup",
        "7_mixed",
    ]
    vals = [r[k] for k in order]
    assert vals[0] == 500
    assert all(a >= b for a, b in zip(vals, vals[1:])), vals
    assert r["5_near_dedup"] < r["4_exact_dedup"], "near-dup must drop"
    # No surviving pair is a near-dup of another survivor: the pair
    # set over survivors' texts must be empty.
    surv_docs = survivors.select(
        "doc_id", F.col("text")
    )
    left = minhash_lsh_pairs(surv_docs).count()
    assert left == 0


def test_prepare_corpus_chunked_output(spark):
    """chunk_tokens= explodes survivors into sliding windows (the
    pre-packing splitter): every chunk fits the budget, short docs
    stay whole, adjacent chunks of a doc overlap by chunk_overlap
    tokens, and the doc set matches the unchunked run exactly."""
    from big_data_spark.pipeline.corpus import prepare_corpus

    sf = "/root/testdata/sf0.001"
    plain, _ = prepare_corpus(spark, sf)
    chunked, _ = prepare_corpus(spark, sf, chunk_tokens=32, chunk_overlap=8)
    rows = chunked.collect()
    assert all(r["n_tokens"] <= 32 for r in rows)
    plain_rows = {r["doc_id"]: r for r in plain.collect()}
    assert {r["doc_id"] for r in rows} == set(plain_rows)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        toks = plain_rows[doc_id]["text"].split(" ")
        if len(toks) <= 32:
            assert len(chunks) == 1
            assert chunks[0]["text"] == plain_rows[doc_id]["text"]
            continue
        # Window i covers toks[i*24 : i*24+32]: adjacent windows
        # share 8 tokens; the union in order reproduces the doc.
        for i, c in enumerate(chunks):
            assert c["text"].split(" ") == toks[i * 24 : i * 24 + 32]
