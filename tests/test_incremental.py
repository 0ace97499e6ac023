"""Incremental dedup: always equals the plain anti-join; the Bloom
filter only decides which rows PAY for the join."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_spark.io.readers import read_table
from big_data_spark.operators.incremental import incremental_dedup, seen_filter
from tests.conftest import SF_SMOKE


def _keyed_docs(spark):
    return read_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.md5("text").alias("text_hash")
    )


def test_equals_plain_anti_join(spark):
    docs = _keyed_docs(spark)
    corpus = docs.filter("doc_id < 300")
    batch = docs.filter("doc_id >= 200")  # 100 rows overlap
    bloom = seen_filter(corpus.select("text_hash"), "text_hash", m=4096, k=3)
    got = incremental_dedup(
        batch, corpus.select("text_hash"), "text_hash", bloom, m=4096, k=3
    )
    want = batch.join(corpus.select("text_hash"), "text_hash", "left_anti")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_exact_even_with_saturated_filter(spark):
    # m=64 saturates: almost everything becomes a suspect — the
    # exact join must still produce the anti-join answer.
    docs = _keyed_docs(spark)
    corpus = docs.filter("doc_id < 300")
    batch = docs.filter("doc_id >= 200")
    bloom = seen_filter(corpus.select("text_hash"), "text_hash", m=64, k=2)
    got = incremental_dedup(
        batch, corpus.select("text_hash"), "text_hash", bloom, m=64, k=2
    )
    want = batch.join(corpus.select("text_hash"), "text_hash", "left_anti")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_null_keys_admitted_and_batch_dups_preserved(spark):
    corpus = spark.createDataFrame([("k1",)], "h string")
    batch = spark.createDataFrame(
        [(1, "k1"), (2, "k2"), (3, "k2"), (4, None)], "id bigint, h string"
    )
    bloom = seen_filter(corpus, "h", m=256, k=2)
    got = incremental_dedup(batch, corpus, "h", bloom, m=256, k=2)
    rows = sorted((r.id, r.h) for r in got.collect())
    # k1 dropped (seen); both k2 rows kept (within-batch dup is not
    # this operator's job); NULL admitted.
    assert rows == [(2, "k2"), (3, "k2"), (4, None)]


def test_filter_probe_broadcasts(spark):
    docs = _keyed_docs(spark)
    corpus = docs.filter("doc_id < 300")
    batch = docs.filter("doc_id >= 200")
    bloom = seen_filter(corpus.select("text_hash"), "text_hash", m=4096, k=3)
    plan = (
        incremental_dedup(
            batch, corpus.select("text_hash"), "text_hash", bloom, m=4096, k=3
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
