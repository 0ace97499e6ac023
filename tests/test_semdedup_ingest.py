"""Incremental semantic dedup: end-state parity with the batch
SemDeDup pass, append-only writes, replay idempotency, the pipeline
hook, and the streaming wrapper."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from big_data_spark.queries.llm import _emb, q_dedup_semantic
from big_data_spark.streaming.semdedup_ingest import (
    ingest_semdedup_batch,
    read_semdedup_prune,
    run_semdedup_ingest,
    semdedup_keep,
)
from tests.conftest import SF_SMOKE


def _vecs(spark):
    return _emb(spark, SF_SMOKE).select("vec_id", "embedding")


def _batch(vecs, b, nb=3):
    return vecs.filter(F.pmod(F.xxhash64("vec_id"), F.lit(nb)) == b)


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    vecs = _vecs(spark)
    idx = str(tmp_path_factory.mktemp("sd") / "index")
    counts = [
        ingest_semdedup_batch(_batch(vecs, b), idx, b) for b in range(3)
    ]
    return idx, vecs, counts


def test_end_state_matches_batch_semdedup(spark, ingested):
    idx, vecs, counts = ingested
    assert all(c["new_vectors"] > 0 for c in counts)
    got = sorted(map(tuple, read_semdedup_prune(spark, idx).collect()))
    exp = sorted(map(tuple, q_dedup_semantic(spark, SF_SMOKE).collect()))
    assert got == exp and got  # non-trivial prune list


def test_retroactive_prune_of_stored_vector(spark, ingested):
    """A later batch can carry a LOWER-id near-dup of an already
    stored vector — the stored one must then appear in the prune
    list (the keep-min-id rule is arrival-order independent)."""
    idx, vecs, _ = ingested
    pruned = {
        r["vec_id"] for r in read_semdedup_prune(spark, idx).collect()
    }
    # From the batch oracle semantics: every pruned vec has an
    # earlier-id neighbor; at least one pruned vec must have been
    # ingested BEFORE its pruning neighbor for this fixture split
    # (hash-interleaved ids), otherwise the split is degenerate.
    by_batch = {
        b: {
            r["vec_id"]
            for r in _batch(vecs, b).select("vec_id").collect()
        }
        for b in range(3)
    }
    batch_of = {v: b for b, vs in by_batch.items() for v in vs}
    exp_pairs = (
        q_dedup_semantic(spark, SF_SMOKE)
        .select("vec_id")
        .collect()
    )
    assert any(
        batch_of[r["vec_id"]] < 2 for r in exp_pairs
    ), "fixture must include a pruned vec from an early batch"
    assert pruned == {r["vec_id"] for r in exp_pairs}


def test_appends_only_and_replay(spark, tmp_path):
    vecs = _vecs(spark)
    idx = str(tmp_path / "index")
    for b in range(2):
        ingest_semdedup_batch(_batch(vecs, b, nb=2), idx, b)
    gen0 = sorted(
        (p, os.path.getsize(p))
        for p in glob.glob(f"{idx}/vectors/_data/s=0/*.parquet")
    )
    assert gen0
    end = sorted(map(tuple, read_semdedup_prune(spark, idx).collect()))
    # Batch 1 never rewrote batch 0's generation.
    assert gen0 == sorted(
        (p, os.path.getsize(p))
        for p in glob.glob(f"{idx}/vectors/_data/s=0/*.parquet")
    )
    # Replay of batch 1 and redelivery under a new id are no-ops.
    ingest_semdedup_batch(_batch(vecs, 1, nb=2), idx, 1)
    assert sorted(
        map(tuple, read_semdedup_prune(spark, idx).collect())
    ) == end
    counts = ingest_semdedup_batch(_batch(vecs, 0, nb=2), idx, 7)
    assert counts["new_vectors"] == 0


def test_pipeline_hook_matches_batch_stage(spark, ingested):
    """prepare_corpus fed the incremental index (semdedup_keep_df=)
    returns the batch pipeline's exact output (no margin-band pair
    exists at this sf — the smoke parity above pins that)."""
    from big_data_spark.pipeline.corpus import prepare_corpus

    idx, _, _ = ingested
    batch_surv, batch_rep = prepare_corpus(spark, SF_SMOKE)
    inc_surv, inc_rep = prepare_corpus(
        spark, SF_SMOKE, semdedup_keep_df=semdedup_keep(spark, idx)
    )
    assert sorted(map(tuple, inc_surv.collect())) == sorted(
        map(tuple, batch_surv.collect())
    )
    assert sorted(map(tuple, inc_rep.collect())) == sorted(
        map(tuple, batch_rep.collect())
    )


def test_streaming_wrapper(spark, tmp_path):
    vecs = _vecs(spark).limit(200)
    src = str(tmp_path / "src")
    vecs.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    idx = str(tmp_path / "index")
    run_semdedup_ingest(stream, idx, str(tmp_path / "ckpt"))
    kept = semdedup_keep(spark, idx)
    assert kept.count() == 200
