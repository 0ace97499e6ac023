"""Streaming CDC mirror: multi-batch fold equals the global fold,
replays are no-ops, stale updates cannot resurrect deleted keys, and
rewrites touch only the changed buckets."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from pyspark.sql import functions as F

from big_data_spark.operators.cdc import latest_changes
from big_data_spark.streaming.cdc_mirror import (
    purge_tombstones,
    read_mirror,
    run_cdc_mirror,
)

SCHEMA = "k bigint, name string, v double, seq bigint, idx bigint, op string"


def _stream(spark, path):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _run(spark, tmp_path, rows, tag, n_files=1, mirror="mirror"):
    src = str(tmp_path / f"src_{tag}")
    spark.createDataFrame(rows, SCHEMA).repartition(n_files).write.parquet(src)
    run_cdc_mirror(
        _stream(spark, src),
        ["k"],
        "seq",
        "idx",
        str(tmp_path / mirror),
        str(tmp_path / f"ckpt_{tag}"),
        n_buckets=4,
    )
    return str(tmp_path / mirror)


def _expected(spark, rows):
    """Global (batch-free) fold of the same feed."""
    feed = spark.createDataFrame(rows, SCHEMA)
    win = latest_changes(feed, ["k"], "seq", "idx")
    return {
        tuple(r)
        for r in win.filter(F.col("op") != "D").drop("op").collect()
    }


def _mirror_rows(spark, mirror_dir):
    return {tuple(r) for r in read_mirror(spark, mirror_dir).collect()}


FEED = [
    (1, "a1", 1.0, 10, 0, "U"),
    (1, "a2", 2.0, 20, 0, "U"),
    (2, "b1", 1.0, 10, 0, "U"),
    (2, "b1", 1.0, 30, 0, "D"),
    (3, "c1", 3.0, 10, 0, "U"),
    (4, "d1", 4.0, 10, 0, "U"),
    (4, "d2", 5.0, 20, 0, "U"),
    (5, "never", 0.0, 10, 0, "D"),  # delete for a never-seen key
]


def test_multi_batch_fold_equals_global_fold(spark, tmp_path):
    mirror = _run(spark, tmp_path, FEED, "main", n_files=4)
    assert _mirror_rows(spark, mirror) == _expected(spark, FEED)


def test_replay_with_fresh_checkpoint_is_noop(spark, tmp_path):
    mirror = _run(spark, tmp_path, FEED, "one", n_files=3)
    before = _mirror_rows(spark, mirror)
    # Same feed again, fresh checkpoint: every change is now stale or
    # equal -> the monotone guard rejects everything.
    _run(spark, tmp_path, FEED, "two", n_files=3)
    assert _mirror_rows(spark, mirror) == before


def test_stale_update_cannot_resurrect_deleted_key(spark, tmp_path):
    mirror = _run(
        spark, tmp_path, [(7, "x", 1.0, 50, 0, "D")], "del"
    )
    # A stale update (seq 20 < delete's 50) delivered later:
    _run(spark, tmp_path, [(7, "xx", 9.0, 20, 0, "U")], "stale")
    assert not any(
        r[0] == 7 for r in _mirror_rows(spark, mirror)
    ), "tombstone must reject the stale update"
    # A genuinely newer update DOES revive the key.
    _run(spark, tmp_path, [(7, "x3", 3.0, 60, 0, "U")], "newer")
    assert (7, "x3", 3.0, 60, 0) in _mirror_rows(spark, mirror)


def test_purge_tombstones_respects_watermark(spark, tmp_path):
    from big_data_spark.io.snapshot import read_snapshot

    mirror = _run(
        spark,
        tmp_path,
        [(1, "a", 1.0, 10, 0, "U"), (2, "b", 2.0, 40, 0, "D")],
        "purge",
    )

    def n_tombstones():
        return (
            read_snapshot(spark, mirror).filter(F.col("_deleted")).count()
        )

    assert n_tombstones() == 1
    purge_tombstones(spark, mirror, "seq", 40)  # watermark == seq: keep
    assert n_tombstones() == 1
    purge_tombstones(spark, mirror, "seq", 41)  # older than 41: purge
    assert n_tombstones() == 0
    # Live rows untouched either way.
    assert _mirror_rows(spark, mirror) == {(1, "a", 1.0, 10, 0)}


def test_only_touched_buckets_rewritten(spark, tmp_path):
    from big_data_spark.io.snapshot import latest_manifest

    mirror = _run(spark, tmp_path, FEED, "base", n_files=1)
    before = latest_manifest(spark, mirror)["entries"]
    files_before = set(glob.glob(f"{mirror}/_data/s=*/_kb=*/*.parquet"))
    # One new change for one key -> exactly one bucket's manifest
    # entry moves to the new generation; untouched buckets carry
    # forward BY REFERENCE (their data files are not rewritten).
    _run(spark, tmp_path, [(1, "a3", 9.0, 99, 0, "U")], "delta")
    after = latest_manifest(spark, mirror)["entries"]
    moved = {k for k in before if after.get(k) != before[k]}
    assert len(moved) == 1, f"expected 1 moved bucket, got {sorted(moved)}"
    assert files_before <= set(
        glob.glob(f"{mirror}/_data/s=*/_kb=*/*.parquet")
    ), "untouched generations must not be rewritten"
    assert (1, "a3", 9.0, 99, 0) in _mirror_rows(spark, mirror)


def test_dq_gate_halts_bad_batch_and_checkpoint_retries(spark, tmp_path):
    """A batch failing its dq checks raises, nothing lands, and a
    restart with a FIXED feed (same checkpoint) processes cleanly."""
    from big_data_spark.operators import dq

    checks = [dq.in_range("v", lo=0.0)]
    src = str(tmp_path / "src_bad")
    bad = spark.createDataFrame(
        [(1, "x", -5.0, 1, 0, "U")], SCHEMA
    )
    bad.write.parquet(src)
    mirror = str(tmp_path / "mirror_dq")
    ckpt = str(tmp_path / "ckpt_dq")
    with pytest.raises(Exception, match="data-quality gate failed"):
        run_cdc_mirror(
            _stream(spark, src), ["k"], "seq", "idx", mirror, ckpt,
            n_buckets=4, checks=checks,
        )
    # Nothing from the bad batch landed: every committed snapshot (an
    # empty batch-0 may commit an entries-less manifest) holds no data.
    from big_data_spark.io.snapshot import read_manifest, snapshot_ids

    for sid in snapshot_ids(spark, mirror):
        assert read_manifest(spark, mirror, sid)["entries"] == {}
    # Fix the feed in place; SAME checkpoint reprocesses the batch.
    good = spark.createDataFrame([(1, "x", 5.0, 1, 0, "U")], SCHEMA)
    shutil.rmtree(src)
    good.write.parquet(src)
    run_cdc_mirror(
        _stream(spark, src), ["k"], "seq", "idx", mirror, ckpt,
        n_buckets=4, checks=checks,
    )
    assert {tuple(r) for r in read_mirror(spark, mirror).collect()} == {
        (1, "x", 5.0, 1, 0)
    }


# ------------------------------------------------------ scd2 mirror


def _run_scd2(spark, tmp_path, rows, tag, n_files=1, mirror="scd2m"):
    from big_data_spark.streaming.cdc_mirror import run_scd2_mirror

    import glob
    import time

    src = str(tmp_path / f"s2src_{tag}")
    os.makedirs(src, exist_ok=True)
    step = max(1, -(-len(rows) // n_files))
    for i in range(0, len(rows), step):
        part = str(tmp_path / f"s2part_{tag}_{i}")
        spark.createDataFrame(rows[i : i + step], SCHEMA).coalesce(
            1
        ).write.parquet(part)
        (pq,) = glob.glob(f"{part}/*.parquet")
        shutil.copy(pq, f"{src}/{i:04d}.parquet")
        now = time.time() + i
        os.utime(f"{src}/{i:04d}.parquet", (now, now))
    run_scd2_mirror(
        _stream(spark, src),
        ["k"],
        "seq",
        "idx",
        str(tmp_path / mirror),
        str(tmp_path / f"s2ckpt_{tag}"),
        n_buckets=4,
    )
    return str(tmp_path / mirror)


SCD2_FEED = [
    (1, "a1", 1.0, 10, 0, "U"),
    (1, "a2", 2.0, 20, 0, "U"),
    (2, "b1", 1.0, 10, 0, "U"),
    (2, "b1", 1.0, 30, 0, "D"),
    (3, "c1", 3.0, 15, 0, "U"),
]


def test_scd2_mirror_matches_batch_fold(spark, tmp_path):
    from big_data_spark.operators.cdc import scd2_apply
    from big_data_spark.streaming.cdc_mirror import read_scd2_mirror

    mirror = _run_scd2(spark, tmp_path, SCD2_FEED, "main", n_files=3)
    got = {
        tuple(r)
        for r in read_scd2_mirror(spark, mirror, current_only=False)
        .select(
            "k", "name", "v",
            "valid_from_seq", "valid_to_seq", "is_current",
        )
        .collect()
    }
    want_df = scd2_apply(
        None,
        spark.createDataFrame(SCD2_FEED, SCHEMA),
        ["k"],
        "seq",
        "idx",
    )
    want = {
        tuple(r)
        for r in want_df.select(
            "k", "name", "v",
            "valid_from_seq", "valid_to_seq", "is_current",
        ).collect()
    }
    assert got == want
    current = {
        (r.k, r.name)
        for r in read_scd2_mirror(spark, mirror).collect()
    }
    assert current == {(1, "a2"), (3, "c1")}


def test_scd2_mirror_replay_is_noop(spark, tmp_path):
    from big_data_spark.streaming.cdc_mirror import read_scd2_mirror

    mirror = _run_scd2(spark, tmp_path, SCD2_FEED, "r1", n_files=2)
    before = {
        tuple(r)
        for r in read_scd2_mirror(spark, mirror, current_only=False).collect()
    }
    _run_scd2(spark, tmp_path, SCD2_FEED, "r2", n_files=2, mirror="scd2m")
    after = {
        tuple(r)
        for r in read_scd2_mirror(spark, mirror, current_only=False).collect()
    }
    assert after == before


def test_mor_delete_on_mirror_survives_next_batch(spark, tmp_path):
    """Round-10 model-walk class: a merge-on-read DELETE issued
    directly on the mirror table must stay deleted through the next
    mirror batch — the batch's base read honors the manifest's masks,
    and the partial write carries the vectors for untouched buckets."""
    from big_data_spark.io.snapshot import delete_where

    rows1 = [
        (k, f"n{k}", float(k), 1, 1, "I") for k in range(8)
    ]
    mirror = _run(spark, tmp_path, rows1, "m1", mirror="mor_mirror")
    st = delete_where(spark, mirror, "k = 3", mode="mor")
    assert st["deleted_rows"] == 1
    got = {r["k"] for r in read_mirror(spark, mirror).collect()}
    assert 3 not in got
    # Next batch updates a key in the SAME bucket as the deleted one
    # (the rewrite path that would resurrect it from an unmasked base
    # read) — found by hashing, not assumed.
    bucket_of = {
        r["k"]: r["b"]
        for r in spark.range(8)
        .selectExpr(
            "id AS k",
            "cast(pmod(xxhash64(id), 4) as int) AS b",
        )
        .collect()
    }
    same = next(
        (k for k in range(8) if k != 3 and bucket_of[k] == bucket_of[3]),
        5,  # no bucket-mate: the carried-bucket mask path is checked
    )
    rows2 = [(same, "upd", 55.0, 2, 1, "U")]
    src = str(tmp_path / "src_m2")
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.parquet(src)
    run_cdc_mirror(
        _stream(spark, src),
        ["k"],
        "seq",
        "idx",
        mirror,
        str(tmp_path / "ckpt_m2"),
        n_buckets=4,
    )
    final = {r["k"]: r["v"] for r in read_mirror(spark, mirror).collect()}
    assert 3 not in final
    assert final[same] == 55.0 and len(final) == 7
