"""Round-11 advice + hardening regressions: read_staged's explicit
declared schema (numeric-looking string partition keys survive), the
streaming WAP gate auditing disk bytes (staging cleaned up either
way), stream_changes tolerating a not-yet-created producer table plus
the max_idle_s escape hatch and per-batch metrics, the loud
mor+row_cdf refusal, and the atomic local-FS tag replace (no
missing-tag window)."""

from __future__ import annotations

import json
import threading

import pytest
from pyspark.sql import functions as F

from big_data_spark.io.snapshot import (
    delete_where,
    list_tags,
    publish_staged,
    read_manifest,
    read_snapshot,
    read_staged,
    stage_snapshot,
    tag_snapshot,
    write_snapshot,
    write_snapshot_partial,
)
from big_data_spark.streaming.changes_stream import stream_changes


def test_read_staged_keeps_numeric_looking_string_partition_keys(
    spark, tmp_path
):
    """'00123' staged on a string partition column must audit as
    '00123' — inference-then-cast-back yielded '123', diverging from
    the raw dir value publish keys the manifest on (round-10
    advice)."""
    t = str(tmp_path / "numkeys")
    base = spark.createDataFrame(
        [("00123", 1), ("1e5", 2)], "part string, v int"
    )
    write_snapshot_partial(
        base, t, 0, "part", touched_keys=["00123", "1e5"]
    )
    token = stage_snapshot(
        spark.createDataFrame([("00123", 3)], "part string, v int"), t
    )
    audited = read_staged(spark, t, token)
    assert audited.schema["part"].dataType.simpleString() == "string"
    assert [r["part"] for r in audited.collect()] == ["00123"]
    publish_staged(spark, t, token, mode="append")
    man = read_manifest(spark, t, 1)
    # The audited value IS the published manifest key.
    assert "00123" in man["entries"]
    # Partitioned WAP append REPLACES the touched partition ('00123'
    # now holds exactly the staged batch) and carries '1e5' forward —
    # and both keys read back VERBATIM (no inference mangling).
    got = read_snapshot(spark, t)
    assert sorted(
        (r["part"], r["v"]) for r in got.collect()
    ) == [("00123", 3), ("1e5", 2)]
    assert [
        r["v"] for r in got.where("part = '00123'").collect()
    ] == [3]


def test_snapshot_sink_checks_stage_to_disk_and_clean_up(
    spark, tmp_path
):
    """The audited stream commits the STAGED bytes' read-back and
    removes staging afterwards — pass and fail both leave no staging
    residue, and a failing audit lands nothing."""
    from big_data_spark.operators.dq import in_range, not_null
    from big_data_spark.streaming.snapshot_sink import snapshot_sink

    src = str(tmp_path / "src")
    spark.range(10).selectExpr("id AS k", "id * 2 AS v").write.json(src)
    stream = spark.readStream.schema("k long, v long").json(src)
    t = str(tmp_path / "sunk")
    snapshot_sink(
        stream,
        t,
        str(tmp_path / "ckpt"),
        checks=[not_null("k")],
    )
    assert read_snapshot(spark, t).count() == 10
    import os

    residue = os.listdir(f"{t}/_staging") if os.path.isdir(
        f"{t}/_staging"
    ) else []
    assert residue == []

    # Failing audit: loud stop, nothing landed, staging removed.
    t2 = str(tmp_path / "sunk_bad")
    with pytest.raises(Exception, match="in_range"):
        snapshot_sink(
            stream,
            t2,
            str(tmp_path / "ckpt2"),
            checks=[in_range("v", 0, 5)],
        )
    assert not os.path.isdir(f"{t2}/_manifests")
    residue2 = os.listdir(f"{t2}/_staging") if os.path.isdir(
        f"{t2}/_staging"
    ) else []
    assert residue2 == []


def test_stream_changes_tolerates_missing_table_and_idles_out(
    spark, tmp_path
):
    """Poll mode on a table with no commits yet sleeps instead of
    crashing (round-10 advice) and max_idle_s bounds the wait."""
    t = str(tmp_path / "never_created")
    seen = []
    st = stream_changes(
        spark,
        t,
        str(tmp_path / "cur"),
        lambda df, eid: seen.append(eid),
        available_now=False,
        poll_interval_s=0.05,
        max_idle_s=0.3,
    )
    assert st["stopped"] == "idle"
    assert st["batches"] == 0 and seen == []
    # Drain mode on the same missing table: nothing to drain, no raise.
    st2 = stream_changes(
        spark, t, str(tmp_path / "cur2"), lambda df, eid: None
    )
    assert st2["stopped"] == "drained" and st2["batches"] == 0


def test_stream_changes_batch_metrics_shape(spark, tmp_path):
    t = str(tmp_path / "metered")
    write_snapshot(spark.range(5).selectExpr("id AS k"), t)
    st = stream_changes(
        spark,
        t,
        str(tmp_path / "cur"),
        lambda df, eid: None,
        track_rows=True,
    )
    assert st["stopped"] == "drained" and st["batches"] == 1
    (m,) = st["batch_metrics"]
    assert m == {"epoch_id": 0, "after_id": -1, "rows": 5}


def test_delete_where_mor_refuses_row_cdf(spark, tmp_path):
    t = str(tmp_path / "morcdf")
    write_snapshot(spark.range(5).selectExpr("id AS k"), t)
    with pytest.raises(ValueError, match="row_cdf.*cow-only"):
        delete_where(spark, t, "k = 1", mode="mor", row_cdf=True)


def test_tag_replace_never_exposes_missing_tag_on_local_fs(
    spark, tmp_path
):
    """replace=True is one atomic overwrite-rename on local FS: a
    reader polling the tag while a mover loops replace-tags must
    never observe not-found, and the pin must stay readable (crc
    sidecar consistent) after every move."""
    t = str(tmp_path / "tagswap")
    write_snapshot(spark.range(3).selectExpr("id AS k"), t, snapshot_id=0)
    write_snapshot(spark.range(4).selectExpr("id AS k"), t, snapshot_id=1)
    tag_snapshot(spark, t, "release", snapshot_id=0)

    stop = threading.Event()
    errors: list[str] = []

    def mover():
        flip = 0
        while not stop.is_set():
            try:
                tag_snapshot(
                    spark, t, "release", snapshot_id=flip % 2, replace=True
                )
            except Exception as exc:  # pragma: no cover - fail loudly
                errors.append(f"mover: {exc}")
                return
            flip += 1

    th = threading.Thread(target=mover)
    th.start()
    try:
        path = f"{t}/_tags/release.json"
        for _ in range(200):
            # Raw filesystem probe: the window the delete-then-rename
            # path exposed was the file being absent between ops.
            with open(path, "rb") as fh:
                body = json.loads(fh.read())
            assert body["tag"] == "release"
            assert body["snapshot_id"] in (0, 1)
    except FileNotFoundError:
        errors.append("reader: tag file vanished mid-replace")
    finally:
        stop.set()
        th.join()
    assert errors == []
    # The pin still reads through the checksummed Hadoop FS (no stale
    # .crc sidecar) and resolves a real snapshot.
    sid = list_tags(spark, t)["release"]
    assert read_snapshot(spark, t, tag="release").count() in (3, 4)
    assert sid in (0, 1)
