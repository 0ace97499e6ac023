"""Write-audit-publish (round 9): a staged batch is invisible until
its audit passes, publish is one atomic claim+commit of the EXACT
audited bytes, and failed audits abandon cleanly."""

from __future__ import annotations

import glob

import pytest

from big_data_spark.io.snapshot import (
    SnapshotConflict,
    abandon_staged,
    append_snapshot,
    publish_staged,
    read_snapshot,
    read_staged,
    stage_snapshot,
    vacuum_snapshots,
)
from big_data_spark.operators.dq import assert_suite, in_range, not_null


def _base(spark, t):
    append_snapshot(
        spark.range(100).selectExpr("id AS k", "cast(id as double) AS v"),
        t,
        snapshot_id=0,
    )


def test_wap_full_loop(spark, tmp_path):
    t = str(tmp_path / "wap")
    _base(spark, t)
    batch = spark.range(100, 150).selectExpr(
        "id AS k", "cast(id as double) AS v"
    )
    token = stage_snapshot(batch, t)
    # Invisible while staged.
    assert read_snapshot(spark, t).count() == 100
    staged = read_staged(spark, t, token)
    # The audit: dq suite over the staged frame.
    assert_suite(staged, [not_null("k"), in_range("v", 0.0, 1000.0)])
    audited_files = sorted(glob.glob(f"{t}/_staging/{token}/*.parquet"))
    sid = publish_staged(spark, t, token)
    assert sid == 1
    got = read_snapshot(spark, t)
    assert got.count() == 150
    # The published bytes ARE the audited bytes (renamed, not
    # rewritten): same file names under the generation dir.
    published = sorted(glob.glob(f"{t}/_data/s=1/*.parquet"))
    assert [p.split("/")[-1] for p in published] == [
        p.split("/")[-1] for p in audited_files
    ]
    # Token consumed.
    with pytest.raises(ValueError, match="no staged batch"):
        read_staged(spark, t, token)


def test_wap_failed_audit_abandons(spark, tmp_path):
    t = str(tmp_path / "wap_fail")
    _base(spark, t)
    bad = spark.createDataFrame([(200, None)], "k long, v double")
    token = stage_snapshot(bad, t)
    with pytest.raises(ValueError, match="not_null"):
        assert_suite(read_staged(spark, t, token), [not_null("v")])
    abandon_staged(spark, t, token)
    assert read_snapshot(spark, t).count() == 100
    with pytest.raises(ValueError, match="no staged batch"):
        publish_staged(spark, t, token)
    # Crash residue (never abandoned) falls to vacuum's staging TTL.
    token2 = stage_snapshot(bad, t)
    res = vacuum_snapshots(spark, t, keep_last=2, staging_ttl_hours=0.0)
    assert token2 in res["removed_staging"]


def test_wap_replace_mode_and_schema_gate(spark, tmp_path):
    t = str(tmp_path / "wap_rep")
    _base(spark, t)
    token = stage_snapshot(
        spark.range(5).selectExpr("id AS k", "cast(1.0 as double) AS v"), t
    )
    sid = publish_staged(spark, t, token, mode="replace")
    got = read_snapshot(spark, t)
    assert got.count() == 5
    assert read_snapshot(spark, t, as_of=0).count() == 100
    # Staging an incompatible batch fails BEFORE any audit work.
    with pytest.raises(ValueError, match="additive"):
        stage_snapshot(spark.range(3).selectExpr("id AS wrong"), t)
    with pytest.raises(ValueError, match="mode must be"):
        publish_staged(spark, t, "zzz", mode="merge")


def test_wap_publish_rebases_past_interloper(spark, tmp_path):
    t = str(tmp_path / "wap_race")
    _base(spark, t)
    token = stage_snapshot(
        spark.range(100, 120).selectExpr(
            "id AS k", "cast(id as double) AS v"
        ),
        t,
    )
    # An appender lands while the audit runs.
    append_snapshot(
        spark.range(500, 510).selectExpr(
            "id AS k", "cast(id as double) AS v"
        ),
        t,
        snapshot_id=1,
    )
    sid = publish_staged(spark, t, token)
    assert sid == 2
    assert read_snapshot(spark, t).count() == 130


def test_wap_publish_records_staged_layout(spark, tmp_path):
    """Code-review round 9: a hive-partitioned staged batch must
    commit its layout_by — otherwise DML range hints on the layout
    column crash the footer sweep (the column lives in dir names)
    and maintenance silently rewrites the table unpartitioned."""
    from big_data_spark.io.snapshot import delete_where, latest_manifest

    t = str(tmp_path / "wap_layout")
    token = stage_snapshot(
        spark.range(100).selectExpr(
            "id AS k", "cast(id % 4 as int) AS g"
        ),
        t,
        partition_by="g",
    )
    publish_staged(spark, t, token)
    man = latest_manifest(spark, t)
    assert man["layout_by"] == "g"
    # The crash case: a range hint on the layout column must be
    # skipped (dir-name column), not swept.
    st = delete_where(spark, t, "g >= 2 AND g <= 2")
    assert st["deleted_rows"] == 25
    assert read_snapshot(spark, t).count() == 75
    # A replace with an unpartitioned batch clears the layout.
    token = stage_snapshot(spark.range(5).selectExpr("id AS k", "cast(0 as int) AS g"), t)
    publish_staged(spark, t, token, mode="replace")
    assert latest_manifest(spark, t)["layout_by"] is None


def test_mixed_layout_append_refused(spark, tmp_path):
    """A single layout_by cannot represent a mixed-layout table:
    appending a batch partitioned on a DIFFERENT column than the
    declared layout is refused across every append path."""
    from big_data_spark.io.snapshot import append_with_retry

    t = str(tmp_path / "mixlay")
    base_expr = [
        "cast(id as int) AS k",
        "cast(id % 2 as int) AS h",
        "cast(id % 3 as int) AS g",
    ]
    token = stage_snapshot(
        spark.range(20).selectExpr(*base_expr), t, partition_by="h"
    )
    publish_staged(spark, t, token)
    bad = spark.range(20, 40).selectExpr(*base_expr)
    token = stage_snapshot(bad, t, partition_by="g")
    with pytest.raises(ValueError, match="mixed-layout"):
        publish_staged(spark, t, token)
    with pytest.raises(ValueError, match="mixed-layout"):
        append_with_retry(bad, t, partition_by="g")
    with pytest.raises(ValueError, match="mixed-layout"):
        append_snapshot(bad, t, partition_by="g")
    # Same-layout and unpartitioned appends still land.
    append_with_retry(bad, t, partition_by="h")
    assert read_snapshot(spark, t).count() == 40
