"""Multi-writer safety of the snapshot layer: a committer working
from a STALE manifest must surface SnapshotConflict (retryable), and
must never silently drop — or destroy the data of — a commit that
landed in its read->commit window (round-7 ADVICE high: lost-update
race in _rewrite_where / compact_snapshot / binpack_snapshot)."""

from __future__ import annotations

import pytest

import big_data_spark.io.snapshot as snap
from big_data_spark.io.snapshot import (
    SnapshotConflict,
    append_snapshot,
    read_manifest,
    read_snapshot,
)


def _two_commits(spark, t):
    """Snapshot 0, then an 'interloper' snapshot 1; returns the STALE
    manifest (v0) a slow writer would still be holding."""
    append_snapshot(
        spark.range(0, 100).selectExpr("id AS k", "cast(id as string) AS v"),
        t,
        snapshot_id=0,
    )
    man0 = read_manifest(spark, t, 0)
    append_snapshot(
        spark.range(100, 200).selectExpr("id AS k", "cast(id as string) AS v"),
        t,
        snapshot_id=1,
    )
    return man0


def test_delete_where_stale_manifest_conflicts(spark, tmp_path, monkeypatch):
    """DELETE computed over a stale manifest collides on the id the
    interloper took (next_id = stale manifest id + 1) instead of
    carrying forward only the stale entries — and the interloper's
    generation data survives untouched (fail-fast claim check runs
    BEFORE clear_generation)."""
    t = str(tmp_path / "race_del")
    man0 = _two_commits(spark, t)
    monkeypatch.setattr(snap, "latest_manifest", lambda *a, **k: man0)
    with pytest.raises(SnapshotConflict):
        snap.delete_where(spark, t, "k >= 0")
    monkeypatch.undo()
    # Both commits intact: nothing lost, nothing deleted.
    assert read_snapshot(spark, t).count() == 200
    assert read_manifest(spark, t, 1)["entries"]


def test_compact_snapshot_stale_manifest_conflicts(
    spark, tmp_path, monkeypatch
):
    from big_data_spark.io.compact import compact_snapshot

    t = str(tmp_path / "race_compact")
    man0 = _two_commits(spark, t)
    monkeypatch.setattr(snap, "latest_manifest", lambda *a, **k: man0)
    with pytest.raises(SnapshotConflict):
        compact_snapshot(spark, t)
    monkeypatch.undo()
    assert read_snapshot(spark, t).count() == 200


def test_binpack_snapshot_stale_manifest_conflicts(
    spark, tmp_path, monkeypatch
):
    from big_data_spark.io.compact import binpack_snapshot

    t = str(tmp_path / "race_binpack")
    man0 = _two_commits(spark, t)
    # Give the stale manifest two small generations so the fold
    # actually proceeds to the id claim.
    append_snapshot(
        spark.range(200, 300).selectExpr("id AS k", "cast(id as string) AS v"),
        t,
        snapshot_id=2,
    )
    man1 = read_manifest(spark, t, 1)
    monkeypatch.setattr(snap, "latest_manifest", lambda *a, **k: man1)
    with pytest.raises(SnapshotConflict):
        binpack_snapshot(spark, t, small_bytes=1 << 30)
    monkeypatch.undo()
    assert read_snapshot(spark, t).count() == 300


def test_compact_reads_as_of_its_own_manifest(spark, tmp_path):
    """compact_snapshot folds exactly the version its manifest names:
    inventory, data and next_id all come from ONE manifest, so the
    committed fold equals that version's content."""
    from big_data_spark.io.compact import compact_snapshot

    t = str(tmp_path / "compact_pin")
    _two_commits(spark, t)
    st = compact_snapshot(spark, t)
    assert st["snapshot_id"] == 2
    assert read_snapshot(spark, t, as_of=2).count() == 200
