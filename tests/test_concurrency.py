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


def test_append_with_retry_two_writer_interleave(
    spark, tmp_path, monkeypatch
):
    """Two appenders race one table: the loser's commit collides,
    rebases onto the winner's manifest, and BOTH generations land
    with correct lineage — data written once each, retry costs a
    rename."""
    from big_data_spark.io.snapshot import append_with_retry

    t = str(tmp_path / "retry_race")
    append_snapshot(
        spark.range(0, 50).selectExpr("id AS k"), t, snapshot_id=0
    )
    orig = snap.commit_manifest
    state = {"fired": False}

    def hook(spark_, table_dir, sid, entries, **kw):
        # First commit attempt: a METADATA committer (fold_deletes'
        # inert clear, an evolve commit) lands the SAME id first.
        if not state["fired"]:
            state["fired"] = True
            man0 = read_manifest(spark, t, 0)
            orig(
                spark,
                table_dir,
                sid,
                dict(man0["entries"]),
                schema_fields=man0.get("schema"),
                maintenance=True,
            )
        return orig(spark_, table_dir, sid, entries, **kw)

    monkeypatch.setattr(snap, "commit_manifest", hook)
    sid = append_with_retry(
        spark.range(100, 150).selectExpr("id AS k"), t
    )
    monkeypatch.undo()
    assert sid == 2  # rebased past the interloper's 1
    got = read_snapshot(spark, t)
    assert got.count() == 100  # 50 + 50: nothing lost
    man2 = read_manifest(spark, t, 2)
    # Lineage: the final manifest carries the base generation AND
    # the retried append (renamed into s=2 after losing s=1's
    # manifest race and renaming back).
    assert set(man2["entries"].values()) == {
        "_data/s=0",
        "_data/s=2",
    }
    import glob
    import os

    # No staging residue, and no half-claimed s=1 data dir.
    assert glob.glob(f"{t}/_staging/*") == []
    assert not os.path.exists(f"{t}/_data/s=1")


def test_append_with_retry_two_real_writers_in_threads(spark, tmp_path):
    """Two genuinely concurrent append_with_retry writers: both land,
    each exactly once, whatever the interleaving."""
    import threading

    from big_data_spark.io.snapshot import append_with_retry

    t = str(tmp_path / "retry_threads")
    append_snapshot(
        spark.range(0, 10).selectExpr("id AS k"), t, snapshot_id=0
    )
    results, errors = {}, []

    def writer(tag, lo, hi):
        try:
            results[tag] = append_with_retry(
                spark.range(lo, hi).selectExpr("id AS k"),
                t,
                attempts=10,
            )
        except Exception as exc:  # noqa: BLE001 — surface in assert
            errors.append((tag, exc))

    threads = [
        threading.Thread(target=writer, args=("a", 100, 150)),
        threading.Thread(target=writer, args=("b", 200, 280)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert sorted(results.values()) == [1, 2]
    got = read_snapshot(spark, t)
    assert got.count() == 10 + 50 + 80
    assert got.where("k >= 100 AND k < 150").count() == 50
    assert got.where("k >= 200 AND k < 280").count() == 80


def test_append_with_retry_exhausts_on_orphan_dir(spark, tmp_path):
    """A crash orphan squatting on the next id blocks the dir claim;
    the helper raises after its budget with the dir named, and the
    staged data survives for a later retry."""
    import glob
    import os

    from big_data_spark.io.snapshot import append_with_retry

    t = str(tmp_path / "retry_orphan")
    append_snapshot(
        spark.range(0, 10).selectExpr("id AS k"), t, snapshot_id=0
    )
    os.makedirs(f"{t}/_data/s=1")
    with open(f"{t}/_data/s=1/part-orphan.parquet", "w") as f:
        f.write("x")
    with pytest.raises(SnapshotConflict, match="s=1"):
        append_with_retry(
            spark.range(10, 20).selectExpr("id AS k"), t, attempts=2
        )
    assert len(glob.glob(f"{t}/_staging/*")) == 1
    assert read_snapshot(spark, t).count() == 10


def test_vacuum_reclaims_stale_staging_only(spark, tmp_path):
    from big_data_spark.io.snapshot import vacuum_snapshots

    t = str(tmp_path / "staging_vac")
    _two_commits(spark, t)
    import os

    os.makedirs(f"{t}/_staging/deadbeef")
    rep = vacuum_snapshots(spark, t, keep_last=2)
    assert rep["removed_staging"] == []  # fresh: protected by TTL
    rep = vacuum_snapshots(spark, t, keep_last=2, staging_ttl_hours=0)
    assert rep["removed_staging"] == ["deadbeef"]
