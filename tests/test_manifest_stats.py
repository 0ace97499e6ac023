"""Manifest-embedded per-file column stats (round-11 directive #2):
commits record per-file min/max for the table's leading numeric
columns; pruned reads on a stats-bearing table are METADATA-ONLY
(zero footer opens, zero file listings), identical in result to the
footer-sweep path, which survives as the fallback for stat-less
legacy generations. Covered generations carry as pure metadata —
only new generations are swept, once, at commit time."""

from __future__ import annotations

import pytest

import big_data_spark.io.snapshot as snap
import big_data_spark.io.stats as stats_mod
from big_data_spark.io.snapshot import (
    append_snapshot,
    delete_where,
    evolve_schema,
    latest_manifest,
    read_entries,
    read_snapshot,
    rollback_snapshot,
    write_snapshot,
    write_snapshot_partial,
)


def _mk(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "id * 2 AS v", "cast(id as string) AS s"
    )


def _no_footer_sweep(monkeypatch):
    """Any footer sweep under the patch is a test failure."""

    def boom(*a, **k):  # pragma: no cover - the assertion itself
        raise AssertionError("footer sweep ran on a stats-bearing table")

    monkeypatch.setattr(stats_mod, "prune_files_multi", boom)


def test_commit_records_default_numeric_stats(spark, tmp_path):
    t = str(tmp_path / "rec")
    write_snapshot(_mk(spark, 0, 100).repartition(4), t)
    man = latest_manifest(spark, t)
    st = man["stats"]
    # round 11 typed skipping: string columns are stat-worthy too,
    # and fresh tables stamp the v2 canonical-form marker.
    assert st["columns"] == ["k", "v", "s"]
    assert st["v"] == 2
    (gen_files,) = st["gens"].values()
    assert len(gen_files) >= 1
    mins = [float(pc["k"][0]) for pc in gen_files.values()]
    maxs = [float(pc["k"][1]) for pc in gen_files.values()]
    assert min(mins) == 0.0 and max(maxs) == 99.0


def test_pruned_read_is_metadata_only_and_exact(
    spark, tmp_path, monkeypatch
):
    t = str(tmp_path / "meta")
    # Clustered layout so files are genuinely prunable on k.
    df = _mk(spark, 0, 1000).repartitionByRange(8, "k")
    write_snapshot(df, t)
    man = latest_manifest(spark, t)
    # Footer-path decision FIRST (stats stripped), for the
    # equivalence check.
    footer_df = read_entries(
        spark,
        t,
        man["entries"],
        predicate={"k": (100.0, 220.0)},
        schema_fields=man["schema"],
        stats=None,
    )
    footer_files = set(footer_df.inputFiles())
    footer_rows = {r["k"] for r in footer_df.collect()}
    # Stats path: zero footer opens allowed from here on.
    _no_footer_sweep(monkeypatch)
    pruned = read_snapshot(spark, t, predicate={"k": (100.0, 220.0)})
    assert {r["k"] for r in pruned.collect()} == set(range(100, 221))
    assert {r["k"] for r in pruned.collect()} == footer_rows
    assert set(pruned.inputFiles()) == footer_files
    # And it genuinely pruned: fewer files than the full table.
    full = read_snapshot(spark, t)
    assert len(pruned.inputFiles()) < len(full.inputFiles())


def test_carry_sweeps_only_new_generations(spark, tmp_path, monkeypatch):
    t = str(tmp_path / "carry")
    append_snapshot(_mk(spark, 0, 50), t, snapshot_id=0)
    man0 = latest_manifest(spark, t)
    swept: list[str] = []
    real = snap._sweep_generation_stats

    def counting(spark_, td, gen_rel, cols, **kw):
        swept.append(gen_rel)
        return real(spark_, td, gen_rel, cols, **kw)

    monkeypatch.setattr(snap, "_sweep_generation_stats", counting)
    append_snapshot(_mk(spark, 50, 80), t, snapshot_id=1)
    man1 = latest_manifest(spark, t)
    assert swept == ["_data/s=1"]  # the carried generation never re-swept
    assert man1["stats"]["gens"]["s=0"] == man0["stats"]["gens"]["s=0"]
    assert set(man1["stats"]["gens"]) == {"s=0", "s=1"}


def test_legacy_generation_falls_back_to_footers(
    spark, tmp_path, monkeypatch
):
    """A generation committed without stats prunes through the footer
    sweep — and ONLY it does (covered generations stay metadata)."""
    t = str(tmp_path / "legacy")
    monkeypatch.setattr(
        snap, "_auto_commit_stats", lambda *a, **k: None
    )
    append_snapshot(
        _mk(spark, 0, 100).repartitionByRange(4, "k"), t, snapshot_id=0
    )
    monkeypatch.undo()
    assert latest_manifest(spark, t)["stats"] is None
    append_snapshot(
        _mk(spark, 100, 200).repartitionByRange(4, "k"), t, snapshot_id=1
    )
    man = latest_manifest(spark, t)
    # Backfill-on-next-commit: auto saw no prev stats and swept BOTH
    # live generations, so the table is fully covered again.
    assert set(man["stats"]["gens"]) == {"s=0", "s=1"}
    swept_paths: list = []
    real = stats_mod.prune_files_multi

    def counting(spark_, paths, *a, **k):
        swept_paths.extend(paths)
        return real(spark_, paths, *a, **k)

    monkeypatch.setattr(stats_mod, "prune_files_multi", counting)
    got = read_snapshot(spark, t, predicate={"k": (150.0, 160.0)})
    assert {r["k"] for r in got.collect()} == set(range(150, 161))
    assert swept_paths == []  # fully covered -> zero sweeps

    # Force a genuinely stat-less newest commit: the pruned read then
    # sweeps exactly the uncovered paths and the result stays exact.
    monkeypatch.setattr(snap, "_auto_commit_stats", lambda *a, **k: None)
    append_snapshot(
        _mk(spark, 200, 250).repartitionByRange(2, "k"), t, snapshot_id=2
    )
    got2 = read_snapshot(spark, t, predicate={"k": (150.0, 210.0)})
    assert {r["k"] for r in got2.collect()} == set(range(150, 211))


def test_stats_follow_schema_evolution(spark, tmp_path, monkeypatch):
    t = str(tmp_path / "evo")
    write_snapshot(_mk(spark, 0, 100).repartitionByRange(4, "k"), t)
    evolve_schema(spark, t, renames={"k": "key"}, drops=["v"])
    man = latest_manifest(spark, t)
    assert man["stats"]["columns"] == ["key", "s"]
    _no_footer_sweep(monkeypatch)
    got = read_snapshot(spark, t, predicate={"key": (10.0, 20.0)})
    assert {r["key"] for r in got.collect()} == set(range(10, 21))
    assert len(got.inputFiles()) < 4


def test_dml_hints_use_manifest_stats(spark, tmp_path, monkeypatch):
    t = str(tmp_path / "dml")
    write_snapshot(_mk(spark, 0, 1000).repartitionByRange(8, "k"), t)
    _no_footer_sweep(monkeypatch)
    st = delete_where(spark, t, "k >= 10 AND k < 20")
    assert st["deleted_rows"] == 10
    assert read_snapshot(spark, t).count() == 990
    st2 = delete_where(spark, t, "k >= 500 AND k < 510", mode="mor")
    assert st2["deleted_rows"] == 10


def test_rollback_carries_target_stats_metadata_only(
    spark, tmp_path, monkeypatch
):
    t = str(tmp_path / "rb")
    append_snapshot(_mk(spark, 0, 50), t, snapshot_id=0)
    man0 = latest_manifest(spark, t)
    delete_where(spark, t, "k < 10")
    swept: list = []
    monkeypatch.setattr(
        snap,
        "_sweep_generation_stats",
        lambda *a, **k: swept.append(a) or {},
    )
    rollback_snapshot(spark, t, 0)
    assert swept == []  # metadata-only: the target's stats carried
    assert latest_manifest(spark, t)["stats"] == man0["stats"]


def test_partitioned_table_excludes_partition_cols(spark, tmp_path):
    t = str(tmp_path / "part")
    df = spark.createDataFrame(
        [(d, r, v) for d in (1, 2) for r in ("eu", "us") for v in range(5)],
        "d int, region string, v int",
    )
    write_snapshot_partial(
        df, t, 0, ["d", "region"],
        touched_keys=[(1, "eu"), (1, "us"), (2, "eu"), (2, "us")],
    )
    man = latest_manifest(spark, t)
    assert man["stats"]["columns"] == ["v"]  # d is a partition column
    for per_col in man["stats"]["gens"]["s=0"].values():
        assert set(per_col) == {"v"}


def test_predicate_outside_stats_columns_falls_back_to_footers(
    spark, tmp_path, monkeypatch
):
    """A hinted column outside the recorded stats set must still
    prune through the footer sweep — routing covered generations
    through the metadata would keep every file for that column (a
    regression vs the pre-stats path; round-11 review)."""
    t = str(tmp_path / "extra_col")
    df = spark.range(0, 1000).selectExpr(
        "id AS a", "id AS b", "id AS c", "id AS d",
        "id AS e",  # 5th numeric: outside the 4-column default set
    )
    write_snapshot(df.repartitionByRange(8, "e"), t)
    man = latest_manifest(spark, t)
    assert man["stats"]["columns"] == ["a", "b", "c", "d"]
    swept: list = []
    real = stats_mod.prune_files_multi

    def spy(spark_, paths, *a, **k):
        swept.extend(paths)
        return real(spark_, paths, *a, **k)

    monkeypatch.setattr(stats_mod, "prune_files_multi", spy)
    got = read_snapshot(spark, t, predicate={"e": (100.0, 150.0)})
    assert {r["e"] for r in got.collect()} == set(range(100, 151))
    assert swept, "footer sweep must run for an uncovered column"
    assert len(got.inputFiles()) < 8  # and it genuinely pruned


def test_legacy_backfill_resolves_renamed_columns(spark, tmp_path, monkeypatch):
    """Backfilling stats for a generation written BEFORE a rename must
    resolve the old physical name through the evolution log — a
    None-recorded column would be permanently unprunable (round-11
    review)."""
    t = str(tmp_path / "legacy_ren")
    monkeypatch.setattr(snap, "_auto_commit_stats", lambda *a, **k: None)
    append_snapshot(
        spark.range(0, 100)
        .selectExpr("id AS amount", "id AS other")
        .repartitionByRange(4, "amount"),
        t,
        snapshot_id=0,
    )
    monkeypatch.undo()
    evolve_schema(spark, t, renames={"amount": "price"})
    assert latest_manifest(spark, t)["stats"] is None  # still legacy
    # Next data commit backfills BOTH generations under current names.
    append_snapshot(
        spark.range(100, 150)
        .selectExpr("id AS price", "id AS other")
        .repartitionByRange(2, "price"),
        t,
        snapshot_id=2,
    )
    man = latest_manifest(spark, t)
    assert man["stats"]["columns"] == ["price", "other"]
    s0 = man["stats"]["gens"]["s=0"]
    assert all(pc["price"] is not None for pc in s0.values()), (
        "pre-rename generation must record stats under the new name"
    )
    _no_footer_sweep(monkeypatch)
    got = read_snapshot(spark, t, predicate={"price": (10.0, 20.0)})
    assert {r["price"] for r in got.collect()} == set(range(10, 21))
