"""Multi-column partitioning (round-11 verdict directive #1): the
manifest's ``partition_col`` generalizes to an ordered column list —
(date, region) fact layouts — across write_snapshot_partial, WAP
stage/publish, DML touched-partition attribution, MOR + fold, compact
z-order, INSERT OVERWRITE, and manifest-level partition pruning.
Single-column tables keep the legacy string field and raw-value entry
keys byte-identically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_spark.io.snapshot import (
    delete_where,
    entry_partition_values,
    fold_deletes,
    latest_manifest,
    partition_entry_key,
    publish_staged,
    read_changes,
    read_manifest,
    read_snapshot,
    read_staged,
    rollback_snapshot,
    stage_snapshot,
    table_history,
    update_where,
    write_snapshot_partial,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "ds string, region string, v int")


BASE = [
    ("2026-01-01", "eu", 1),
    ("2026-01-01", "us", 2),
    ("2026-01-02", "eu", 3),
    ("2026-01-02", "us", 4),
]


def _tbl(spark, tmp_path, name="t"):
    t = str(tmp_path / name)
    write_snapshot_partial(
        _mk(spark, BASE),
        t,
        0,
        ["ds", "region"],
        touched_keys=[(r[0], r[1]) for r in BASE],
    )
    return t


def test_two_col_roundtrip_and_entry_keys(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    man = read_manifest(spark, t, 0)
    assert man["partition_col"] == ["ds", "region"]
    assert sorted(man["entries"]) == [
        "ds=2026-01-01/region=eu",
        "ds=2026-01-01/region=us",
        "ds=2026-01-02/region=eu",
        "ds=2026-01-02/region=us",
    ]
    for key, rel in man["entries"].items():
        assert rel == f"_data/s=0/{key}"
    got = sorted(
        (r["ds"], r["region"], r["v"])
        for r in read_snapshot(spark, t).collect()
    )
    assert got == sorted(BASE)
    # History renders the columns comma-joined in the string field.
    h = table_history(spark, t).collect()[0]
    assert h["partition_col"] == "ds,region"


def test_partial_replace_one_leaf_carries_rest(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    write_snapshot_partial(
        _mk(spark, [("2026-01-01", "eu", 10)]),
        t,
        1,
        ["ds", "region"],
        touched_keys=[("2026-01-01", "eu")],
    )
    man = read_manifest(spark, t, 1)
    assert man["entries"]["ds=2026-01-01/region=eu"].startswith("_data/s=1/")
    # Untouched leaves carried by reference (still s=0).
    assert man["entries"]["ds=2026-01-02/region=us"].startswith("_data/s=0/")
    got = sorted(
        (r["ds"], r["region"], r["v"])
        for r in read_snapshot(spark, t).collect()
    )
    assert got == [
        ("2026-01-01", "eu", 10),
        ("2026-01-01", "us", 2),
        ("2026-01-02", "eu", 3),
        ("2026-01-02", "us", 4),
    ]
    # Emptied leaf drops out of the manifest atomically.
    write_snapshot_partial(
        _mk(spark, []),
        t,
        2,
        ["ds", "region"],
        touched_keys=[("2026-01-01", "us")],
    )
    man2 = read_manifest(spark, t, 2)
    assert "ds=2026-01-01/region=us" not in man2["entries"]
    assert read_snapshot(spark, t).count() == 3
    # Time travel still sees the old leaf.
    assert read_snapshot(spark, t, as_of=1).count() == 4


def test_escaped_values_roundtrip(spark, tmp_path):
    """Partition values containing '/', '=', ':', ' ' and '%' escape
    into dir names, key canonically, and read back verbatim."""
    t = str(tmp_path / "esc")
    rows = [("a/b", "x=y", 1), ("a:b", "p 2%3Ax", 2)]
    write_snapshot_partial(
        _mk(spark, rows),
        t,
        0,
        ["ds", "region"],
        touched_keys=[(r[0], r[1]) for r in rows],
    )
    man = read_manifest(spark, t, 0)
    assert len(man["entries"]) == 2
    spark_side = sorted(
        (r["ds"], r["region"], r["v"])
        for r in read_snapshot(spark, t).collect()
    )
    assert spark_side == sorted(rows)
    # Keys parse back to the raw values.
    parsed = sorted(
        tuple(
            entry_partition_values(spark, ["ds", "region"], k).values()
        )
        for k in man["entries"]
    )
    assert parsed == [("a/b", "x=y"), ("a:b", "p 2%3Ax")]
    # DML attribution on an escaped leaf touches exactly that leaf.
    st = delete_where(spark, t, "v = 2")
    assert st["deleted_rows"] == 1 and st["carried"] == 1
    assert read_snapshot(spark, t).count() == 1


def test_wap_two_col_stage_audit_publish(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    token = stage_snapshot(
        _mk(spark, [("2026-01-03", "eu", 5), ("2026-01-01", "eu", 6)]), t
    )
    audited = read_staged(spark, t, token)
    assert audited.count() == 2
    assert audited.schema["ds"].dataType.simpleString() == "string"
    sid = publish_staged(spark, t, token, mode="append")
    man = read_manifest(spark, t, sid)
    # Touched leaves replaced, new leaf added, others carried.
    assert man["entries"]["ds=2026-01-03/region=eu"].startswith(
        f"_data/s={sid}/"
    )
    assert man["entries"]["ds=2026-01-01/region=eu"].startswith(
        f"_data/s={sid}/"
    )
    assert man["entries"]["ds=2026-01-02/region=us"].startswith("_data/s=0/")
    got = sorted(
        (r["ds"], r["region"], r["v"])
        for r in read_snapshot(spark, t).collect()
    )
    assert got == [
        ("2026-01-01", "eu", 6),
        ("2026-01-01", "us", 2),
        ("2026-01-02", "eu", 3),
        ("2026-01-02", "us", 4),
        ("2026-01-03", "eu", 5),
    ]
    # replace mode: the staged batch becomes the whole table.
    token2 = stage_snapshot(_mk(spark, [("2026-02-01", "ap", 9)]), t)
    sid2 = publish_staged(spark, t, token2, mode="replace")
    man2 = read_manifest(spark, t, sid2)
    assert list(man2["entries"]) == ["ds=2026-02-01/region=ap"]
    assert man2["partition_col"] == ["ds", "region"]


def test_dml_two_col_touched_partition_attribution(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    st = update_where(
        spark, t, "ds = '2026-01-01' AND region = 'eu'", {"v": "v + 100"}
    )
    assert st["updated_rows"] == 1
    assert st["rewritten"] == 1 and st["carried"] == 3
    man = latest_manifest(spark, t)
    assert man["entries"]["ds=2026-01-01/region=eu"].startswith(
        f"_data/s={st['snapshot_id']}/"
    )
    got = read_snapshot(spark, t).where("region = 'eu'")
    assert sorted(r["v"] for r in got.collect()) == [3, 101]
    # DELETE emptying a leaf drops its entry.
    st2 = delete_where(spark, t, "ds = '2026-01-02' AND region = 'us'")
    assert st2["deleted_rows"] == 1
    assert "ds=2026-01-02/region=us" not in latest_manifest(spark, t)[
        "entries"
    ]
    # SET on either partition column is refused loudly.
    with pytest.raises(ValueError, match="partition column"):
        update_where(spark, t, "v = 3", {"region": "'ap'"})
    with pytest.raises(ValueError, match="partition column"):
        update_where(spark, t, "v = 3", {"ds": "'x'"})


def test_mor_and_fold_on_two_col_table(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    st = delete_where(spark, t, "v IN (2, 3)", mode="mor")
    assert st["deleted_rows"] == 2
    assert read_snapshot(spark, t).count() == 2
    man = latest_manifest(spark, t)
    assert man["partition_col"] == ["ds", "region"]
    # Fold materializes the masks per touched leaf, carries the rest.
    st2 = fold_deletes(spark, t)
    assert st2["rewritten"] == 2
    man2 = latest_manifest(spark, t)
    assert man2["deletes"] == []
    assert sorted(
        (r["ds"], r["region"], r["v"])
        for r in read_snapshot(spark, t).collect()
    ) == [("2026-01-01", "eu", 1), ("2026-01-02", "us", 4)]
    # Untouched leaves still point at s=0.
    assert man2["entries"]["ds=2026-01-01/region=eu"].startswith(
        "_data/s=0/"
    )


def test_change_feed_and_rollback_two_col(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    write_snapshot_partial(
        _mk(spark, [("2026-01-01", "eu", 10)]),
        t,
        1,
        ["ds", "region"],
        touched_keys=[("2026-01-01", "eu")],
    )
    feed = read_changes(spark, t, after_id=0, until_id=1)
    rows = sorted(
        (r["_change_type"], r["ds"], r["region"], r["v"])
        for r in feed.collect()
    )
    assert rows == [
        ("delete", "2026-01-01", "eu", 1),
        ("insert", "2026-01-01", "eu", 10),
    ]
    sid = rollback_snapshot(spark, t, 0)
    assert sorted(
        r["v"] for r in read_snapshot(spark, t).collect()
    ) == [1, 2, 3, 4]
    assert latest_manifest(spark, t)["partition_col"] == ["ds", "region"]
    assert sid == 2


def test_manifest_level_partition_pruning(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    pruned = read_snapshot(spark, t, partitions={"ds": "2026-01-01"})
    assert sorted(r["v"] for r in pruned.collect()) == [1, 2]
    # Scans touch ONLY the matching leaves — zero file listing for
    # excluded partitions.
    files = pruned.inputFiles()
    assert files and all("ds=2026-01-01" in f for f in files)
    both = read_snapshot(
        spark, t, partitions={"ds": "2026-01-02", "region": ["eu", "us"]}
    )
    assert sorted(r["v"] for r in both.collect()) == [3, 4]
    none = read_snapshot(spark, t, partitions={"ds": "2099-01-01"})
    assert none.count() == 0 and "v" in none.columns
    with pytest.raises(ValueError, match="not in the table's partition"):
        read_snapshot(spark, t, partitions={"nope": 1})
    # Single-column tables prune the same way.
    t2 = str(tmp_path / "single")
    write_snapshot_partial(
        spark.createDataFrame(
            [("a", 1), ("b", 2)], "part string, v int"
        ),
        t2,
        0,
        "part",
        touched_keys=["a", "b"],
    )
    one = read_snapshot(spark, t2, partitions={"part": "a"})
    assert [r["v"] for r in one.collect()] == [1]
    assert all("part=a" in f for f in one.inputFiles())


def test_layout_mismatch_and_null_refusals(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    # Single-col partial on a two-col table is refused.
    with pytest.raises(ValueError, match="partial write cannot"):
        write_snapshot_partial(
            _mk(spark, [("2026-01-01", "eu", 1)]),
            t,
            9,
            "ds",
            touched_keys=["2026-01-01"],
        )
    # Wrong arity and null members are refused before any write.
    with pytest.raises(ValueError, match="value\\(s\\) for"):
        write_snapshot_partial(
            _mk(spark, []),
            t,
            9,
            ["ds", "region"],
            touched_keys=[("2026-01-01",)],
        )
    with pytest.raises(ValueError, match="null partition keys"):
        write_snapshot_partial(
            _mk(spark, []),
            t,
            9,
            ["ds", "region"],
            touched_keys=[("2026-01-01", None)],
        )
    # Staging on different columns is refused; appends keep refusing
    # partitioned tables.
    with pytest.raises(ValueError, match="staged on"):
        stage_snapshot(_mk(spark, BASE), t, partition_by="ds")
    from big_data_spark.io.snapshot import append_snapshot

    with pytest.raises(ValueError, match="partitioned on"):
        append_snapshot(_mk(spark, BASE), t)


def test_compact_zorder_within_two_col_partitions(spark, tmp_path):
    from big_data_spark.io.compact import compact_snapshot

    t = str(tmp_path / "cz")
    rows = [
        (f"2026-01-0{d}", reg, i, (i * 7) % 13)
        for d in (1, 2)
        for reg in ("eu", "us")
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "ds string, region string, v int, w int"
    )
    write_snapshot_partial(
        df,
        t,
        0,
        ["ds", "region"],
        touched_keys=[("2026-01-01", "eu"), ("2026-01-01", "us"),
                      ("2026-01-02", "eu"), ("2026-01-02", "us")],
    )
    st = compact_snapshot(spark, t, zorder_by=["v", "w"])
    man = latest_manifest(spark, t)
    assert man["partition_col"] == ["ds", "region"]
    assert len(man["entries"]) == 4
    assert read_snapshot(spark, t).count() == 200
    with pytest.raises(ValueError, match="partition column"):
        compact_snapshot(spark, t, zorder_by=["region", "v", "w"])


def test_insert_overwrite_preserves_partitioning(spark, tmp_path):
    """round-10 advice: INSERT OVERWRITE on a partitioned snapshot
    table must keep partition_col (and per-partition entries) so
    partial writers keep working afterwards."""
    from big_data_spark.catalog import SnapshotCatalog

    t = _tbl(spark, tmp_path)
    cat = SnapshotCatalog(spark)
    cat.register("fact", t)
    st = cat.sql(
        "INSERT OVERWRITE fact "
        "SELECT '2026-03-01', 'eu', 42"
    )
    assert st["inserted_rows"] == 1
    man = latest_manifest(spark, t)
    assert man["partition_col"] == ["ds", "region"]
    assert list(man["entries"]) == ["ds=2026-03-01/region=eu"]
    # Partial writers keep working after the overwrite.
    write_snapshot_partial(
        _mk(spark, [("2026-03-02", "us", 7)]),
        t,
        man["snapshot_id"] + 1,
        ["ds", "region"],
        touched_keys=[("2026-03-02", "us")],
    )
    assert read_snapshot(spark, t).count() == 2


def test_boolean_and_malformed_touched_keys(spark, tmp_path):
    """Boolean partition values canonicalize to Spark's dir rendering
    ('true'/'false', not Python's 'True'), and a malformed canonical
    string raises instead of silently popping nothing (round-11
    review)."""
    t = str(tmp_path / "boolpart")
    df = spark.createDataFrame(
        [(True, "eu", 1), (False, "eu", 2)],
        "flag boolean, region string, v int",
    )
    write_snapshot_partial(
        df, t, 0, ["flag", "region"],
        touched_keys=[(True, "eu"), (False, "eu")],
    )
    man = read_manifest(spark, t, 0)
    assert sorted(man["entries"]) == [
        "flag=false/region=eu",
        "flag=true/region=eu",
    ]
    # Replacing by tuple with a bool must hit the existing entry.
    write_snapshot_partial(
        spark.createDataFrame(
            [(True, "eu", 9)], "flag boolean, region string, v int"
        ),
        t, 1, ["flag", "region"], touched_keys=[(True, "eu")],
    )
    got = sorted(
        (r["flag"], r["v"])
        for r in read_snapshot(spark, t).collect()
    )
    assert got == [(False, 2), (True, 9)]
    with pytest.raises(ValueError, match="neither a value tuple nor"):
        write_snapshot_partial(
            spark.createDataFrame(
                [], "flag boolean, region string, v int"
            ),
            t, 2, ["flag", "region"], touched_keys=["true|eu"],
        )


def test_partitions_filter_matches_boolean_keys(spark, tmp_path):
    """read_snapshot(partitions={'flag': True}) must render True the
    way Spark writes the dir value ('true') — round-11 review pass 2;
    str(True) pruned every entry and silently returned zero rows."""
    t = str(tmp_path / "boolprune")
    df = spark.createDataFrame(
        [(True, 1), (True, 2), (False, 3)], "flag boolean, v int"
    )
    write_snapshot_partial(
        df, t, 0, "flag", touched_keys=[True, False]
    )
    got = read_snapshot(spark, t, partitions={"flag": True})
    assert sorted(r["v"] for r in got.collect()) == [1, 2]


def test_explicit_stats_columns_through_partial_writer(spark, tmp_path):
    """write_snapshot_partial(stats_columns=) reaches the manifest —
    the documented override is a real writer parameter."""
    t = str(tmp_path / "statcols")
    df = spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 20)], "part string, x int, y int"
    )
    write_snapshot_partial(
        df, t, 0, "part", touched_keys=["a", "b"], stats_columns=["y"]
    )
    assert latest_manifest(spark, t)["stats"]["columns"] == ["y"]
