"""Model-based randomized lakehouse test: a seeded random walk over
the snapshot table's whole write surface — appends, COW/MOR deletes,
updates (with and without row-level CDF), fold_deletes, bin-pack,
rollback, tags — checked after EVERY commit against an in-memory
model, then a full change-feed replay from a mid-walk checkpoint
must reproduce the final model. Interleavings nobody hand-writes
(MOR delete -> row-CDF update -> rollback -> binpack -> feed) are
exactly where table formats rot."""

from __future__ import annotations

import random

import pytest

from big_data_spark.io.compact import binpack_snapshot
from big_data_spark.io.snapshot import (
    append_snapshot,
    delete_where,
    fold_deletes,
    read_changes,
    read_snapshot,
    rollback_snapshot,
    snapshot_ids,
    tag_snapshot,
    update_where,
    vacuum_snapshots,
)

N_STEPS = 22


def _rows(df):
    return {(r["k"], r["v"]) for r in df.collect()}


def _run_walk(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = str(tmp_path / f"model_{seed}")
    model: dict[int, float] = {}
    next_key = 0
    history: dict[int, frozenset] = {}

    def snap_model():
        sid = snapshot_ids(spark, t)[-1]
        history[sid] = frozenset(model.items())
        return sid

    def do_append():
        nonlocal next_key
        m = rng.randint(3, 12)
        batch = [(next_key + i, float(next_key + i)) for i in range(m)]
        next_key += m
        append_snapshot(
            spark.createDataFrame(batch, "k long, v double"), t
        )
        model.update(dict(batch))

    def do_delete():
        p, r = rng.choice([(3, 0), (4, 1), (5, 2), (7, 3)])
        mode = rng.choice(["cow", "mor"])
        row_cdf = mode == "cow" and rng.random() < 0.5
        st = delete_where(
            spark, t, f"k % {p} = {r}", mode=mode, row_cdf=row_cdf
        )
        doomed = [k for k in model if k % p == r]
        assert st["deleted_rows"] == len(doomed), (st, p, r)
        for k in doomed:
            del model[k]

    def do_update():
        p, r = rng.choice([(3, 1), (4, 2), (5, 0)])
        row_cdf = rng.random() < 0.5
        st = update_where(
            spark, t, f"k % {p} = {r}", {"v": "v + 1000.0"},
            row_cdf=row_cdf,
        )
        hit = [k for k in model if k % p == r]
        assert st["updated_rows"] == len(hit), (st, p, r)
        for k in hit:
            model[k] = model[k] + 1000.0

    def do_fold():
        fold_deletes(spark, t)  # content no-op

    def do_binpack():
        binpack_snapshot(spark, t)  # content no-op (maintenance)

    def do_rollback():
        target = rng.choice(sorted(history))
        rollback_snapshot(spark, t, target)
        model.clear()
        model.update(dict(history[target]))

    # Bootstrap, then checkpoint early so the feed replay covers most
    # of the walk.
    do_append()
    checkpoint_id = snap_model()
    checkpoint_rows = set(history[checkpoint_id])
    tag_snapshot(spark, t, "walk-checkpoint", snapshot_id=checkpoint_id)

    ops = [do_append, do_delete, do_update, do_fold, do_binpack,
           do_rollback]
    weights = [4, 3, 3, 1, 1, 1]
    for step in range(N_STEPS):
        op = rng.choices(ops, weights)[0]
        op()
        sid = snap_model()
        got = _rows(read_snapshot(spark, t))
        assert got == set(model.items()), (
            f"seed={seed} step={step} op={op.__name__} sid={sid}: "
            f"table diverged from model "
            f"(+{got - set(model.items())} -{set(model.items()) - got})"
        )

    # Feed replay from the checkpoint reproduces the final model,
    # across every kind of commit the walk produced (tag pins the
    # checkpoint, so this survives any retention policy).
    state = set(checkpoint_rows)
    feed = read_changes(spark, t, after_id=checkpoint_id).collect()
    for sid in sorted({r["_commit_id"] for r in feed}):
        state -= {
            (r["k"], r["v"])
            for r in feed
            if r["_commit_id"] == sid
            and r["_change_type"] in ("delete", "update_preimage")
        }
        state |= {
            (r["k"], r["v"])
            for r in feed
            if r["_commit_id"] == sid
            and r["_change_type"] in ("insert", "update_postimage")
        }
    assert state == set(model.items()), f"seed={seed}: feed replay diverged"
    # Retention under pins: vacuum keeps the tagged checkpoint alive.
    vacuum_snapshots(spark, t, keep_last=2)
    assert checkpoint_id in snapshot_ids(spark, t)
    assert _rows(
        read_snapshot(spark, t, tag="walk-checkpoint")
    ) == set(checkpoint_rows)


@pytest.mark.parametrize("seed", [7, 23])
def test_random_walk_matches_model(spark, tmp_path, seed):
    _run_walk(spark, tmp_path, seed)


# Hive-escaped on purpose: the walk round-trips an escaping partition
# key through every write path.
PARTS = ("p0", "p1", "p 2:x")
N_PART_STEPS = 16


def _rows3(df):
    return {(r["k"], r["part"], r["v"]) for r in df.collect()}


def _run_partitioned_walk(spark, tmp_path, seed):
    from big_data_spark.io.compact import compact_snapshot
    from big_data_spark.io.snapshot import (
        publish_staged,
        stage_snapshot,
        write_snapshot_partial,
    )

    rng = random.Random(seed)
    t = str(tmp_path / f"pmodel_{seed}")
    model: dict[int, tuple[str, float]] = {}
    next_key = 0
    history: dict[int, frozenset] = {}

    def next_sid():
        return snapshot_ids(spark, t)[-1] + 1

    def snap_model():
        sid = snapshot_ids(spark, t)[-1]
        history[sid] = frozenset(
            (k, p, v) for k, (p, v) in model.items()
        )
        return sid

    def fresh_batch(part, m):
        nonlocal next_key
        batch = [
            (next_key + i, part, float(next_key + i)) for i in range(m)
        ]
        next_key += m
        return batch

    def do_partial_replace():
        part = rng.choice(PARTS)
        batch = fresh_batch(part, rng.randint(2, 8))
        write_snapshot_partial(
            spark.createDataFrame(batch, "k long, part string, v double"),
            t,
            next_sid(),
            "part",
            [part],
        )
        for k in [k for k, (p, _) in model.items() if p == part]:
            del model[k]
        model.update({k: (p, v) for k, p, v in batch})

    def do_wap_append():
        # Staged publish in append mode = replace exactly the touched
        # partitions, audited bytes published verbatim.
        part = rng.choice(PARTS)
        batch = fresh_batch(part, rng.randint(2, 6))
        token = stage_snapshot(
            spark.createDataFrame(batch, "k long, part string, v double"),
            t,
        )
        publish_staged(spark, t, token)
        for k in [k for k, (p, _) in model.items() if p == part]:
            del model[k]
        model.update({k: (p, v) for k, p, v in batch})

    def do_delete():
        p, r = rng.choice([(3, 0), (4, 1), (5, 2)])
        mode = rng.choice(["cow", "mor"])
        st = delete_where(spark, t, f"k % {p} = {r}", mode=mode)
        doomed = [k for k in model if k % p == r]
        assert st["deleted_rows"] == len(doomed), (st, p, r)
        for k in doomed:
            del model[k]

    def do_update():
        p, r = rng.choice([(3, 1), (4, 2)])
        row_cdf = rng.random() < 0.5
        st = update_where(
            spark, t, f"k % {p} = {r}", {"v": "v + 1000.0"},
            row_cdf=row_cdf,
        )
        hit = [k for k in model if k % p == r]
        assert st["updated_rows"] == len(hit), (st, p, r)
        for k in hit:
            part, v = model[k]
            model[k] = (part, v + 1000.0)

    def do_fold():
        fold_deletes(spark, t)

    def do_compact():
        compact_snapshot(spark, t)  # partitioned maintenance branch

    def do_rollback():
        target = rng.choice(sorted(history))
        rollback_snapshot(spark, t, target)
        model.clear()
        model.update(
            {k: (p, v) for k, p, v in history[target]}
        )

    boot = [r for part in PARTS for r in fresh_batch(part, 4)]
    write_snapshot_partial(
        spark.createDataFrame(boot, "k long, part string, v double"),
        t,
        0,
        "part",
        list(PARTS),
    )
    model.update({k: (p, v) for k, p, v in boot})
    checkpoint_id = snap_model()
    checkpoint_rows = set(history[checkpoint_id])
    tag_snapshot(spark, t, "pwalk-checkpoint", snapshot_id=checkpoint_id)

    ops = [do_partial_replace, do_wap_append, do_delete, do_update,
           do_fold, do_compact, do_rollback]
    weights = [3, 3, 3, 3, 1, 1, 1]
    for step in range(N_PART_STEPS):
        op = rng.choices(ops, weights)[0]
        op()
        sid = snap_model()
        got = _rows3(read_snapshot(spark, t))
        want = {(k, p, v) for k, (p, v) in model.items()}
        assert got == want, (
            f"seed={seed} step={step} op={op.__name__} sid={sid}: "
            f"table diverged (+{got - want} -{want - got})"
        )
    # Feed replay from the pinned checkpoint reproduces the final
    # model across partial writes, WAP publishes, DML and rollbacks.
    state = set(checkpoint_rows)
    feed = read_changes(spark, t, after_id=checkpoint_id).collect()
    for sid in sorted({r["_commit_id"] for r in feed}):
        state -= {
            (r["k"], r["part"], r["v"])
            for r in feed
            if r["_commit_id"] == sid
            and r["_change_type"] in ("delete", "update_preimage")
        }
        state |= {
            (r["k"], r["part"], r["v"])
            for r in feed
            if r["_commit_id"] == sid
            and r["_change_type"] in ("insert", "update_postimage")
        }
    assert state == {
        (k, p, v) for k, (p, v) in model.items()
    }, f"seed={seed}: partitioned feed replay diverged"


@pytest.mark.parametrize("seed", [11, 42])
def test_partitioned_random_walk_matches_model(spark, tmp_path, seed):
    _run_partitioned_walk(spark, tmp_path, seed)


# ---- Evolution walk: renames/widen/DML/rollback interleaved ----

N_EVO_STEPS = 14


def _run_evolution_walk(spark, tmp_path, seed):
    from big_data_spark.io.snapshot import evolve_schema

    rng = random.Random(seed)
    t = str(tmp_path / f"emodel_{seed}")
    model: dict[int, float] = {}
    next_key = 0
    vname = "v"          # the value column's CURRENT logical name
    vgen = 0
    ktype = "int"        # widened to bigint once, mid-walk
    history: dict[int, tuple] = {}

    def snap_model():
        sid = snapshot_ids(spark, t)[-1]
        history[sid] = (vname, ktype, frozenset(model.items()))
        return sid

    def do_append():
        nonlocal next_key
        m = rng.randint(3, 8)
        batch = [(next_key + i, float(next_key + i)) for i in range(m)]
        next_key += m
        append_snapshot(
            spark.createDataFrame(
                batch, f"k {ktype}, {vname} double"
            ),
            t,
        )
        model.update(dict(batch))

    def do_rename():
        nonlocal vname, vgen
        vgen += 1
        new = f"v_{vgen}"
        evolve_schema(spark, t, renames={vname: new})
        vname = new

    def do_widen():
        nonlocal ktype
        if ktype != "int":
            return do_append()
        evolve_schema(spark, t, widens={"k": "bigint"})
        ktype = "bigint"

    def do_update():
        p, r = rng.choice([(3, 1), (4, 2)])
        st = update_where(
            spark, t, f"k % {p} = {r}", {vname: f"{vname} + 1000.0"},
            row_cdf=rng.random() < 0.5,
        )
        hit = [k for k in model if k % p == r]
        assert st["updated_rows"] == len(hit)
        for k in hit:
            model[k] = model[k] + 1000.0

    def do_delete():
        p, r = rng.choice([(3, 0), (5, 2)])
        mode = rng.choice(["cow", "mor"])
        st = delete_where(spark, t, f"k % {p} = {r}", mode=mode)
        doomed = [k for k in model if k % p == r]
        assert st["deleted_rows"] == len(doomed)
        for k in doomed:
            del model[k]

    def do_rollback():
        nonlocal vname, ktype
        target = rng.choice(sorted(history))
        rollback_snapshot(spark, t, target)
        vname, ktype, rows = history[target]
        model.clear()
        model.update(dict(rows))

    do_append()
    snap_model()
    ops = [do_append, do_rename, do_widen, do_update, do_delete,
           do_rollback]
    weights = [4, 2, 1, 3, 2, 1]
    for step in range(N_EVO_STEPS):
        op = rng.choices(ops, weights)[0]
        op()
        sid = snap_model()
        df = read_snapshot(spark, t)
        assert df.columns == ["k", vname], (
            f"seed={seed} step={step} op={op.__name__}: columns "
            f"{df.columns} != ['k', {vname!r}]"
        )
        assert dict(df.dtypes)["k"] == ktype
        got = {(r["k"], r[vname]) for r in df.collect()}
        assert got == set(model.items()), (
            f"seed={seed} step={step} op={op.__name__} sid={sid}: "
            f"(+{got - set(model.items())} -{set(model.items()) - got})"
        )


@pytest.mark.parametrize("seed", [3, 59])
def test_evolution_random_walk_matches_model(spark, tmp_path, seed):
    _run_evolution_walk(spark, tmp_path, seed)
