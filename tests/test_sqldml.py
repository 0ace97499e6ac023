"""SQL DML door (big_data_spark/sqldml.py + catalog.SnapshotCatalog):
DELETE/UPDATE/MERGE statements route to the copy-on-write snapshot
primitives, views refresh after each commit, and everything outside
the documented subset raises loudly (no partial applies)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_spark.catalog import SnapshotCatalog, as_of
from big_data_spark.io.snapshot import append_snapshot, read_snapshot
from big_data_spark.sqldml import execute_dml, is_dml


@pytest.fixture()
def cat(spark, tmp_path):
    t = str(tmp_path / "orders_t")
    rows = [
        (1, "O", 100.0, "a"),
        (2, "F", 200.0, "b"),
        (3, "O", 300.0, "c"),
        (4, "X", 400.0, "d"),
    ]
    append_snapshot(
        spark.createDataFrame(
            rows, "k int, status string, total double, who string"
        ),
        t,
        snapshot_id=0,
    )
    c = SnapshotCatalog(spark)
    c.register("orders_t", t)
    return c, t


def test_sql_delete_routes_and_refreshes(spark, cat):
    c, t = cat
    st = c.sql("DELETE FROM orders_t WHERE status = 'X'")
    assert st["statement_type"] == "DELETE" and st["deleted_rows"] == 1
    # The post-DML view reflects the commit without manual refresh.
    assert c.sql("SELECT count(*) AS n FROM orders_t").first()["n"] == 3
    # Time travel to the pre-DML version still works through SQL.
    assert c.sql("SELECT count(*) AS n FROM orders_t_v0").first()["n"] == 4


def test_sql_update_multi_set_with_expression(spark, cat):
    c, t = cat
    st = c.sql(
        "UPDATE orders_t SET total = total * 1.1, "
        "who = upper(concat(who, '!')) WHERE status = 'O'"
    )
    assert st["statement_type"] == "UPDATE" and st["updated_rows"] == 2
    got = {
        r["k"]: (round(r["total"], 2), r["who"])
        for r in read_snapshot(spark, t).collect()
    }
    assert got[1] == (110.0, "A!") and got[3] == (330.0, "C!")
    assert got[2] == (200.0, "b")  # non-matching untouched


def test_sql_merge_full_clause_set(spark, cat):
    c, t = cat
    spark.createDataFrame(
        [
            (2, "F", 999.0, "upd"),   # matched -> UPDATE
            (4, "DEL", 0.0, "del"),   # matched + pred -> DELETE
            (9, "N", 50.0, "new"),    # not matched -> INSERT
            (8, "SKIP", 1.0, "no"),   # not matched, fails pred
        ],
        "k int, status string, total double, who string",
    ).createOrReplaceTempView("changes_src")
    st = c.sql(
        "MERGE INTO orders_t AS t USING changes_src AS s ON t.k = s.k "
        "WHEN MATCHED AND s.status = 'DEL' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED AND s.status != 'SKIP' THEN INSERT *"
    )
    assert st["statement_type"] == "MERGE"
    got = {r["k"]: r["who"] for r in read_snapshot(spark, t).collect()}
    assert got == {1: "a", 2: "upd", 3: "c", 9: "new"}


def test_sql_merge_delete_only_leaves_matches_unchanged(spark, cat):
    c, t = cat
    spark.createDataFrame(
        [(1, "D"), (2, "KEEP")], "k int, op string"
    ).createOrReplaceTempView("del_src")
    c.sql(
        "MERGE INTO orders_t t USING del_src s ON t.k = s.k "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE"
    )
    got = {r["k"]: r["who"] for r in read_snapshot(spark, t).collect()}
    # Row 2 matched but only the DELETE clause exists: unchanged.
    assert got == {2: "b", 3: "c", 4: "d"}


def test_sql_merge_update_exprs_with_aliases(spark, cat):
    c, t = cat
    spark.createDataFrame(
        [(2, 5.0)], "k int, delta double"
    ).createOrReplaceTempView("delta_src")
    c.sql(
        "MERGE INTO orders_t tgt USING delta_src src ON tgt.k = src.k "
        "WHEN MATCHED THEN UPDATE SET total = tgt.total + src.delta"
    )
    got = {r["k"]: r["total"] for r in read_snapshot(spark, t).collect()}
    assert got[2] == 205.0 and got[1] == 100.0


def test_unsupported_statements_raise_whole(spark, cat):
    c, t = cat
    before = read_snapshot(spark, t).count()
    for bad in (
        "DELETE FROM nowhere WHERE k = 1",
        "UPDATE orders_t SET = 5 WHERE k = 1",
        "MERGE INTO orders_t t USING orders_t s ON t.k < s.k "
        "WHEN MATCHED THEN DELETE",
        "MERGE INTO orders_t t USING orders_t s ON t.k = s.k "
        "WHEN MATCHED THEN TRUNCATE",
        "TRUNCATE TABLE orders_t",
    ):
        with pytest.raises(ValueError):
            execute_dml(spark, bad, c.tables)
    assert read_snapshot(spark, t).count() == before
    assert not is_dml("SELECT * FROM orders_t")
    # Non-DML routes to plain spark.sql through the same door.
    assert c.sql("SELECT max(k) AS m FROM orders_t").first()["m"] == 4


def test_lazy_registration_and_as_of(spark, tmp_path):
    t = str(tmp_path / "lazy_t")
    for g in range(3):
        append_snapshot(
            spark.range(g * 10, (g + 1) * 10).selectExpr("id AS k"),
            t,
            snapshot_id=g,
        )
    c = SnapshotCatalog(spark, versions="lazy")
    names = c.register("lazy_t", t)
    # No per-version views registered eagerly.
    assert [n for n in names if "_v" in n] == []
    assert c.sql("SELECT count(*) AS n FROM lazy_t").first()["n"] == 30
    # On-demand time travel materializes exactly one view.
    assert c.as_of("lazy_t", 0).count() == 10
    assert (
        spark.sql("SELECT count(*) AS n FROM lazy_t_v0").first()["n"] == 10
    )
    assert as_of(spark, t, 1).count() == 20
