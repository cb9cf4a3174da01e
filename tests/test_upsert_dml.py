"""Upsert + join-powered DML surface (VERDICT r02 missing #2): INSERT ... ON
CONFLICT DO UPDATE, UPDATE ... FROM, DELETE ... USING — rows_affected matches
DuckDB's changes() semantics."""

from __future__ import annotations

import tempfile

import pytest


@pytest.fixture(scope="module")
def engine(spark):
    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_upsert_"))


# ---- INSERT ... ON CONFLICT DO UPDATE -------------------------------------


def test_upsert_updates_and_inserts(engine):
    engine.execute("CREATE TABLE up1 (id INTEGER PRIMARY KEY, v TEXT, n INTEGER)")
    engine.execute("INSERT INTO up1 VALUES (1, 'a', 10), (2, 'b', 20)")
    out = engine.execute(
        "INSERT INTO up1 VALUES (2, 'B', 99), (3, 'c', 30) "
        "ON CONFLICT (id) DO UPDATE SET v = excluded.v, n = excluded.n"
    )
    assert out.rows_affected == 2  # one update + one insert
    rows = {
        (r.id, r.v, r.n)
        for r in engine.query_df("SELECT * FROM up1").collect()
    }
    assert rows == {(1, "a", 10), (2, "B", 99), (3, "c", 30)}


def test_upsert_excluded_mixed_with_existing(engine):
    engine.execute("CREATE TABLE up2 (id INTEGER PRIMARY KEY, n INTEGER)")
    engine.execute("INSERT INTO up2 VALUES (1, 100)")
    # new value = old + incoming: bare n is the existing row, excluded.n incoming
    engine.execute(
        "INSERT INTO up2 VALUES (1, 5) ON CONFLICT DO UPDATE SET n = n + excluded.n"
    )
    assert engine.query_df("SELECT n FROM up2").collect()[0].n == 105


def test_upsert_do_update_where(engine):
    engine.execute("CREATE TABLE up3 (id INTEGER PRIMARY KEY, n INTEGER)")
    engine.execute("INSERT INTO up3 VALUES (1, 10), (2, 200)")
    out = engine.execute(
        "INSERT INTO up3 VALUES (1, 11), (2, 201) "
        "ON CONFLICT DO UPDATE SET n = excluded.n WHERE n < 100"
    )
    # only id=1 passes the WHERE (existing n=10 < 100); id=2 is skipped
    assert out.rows_affected == 1
    rows = {(r.id, r.n) for r in engine.query_df("SELECT * FROM up3").collect()}
    assert rows == {(1, 11), (2, 200)}


def test_upsert_duplicate_incoming_keys_raise(engine):
    engine.execute("CREATE TABLE up4 (id INTEGER PRIMARY KEY, n INTEGER)")
    with pytest.raises(ValueError):
        engine.execute(
            "INSERT INTO up4 VALUES (1, 1), (1, 2) "
            "ON CONFLICT DO UPDATE SET n = excluded.n"
        )


def test_upsert_without_pk_raises(engine):
    engine.execute("CREATE TABLE up5 (id INTEGER, n INTEGER)")
    with pytest.raises(ValueError):
        engine.execute(
            "INSERT INTO up5 VALUES (1, 1) ON CONFLICT DO UPDATE SET n = excluded.n"
        )


def test_upsert_insert_select_form(engine):
    engine.execute("CREATE TABLE up6 (id INTEGER PRIMARY KEY, n INTEGER)")
    engine.execute("INSERT INTO up6 VALUES (1, 1), (2, 2)")
    out = engine.execute(
        "INSERT INTO up6 SELECT id, n * 10 FROM up6 "
        "ON CONFLICT DO UPDATE SET n = excluded.n"
    )
    assert out.rows_affected == 2
    rows = {(r.id, r.n) for r in engine.query_df("SELECT * FROM up6").collect()}
    assert rows == {(1, 10), (2, 20)}


# ---- UPDATE ... FROM -------------------------------------------------------


def test_update_from(engine):
    engine.execute("CREATE TABLE tgt (id INTEGER, v TEXT)")
    engine.execute("CREATE TABLE srcu (id INTEGER, v TEXT)")
    engine.execute("INSERT INTO tgt VALUES (1, 'old1'), (2, 'old2'), (3, 'old3')")
    engine.execute("INSERT INTO srcu VALUES (1, 'new1'), (3, 'new3')")
    out = engine.execute("UPDATE tgt SET v = s.v FROM srcu s WHERE tgt.id = s.id")
    assert out.rows_affected == 2
    rows = {(r.id, r.v) for r in engine.query_df("SELECT * FROM tgt").collect()}
    assert rows == {(1, "new1"), (2, "old2"), (3, "new3")}


def test_update_from_multiple_matches_raise(engine):
    engine.execute("CREATE TABLE tgt2 (id INTEGER, v TEXT)")
    engine.execute("CREATE TABLE srcu2 (id INTEGER, v TEXT)")
    engine.execute("INSERT INTO tgt2 VALUES (1, 'x')")
    engine.execute("INSERT INTO srcu2 VALUES (1, 'a'), (1, 'b')")
    with pytest.raises(ValueError):
        engine.execute("UPDATE tgt2 SET v = s.v FROM srcu2 s WHERE tgt2.id = s.id")


def test_update_from_expression_mixing_sides(engine):
    engine.execute("CREATE TABLE tgt3 (id INTEGER, n INTEGER)")
    engine.execute("CREATE TABLE srcu3 (id INTEGER, add_n INTEGER)")
    engine.execute("INSERT INTO tgt3 VALUES (1, 10), (2, 20)")
    engine.execute("INSERT INTO srcu3 VALUES (1, 5)")
    engine.execute(
        "UPDATE tgt3 SET n = tgt3.n + s.add_n FROM srcu3 s WHERE tgt3.id = s.id"
    )
    rows = {(r.id, r.n) for r in engine.query_df("SELECT * FROM tgt3").collect()}
    assert rows == {(1, 15), (2, 20)}


# ---- DELETE ... USING ------------------------------------------------------


def test_delete_using(engine):
    engine.execute("CREATE TABLE dtgt (id INTEGER, v TEXT)")
    engine.execute("CREATE TABLE dsrc (id INTEGER)")
    engine.execute("INSERT INTO dtgt VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    engine.execute("INSERT INTO dsrc VALUES (1), (3), (99)")
    out = engine.execute("DELETE FROM dtgt USING dsrc WHERE dtgt.id = dsrc.id")
    assert out.rows_affected == 2
    rows = [r.v for r in engine.query_df("SELECT v FROM dtgt").collect()]
    assert rows == ["b"]


def test_delete_using_extra_predicate(engine):
    engine.execute("CREATE TABLE dtgt2 (id INTEGER, keep BOOLEAN)")
    engine.execute("CREATE TABLE dsrc2 (id INTEGER)")
    engine.execute("INSERT INTO dtgt2 VALUES (1, true), (2, false)")
    engine.execute("INSERT INTO dsrc2 VALUES (1), (2)")
    out = engine.execute(
        "DELETE FROM dtgt2 USING dsrc2 s WHERE dtgt2.id = s.id AND NOT dtgt2.keep"
    )
    assert out.rows_affected == 1
    assert [r.id for r in engine.query_df("SELECT id FROM dtgt2").collect()] == [1]


# ---- partitioned-table paths ----------------------------------------------


def test_upsert_partitioned_table(engine):
    engine.execute(
        "CREATE TABLE pup (id INTEGER PRIMARY KEY, g TEXT, n INTEGER) PARTITION BY (g)"
    )
    engine.execute("INSERT INTO pup VALUES (1, 'a', 10), (2, 'b', 20)")
    out = engine.execute(
        "INSERT INTO pup VALUES (1, 'a', 11), (3, 'b', 30) "
        "ON CONFLICT DO UPDATE SET n = excluded.n"
    )
    assert out.rows_affected == 2
    rows = {(r.id, r.g, r.n) for r in engine.query_df("SELECT * FROM pup").collect()}
    assert rows == {(1, "a", 11), (2, "b", 20), (3, "b", 30)}


def test_delete_using_partitioned(engine):
    engine.execute("CREATE TABLE pdel (id INTEGER, g TEXT) PARTITION BY (g)")
    engine.execute("INSERT INTO pdel VALUES (1, 'a'), (2, 'a'), (3, 'b')")
    engine.execute("CREATE TABLE pdel_src (id INTEGER)")
    engine.execute("INSERT INTO pdel_src VALUES (1)")
    out = engine.execute("DELETE FROM pdel USING pdel_src s WHERE pdel.id = s.id")
    assert out.rows_affected == 1
    rows = {(r.id, r.g) for r in engine.query_df("SELECT * FROM pdel").collect()}
    assert rows == {(2, "a"), (3, "b")}


# ---- INSERT OR REPLACE / OR IGNORE shorthands (round 5) -------------------
# Verified against DuckDB: OR REPLACE rewrites every non-key column from the
# incoming row; OR IGNORE keeps the existing row.


def test_insert_or_replace(engine):
    engine.execute("CREATE TABLE orr (id INTEGER PRIMARY KEY, v TEXT, n INTEGER)")
    engine.execute("INSERT INTO orr VALUES (1, 'a', 10), (2, 'b', 20)")
    out = engine.execute("INSERT OR REPLACE INTO orr VALUES (2, 'B', 99), (3, 'c', 30)")
    assert out.rows_affected == 2
    rows = {(r.id, r.v, r.n) for r in engine.query_df("SELECT * FROM orr").collect()}
    assert rows == {(1, "a", 10), (2, "B", 99), (3, "c", 30)}


def test_insert_or_ignore(engine):
    out = engine.execute("INSERT OR IGNORE INTO orr VALUES (3, 'X', 0), (4, 'd', 40)")
    assert out.rows_affected == 1  # only the new row
    rows = {(r.id, r.v, r.n) for r in engine.query_df("SELECT * FROM orr").collect()}
    assert rows == {(1, "a", 10), (2, "B", 99), (3, "c", 30), (4, "d", 40)}


def test_insert_by_name(engine):
    engine.execute("CREATE TABLE byname (a INTEGER, b TEXT, c DOUBLE)")
    out = engine.execute(
        "INSERT INTO byname BY NAME SELECT 'x' AS b, 1 AS a"
    )
    assert out.rows_affected == 1
    row = engine.query_df("SELECT * FROM byname").collect()[0]
    assert (row.a, row.b, row.c) == (1, "x", None)
    # RETURNING composes with BY NAME
    out = engine.execute(
        "INSERT INTO byname BY NAME SELECT 2.5 AS c, 7 AS a RETURNING a, b, c"
    )
    assert out.rows_affected == 1
    r = out.returning.collect()[0]
    assert (r.a, r.b, r.c) == (7, None, 2.5)


def test_update_from_and_delete_using_subquery_sources(spark, tmp_path):
    """UPDATE ... FROM (SELECT ...) s / DELETE ... USING (SELECT ...) s —
    derived sources route through the full query router into a temp view
    (r08 late; previously a cryptic unresolved-column error)."""
    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, str(tmp_path / "wh_subq_dml"))
    eng.execute("CREATE TABLE sq (id INT, b VARCHAR)")
    eng.execute("INSERT INTO sq VALUES (1,'x'),(2,'y'),(3,'x')")
    r = eng.execute(
        "UPDATE sq SET b = 'z' FROM (SELECT 'x' AS k) s WHERE sq.b = s.k"
    )
    assert r.rows_affected == 2
    assert sorted(
        tuple(x) for x in eng.query_df("SELECT * FROM sq").collect()
    ) == [(1, "z"), (2, "y"), (3, "z")]
    r = eng.execute(
        "DELETE FROM sq USING (SELECT 'z' AS k) s WHERE sq.b = s.k"
    )
    assert r.rows_affected == 2
    assert [
        tuple(x) for x in eng.query_df("SELECT * FROM sq").collect()
    ] == [(2, "y")]
