"""BEGIN / COMMIT / ROLLBACK snapshot transactions (round 6).

The reference's own transactions are an unshipped TODO (README.md:21), but
its linked DuckDB accepts them through the passthrough (db/db.go:52) — so a
reference user CAN type BEGIN/ROLLBACK today and get real discard semantics.
These tests pin our snapshot implementation to that contract: every write
statement kind (INSERT, UPDATE, DELETE, DDL, sequences, macros, comments)
must be fully undone by ROLLBACK and fully kept by COMMIT, including across
a simulated process crash.
"""

from __future__ import annotations

import tempfile

import pytest


@pytest.fixture()
def engine(spark):
    from duckdb_service_spark.service.executor import Engine

    e = Engine(spark, tempfile.mkdtemp(prefix="warehouse_txn_"))
    e.execute("CREATE TABLE acct (id INTEGER PRIMARY KEY, bal INTEGER)")
    e.execute("INSERT INTO acct VALUES (1, 100), (2, 200), (3, 300)")
    return e


def _bals(engine):
    return {
        (r.id, r.bal) for r in engine.query_df("SELECT id, bal FROM acct").collect()
    }


def test_rollback_discards_insert(engine):
    engine.execute("BEGIN")
    engine.execute("INSERT INTO acct VALUES (4, 400)")
    assert (4, 400) in _bals(engine)  # reads own writes inside the txn
    engine.execute("ROLLBACK")
    assert _bals(engine) == {(1, 100), (2, 200), (3, 300)}


def test_commit_keeps_writes(engine):
    engine.execute("BEGIN TRANSACTION")
    engine.execute("INSERT INTO acct VALUES (4, 400)")
    engine.execute("UPDATE acct SET bal = bal + 1 WHERE id = 1")
    engine.execute("COMMIT")
    assert _bals(engine) == {(1, 101), (2, 200), (3, 300), (4, 400)}


def test_rollback_discards_update_and_delete(engine):
    engine.execute("BEGIN")
    engine.execute("UPDATE acct SET bal = 0")
    engine.execute("DELETE FROM acct WHERE id = 2")
    assert _bals(engine) == {(1, 0), (3, 0)}
    engine.execute("ROLLBACK")
    assert _bals(engine) == {(1, 100), (2, 200), (3, 300)}


def test_rollback_drops_created_table(engine):
    engine.execute("BEGIN")
    engine.execute("CREATE TABLE scratch (x INTEGER)")
    engine.execute("INSERT INTO scratch VALUES (1)")
    engine.execute("ROLLBACK")
    assert "scratch" not in engine.catalog.tables
    with pytest.raises(Exception):
        engine.query_df("SELECT * FROM scratch").collect()


def test_rollback_restores_dropped_table(engine):
    engine.execute("BEGIN")
    engine.execute("DROP TABLE acct")
    assert "acct" not in engine.catalog.tables
    engine.execute("ROLLBACK")
    assert _bals(engine) == {(1, 100), (2, 200), (3, 300)}
    # PK metadata survives the restore
    assert engine.catalog.tables["acct"].pk_cols == ["id"]


def test_rollback_restores_sequence_state(engine):
    engine.execute("CREATE SEQUENCE sq START 10")
    assert engine.query_df("SELECT nextval('sq') AS v").collect()[0].v == 10
    engine.execute("BEGIN")
    assert engine.query_df("SELECT nextval('sq') AS v").collect()[0].v == 11
    engine.execute("ROLLBACK")
    # DuckDB parity: sequence state rolls back with the transaction
    assert engine.query_df("SELECT nextval('sq') AS v").collect()[0].v == 11


def test_rollback_removes_created_view_and_macro(engine):
    engine.execute("BEGIN")
    engine.execute("CREATE VIEW rich AS SELECT * FROM acct WHERE bal >= 200")
    engine.execute("CREATE MACRO dbl(x) AS x * 2")
    engine.execute("ROLLBACK")
    assert "rich" not in engine.catalog.views
    assert "dbl" not in engine.catalog.macros
    with pytest.raises(Exception):
        engine.query_df("SELECT * FROM rich").collect()


def test_nested_begin_rejected(engine):
    engine.execute("BEGIN")
    with pytest.raises(ValueError, match="within a transaction"):
        engine.execute("BEGIN")
    engine.execute("ROLLBACK")


def test_rollback_without_txn_rejected(engine):
    with pytest.raises(ValueError, match="no transaction is active"):
        engine.execute("ROLLBACK")


def test_script_form_transaction(engine):
    # semicolon script through one execute() call, like a posted HTTP body
    engine.execute("BEGIN; INSERT INTO acct VALUES (9, 900); ROLLBACK")
    assert _bals(engine) == {(1, 100), (2, 200), (3, 300)}


def test_partitioned_table_rollback(engine):
    engine.execute(
        "CREATE TABLE ev (d INTEGER, v INTEGER) PARTITION BY (d)"
    )
    engine.execute("INSERT INTO ev VALUES (1, 10), (2, 20)")
    engine.execute("BEGIN")
    engine.execute("UPDATE ev SET v = 99 WHERE d = 1")
    engine.execute("INSERT INTO ev VALUES (3, 30)")
    engine.execute("ROLLBACK")
    rows = {(r.d, r.v) for r in engine.query_df("SELECT d, v FROM ev").collect()}
    assert rows == {(1, 10), (2, 20)}


def test_crash_recovery_rolls_back(spark):
    """A process that dies mid-transaction must come back up pre-BEGIN."""
    from duckdb_service_spark.service.executor import Engine

    wh = tempfile.mkdtemp(prefix="warehouse_crash_")
    e1 = Engine(spark, wh)
    e1.execute("CREATE TABLE t (x INTEGER)")
    e1.execute("INSERT INTO t VALUES (1)")
    e1.execute("BEGIN")
    e1.execute("INSERT INTO t VALUES (2)")
    e1.execute("CREATE TABLE mid_txn (y INTEGER)")
    # no COMMIT/ROLLBACK: simulate a crash by just re-opening the warehouse
    e2 = Engine(spark, wh)
    assert [r.x for r in e2.query_df("SELECT x FROM t").collect()] == [1]
    assert "mid_txn" not in e2.catalog.tables
    assert not e2.catalog.in_txn


def test_status_reports_transaction(engine):
    assert engine.catalog.status()["transaction_active"] is False
    engine.execute("BEGIN")
    assert engine.catalog.status()["transaction_active"] is True
    engine.execute("COMMIT")
    assert engine.catalog.status()["transaction_active"] is False
