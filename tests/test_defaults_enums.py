"""Column DEFAULTs (declared, keyword, DEFAULT VALUES, SET DEFAULT) and
CREATE TYPE ... AS ENUM — differential against DuckDB running the IDENTICAL
statement sequence (the reference passes these straight through to DuckDB,
db/db.go:52,70)."""

from __future__ import annotations

import tempfile

import duckdb
import pytest


@pytest.fixture(scope="module")
def engine(spark):
    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_defaults_"))


STMTS = [
    "CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')",
    "CREATE TABLE td (a INTEGER DEFAULT 7, b VARCHAR, m mood DEFAULT 'ok', "
    "  s VARCHAR DEFAULT upper('x' || 'y'))",
    "INSERT INTO td (b) VALUES ('p1')",
    "INSERT INTO td VALUES (DEFAULT, 'p2', 'happy', DEFAULT)",
    "INSERT INTO td DEFAULT VALUES",
    "INSERT INTO td (b, a) VALUES ('p3', DEFAULT)",
    "UPDATE td SET a = DEFAULT, m = 'sad' WHERE b = 'p2'",
]


def test_defaults_and_enum_match_duckdb(engine):
    con = duckdb.connect()
    for stmt in STMTS:
        engine.execute(stmt)
        con.execute(stmt)
    want = sorted(map(tuple, con.execute(
        "SELECT a, b, CAST(m AS VARCHAR), s FROM td").fetchall()),
        key=lambda t: (str(t[1]),))
    got = sorted(
        [(r.a, r.b, r.m, r.s) for r in
         engine.query_df("SELECT a, b, m, s FROM td").collect()],
        key=lambda t: (str(t[1]),))
    assert got == want


def test_enum_violation_and_drop_guard(engine):
    from duckdb_service_spark.service.dml import ConstraintViolation

    with pytest.raises(ConstraintViolation, match="enum"):
        engine.execute("INSERT INTO td VALUES (1, 'bad', 'angry', 'q')")
    with pytest.raises(ValueError, match="used by"):
        engine.execute("DROP TYPE mood")
    # unused type drops cleanly; IF EXISTS tolerates absence
    engine.execute("CREATE TYPE shade AS ENUM ('light', 'dark')")
    engine.execute("DROP TYPE shade")
    engine.execute("DROP TYPE IF EXISTS shade")
    with pytest.raises(ValueError, match="does not exist"):
        engine.execute("DROP TYPE shade")


def test_types_survive_reopen(spark, engine):
    from duckdb_service_spark.service.executor import Engine

    eng2 = Engine(spark, engine.catalog.dir)
    assert eng2.catalog.types["mood"] == ["sad", "ok", "happy"]
    # defaults persisted in the sidecar: a fresh engine still fills them
    eng2.execute("INSERT INTO td (b) VALUES ('p4')")
    row = [r for r in eng2.query_df("SELECT * FROM td").collect() if r.b == "p4"][0]
    assert (row.a, row.m, row.s) == (7, "ok", "XY")


# ---- CHECK / UNIQUE / FOREIGN KEY (r06) -----------------------------------


def test_check_unique_fk_match_duckdb_accept_reject(spark):
    """Statement-by-statement differential: each write must succeed or
    fail exactly where DuckDB succeeds or fails."""
    import tempfile

    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="warehouse_constraints_"))
    con = duckdb.connect()
    stmts = [
        "CREATE TABLE p (id INTEGER PRIMARY KEY, name VARCHAR)",
        "CREATE TABLE c1 (a INTEGER CHECK (a > 0), b VARCHAR UNIQUE, "
        " pid INTEGER REFERENCES p(id))",
        "INSERT INTO p VALUES (1, 'one'), (2, 'two')",
        "INSERT INTO c1 VALUES (5, 'x', 1)",
        "INSERT INTO c1 VALUES (-5, 'y', 1)",   # CHECK violation
        "INSERT INTO c1 VALUES (5, 'x', 2)",    # UNIQUE violation
        "INSERT INTO c1 VALUES (5, 'z', 99)",   # FK violation
        "INSERT INTO c1 VALUES (5, NULL, NULL)",  # NULLs pass UNIQUE + FK
        "INSERT INTO c1 VALUES (6, NULL, NULL)",  # second NULL still passes
        "DELETE FROM p WHERE id = 1",           # parent still referenced
        "DELETE FROM p WHERE id = 2",           # unreferenced: ok
    ]
    for stmt in stmts:
        ours = theirs = "ok"
        try:
            eng.execute(stmt)
        except Exception:
            ours = "err"
        try:
            con.execute(stmt)
        except Exception:
            theirs = "err"
        assert ours == theirs, f"divergence on {stmt!r}: engine={ours} duckdb={theirs}"
    want = sorted(map(tuple, con.execute("SELECT a, b, pid FROM c1").fetchall()),
                  key=str)
    got = sorted([(r.a, r.b, r.pid) for r in
                  eng.query_df("SELECT a, b, pid FROM c1").collect()], key=str)
    assert got == want


def test_table_level_constraints_and_alter_default(spark):
    import tempfile

    from duckdb_service_spark.service.dml import ConstraintViolation
    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="warehouse_tlc_"))
    eng.execute(
        "CREATE TABLE t (a INTEGER, b INTEGER, UNIQUE (a, b), CHECK (a + b < 100))"
    )
    eng.execute("INSERT INTO t VALUES (1, 2), (1, 3)")
    with pytest.raises(ConstraintViolation, match="UNIQUE"):
        eng.execute("INSERT INTO t VALUES (1, 2)")
    with pytest.raises(ConstraintViolation, match="CHECK"):
        eng.execute("INSERT INTO t VALUES (60, 60)")
    # ALTER ADD with DEFAULT fills existing rows (DuckDB semantics)
    eng.execute("ALTER TABLE t ADD COLUMN z INTEGER DEFAULT 9")
    assert {r.z for r in eng.query_df("SELECT z FROM t").collect()} == {9}
    eng.execute("INSERT INTO t (a, b) VALUES (2, 5)")
    assert {r.z for r in eng.query_df("SELECT z FROM t").collect()} == {9}


def test_generated_columns_match_duckdb(spark):
    """GENERATED ALWAYS AS: excluded from positional INSERT, recomputed on
    UPDATE, un-SET-able; typed and type-inferred variants. Differential on
    the statement sequence DuckDB accepts."""
    import tempfile

    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="warehouse_gen_"))
    con = duckdb.connect()
    stmts = [
        "CREATE TABLE g (a INTEGER, b INTEGER GENERATED ALWAYS AS (a * 2))",
        "INSERT INTO g (a) VALUES (3)",
        "INSERT INTO g VALUES (4)",
        "INSERT INTO g VALUES (5, 99)",   # positional into generated: error
        "UPDATE g SET a = 10 WHERE a = 3",
    ]
    for stmt in stmts:
        ours = theirs = "ok"
        try:
            eng.execute(stmt)
        except Exception:
            ours = "err"
        try:
            con.execute(stmt)
        except Exception:
            theirs = "err"
        assert ours == theirs, f"divergence on {stmt!r}: engine={ours} duckdb={theirs}"
    assert sorted((r.a, r.b) for r in eng.query_df("SELECT * FROM g").collect()) == sorted(
        map(tuple, con.execute("SELECT * FROM g").fetchall())
    )
    # untyped generated column: type inferred from the expression
    eng.execute("CREATE TABLE g2 (a INTEGER, t GENERATED ALWAYS AS (a || '!'))")
    eng.execute("INSERT INTO g2 VALUES (7)")
    assert eng.query_df("SELECT t FROM g2").collect()[0].t == "7!"


def test_enum_types_roll_back(spark):
    """ENUM types created inside a transaction disappear on ROLLBACK
    (the _types.json sidecar is part of the snapshot)."""
    import tempfile

    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="warehouse_types_txn_"))
    eng.execute("CREATE TYPE keepme AS ENUM ('a')")
    eng.execute("BEGIN")
    eng.execute("CREATE TYPE gone AS ENUM ('x', 'y')")
    eng.execute("ROLLBACK")
    assert "gone" not in eng.catalog.types
    assert eng.catalog.types["keepme"] == ["a"]
    eng.execute("BEGIN")
    eng.execute("CREATE TYPE stays AS ENUM ('z')")
    eng.execute("COMMIT")
    assert eng.catalog.types["stays"] == ["z"]


def test_schemas(spark):
    """CREATE/DROP SCHEMA, schema-qualified DDL/DML/queries, the main.
    default-schema prefix, and the non-empty drop guard with CASCADE."""
    import tempfile

    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="warehouse_schemas_"))
    eng.execute("CREATE SCHEMA analytics")
    eng.execute("CREATE TABLE analytics.t1 (a INTEGER)")
    eng.execute("INSERT INTO analytics.t1 VALUES (1), (2)")
    eng.execute("CREATE TABLE base (b INTEGER)")
    eng.execute("INSERT INTO main.base VALUES (9)")
    assert [r.a for r in eng.query_df(
        "SELECT a FROM analytics.t1 ORDER BY a").collect()] == [1, 2]
    assert eng.query_df("SELECT b FROM main.base").collect()[0].b == 9
    # cross-schema join
    rows = eng.query_df(
        "SELECT t.a, m.b FROM analytics.t1 t JOIN main.base m ON t.a < m.b "
        "ORDER BY t.a"
    ).collect()
    assert [(r.a, r.b) for r in rows] == [(1, 9), (2, 9)]
    with pytest.raises(ValueError, match="CASCADE"):
        eng.execute("DROP SCHEMA analytics")
    eng.execute("DROP SCHEMA analytics CASCADE")
    with pytest.raises(Exception):
        eng.query_df("SELECT * FROM analytics.t1").collect()
    # a string literal mentioning a schema name is untouched
    assert eng.query_df("SELECT 'analytics.t1' AS s").collect()[0].s == "analytics.t1"
    # schemas survive reopen
    eng.execute("CREATE SCHEMA keep")
    eng2 = Engine(spark, eng.catalog.dir)
    assert "keep" in eng2.catalog.schemas
