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
