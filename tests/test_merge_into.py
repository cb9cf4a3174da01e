"""MERGE INTO (DuckDB >= 1.4 surface; the reference's linked engine is
go-duckdb v1.8.3 = DuckDB 1.1.x, so this is forward surface beyond strict
parity — semantics follow DuckDB 1.4's documented MERGE: first matching WHEN
clause wins per row, UPDATE/DELETE/INSERT/DO NOTHING actions, BY SOURCE
clauses, shorthand UPDATE/INSERT, RETURNING with merge_action."""

from __future__ import annotations

import tempfile

import pytest


@pytest.fixture(scope="module")
def engine(spark):
    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_merge_"))


def _rows(engine, sql):
    return [tuple(r) for r in engine.query_df(sql).collect()]


def test_merge_update_and_insert(engine):
    engine.execute("CREATE TABLE mt (id INTEGER PRIMARY KEY, v TEXT, n INTEGER)")
    engine.execute("INSERT INTO mt VALUES (1,'a',10),(2,'b',20),(3,'c',30)")
    engine.execute("CREATE TABLE ms (id INTEGER, v TEXT, n INTEGER)")
    engine.execute("INSERT INTO ms VALUES (2,'B',99),(4,'d',40)")
    out = engine.execute(
        "MERGE INTO mt USING ms ON mt.id = ms.id "
        "WHEN MATCHED THEN UPDATE SET v = ms.v, n = ms.n "
        "WHEN NOT MATCHED THEN INSERT VALUES (ms.id, ms.v, ms.n)"
    )
    assert out.rows_affected == 2
    assert _rows(engine, "SELECT * FROM mt ORDER BY id") == [
        (1, "a", 10), (2, "B", 99), (3, "c", 30), (4, "d", 40),
    ]


def test_merge_clause_order_and_shorthands(engine):
    engine.execute("CREATE TABLE ms2 (id INTEGER, v TEXT, n INTEGER)")
    engine.execute("INSERT INTO ms2 VALUES (1,'x',1),(3,'y',500),(5,'e',50)")
    out = engine.execute(
        "MERGE INTO mt USING ms2 ON mt.id = ms2.id "
        "WHEN MATCHED AND ms2.n > 100 THEN DELETE "
        "WHEN MATCHED THEN UPDATE "
        "WHEN NOT MATCHED THEN INSERT"
    )
    # id=3 deleted (n=500>100), id=1 updated via shorthand, id=5 inserted
    assert out.rows_affected == 3
    assert _rows(engine, "SELECT * FROM mt ORDER BY id") == [
        (1, "x", 1), (2, "B", 99), (4, "d", 40), (5, "e", 50),
    ]


def test_merge_not_matched_by_source(engine):
    engine.execute("CREATE TABLE ms3 (id INTEGER, v TEXT, n INTEGER)")
    engine.execute("INSERT INTO ms3 VALUES (2,'keep',0)")
    out = engine.execute(
        "MERGE INTO mt USING ms3 ON mt.id = ms3.id "
        "WHEN NOT MATCHED BY SOURCE AND n < 45 THEN DELETE"
    )
    # rows 1 (n=1) and 4 (n=40) have no source match and n<45 -> deleted;
    # row 5 (n=50) survives the AND; row 2 is matched
    assert out.rows_affected == 2
    assert _rows(engine, "SELECT id FROM mt ORDER BY id") == [(2,), (5,)]


def test_merge_returning_merge_action(engine):
    engine.execute("CREATE TABLE ms4 (id INTEGER, v TEXT, n INTEGER)")
    engine.execute("INSERT INTO ms4 VALUES (2,'upd',1),(9,'new',90)")
    out = engine.execute(
        "MERGE INTO mt USING ms4 ON mt.id = ms4.id "
        "WHEN MATCHED THEN UPDATE SET n = mt.n + ms4.n "
        "WHEN NOT MATCHED THEN INSERT "
        "RETURNING merge_action, id, n"
    )
    assert out.rows_affected == 2
    got = {tuple(r) for r in out.returning.collect()}
    assert got == {("UPDATE", 2, 100), ("INSERT", 9, 90)}


def test_merge_subquery_source_and_do_nothing(engine):
    out = engine.execute(
        "MERGE INTO mt USING (SELECT 2 AS id, 7 AS add_n) src ON mt.id = src.id "
        "WHEN MATCHED AND add_n > 100 THEN UPDATE SET n = add_n "
        "WHEN MATCHED THEN DO NOTHING"
    )
    assert out.rows_affected == 0
    assert _rows(engine, "SELECT n FROM mt WHERE id = 2") == [(100,)]


def test_merge_duplicate_source_match_raises(engine):
    engine.execute("CREATE TABLE ms5 (id INTEGER, n INTEGER)")
    engine.execute("INSERT INTO ms5 VALUES (2, 1), (2, 2)")
    with pytest.raises(Exception, match="update the same row twice"):
        engine.execute(
            "MERGE INTO mt USING ms5 ON mt.id = ms5.id "
            "WHEN MATCHED THEN UPDATE SET n = ms5.n"
        )


def test_merge_partitioned_target(engine):
    engine.execute(
        "CREATE TABLE mp (id INTEGER PRIMARY KEY, region TEXT, n INTEGER) "
        "PARTITION BY (region)"
    )
    engine.execute(
        "INSERT INTO mp VALUES (1,'eu',10),(2,'eu',20),(3,'us',30)"
    )
    engine.execute("CREATE TABLE mps (id INTEGER, n INTEGER)")
    engine.execute("INSERT INTO mps VALUES (1, 11), (3, 33), (7, 70)")
    out = engine.execute(
        "MERGE INTO mp USING mps ON mp.id = mps.id "
        "WHEN MATCHED THEN UPDATE SET n = mps.n "
        "WHEN NOT MATCHED THEN INSERT (id, region, n) VALUES (mps.id, 'new', mps.n)"
    )
    assert out.rows_affected == 3
    assert _rows(engine, "SELECT id, region, n FROM mp ORDER BY id") == [
        (1, "eu", 11), (2, "eu", 20), (3, "us", 33), (7, "new", 70),
    ]


def test_merge_http_surface(engine):
    # the statement must ride the same /db/execute envelope as other DML
    from duckdb_service_spark.service.serializer import execute_result

    out = engine.execute(
        "MERGE INTO mt USING (SELECT 50 AS id, 'z' AS v, 5 AS n) s ON mt.id = s.id "
        "WHEN NOT MATCHED THEN INSERT"
    )
    env = execute_result(out.rows_affected)
    assert env["rows_affected"] == 1
