"""Round-5 ADVICE regression tests.

1. bare-path FROM rewrite must not fire on string literals in select
   lists / IN lists (sql_routing.py `_rewrite_bare_path_from`).
2. MERGE with only NOT-MATCHED clauses must not duplicate target rows
   when one target row matches multiple source rows (dml.py merge_into).
3. SIMILAR TO / GLOB rewrite must not corrupt string literals that
   contain the operator keywords (dialect.py `_rewrite_similar_glob`).
4. comma-form FROM UNNEST followed by another relation must emit the
   LATERAL VIEW after all relations (dialect.py `_rewrite_from_unnest`).
5. IGNORE/RESPECT NULLS with nested call arguments must still rewrite
   (dialect.py `_rewrite_ignore_nulls`).
"""

from __future__ import annotations

import os
import tempfile

import pytest


@pytest.fixture(scope="module")
def engine(spark):
    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_advice5_"))


def _rows(engine, sql):
    return [tuple(r) for r in engine.query_df(sql).collect()]


# ---- 1. bare-path FROM position awareness ---------------------------------


def test_literal_ending_in_parquet_in_select_list(engine):
    rows = _rows(engine, "SELECT 'x' AS a, 'data.parquet' AS fname")
    assert rows == [("x", "data.parquet")]


def test_literal_ending_in_csv_in_in_list(engine):
    engine.execute("CREATE TABLE files_t (name TEXT)")
    engine.execute("INSERT INTO files_t VALUES ('a.csv'), ('z.txt')")
    rows = _rows(
        engine, "SELECT name FROM files_t WHERE name IN ('a.csv', 'b.csv')"
    )
    assert rows == [("a.csv",)]


def test_bare_path_still_rewrites_in_from(engine, tmp_path_factory):
    d = tmp_path_factory.mktemp("barepath")
    p = os.path.join(str(d), "five.parquet")
    engine.spark.range(5).toDF("i").write.parquet(p)
    rows = _rows(engine, f"SELECT count(*) AS c FROM '{p}'")
    assert rows == [(5,)]


def test_bare_path_comma_join_rewrites(engine, tmp_path_factory):
    d = tmp_path_factory.mktemp("barepath2")
    p = os.path.join(str(d), "three.parquet")
    engine.spark.range(3).toDF("j").write.parquet(p)
    rows = _rows(
        engine,
        f"SELECT count(*) AS c FROM (SELECT 1 AS one) o, '{p}'",
    )
    assert rows == [(3,)]


# ---- 2. MERGE duplicate-match guard without WHEN MATCHED ------------------


def test_merge_not_matched_only_does_not_duplicate(engine):
    engine.execute("CREATE TABLE dm_t (id INTEGER, v TEXT)")
    engine.execute("INSERT INTO dm_t VALUES (1,'a'),(2,'b'),(3,'c')")
    engine.execute("CREATE TABLE dm_s (id INTEGER)")
    # id=1 matches TWICE; only a BY SOURCE clause present
    engine.execute("INSERT INTO dm_s VALUES (1),(1),(2)")
    out = engine.execute(
        "MERGE INTO dm_t USING dm_s ON dm_t.id = dm_s.id "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    assert out.rows_affected == 1  # id=3 deleted
    assert _rows(engine, "SELECT id, v FROM dm_t ORDER BY id") == [
        (1, "a"),
        (2, "b"),
    ]


def test_merge_insert_only_does_not_duplicate(engine):
    engine.execute("CREATE TABLE dm2_t (id INTEGER, v TEXT)")
    engine.execute("INSERT INTO dm2_t VALUES (1,'a')")
    engine.execute("CREATE TABLE dm2_s (id INTEGER, v TEXT)")
    engine.execute("INSERT INTO dm2_s VALUES (1,'x'),(1,'y'),(4,'d')")
    engine.execute(
        "MERGE INTO dm2_t USING dm2_s ON dm2_t.id = dm2_s.id "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale' "
        "WHEN NOT MATCHED THEN INSERT VALUES (dm2_s.id, dm2_s.v)"
    )
    rows = _rows(engine, "SELECT id FROM dm2_t ORDER BY id")
    assert [r[0] for r in rows] == [1, 4]


# ---- 3. GLOB / SIMILAR TO literal safety ----------------------------------


def test_glob_keyword_inside_literal_untouched(engine):
    rows = _rows(engine, "SELECT 'he GLOB ''x''' AS s")
    assert rows == [("he GLOB 'x'",)]


def test_similar_to_inside_literal_untouched(engine):
    rows = _rows(engine, "SELECT 'a SIMILAR TO b' AS s, 'ac' SIMILAR TO 'a.' AS m")
    assert rows == [("a SIMILAR TO b", True)]


# ---- 4. comma-form UNNEST followed by another relation --------------------


def test_comma_unnest_then_relation(engine):
    engine.execute("CREATE TABLE un_t (id INTEGER, xs INTEGER[])")
    engine.execute("INSERT INTO un_t VALUES (1, [10, 20])")
    engine.execute("CREATE TABLE un_s (id INTEGER, tag TEXT)")
    engine.execute("INSERT INTO un_s VALUES (1, 'ok')")
    rows = _rows(
        engine,
        "SELECT u.x, s.tag FROM un_t t, UNNEST(t.xs) AS u(x), un_s s "
        "WHERE s.id = t.id ORDER BY u.x",
    )
    assert rows == [(10, "ok"), (20, "ok")]


# ---- 5. IGNORE NULLS with nested call arguments ---------------------------


def test_ignore_nulls_nested_call(engine):
    engine.execute("CREATE TABLE in_t (g INTEGER, o INTEGER, a INTEGER, b INTEGER)")
    engine.execute(
        "INSERT INTO in_t VALUES (1,1,NULL,NULL),(1,2,NULL,7),(1,3,5,NULL)"
    )
    rows = _rows(
        engine,
        "SELECT o, first_value(coalesce(a, b) IGNORE NULLS) OVER "
        "(PARTITION BY g ORDER BY o) AS fv FROM in_t ORDER BY o",
    )
    assert rows == [(1, None), (2, 7), (3, 7)]
