"""Round-3 ADVICE regression tests: dialect bare-type rewrite, DESCRIBE
paren stripping, WITH RECURSIVE top-level UNION ALL split, ASOF routing
literal/collision safety, ON CONFLICT target validation, ROLLBACK."""

from __future__ import annotations

import tempfile

import pytest


@pytest.fixture(scope="module")
def engine(spark):
    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_advice_"))


# ---- dialect: TEXT/VARCHAR only in cast contexts --------------------------


def test_identifier_named_text_survives(engine):
    engine.execute("CREATE TABLE doc_like (doc_id INTEGER, text TEXT)")
    engine.execute("INSERT INTO doc_like VALUES (1, 'hello')")
    rows = engine.query_df("SELECT text FROM doc_like").collect()
    assert rows[0].text == "hello"
    rows = engine.query_df("SELECT doc_id AS text FROM doc_like").collect()
    assert rows[0].text == 1


def test_cast_to_text_and_varchar_still_rewritten(engine):
    rows = engine.query_df(
        "SELECT CAST(7 AS TEXT) AS a, TRY_CAST('8' AS VARCHAR) AS b, 9::VARCHAR AS c"
    ).collect()
    assert (rows[0].a, rows[0].b, rows[0].c) == ("7", "8", "9")


def test_cast_literal_arg_with_text_target(engine):
    rows = engine.query_df("SELECT CAST('5' AS TEXT) AS v").collect()
    assert rows[0].v == "5"


def test_string_literal_containing_cast_text_untouched(engine):
    rows = engine.query_df("SELECT 'CAST(a AS TEXT)' AS lit").collect()
    assert rows[0].lit == "CAST(a AS TEXT)"


# ---- DESCRIBE <query> balanced paren stripping ----------------------------


def test_describe_query_ending_in_paren(engine):
    _, df = engine.run_statement("DESCRIBE SELECT count(*) AS c FROM (SELECT 1 AS x)")
    cols = {r.column_name for r in df.collect()}
    assert cols == {"c"}


def test_describe_wrapped_query(engine):
    _, df = engine.run_statement("DESCRIBE (SELECT 1 AS a, 'b' AS b)")
    assert {r.column_name for r in df.collect()} == {"a", "b"}


# ---- WITH RECURSIVE: top-level UNION ALL only -----------------------------


def test_recursive_union_all_inside_parens_not_split(engine):
    # seed is itself a parenthesized UNION ALL — one top-level split point
    rows = engine.query_df(
        "WITH RECURSIVE t(n) AS ("
        "(SELECT 1 UNION ALL SELECT 2) "
        "UNION ALL SELECT n + 10 FROM t WHERE n < 20"
        ") SELECT count(*) AS c, sum(n) AS s FROM t"
    ).collect()
    # 1,2 then 11,12 then 21,22 -> stop (n<20 fails for 21,22)
    assert rows[0].c == 6 and rows[0].s == 69


def test_recursive_multiple_top_level_unions_raise(engine):
    from duckdb_service_spark.service.dialect import UnsupportedDialect

    with pytest.raises((UnsupportedDialect, ValueError)):
        engine.query_df(
            "WITH RECURSIVE t(n) AS ("
            "SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT n + 1 FROM t WHERE n < 5"
            ") SELECT * FROM t"
        )


def test_recursive_union_all_in_string_literal_ignored(engine):
    rows = engine.query_df(
        "WITH RECURSIVE t(n, tag) AS ("
        "SELECT 1, 'UNION ALL' "
        "UNION ALL SELECT n + 1, tag FROM t WHERE n < 3"
        ") SELECT count(*) AS c FROM t"
    ).collect()
    assert rows[0].c == 3


# ---- ASOF routing: collision detection + literal-safe flattening ----------


def test_asof_right_column_collision_raises(engine):
    from duckdb_service_spark.service.dialect import UnsupportedDialect

    engine.execute("CREATE TABLE aleft (k INTEGER, ts INTEGER, value TEXT)")
    engine.execute("CREATE TABLE aright (k INTEGER, ts INTEGER, value TEXT)")
    engine.execute("INSERT INTO aleft VALUES (1, 10, 'L')")
    engine.execute("INSERT INTO aright VALUES (1, 5, 'R')")
    with pytest.raises((UnsupportedDialect, ValueError)):
        engine.query_df(
            "SELECT l.k, l.ts, l.value, r.value "
            "FROM aleft l ASOF JOIN aright r ON l.k = r.k AND l.ts >= r.ts"
        )


def test_asof_literal_with_alias_dot_survives(engine):
    engine.execute("CREATE TABLE bleft (k INTEGER, ts INTEGER)")
    engine.execute("CREATE TABLE bright (k INTEGER, ts INTEGER, payload TEXT)")
    engine.execute("INSERT INTO bleft VALUES (1, 10)")
    engine.execute("INSERT INTO bright VALUES (1, 5, 'P')")
    rows = engine.query_df(
        "SELECT l.k, l.ts, r.payload, 'r.ts literal' AS note "
        "FROM bleft l ASOF JOIN bright r ON l.k = r.k AND l.ts >= r.ts"
    ).collect()
    assert rows[0].payload == "P" and rows[0].note == "r.ts literal"


def test_asof_payload_pruned_to_referenced(engine, spark):
    """Unreferenced right columns must not ride through the window struct."""
    from duckdb_service_spark.service import sql_routing
    from duckdb_service_spark.service.dialect import translate

    engine.execute("CREATE TABLE cleft (k INTEGER, ts INTEGER)")
    engine.execute(
        "CREATE TABLE cright (k INTEGER, ts INTEGER, keepme TEXT, heavy1 TEXT, heavy2 TEXT)"
    )
    engine.execute("INSERT INTO cleft VALUES (1, 10)")
    engine.execute("INSERT INTO cright VALUES (1, 5, 'y', 'x', 'x')")
    out = sql_routing.route_asof_join(
        spark,
        "SELECT l.k, r.keepme FROM cleft l ASOF JOIN cright r ON l.k = r.k AND l.ts >= r.ts",
        resolve=engine.catalog.read,
        translate=translate,
    )
    assert [r.keepme for r in out.collect()] == ["y"]
    routed = spark.table("__asof_routed")
    assert "heavy1" not in routed.columns and "heavy2" not in routed.columns


# ---- ON CONFLICT target validation ----------------------------------------


def test_on_conflict_wrong_target_raises(engine):
    engine.execute("CREATE TABLE oc (id INTEGER PRIMARY KEY, v TEXT)")
    engine.execute("INSERT INTO oc VALUES (1, 'a')")
    with pytest.raises(ValueError):
        engine.execute("INSERT INTO oc VALUES (1, 'b') ON CONFLICT (v) DO NOTHING")


def test_on_conflict_pk_target_ok(engine):
    engine.execute("CREATE TABLE oc2 (id INTEGER PRIMARY KEY, v TEXT)")
    engine.execute("INSERT INTO oc2 VALUES (1, 'a')")
    out = engine.execute("INSERT INTO oc2 VALUES (1, 'b') ON CONFLICT (id) DO NOTHING")
    assert out.rows_affected == 0
    assert engine.query_df("SELECT v FROM oc2").collect()[0].v == "a"


# ---- ROLLBACK raises -------------------------------------------------------


def test_rollback_raises(engine):
    assert engine.execute("BEGIN").rows_affected == 0
    assert engine.execute("COMMIT").rows_affected == 0
    with pytest.raises(ValueError):
        engine.execute("ROLLBACK")
