"""Round-6 ADVICE regression tests.

1. _rewrite_division_double must not mangle CASE..END, window specs,
   named windows, or comment delimiters (dialect.py).
2. INSERT default handling on tables with generated columns: bare
   DEFAULT tokens resolve against insertable columns; DEFAULT VALUES
   skips generated columns (dml.py).
3. Postfix int casts (2.5::INTEGER) take the same DuckDB rounding path
   as CAST(2.5 AS INTEGER) (dialect.py _rewrite_postfix_int_casts).
4. ALTER TABLE ADD COLUMN ... DEFAULT backfills through the dialect
   translator (catalog.py).
5. Self-referencing FOREIGN KEY validates against end-of-statement
   state: one batch may contain both parent and child rows (dml.py).
"""

from __future__ import annotations

import tempfile

import duckdb
import pytest

from duckdb_service_spark.service.dialect import translate


@pytest.fixture(scope="module")
def engine(spark):
    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_advice6_"))


def _rows(engine, sql):
    return [tuple(r) for r in engine.query_df(sql).collect()]


# ---- 1. division-rewrite operand identification ---------------------------


def test_division_after_case_end_wraps_whole_case(engine):
    sql = "SELECT CASE WHEN 1=1 THEN 1 ELSE 2 END / 4 AS v"
    assert "CAST(CASE WHEN" in translate(sql)
    assert _rows(engine, sql) == [(0.25,)]


def test_division_after_nested_case_end(engine):
    sql = (
        "SELECT CASE WHEN 1=0 THEN CASE WHEN 1=1 THEN 9 ELSE 8 END "
        "ELSE 5 END / 2 AS v"
    )
    assert _rows(engine, sql) == [(2.5,)]


def test_division_after_window_spec(engine):
    engine.execute("CREATE TABLE adv6_w (g INT, x INT)")
    engine.execute("INSERT INTO adv6_w VALUES (1, 3), (1, 4)")
    rows = _rows(
        engine,
        "SELECT sum(x) OVER (PARTITION BY g) / 2 AS v FROM adv6_w",
    )
    assert rows == [(3.5,), (3.5,)]


def test_division_after_named_window(engine):
    rows = _rows(
        engine,
        "SELECT sum(x) OVER w / 2 AS v FROM adv6_w WINDOW w AS (PARTITION BY g)",
    )
    assert rows == [(3.5,), (3.5,)]


def test_division_comment_delimiters_untouched():
    out = translate("SELECT a /* note */ , b/2 FROM t")
    assert "/* note */" in out
    assert "CAST(a AS DOUBLE)" not in out
    assert "CAST(b AS DOUBLE)/2" in out


def test_division_plain_operands_still_rewritten():
    out = translate("SELECT a/b, f(x)/2, (a+b)/c FROM t")
    assert "CAST(a AS DOUBLE)/b" in out
    assert "CAST(f(x) AS DOUBLE)/2" in out
    assert "CAST((a+b) AS DOUBLE)/c" in out


# ---- 2. generated columns and DEFAULT handling ----------------------------


def test_default_values_skips_generated_column(engine):
    engine.execute(
        "CREATE TABLE adv6_gen (a INT DEFAULT 7, "
        "b INT GENERATED ALWAYS AS (a * 2), c INT DEFAULT 5)"
    )
    engine.execute("INSERT INTO adv6_gen DEFAULT VALUES")
    assert _rows(engine, "SELECT a, b, c FROM adv6_gen") == [(7, 14, 5)]


def test_positional_default_token_after_generated_column(engine):
    # positional VALUES map to insertable columns (a, c): the DEFAULT in
    # slot 2 must resolve to c's default (5), not b's
    engine.execute("INSERT INTO adv6_gen VALUES (10, DEFAULT)")
    rows = sorted(_rows(engine, "SELECT a, b, c FROM adv6_gen"))
    assert rows == [(7, 14, 5), (10, 20, 5)]


# ---- 3. postfix int casts round like CAST ---------------------------------


@pytest.mark.parametrize(
    "expr",
    ["2.5::INTEGER", "(2.5)::INTEGER", "'-2.5'::INT", "2.49::BIGINT",
     "(1.0 + 1.5)::INTEGER"],
)
def test_postfix_int_cast_matches_duckdb(engine, expr):
    want = duckdb.sql(f"SELECT {expr} AS v").fetchone()[0]
    assert _rows(engine, f"SELECT {expr} AS v") == [(want,)]


def test_postfix_and_cast_spelling_agree(engine):
    rows = _rows(
        engine, "SELECT 2.5::INTEGER AS a, CAST(2.5 AS INTEGER) AS b"
    )
    assert rows == [(3, 3)]


# ---- 4. ALTER ADD COLUMN DEFAULT goes through translate() -----------------


def test_alter_add_column_duckdb_dialect_default(engine):
    engine.execute("CREATE TABLE adv6_alter (s TEXT)")
    engine.execute("INSERT INTO adv6_alter VALUES ('hello world')")
    # str_split is DuckDB dialect (Spark: split) — backfill must translate
    engine.execute(
        "ALTER TABLE adv6_alter ADD COLUMN w TEXT "
        "DEFAULT str_split('a b', ' ')[1]"
    )
    assert _rows(engine, "SELECT s, w FROM adv6_alter") == [("hello world", "a")]


# ---- 5. self-referencing FK within one batch ------------------------------


def test_self_referencing_fk_same_batch(engine):
    engine.execute(
        "CREATE TABLE adv6_tree (id INT PRIMARY KEY, "
        "parent_id INT REFERENCES adv6_tree(id))"
    )
    engine.execute(
        "INSERT INTO adv6_tree VALUES (1, NULL), (2, 1), (3, 2)"
    )
    assert sorted(_rows(engine, "SELECT id, parent_id FROM adv6_tree")) == [
        (1, None), (2, 1), (3, 2)
    ]


def test_self_referencing_fk_still_rejects_dangling(engine):
    from duckdb_service_spark.service.dml import ConstraintViolation

    with pytest.raises(Exception):
        engine.execute("INSERT INTO adv6_tree VALUES (9, 999)")
