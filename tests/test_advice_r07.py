"""Round-7 ADVICE regression tests — all four findings differentially
verified against DuckDB on the same statement.

1. ``~`` / ``!~`` are DuckDB aliases for regexp_full_match (measured:
   'xab' ~ 'a.*' is FALSE), so the rewrite must anchor literal patterns
   like the SIMILAR TO rewrite does and raise on non-literal patterns
   (dialect.py _anchored_regex_rhs).
2. first/last(x ORDER BY k) must position NULL ordering keys NULLS LAST
   (both directions — measured), not skip them the way min_by/max_by do
   (dialect.py _emit_ordered_first_last null-flag struct key).
3. ``~~*`` / ``!~~*`` must tokenize before ``~~`` / ``!~~`` and lower to
   ILIKE / NOT ILIKE (dialect.py _BINOP_TEXT_RE).
4. count(DISTINCT x) FILTER (WHERE c) OVER (...) must keep DISTINCT
   outside the folded CASE and then ride the window-DISTINCT lowering
   (dialect.py _rewrite_window_filter ordering + DISTINCT handling).
"""

from __future__ import annotations

import duckdb
import pytest

from duckdb_service_spark.service.dialect import UnsupportedDialect, translate


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _differential(spark, con, sql, order_insensitive=True):
    got = [tuple(r) for r in spark.sql(translate(sql)).collect()]
    want = con.execute(sql).fetchall()
    if order_insensitive:
        got, want = sorted(got, key=repr), sorted(want, key=repr)
    assert got == want, f"{sql!r}: spark={got} duckdb={want}"


# ---- 1. ~ / !~ full-match anchoring ---------------------------------------

REGEX_OP_CASES = [
    # partial matches that are NOT full matches — the unanchored RLIKE bug
    "SELECT s ~ 'a.*' AS m FROM (VALUES ('xab'), ('ab'), ('abx'), (NULL)) t(s)",
    "SELECT s !~ 'a.*' AS m FROM (VALUES ('xab'), ('ab'), (NULL)) t(s)",
    "SELECT s FROM (VALUES ('foo1'), ('xfoo1'), ('foo')) t(s) WHERE s ~ 'foo[0-9]+'",
    # escaped quote inside the pattern
    "SELECT s ~ 'it''s.*' AS m FROM (VALUES ('it''s fine'), ('x it''s')) t(s)",
]


@pytest.mark.parametrize("sql", REGEX_OP_CASES)
def test_regex_match_is_anchored(spark, con, sql):
    _differential(spark, con, sql)


def test_regex_match_nonliteral_pattern_raises():
    with pytest.raises(UnsupportedDialect):
        translate("SELECT s ~ upper(p) FROM t")
    with pytest.raises(UnsupportedDialect):
        translate("SELECT s !~ p FROM t")


# ---- 2. first/last ORDER BY with NULL ordering keys ------------------------

FIRST_LAST_SQL = (
    "SELECT {fn}(x ORDER BY k{dir}) AS v FROM "
    "(VALUES ('a', 1), ('b', 2), ('c', NULL)) t(x, k)"
)


@pytest.mark.parametrize("fn", ["first", "last"])
@pytest.mark.parametrize("direction", ["", " DESC"])
def test_first_last_null_key_nulls_last(spark, con, fn, direction):
    _differential(
        spark, con, FIRST_LAST_SQL.format(fn=fn, dir=direction)
    )


def test_first_all_null_keys_returns_a_row(spark, con):
    sql = (
        "SELECT first(x ORDER BY k) AS v FROM "
        "(SELECT 'a' AS x, CAST(NULL AS INT) AS k)"
    )
    _differential(spark, con, sql)


def test_last_multikey_null_tail_key(spark, con):
    sql = (
        "SELECT last(x ORDER BY k1, k2) AS v FROM "
        "(VALUES ('a', 1, 1), ('b', 1, NULL), ('c', 0, 9)) t(x, k1, k2)"
    )
    _differential(spark, con, sql)


def test_last_null_value_non_null_key_still_positional(spark, con):
    # regression guard for the original struct-wrap behavior: a NULL value
    # with the greatest key must still be returned (not skipped)
    sql = (
        "SELECT last(x ORDER BY k) AS v FROM "
        "(VALUES ('a', 1), (NULL, 2)) t(x, k)"
    )
    _differential(spark, con, sql)


# ---- 3. ~~* / !~~* tokenization -------------------------------------------

ILIKE_OP_CASES = [
    "SELECT s ~~* 'ab%' AS m FROM (VALUES ('AbC'), ('xAb'), (NULL)) t(s)",
    "SELECT s !~~* 'ab%' AS m FROM (VALUES ('AbC'), ('xAb'), (NULL)) t(s)",
    # the shorter tokens must still work alongside
    "SELECT s ~~ 'ab%' AS m, s !~~ 'ab%' AS n FROM (VALUES ('abc'), ('ABC')) t(s)",
]


@pytest.mark.parametrize("sql", ILIKE_OP_CASES)
def test_ilike_operators(spark, con, sql):
    _differential(spark, con, sql)


# ---- 4. window FILTER with DISTINCT ----------------------------------------

def test_count_distinct_filter_over(spark, con):
    sql = (
        "SELECT x, count(DISTINCT x) FILTER (WHERE c) OVER () AS n FROM "
        "(VALUES (1, true), (1, true), (2, false), (3, true)) t(x, c)"
    )
    _differential(spark, con, sql)


def test_sum_distinct_filter_over_partition(spark, con):
    sql = (
        "SELECT g, sum(DISTINCT x) FILTER (WHERE c) OVER (PARTITION BY g) AS s "
        "FROM (VALUES (1, 1, true), (1, 1, true), (1, 2, false), "
        "(2, 5, true), (2, 5, true)) t(g, x, c)"
    )
    got = [
        (r[0], None if r[1] is None else float(r[1]))
        for r in spark.sql(translate(sql)).collect()
    ]
    want = [
        (r[0], None if r[1] is None else float(r[1]))
        for r in con.execute(sql).fetchall()
    ]
    assert sorted(got) == sorted(want)


def test_plain_filter_over_unchanged(spark, con):
    sql = (
        "SELECT count(*) FILTER (WHERE c) OVER () AS n FROM "
        "(VALUES (true), (false), (true)) t(c)"
    )
    _differential(spark, con, sql)
