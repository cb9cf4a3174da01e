"""Round-7 idiom sweep regressions: DuckDB function-surface gaps found by
a systematic idiom sweep, each differential-tested verbatim.

- arg_min/arg_max skip rows with NULL value or NULL ordering key (measured)
- first/last with inline ORDER BY are POSITIONAL (struct-wrapped min_by/
  max_by so a NULL value is not skipped), DESC supported
- string_agg/group_concat 1-arg form defaults ',' separator
- product / kahan_sum / fdiv / fmod (FLOORED division+modulo pair)
- strip_accents (Latin-1 fold) / list_grade_up (argsort, NULLs last)
- aggregate FILTER shorthand without WHERE
- FILTER on WINDOW aggregates (Spark lacks it: folded into a CASE arg)
"""

from __future__ import annotations

import duckdb
import pytest

from duckdb_service_spark.service.dialect import translate

ROWS = [(1, "ab", 1.5), (2, "cd", -2.5), (3, None, None), (4, "zz", 0.5)]
# note: t.s holds strings for the regex/LIKE operator cases


@pytest.fixture(scope="module")
def engines(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s TEXT, d DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", ROWS)
    spark.createDataFrame(ROWS, "i int, s string, d double").createOrReplaceTempView(
        "t"
    )
    return spark, con


CASES = [
    "SELECT last(s ORDER BY i) AS a, first(s ORDER BY i) AS b FROM t",
    "SELECT last(s ORDER BY i DESC) AS a FROM t",
    "SELECT i % 2 AS m, first(s ORDER BY i) AS f FROM t GROUP BY 1",
    "SELECT arg_max(s, i) AS a, arg_min(s, i) AS b, arg_max(s, d) AS c FROM t",
    "SELECT string_agg(s) AS x FROM t",
    "SELECT group_concat(s, '|') AS x FROM t",
    "SELECT group_concat(s) AS x FROM t",
    "SELECT round(product(d), 6) AS x FROM t",
    "SELECT kahan_sum(d) AS x FROM t",
    "SELECT fdiv(-7.5, 2) AS a, fmod(-7.5, 2) AS b, fdiv(7, 2) AS c, "
    "fmod(7.5, 2) AS e",
    "SELECT strip_accents('café ÀÉÎõü Ññ') AS x",
    "SELECT list_grade_up([3, 1, 2, NULL]) AS x",
    "SELECT sum(i) FILTER (i > 1) AS x FROM t",
    "SELECT i, sum(i) FILTER (i > 1) OVER () AS w FROM t",
    "SELECT i, count(*) FILTER (WHERE s IS NOT NULL) OVER (ORDER BY i) AS w FROM t",
    "SELECT avg(d) FILTER (WHERE i <> 2) OVER (PARTITION BY i % 2) AS w FROM t",
    "SELECT quantile_cont(d, [0.25, 0.5, 0.75]) AS q FROM t",
    # list/map/json batch (round-7 second sweep)
    "SELECT list_any_value([NULL, 3, 1]) AS x",
    "SELECT array_pop_back([1,2,3]) AS x, array_pop_front([1,2,3]) AS y",
    "SELECT list_select([10,20,30], [3,1]) AS x",
    "SELECT list_where([10,20,30], [true,false,true]) AS x",
    "SELECT list_has_any([1,2],[2,9]) AS x, list_has_all([1,2,3],[1,3]) AS y",
    "SELECT json_array_length('[1,2,3]') AS x",
    "SELECT json_keys('{\"a\":1,\"b\":2}') AS x",
    "SELECT json_valid('{\"a\": 1}') AS a, json_valid('nope{') AS b",
    "SELECT map_keys(map(['a','b'],[1,2])) AS x",
    "SELECT cardinality(map(['a'],[1])) AS x",
    "SELECT struct_pack(a := 1, b := 'x') AS x",
    "SELECT list_unique([1,1,2,NULL]) AS x",
    "SELECT array_length([1,2,3]) AS x",
    "SELECT list_reduce([1,2,3], (a, b) -> a + b) AS x",
    "SELECT list_apply([1,2], x -> x * 10) AS x",
    # operator-symbol batch (round-7 third sweep): ** and ^ are POWER in
    # DuckDB (^ is XOR in Spark — silent wrong value without the rewrite),
    # ~ family is regex/LIKE, ^@ is starts_with, xor() is the function form
    "SELECT 2 ** 10 AS x",
    "SELECT 2 ^ 10 AS x",
    "SELECT -2 ** 2 AS x",
    "SELECT 3 - 2 ** 2 AS x",
    "SELECT 2 * 3 ** 2 AS x",
    "SELECT xor(10, 5) AS x",
    "SELECT ~5 AS x",
    "SELECT s ~ 'a.*' AS x FROM t",
    "SELECT s !~ 'a.*' AS x FROM t",
    "SELECT s ~~ 'a%' AS x FROM t",
    "SELECT s !~~ 'a%' AS x FROM t",
    "SELECT s ^@ 'ab' AS x FROM t",
    "SELECT i << 2 AS a, i >> 1 AS b, i & 6 AS c, i | 1 AS d FROM t",
    "SELECT format('{}/{}', 3, 'xy') AS x",
    "SELECT format('pct 100% {}', 5) AS x",
    # date/string batch (round-7 fourth sweep)
    "SELECT dayofweek(DATE '2024-02-29') AS x",
    "SELECT yearweek(DATE '2021-01-01') AS x, yearweek(DATE '2024-02-29') AS y",
    "SELECT century(DATE '2024-02-29') AS x, decade(DATE '2024-02-29') AS y",
    "SELECT epoch_ns(TIMESTAMP '2024-02-29 13:45:30.123456') AS x",
    "SELECT microsecond(TIMESTAMP '2024-02-29 13:45:30.123456') AS x, "
    "millisecond(TIMESTAMP '2024-02-29 13:45:30.123456') AS y",
    "SELECT date_sub('month', DATE '2024-02-29', DATE '2024-07-01') AS x, "
    "datesub('day', DATE '2024-02-29', DATE '2024-03-05') AS y",
    "SELECT sha256('x') AS x",
    "SELECT base64(encode('Hi')) AS x",
    "SELECT from_base64('SGVsbG8=') AS x",
    "SELECT ltrim('Hello', 'He') AS x, rtrim('Hello', 'lo') AS y, "
    "trim('Hello', 'Ho') AS z",
    "SELECT like_escape('a_b', 'a$_b', '$') AS a, "
    "ilike_escape('A_B', 'a$_b', '$') AS b",
]


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):
        return tuple(sorted((k, _norm(x)) for k, x in v.asDict().items()))
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


@pytest.mark.parametrize("q", CASES)
def test_idiom_matches_duckdb(engines, q):
    spark, con = engines
    want = sorted(repr(tuple(_norm(x) for x in r)) for r in con.execute(q).fetchall())
    got = sorted(
        repr(tuple(_norm(x) for x in r))
        for r in [tuple(r) for r in spark.sql(translate(q)).collect()]
    )
    assert got == want
