"""Round-9 map-subscript routing (VERDICT r08 task 7): ``m[k]`` on a
catalog-resolvable MAP column returns DuckDB's LIST shape ([value] on hit,
[] on miss — same as map_extract), resolved against the FROM relation's
actual schema in service/sql_routing.rewrite_map_subscripts. Also covers
the MAP(K, V) column type in CREATE TABLE (catalog.parse_type)."""

from __future__ import annotations

import tempfile

import duckdb
import pytest


@pytest.fixture(scope="module")
def engines(spark):
    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="warehouse_maps_"))
    con = duckdb.connect()
    for ex in (eng.execute, con.execute):
        ex("CREATE TABLE mt (id INTEGER, m MAP(VARCHAR, INTEGER), arr INTEGER[], s VARCHAR)")
        ex(
            "INSERT INTO mt VALUES (1, map(['a','b'],[1,2]), [10,20], 'xy'), "
            "(2, map(['x'],[9]), [30], 'zz')"
        )
    return eng, con


QUERIES = [
    # LIST-shaped hit and miss
    "SELECT id, m['a'] AS hit, m['zz'] AS miss FROM mt ORDER BY id",
    # usable in predicates
    "SELECT id FROM mt WHERE m['a'] = [1] ORDER BY id",
    # non-map subscripts on the same relation keep element semantics
    "SELECT id, arr[2] AS a2, s[1] AS s1 FROM mt ORDER BY id",
    # dynamic (column-valued) key
    "SELECT id, m[s] AS dyn FROM mt ORDER BY id",
    # map_extract stays equivalent
    "SELECT id, map_extract(m, 'a') AS me FROM mt ORDER BY id",
]


@pytest.mark.parametrize("q", QUERIES)
def test_map_subscript_matches_duckdb(engines, q):
    eng, con = engines
    got = [tuple(r) for r in eng.query_df(q).collect()]
    want = [tuple(r) for r in con.execute(q).fetchall()]
    assert got == want, f"{q}: spark={got!r} duck={want!r}"


def test_map_subscript_untouched_without_from(spark):
    # no FROM relation to resolve against: the generic lowering stays
    from duckdb_service_spark.service.dialect import translate
    from duckdb_service_spark.service.sql_routing import rewrite_map_subscripts

    sql = "SELECT map(['a'],[1])['a'] AS v"
    assert rewrite_map_subscripts(spark, sql, translate) == sql


def test_float_column_floordiv_matches_duckdb(spark, engines):
    # `dcol // x` on a schema-resolved floating column is plain DOUBLE
    # division in DuckDB — the service layer resolves what the textual
    # dialect cannot (tests reuse the engines fixture's warehouse)
    import duckdb

    eng, _ = engines
    con = duckdb.connect()
    for ex in (eng.execute, con.execute):
        ex("CREATE TABLE ft (i INTEGER, d DOUBLE)")
        ex("INSERT INTO ft VALUES (7, 7.5), (9, 2.0)")
    for q in [
        "SELECT i, d // 2 AS a, i // 2 AS b, 15 // d AS c FROM ft ORDER BY i",
        "SELECT i // nullif(i - 7, 0) AS g FROM ft ORDER BY i",
    ]:
        got = [tuple(r) for r in eng.query_df(q).collect()]
        want = con.execute(q).fetchall()
        assert got == want, f"{q}: {got} != {want}"


def test_string_column_subscripts_and_slices(engines):
    # bare string-column subscripts + slices through the schema route
    import duckdb

    eng, _ = engines
    con = duckdb.connect()
    for ex in (eng.execute, con.execute):
        ex("CREATE TABLE st (id INTEGER, s VARCHAR)")
        ex("INSERT INTO st VALUES (1, 'abcde'), (2, 'héllo'), (3, '')")
    for q in [
        "SELECT id, s[2] AS a, s[0] AS b, s[-1] AS c FROM st ORDER BY id",
        "SELECT id, s[2:3] AS a, s[2:] AS b, s[:2] AS c, s[2:-1] AS d FROM st ORDER BY id",
        "SELECT id FROM st WHERE s[1] = 'a'",
    ]:
        got = [tuple(r) for r in eng.query_df(q).collect()]
        want = con.execute(q).fetchall()
        assert got == want, f"{q}: {got} != {want}"
