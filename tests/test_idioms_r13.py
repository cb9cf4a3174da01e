"""Round-13 regression tests — VERDICT r12 tasks 1/2/4/6 + ADVICE r13,
each differentially verified against live DuckDB:

1. (VERDICT #1) The branch-type fold is COMPOSITIONAL: a function call,
   aggregate, arithmetic expression, or nested CASE beside a numeric /
   date string literal types like DuckDB's binder (the LIMIT-0 lane
   probe in sql_routing._branch_atom), so COALESCE(max(a), '9') /
   COALESCE(NULLIF(1,1), '7') / COALESCE(1+1, '7') coerce the literal
   into the composite's lane, GREATEST(1+1, '7') computes BIGINT 7, and
   a VARCHAR-typed composite against a lane reproduces DuckDB's binder
   error instead of Spark's string-wins coercion.
2. (VERDICT #2) quantile_cont/mad over DECIMAL truncate TOWARD ZERO on
   the scaled integers — emitted as e - e % 1 so the cast-contract's
   BROUND (round-half-even) rewrite cannot re-own the inner cast; the
   .5-boundary and negative-lane rows pin it.
3. (VERDICT #4/#5) UNION type-name fidelity: typeof(union_value(...))
   prints DuckDB's UNION(tag TYPE, ...), typeof(union_tag(...)) prints
   ENUM('tag', ...), and /db/query tags union_tag columns with the
   ENUM duckdb_type.
4. (VERDICT #6) numeric literal + implicit alias (1__0 / 1_000_ /
   1.5__x) rewrites to the literal + explicit alias DuckDB's parser
   produces — value AND column name match.
5. (ADVICE r13) INTERVAL '2 days'::INTERVAL splices ONCE (the two
   interval regexes no longer double-apply on the overlapping span);
   bare current_timestamp keyword casts to VARCHAR with the '+00'
   suffix; '->' only tags JSON when it is the extract operator (not a
   lambda arrow or inside a string literal); the serializer derives the
   UTC instant explicitly so a non-UTC driver host cannot shift
   TIMESTAMPTZ values while claiming '+00'.
6. (found r13) casts inside VALUES rows stay plain — Spark inline
   tables reject the cast contract's raise_error guards outright
   (INVALID_INLINE_TABLE), so FROM (VALUES (CAST(1.0 AS DECIMAL(3,1))),
   ...) must run.
7. (found r13) DuckDB's datetime LITERAL grammar: seconds are REQUIRED
   once a time component appears (TIMESTAMP '2020-01-01 01:00' raises
   its conversion error; TRY_CAST NULLs it; Spark alone parses a value
   silently), '/' date separators are accepted (normalized for Spark),
   and DATE ignores any remainder after the date prefix ('2020-01-01
   junk' is 2020-01-01). BC years, ±HH:MM offsets, hour-24 rollover,
   and epoch/infinity specials remain loud documented divergences.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def eng(spark):
    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_r13_"))


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _differential(eng, con, sql, check_cols=False):
    try:
        r = con.execute(sql)
        want = ("OK", r.fetchall(), [d[0] for d in r.description])
    except Exception as e:
        want = ("ERR", str(e).splitlines()[0], None)
    try:
        df = eng.query_df(sql)
        got = ("OK", [tuple(x) for x in df.collect()], df.columns)
    except Exception as e:
        got = ("ERR", str(e).splitlines()[0], None)
    assert got[0] == want[0], f"{sql!r}: spark={got} duck={want}"
    if got[0] == "OK":
        assert got[1] == want[1], f"{sql!r}: spark={got[1]} duck={want[1]}"
        if check_cols:
            assert got[2] == want[2], f"{sql!r}: cols spark={got[2]} duck={want[2]}"


# ---- 1. compositional branch typing ----------------------------------------

COMPOSITE_BRANCHES = [
    # the five VERDICT r12 "What's wrong #1" probes
    "SELECT COALESCE(CASE WHEN 1=0 THEN 1 END, '7') AS v",
    "SELECT COALESCE(NULLIF(1,1), '7') AS v",
    "SELECT COALESCE(1+1, '7') AS v",
    "SELECT GREATEST(1+1, '7') AS v",
    "SELECT CASE WHEN 1=0 THEN (CASE WHEN 1=1 THEN 1 END) ELSE '7' END AS v",
    # composite lanes: function calls, date arithmetic, width surfaces
    "SELECT COALESCE(length('ab'), '7') AS v",
    "SELECT COALESCE(DATE '2020-01-01' + 1, '2021-02-03') AS v",
    "SELECT COALESCE(1.5+1, '7') AS v",
    "SELECT GREATEST(length('ab'), '7') AS v",
    "SELECT LEAST(1+1, '7') AS v",
    "SELECT IF(1=0, 1+1, '7') AS v",
    "SELECT IFNULL(NULLIF(1,1), '7') AS v",
    # VARCHAR composite against a lane: DuckDB binder error
    "SELECT COALESCE(upper('x'), 1) AS v",
    # all-string composites stay VARCHAR
    "SELECT COALESCE(upper('x'), '7') AS v",
    # parens are transparent to the binder
    "SELECT COALESCE(1, ('7')) AS v",
    # aggregates in branches over a real FROM
    "SELECT COALESCE(max(v), '9') AS v FROM (VALUES (1),(2)) s(v)",
    "SELECT COALESCE(min(v), '9') AS v FROM (VALUES (1),(2)) s(v)",
    # r12 shapes must still hold (regression)
    "SELECT CASE WHEN 1=1 THEN 1 ELSE '2' END AS v",
    "SELECT COALESCE('2', 1) AS v",
    "SELECT COALESCE(NULL, '2', 1) AS v",
    "SELECT GREATEST(1, '2') AS v",
    "SELECT COALESCE(1, '2', 1.5) AS v",
]


@pytest.mark.parametrize("q", COMPOSITE_BRANCHES)
def test_composite_branch_lane(eng, con, q):
    _differential(eng, con, q)


# ---- 2. ordered stats over DECIMAL: trunc-toward-zero boundaries -----------

@pytest.fixture(scope="module")
def ordered_tables(eng, con):
    ddl = [
        "CREATE TABLE qd(v DECIMAL(2,1))",
        "INSERT INTO qd VALUES (1.1),(1.7),(3.2),(4.5)",
        "CREATE TABLE qn(v DECIMAL(3,1))",
        "INSERT INTO qn VALUES (-1.1),(-1.7),(-3.2),(-4.5)",
        "CREATE TABLE qm(v DECIMAL(3,1))",
        "INSERT INTO qm VALUES (1.0),(2.1),(4.1),(9.9)",
    ]
    for s in ddl:
        eng.execute(s)
        con.execute(s)
    return True


ORDERED_STATS = [
    # scaled 15.5 must land 1.5 (trunc), not 1.6 (BROUND half-even)
    "SELECT quantile_cont(v, 0.25) AS q FROM qd",
    "SELECT quantile_cont(v, [0.25, 0.75]) AS q FROM qd",
    # negatives: toward zero, not floor (-35.25 -> -3.5, -15.5 -> -1.5)
    "SELECT quantile_cont(v, 0.25) AS q FROM qn",
    "SELECT quantile_cont(v, 0.75) AS q FROM qn",
    # mad's deviation median hits the same boundary (trunc(15.5) = 1.5)
    "SELECT mad(v) AS m FROM qm",
    "SELECT mad(v) AS m FROM qd",
    "SELECT median(v) AS m FROM qd",
    "SELECT median(v) AS m FROM qm",
    # pass composition: ordered stat result through the branch fold
    "SELECT COALESCE(quantile_disc(v, 0.5), '0.0') AS q FROM qd",
]


@pytest.mark.parametrize("q", ORDERED_STATS)
def test_ordered_stat_decimal_trunc(eng, con, ordered_tables, q):
    _differential(eng, con, q)


# ---- 3. union type names ----------------------------------------------------

UNION_NAMES = [
    "SELECT typeof(union_value(num := 2)) AS t",
    "SELECT typeof(union_value(s := 'x')) AS t",
    "SELECT typeof(union_value(d := 1.25)) AS t",
    "SELECT typeof(union_value(num := 2)::UNION(num INTEGER, str VARCHAR)) AS t",
    "SELECT typeof(union_tag(union_value(num := 2))) AS t",
    "SELECT union_tag(union_value(num := 2)) AS r",
]


@pytest.mark.parametrize("q", UNION_NAMES)
def test_union_type_names(eng, con, q):
    _differential(eng, con, q)


def test_union_tag_serializes_enum(eng):
    from duckdb_service_spark.service.serializer import query_result

    df = eng.query_df("SELECT union_tag(union_value(num := 2)) AS t")
    out = query_result(df)
    assert out["types"] == ["ENUM('num')"]
    assert out["values"] == [["num"]]
    df2 = eng.query_df(
        "SELECT union_tag(union_value(num := 2)"
        "::UNION(num INTEGER, str VARCHAR)) AS t"
    )
    assert query_result(df2)["types"] == ["ENUM('num', 'str')"]


# ---- 4. numeric literal + implicit alias ------------------------------------

UNDERSCORE_ALIASES = [
    "SELECT 1__0",
    "SELECT 1_000_",
    "SELECT 1.5__x",
    "SELECT 1_000",   # valid literal: no alias
    "SELECT 1_0",
]


@pytest.mark.parametrize("q", UNDERSCORE_ALIASES)
def test_underscore_literal_alias(eng, con, q):
    _differential(eng, con, q, check_cols=True)


# ---- 5. ADVICE r13 ----------------------------------------------------------

ADVICE_PROBES = [
    # overlapping interval regex spans splice once
    "SELECT TIMESTAMP '2020-01-01' + INTERVAL '2 days'::INTERVAL AS r",
    "SELECT TIMESTAMP '2020-01-01' + INTERVAL '2 days' AS r",
    "SELECT TIMESTAMP '2020-01-01' + '2 days'::INTERVAL AS r",
    # bare current_timestamp keyword is tz-aware
    "SELECT CAST(current_timestamp AS VARCHAR) LIKE '%+00' AS r",
    "SELECT CAST(now() AS VARCHAR) LIKE '%+00' AS r",
]


@pytest.mark.parametrize("q", ADVICE_PROBES)
def test_advice_r13_probes(eng, con, q):
    _differential(eng, con, q)


def test_arrow_tagging_skips_lambdas_and_literals(eng):
    from duckdb_service_spark.service.serializer import query_result

    # lambda arrow: result is plain VARCHAR, not JSON
    df = eng.query_df(
        "SELECT array_to_string(list_transform([1, 2], x -> x + 1), ',') AS v"
    )
    assert query_result(df)["types"] == ["VARCHAR"]
    # arrow inside a string literal: plain VARCHAR
    df2 = eng.query_df("SELECT 'a->b' AS v")
    assert query_result(df2)["types"] == ["VARCHAR"]
    # the real JSON extract operator still tags JSON
    df3 = eng.query_df("""SELECT '{"a": 1}'::JSON -> 'a' AS v""")
    assert query_result(df3)["types"] == ["JSON"]


def test_serializer_tz_rendering_ignores_host_timezone(eng):
    from duckdb_service_spark.service.serializer import query_result

    df = eng.query_df("SELECT TIMESTAMPTZ '2020-01-01 08:00:00' AS t")
    old = os.environ.get("TZ")
    try:
        os.environ["TZ"] = "America/New_York"
        time.tzset()
        out = query_result(df)
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        time.tzset()
    assert out["types"] == ["TIMESTAMP WITH TIME ZONE"]
    assert out["values"] == [["2020-01-01 08:00:00+00"]]


# ---- 6. VALUES rows keep plain casts ----------------------------------------

VALUES_CASTS = [
    "SELECT v FROM (VALUES (CAST(1.0 AS DECIMAL(3,1))),"
    "(CAST(2.1 AS DECIMAL(3,1)))) s(v)",
    "SELECT v FROM (VALUES (CAST('7' AS INTEGER)),(8)) s(v)",
    "SELECT v FROM (VALUES (CAST(1.5 AS FLOAT)),(CAST(2.5 AS FLOAT))) s(v)",
]


@pytest.mark.parametrize("q", VALUES_CASTS)
def test_values_rows_keep_plain_casts(eng, con, q):
    _differential(eng, con, q)


# ---- 7. datetime literal grammar ---------------------------------------------

DATETIME_LITERALS = [
    # no-seconds forms raise DuckDB's conversion error; TRY_CAST NULLs
    "SELECT TIMESTAMP '2020-01-01 01:00' AS r",
    "SELECT TIMESTAMPTZ '2020-01-01 01:00' AS r",
    "SELECT '2020-01-01 01:00'::TIMESTAMP AS r",
    "SELECT CAST('2020-01-01 01:00' AS TIMESTAMP) AS r",
    "SELECT TRY_CAST('2020-01-01 01:00' AS TIMESTAMP) AS r",
    "SELECT TIMESTAMP '2020-01-01T01:00' AS r",
    "SELECT TIMESTAMP '2020-01-01 01' AS r",
    "SELECT TIME '01:00' AS r",
    # accepted shapes stay working
    "SELECT TIMESTAMP '2020-01-01 01:00:00' AS r",
    "SELECT TIMESTAMP '2020-01-01' AS r",
    "SELECT TIMESTAMP '2020-01-01 1:2:3' AS r",
    "SELECT TIMESTAMP '2020-01-01 01:00:00.5' AS r",
    "SELECT TRY_CAST('2020-01-01 01:00:00' AS TIMESTAMP) AS r",
    # slash separators normalize (DuckDB accepts; Spark alone rejects)
    "SELECT TIMESTAMP '2020/01/01 01:00:00' AS r",
    "SELECT DATE '2020/01/01' AS r",
    "SELECT CAST('2020/01/01' AS DATE) AS r",
    # DATE ignores the remainder after the date prefix
    "SELECT DATE '2020-01-01 junk' AS r",
    "SELECT DATE '2020-01-01T00:00:00' AS r",
    "SELECT DATE '2020-01-01 01:00' AS r",
    # regressions around the pass
    "SELECT DATE '2020-01-01' + 1 AS r",
    "SELECT TIMESTAMP '2020-01-01 00:00:00' + INTERVAL '2 days' AS r",
    "SELECT CAST(TIMESTAMP '2020-01-01 01:02:03' AS DATE) AS r",
]


@pytest.mark.parametrize("q", DATETIME_LITERALS)
def test_datetime_literal_grammar(eng, con, q):
    _differential(eng, con, q)


# ---- 8. conversion-error MESSAGE parity --------------------------------------
# The /db/query envelope carries the bare DuckDB message (duck_error_text
# strips Spark's USER_RAISED_EXCEPTION wrapper); the templates themselves
# are measured-verbatim per lane.

ERROR_MESSAGES = [
    "SELECT CAST('x' AS TINYINT) AS v",
    "SELECT CAST('x' AS SMALLINT) AS v",
    "SELECT CAST('x' AS INTEGER) AS v",
    "SELECT CAST('x' AS BIGINT) AS v",
    "SELECT CAST('x' AS DOUBLE) AS v",
    "SELECT CAST('x' AS FLOAT) AS v",
    "SELECT CAST('x' AS DECIMAL(4,1)) AS v",
    "SELECT CAST('nope' AS BOOLEAN) AS v",
    "SELECT CAST(CAST(300 AS BIGINT) AS TINYINT) AS v",
    "SELECT CAST(CAST(300.5 AS DECIMAL(5,1)) AS TINYINT) AS v",
    "SELECT CAST(12.345 AS DECIMAL(3,2)) AS v",
    "SELECT CAST(CAST('1e40' AS DOUBLE) AS FLOAT) AS v",
]


# ---- 9. composite cells in list literals / VALUES; typeof composite names ----

COMPOSITE_CELLS = [
    # composite cells join the literal-lane union (probe-typed)
    "SELECT [1+1, '7'] AS v",
    "SELECT [length('abc'), '7'] AS v",
    "SELECT v FROM (VALUES (1+1), ('7')) s(v)",
    "SELECT v FROM (VALUES (1+1), ('7'), (2.5)) s(v)",
    "SELECT [1=1, 1+0] AS v",
    # width: composite int cells contribute CLASS units (BIGINT = 19,
    # where Spark's native union would reserve 20)
    "SELECT typeof([1.5, CAST(1 AS BIGINT)]) AS v",
    "SELECT typeof([1.5, CAST(1 AS TINYINT)]) AS v",
    "SELECT typeof([123.456, 1+1]) AS v",
    "SELECT typeof([1.5, 4000000000]) AS v",
    # non-literal VARCHAR against a lane: DuckDB's bind errors
    "SELECT [upper('x'), 1] AS v",
    "SELECT v FROM (VALUES (upper('x')), (1)) s(v)",
    # typeof prints DuckDB's composite type names, not Spark's
    "SELECT typeof([1, 2]) AS v",
    "SELECT typeof(MAP {'x': 1}) AS v",
    "SELECT typeof({'a': 5, 'b': [1.5]}) AS v",
    "SELECT typeof([[1], [2, 3]]) AS v",
    "SELECT pg_typeof([1, 2]) AS v",
    "SELECT typeof(INTERVAL 1 DAY) AS v",
    "SELECT typeof([DATE '2020-01-01']) AS v",
]


@pytest.mark.parametrize("q", COMPOSITE_CELLS)
def test_composite_cells_and_typeof_names(eng, con, q):
    _differential(eng, con, q)


# ---- 10. string-literal overload rejections ----------------------------------
# DuckDB's +/- are ambiguous over (string literal, integer literal) —
# date overloads — and abs/round/floor/ceil/sign reject STRING_LITERAL
# args; */% coerce and DECIMAL partners compute DOUBLE (measured r13).

STRING_OVERLOADS = [
    "SELECT '2' + 1 AS v",       # binder error
    "SELECT 'x' + 1 AS v",       # binder error
    "SELECT 1 + '2' AS v",       # binder error
    "SELECT '2' - 1 AS v",       # binder error
    "SELECT abs('-2') AS v",     # binder error
    "SELECT round('2.5') AS v",  # binder error
    "SELECT floor('2.5') AS v",  # binder error
    "SELECT sign('-2') AS v",    # binder error
    # the coercing overloads keep working
    "SELECT '2' * 3 AS v",
    "SELECT '2' + 1.5 AS v",
    "SELECT sqrt('4') AS v",
    "SELECT DATE '2020-01-01' + 1 AS v",
    "SELECT 'a' || 'b' AS v",
    "SELECT '2'::INT + 1 AS v",
    "SELECT 3 * '2' - 1 AS v",
    "SELECT abs(-2) AS v",
    "SELECT round(2.5, 0) AS v",
]


@pytest.mark.parametrize("q", STRING_OVERLOADS)
def test_string_literal_overload_rejects(eng, con, q):
    _differential(eng, con, q)


# ---- 11. string literals in boolean / LIMIT contexts -------------------------
# DuckDB's implicit VARCHAR->BOOL cast fires in condition positions
# (WHERE '1' keeps rows, CASE WHEN 'T' THEN, NOT 'true'; 'x' raises its
# conversion error) and LIMIT/OFFSET accept quoted digit counts.

BOOL_CONTEXTS = [
    "SELECT CASE WHEN '1' THEN 'y' ELSE 'n' END AS v",
    "SELECT CASE WHEN 'T' THEN 1 ELSE 0 END AS v",
    "SELECT CASE WHEN 'yes' THEN 1 ELSE 0 END AS v",  # conversion error
    "SELECT 1 AS a WHERE '1'",
    "SELECT 1 AS a WHERE '0'",
    "SELECT 1 AS a WHERE 'x'",                        # conversion error
    "SELECT NOT 'true' AS v",
    "SELECT 1 AS a WHERE NOT '0'",
    "SELECT 1 AS a LIMIT '2'",
    "SELECT 1 AS a LIMIT '2x'",                       # conversion error
    "SELECT 1 AS a OFFSET '1'",
    # guards: comparison operands / simple CASE / BETWEEN / LIKE stay put
    "SELECT CASE 'A' WHEN 'A' THEN 1 ELSE 0 END AS v",
    "SELECT 2 BETWEEN '1' AND '3' AS v",
    "SELECT 'abc' LIKE 'a%' AS v",
    "SELECT 1 AS a WHERE 'a' = 'a'",
]


@pytest.mark.parametrize("q", BOOL_CONTEXTS)
def test_string_literals_in_bool_contexts(eng, con, q):
    _differential(eng, con, q)


# structured comparisons, slicing, division edges, postfix factorial
SURFACE_EDGES = [
    "SELECT {'a':1} = {'a':1} AS v",
    "SELECT [1,2] = [1,2] AS v",
    "SELECT [1,2] < [1,3] AS v",
    "SELECT {'a':1} < {'a':2} AS v",
    "SELECT 'abc'[2] AS v",
    "SELECT 'abc'[2:3] AS v",
    "SELECT [1,2,3][-1] AS v",
    "SELECT [1,2,3][2:] AS v",
    "SELECT [1,2,3][:2] AS v",
    "SELECT 'hello'[-3:] AS v",
    "SELECT 1 // 0 AS v",
    "SELECT 1 % 0 AS v",
    "SELECT 1.0 / 0 AS v",
    "SELECT 0.0 / 0.0 AS v",
    # postfix factorial: only the isolated-term shape computes (DuckDB's
    # ! binds looser than arithmetic — 3! + 1 is a catalog error there)
    "SELECT 5! AS v",
    "SELECT 3!, 4 AS w",
    "SELECT [3!] AS v",
    "SELECT 1 != 2 AS v",
    "SELECT factorial(5) AS v",
]


@pytest.mark.parametrize("q", SURFACE_EDGES)
def test_surface_edges(eng, con, q):
    _differential(eng, con, q)


# string -> LIST casts parse DuckDB's bracket grammar (element-wise TRY,
# quotes protect commas but stay in the value); list-literal -> list
# casts distribute the scalar cast contract per cell (rounding)
LIST_CASTS = [
    "SELECT CAST('[1, 2]' AS INTEGER[]) AS v",
    "SELECT '[1,2]'::INT[] AS v",
    "SELECT CAST('[a, b]' AS VARCHAR[]) AS v",
    "SELECT CAST('[''a'', ''b,c'']' AS VARCHAR[]) AS v",
    "SELECT CAST('[1, NULL]' AS INTEGER[]) AS v",
    "SELECT CAST('[[1],[2]]' AS INTEGER[][]) AS v",
    "SELECT CAST('[]' AS INTEGER[]) AS v",
    "SELECT CAST('[1, x]' AS INTEGER[]) AS v",     # element conversion error
    "SELECT TRY_CAST('[1, x]' AS INTEGER[]) AS v",  # [1, NULL]
    "SELECT CAST('1,2' AS INTEGER[]) AS v",         # unbracketed: raises
    "SELECT TRY_CAST('1,2' AS INTEGER[]) AS v",     # NULL
    "SELECT CAST('[1.5, 2]' AS INTEGER[]) AS v",    # rounds half-away
    "SELECT CAST(' [1,2] ' AS INTEGER[]) AS v",
    "SELECT CAST('[1, 2' AS INTEGER[]) AS v",       # unclosed: raises
    "SELECT CAST([1.7] AS INTEGER[]) AS v",         # [2], not Spark's [1]
    "SELECT CAST([1.5, 2.5] AS INTEGER[]) AS v",
    "SELECT CAST(['1', '2'] AS INTEGER[]) AS v",
    "SELECT CAST([1, NULL] AS VARCHAR[]) AS v",
    "SELECT TRY_CAST(['x'] AS INTEGER[]) AS v",
    "SELECT CAST([] AS INTEGER[]) AS v",
    "SELECT CAST([1,2] AS VARCHAR) AS v",
]


@pytest.mark.parametrize("q", LIST_CASTS)
def test_string_and_literal_list_casts(eng, con, q):
    _differential(eng, con, q)


# numeric aggregates reject VARCHAR args where Spark silently coerces
# (sum('2') computed 2.0); median over VARCHAR is ordinal in DuckDB.
AGG_STRING_ARGS = [
    "SELECT sum('2') AS v",      # binder error
    "SELECT avg('2') AS v",      # binder error
    "SELECT stddev('2') AS v",   # binder error
    "SELECT max('2') AS v",      # VARCHAR max works
    "SELECT count('x') AS v",
    "SELECT string_agg('a', ',') AS v",
    "SELECT median('2') AS v",   # ordinal: the string itself
    "SELECT mode('2') AS v",
    "SELECT median(2.5) AS v",
]


@pytest.mark.parametrize("q", AGG_STRING_ARGS)
def test_aggregate_string_args(eng, con, q):
    _differential(eng, con, q)


def test_string_arith_binder_message_verbatim(eng, con):
    q = "SELECT '2' + 1 AS v"
    with pytest.raises(Exception) as want:
        con.execute(q)
    with pytest.raises(Exception) as got:
        eng.query_df(q).collect()
    assert str(got.value).splitlines()[0] == str(want.value).splitlines()[0]


def test_list_varchar_mix_error_message(eng, con):
    q = "SELECT [upper('x'), 1] AS v"
    with pytest.raises(Exception) as want:
        con.execute(q)
    with pytest.raises(Exception) as got:
        eng.query_df(q).collect()
    assert str(got.value).splitlines()[0] == str(want.value).splitlines()[0]


@pytest.mark.parametrize("q", ERROR_MESSAGES)
def test_conversion_error_messages_verbatim(eng, con, q):
    from duckdb_service_spark.service.serializer import duck_error_text

    with pytest.raises(Exception) as want:
        con.execute(q)
    duck_msg = str(want.value).splitlines()[0].strip()
    try:
        eng.query_df(q).collect()
        raised = None
    except Exception as ex:
        raised = ex
    assert raised is not None, f"{q!r}: engine returned a value"
    got = duck_error_text(raised).splitlines()[0].strip()
    assert got == duck_msg, f"{q!r}:\n  engine {got!r}\n  duckdb {duck_msg!r}"
