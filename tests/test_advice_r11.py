"""Round-11 regression tests: the two VERDICT r10 cast-contract holes,
all five ADVICE r11 findings, and the two NEW divergences the widened
r11 sweep surfaced — each differentially verified against live DuckDB.

1. (VERDICT #1a) decimal->decimal tightening: the ``src == tgt`` skip
   made the guard branch unreachable — overflow silently returned NULL
   where DuckDB raises. Probing the fix also measured that DuckDB
   TRUNCATES toward zero on a scale shrink (1.999999 -> DECIMAL(9,3)
   = 1.999) where Spark rounds HALF_UP; emulated with exact
   ``x - (x % step)`` decimal arithmetic.
2. (VERDICT #1b) literal-shaped cast sources inside parenthesized
   subqueries now keep the error contract (only schema-resolved
   identifier sources need the scope exclusion).
3. (ADVICE high) CAST(NULL double/float AS VARCHAR) returned 'nan' —
   Arrow hands SQL NULL to the pandas UDF as NaN; a SQL-level IS NULL
   guard now distinguishes them.
4. (ADVICE low) nested failable casts under a no-guard outer cast kept
   Spark semantics; the rewrite now recurses into cast bodies.
5. (ADVICE medium) rewrite_map_subscripts spliced OVERLAPPING hits for
   nested subscripts (m[s[2]]) into corrupted SQL; outermost-only with
   key recursion now.
6. (ADVICE low) alias(c1) IS NULL / IN / BETWEEN took the user-alias
   branch and emitted broken SQL; continuations fall to the nested lane.
7. (ADVICE low) SET window_frame_element_bound: non-integer input now
   raises a clean SET error (and the process-wide scope is documented).
8. (r11 sweep) FLOAT -> DECIMAL rounds HALF-EVEN in DuckDB (2.5::FLOAT
   -> DECIMAL(12,0) = 2) vs Spark's HALF_UP; emulated via bround().
9. (r11 sweep) bare DECIMAL target defaults to (18,3) in DuckDB vs
   Spark's (10,0); normalized in the cast pass.
"""

from __future__ import annotations

import tempfile

import duckdb
import pytest


@pytest.fixture(scope="module")
def eng(spark):
    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_r11_"))


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _differential(eng, con, sql):
    try:
        want = ("OK", con.execute(sql).fetchall())
    except Exception as e:
        want = ("ERR", str(e).splitlines()[0])
    try:
        got = ("OK", [tuple(r) for r in eng.query_df(sql).collect()])
    except Exception as e:
        got = ("ERR", str(e).splitlines()[0])
    assert got[0] == want[0], f"{sql!r}: spark={got} duck={want}"
    if got[0] == "OK":
        assert got[1] == want[1], f"{sql!r}: spark={got[1]} duck={want[1]}"


# ---- 1. decimal -> decimal tightening ------------------------------------

DECIMAL_TIGHTEN = [
    # overflow raises (the formerly-dead guard branch)
    "SELECT CAST(CAST(9999999.999999 AS DECIMAL(18,6)) AS DECIMAL(9,3)) AS v",
    # TRY_CAST overflow stays NULL
    "SELECT TRY_CAST(CAST(9999999.999999 AS DECIMAL(18,6)) AS DECIMAL(9,3)) AS v",
    # scale shrink TRUNCATES toward zero (both signs), no rounding
    "SELECT CAST(CAST(1.999999 AS DECIMAL(18,6)) AS DECIMAL(9,3)) AS v",
    "SELECT CAST(CAST(-2.5115 AS DECIMAL(18,4)) AS DECIMAL(9,3)) AS v",
    "SELECT TRY_CAST(CAST(1.999999 AS DECIMAL(18,6)) AS DECIMAL(9,3)) AS v",
    # truncation means NO rounding carry: equal units cannot overflow
    "SELECT CAST(CAST(999999999999.9 AS DECIMAL(13,1)) AS DECIMAL(12,0)) AS v",
    # fitting tightening keeps the value
    "SELECT CAST(CAST(123456.654321 AS DECIMAL(18,6)) AS DECIMAL(9,3)) AS v",
    # widening is untouched
    "SELECT CAST(CAST(1.999 AS DECIMAL(9,3)) AS DECIMAL(18,6)) AS v",
]


@pytest.mark.parametrize("q", DECIMAL_TIGHTEN)
def test_decimal_tightening_contract(eng, con, q):
    _differential(eng, con, q)


# ---- 2. literal-source casts inside subqueries ----------------------------

SUBQUERY_CASTS = [
    "SELECT v FROM (SELECT CAST('apple' AS INTEGER) AS v) t",
    "SELECT v FROM (SELECT TRY_CAST('apple' AS INTEGER) AS v) t",
    "SELECT v FROM (SELECT CAST('42' AS INTEGER) AS v) t",
    "SELECT v FROM (SELECT CAST(9999999.999999 AS DECIMAL(9,3)) AS v) t",
]


@pytest.mark.parametrize("q", SUBQUERY_CASTS)
def test_subquery_literal_cast_contract(eng, con, q):
    _differential(eng, con, q)


# ---- 3. NULL double/float -> VARCHAR --------------------------------------

NULL_FLOAT_STR = [
    "SELECT CAST(CAST(NULL AS DOUBLE) AS VARCHAR) AS v",
    "SELECT TRY_CAST(CAST(NULL AS DOUBLE) AS VARCHAR) AS v",
    "SELECT CAST(CAST(NULL AS FLOAT) AS VARCHAR) AS v",
    "SELECT CAST(CAST(1.5 AS DOUBLE) AS VARCHAR) AS v",
]


@pytest.mark.parametrize("q", NULL_FLOAT_STR)
def test_null_float_to_varchar_is_null(eng, con, q):
    _differential(eng, con, q)


# ---- 4. nested failable casts ---------------------------------------------

NESTED_CASTS = [
    "SELECT CAST(CAST('apple' AS INTEGER) AS BIGINT) AS v",
    "SELECT CAST(CAST('17' AS INTEGER) AS BIGINT) AS v",
    "SELECT TRY_CAST(CAST('17' AS INTEGER) AS BIGINT) AS v",
    "SELECT CAST(CAST(CAST(9999999.999999 AS DECIMAL(18,6)) AS DECIMAL(20,6)) AS DECIMAL(9,3)) AS v",
]


@pytest.mark.parametrize("q", NESTED_CASTS)
def test_nested_cast_contract_recurses(eng, con, q):
    _differential(eng, con, q)


# ---- 5. nested map subscripts ----------------------------------------------


@pytest.fixture(scope="module")
def map_eng(spark):
    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="warehouse_r11m_"))
    con = duckdb.connect()
    for ex in (eng.execute, con.execute):
        ex("CREATE TABLE nm (id INTEGER, m MAP(VARCHAR, INTEGER), s VARCHAR)")
        ex(
            "INSERT INTO nm VALUES (1, map(['x','y'],[1,2]), 'xy'), "
            "(2, map(['z'],[9]), 'zq')"
        )
    return eng, con


NESTED_SUBSCRIPTS = [
    # string-col subscript key inside a map subscript: both spans used
    # to be spliced as if disjoint, emitting corrupted SQL
    "SELECT id, m[s[1]] AS v FROM nm ORDER BY id",
    "SELECT id, m[s[2]] AS v FROM nm ORDER BY id",
]


@pytest.mark.parametrize("q", NESTED_SUBSCRIPTS)
def test_nested_map_subscript(map_eng, q):
    eng, con = map_eng
    got = [tuple(r) for r in eng.query_df(q).collect()]
    want = [tuple(r) for r in con.execute(q).fetchall()]
    assert got == want, f"{q}: spark={got!r} duck={want!r}"


# ---- 6. alias() expression continuations -----------------------------------

ALIAS_CONT = [
    "SELECT alias(c1) IS NULL AS v FROM (VALUES (1)) t(c1)",
    "SELECT alias(c1) IN ('c1', 'x') AS v FROM (VALUES (1)) t(c1)",
    "SELECT alias(c1) NOT IN ('q') AS v FROM (VALUES (1)) t(c1)",
    "SELECT alias(c1) LIKE 'c%' AS v FROM (VALUES (1)) t(c1)",
    "SELECT alias(c1) BETWEEN 'a' AND 'd' AS v FROM (VALUES (1)) t(c1)",
    # the user-alias branch still wins at a select-item boundary
    "SELECT alias(c1) AS v FROM (VALUES (1)) t(c1)",
    "SELECT alias(c1) v2 FROM (VALUES (1)) t(c1)",
]


@pytest.mark.parametrize("q", ALIAS_CONT)
def test_alias_expression_continuations(spark, con, q):
    from duckdb_service_spark.service.dialect import translate

    d = con.execute(q)
    want, wcols = d.fetchall(), [x[0] for x in d.description]
    df = spark.sql(translate(q))
    got = [tuple(r) for r in df.collect()]
    assert got == want, f"{q}: spark={got!r} duck={want!r}"
    assert df.columns == wcols


# ---- 7. SET window_frame_element_bound validation ---------------------------


def test_set_frame_bound_rejects_non_integer(eng):
    import duckdb_service_spark.service.dialect as _dialect

    before = _dialect.WINDOW_FRAME_ELEMENT_BOUND
    with pytest.raises(ValueError, match="window_frame_element_bound"):
        eng.execute("SET window_frame_element_bound = 'abc'")
    assert _dialect.WINDOW_FRAME_ELEMENT_BOUND == before
    eng.execute("SET window_frame_element_bound = 123456")
    assert _dialect.WINDOW_FRAME_ELEMENT_BOUND == 123456
    _dialect.WINDOW_FRAME_ELEMENT_BOUND = before


# ---- 8. FLOAT -> DECIMAL rounds half-even -----------------------------------

FLOAT_DECIMAL = [
    "SELECT CAST(CAST(2.5 AS FLOAT) AS DECIMAL(12,0)) AS v",
    "SELECT CAST(CAST(3.5 AS FLOAT) AS DECIMAL(12,0)) AS v",
    "SELECT CAST(CAST(-2.5 AS FLOAT) AS DECIMAL(12,0)) AS v",
    "SELECT TRY_CAST(CAST(2.5 AS FLOAT) AS DECIMAL(12,0)) AS v",
    "SELECT CAST(CAST(0.125 AS FLOAT) AS DECIMAL(9,2)) AS v",
    # the DOUBLE lane stays half-away (= Spark HALF_UP)
    "SELECT CAST(CAST(2.5 AS DOUBLE) AS DECIMAL(12,0)) AS v",
]


@pytest.mark.parametrize("q", FLOAT_DECIMAL)
def test_float_to_decimal_half_even(eng, con, q):
    _differential(eng, con, q)


# ---- 9. bare DECIMAL defaults to (18,3) --------------------------------------

BARE_DECIMAL = [
    "SELECT CAST(CAST(1.99999 AS DECIMAL(10,5)) AS DECIMAL) AS v",
    "SELECT CAST('1.99999' AS DECIMAL) AS v",
    "SELECT CAST(5 AS DECIMAL) AS v",
    "SELECT TRY_CAST('2.5' AS DECIMAL) AS v",
]


@pytest.mark.parametrize("q", BARE_DECIMAL)
def test_bare_decimal_default_18_3(eng, con, q):
    _differential(eng, con, q)
