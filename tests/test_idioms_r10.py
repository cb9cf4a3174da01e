"""Round-10 dialect fixes, differentially verified against DuckDB.

1. Full md5_number composition (VERDICT r09 task 8): DuckDB's HUGEINT
   (signed 128-bit LE of all 16 md5 bytes) composed from the measured
   half emitters as DECIMAL(38,0) where |v| < 1e38; NULL passes through;
   TRUE overflow raises at runtime (no more translate-time raise).
2+ (later sections): implicit-cast matrix sweep fixes (r09 task 5).
"""

from __future__ import annotations

import duckdb
import pytest

from duckdb_service_spark.service.dialect import translate


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _differential(spark, con, sql, order_insensitive=True):
    got = [tuple(r) for r in spark.sql(translate(sql)).collect()]
    want = con.execute(sql).fetchall()
    if order_insensitive:
        got, want = sorted(got, key=repr), sorted(want, key=repr)
    assert got == want, f"{sql!r}: spark={got} duckdb={want}"


# ---- 1. md5_number -------------------------------------------------------


def test_md5_number_composable_values_match(spark, con):
    # positive and negative HUGEINTs that fit DECIMAL(38) (measured set)
    sql = (
        "SELECT s, CAST(md5_number(s) AS VARCHAR) AS n FROM (VALUES "
        "('c'), ('e'), ('world'), ('x3'), ('test'), ('foo'), ('bar')) t(s)"
    )
    _differential(spark, con, sql)


def test_md5_number_null_passthrough(spark, con):
    sql = "SELECT CAST(md5_number(NULL) AS VARCHAR) AS n"
    _differential(spark, con, sql)


def test_md5_number_true_overflow_raises(spark):
    # md5_number('abc') = 1.5219...e38 > DECIMAL(38) max (measured)
    with pytest.raises(Exception, match="md5_number"):
        spark.sql(translate("SELECT md5_number('abc') AS n")).collect()


def test_md5_number_matches_half_composition(spark, con):
    # the full value IS lower * 2^64 + upper (signed lower), measured
    sql = (
        "SELECT md5_number(s) = "
        "(CASE WHEN md5_number_lower(s) >= 9223372036854775808::HUGEINT "
        "THEN md5_number_lower(s)::HUGEINT - 18446744073709551616::HUGEINT "
        "ELSE md5_number_lower(s)::HUGEINT END) "
        "* 18446744073709551616::HUGEINT + md5_number_upper(s)::HUGEINT "
        "AS eq FROM (VALUES ('c'), ('world'), ('foo')) t(s)"
    )
    assert all(r[0] for r in con.execute(sql).fetchall())


# ---- 2. implicit-cast matrix sweep fixes (r09 task 5) ---------------------
#
# Probed by tools/sweep_coercion.py through the ENGINE path (the
# schema-resolved routing passes only exist there); every divergence or
# analysis error on valid DuckDB input is frozen here.


@pytest.fixture(scope="module")
def coerce_engines(spark):
    import tempfile

    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="warehouse_coerce_"))
    con = duckdb.connect()
    for ex in (eng.execute, con.execute):
        ex(
            "CREATE TABLE ct (u INTEGER, i8 TINYINT, i64 BIGINT, "
            "dc5 DECIMAL(5,2), dc18 DECIMAL(18,6), flt FLOAT, "
            "b BOOLEAN, s VARCHAR, dt DATE, li INTEGER[])"
        )
        ex(
            "INSERT INTO ct VALUES "
            "(1, 3, 4000000, 1.25, 123.456789, 0.5, true, '42', "
            "DATE '2024-01-05', [1,2]), "
            "(2, -2, -12, -99.99, -0.000001, 4.0, false, 'apple', "
            "DATE '2023-12-31', [3]), "
            "(3, NULL, 250, 3.5, 1.5, -1.5, NULL, NULL, NULL, NULL)"
        )
    return eng, con


COERCION_QUERIES = [
    # FLOAT result lane: DuckDB computes wide, narrows the result, and
    # its DECIMAL->FLOAT operand cast divides unscaled/10^scale in f32
    "SELECT u, dc5 + flt AS a, dc18 + flt AS b2, flt - dc18 AS c, "
    "dc18 * flt AS d, i64 / flt AS e, dc18 % flt AS f FROM ct ORDER BY u",
    "SELECT u, dc5 // flt AS a, i64 // flt AS b2 FROM ct ORDER BY u",
    # bool vs numeric comparisons order as 0/1 (measured)
    "SELECT u, i8 < b AS a, b >= i64 AS b2, i8 BETWEEN b AND 5 AS c, "
    "b IN (1, 0) AS d, b IN (2, 0) AS e FROM ct ORDER BY u",
    # bool column vs varchar COLUMN compares as strings (never an error)
    "SELECT u, s = b AS a FROM ct ORDER BY u",
    # DATE - DATE columns = BIGINT days; DATE +/- INTERVAL = TIMESTAMP
    "SELECT u, dt - dt AS a, dt + INTERVAL 2 DAY AS b2, "
    "dt - INTERVAL 36 HOUR AS c FROM ct ORDER BY u",
    # list col || scalar col/NULL resolves as VARCHAR concat (measured:
    # 'apple' || [1,2] = 'apple[1, 2]'); list col || list col keeps
    # list_concat's NULL-as-empty dispatch
    "SELECT u, s || li AS a, li || NULL AS b2, li || li AS c FROM ct ORDER BY u",
]


@pytest.mark.parametrize("q", COERCION_QUERIES)
def test_coercion_matrix_matches_duckdb(coerce_engines, q):
    eng, con = coerce_engines
    got = [
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in eng.query_df(q).collect()
    ]
    want = [
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in con.execute(q).fetchall()
    ]
    assert got == want, f"{q}: spark={got!r} duck={want!r}"


# ---- 3. CAST error contract (tools/sweep_casts.py, r10) -------------------
#
# DuckDB CAST raises Conversion Errors where Spark's non-ANSI cast wraps
# integers, saturates floats, or NULLs bad strings silently; TRY_CAST
# yields NULL. The service rewrite_cast_contract pass reproduces the
# contract (final sweep: 547 MATCH + 173 BOTH-ERR, zero divergence).

CAST_MATCH_QUERIES = [
    # unimplemented pairs: TRY -> NULL; NULL input passes through CAST
    "SELECT TRY_CAST(TIMESTAMP '2024-01-05 01:02:03' AS BIGINT) AS a, "
    "TRY_CAST(DATE '2024-01-05' AS INTEGER) AS b2, "
    "TRY_CAST(7 AS TIMESTAMP) AS c, "
    "CAST(CAST(NULL AS DATE) AS INTEGER) AS d",
    # decimal -> int rounds HALF-AWAY in both CAST and TRY_CAST
    "SELECT CAST(CAST(-0.5 AS DECIMAL(9,3)) AS INTEGER) AS a, "
    "TRY_CAST(CAST(2.5 AS DECIMAL(9,3)) AS TINYINT) AS b2, "
    "CAST(CAST(1.5 AS DECIMAL(9,3)) AS BIGINT) AS c",
    # string -> int parses through decimal then rounds (measured -7.25
    # -> -7, -7.5 -> -8); TRY_CAST included (the \\bCAST gate fix)
    "SELECT CAST('-7.25' AS INTEGER) AS a, TRY_CAST('-7.25' AS TINYINT) AS b2, "
    "CAST('-7.5' AS SMALLINT) AS c",
    # string -> boolean: duck's exact token set, no trimming
    "SELECT CAST('T' AS BOOLEAN) AS a, CAST('0' AS BOOLEAN) AS b2, "
    "TRY_CAST('yes' AS BOOLEAN) AS c, TRY_CAST(' true ' AS BOOLEAN) AS d",
    # decimal -> float: the scaled-int float32 lane
    "SELECT CAST(CAST(123456.654321 AS DECIMAL(18,6)) AS FLOAT) AS a",
    # double/float -> varchar: shortest-round-trip + duck's exponent
    # thresholds (Python repr / numpy float32 parity, measured)
    "SELECT CAST(CAST(1e8 AS DOUBLE) AS VARCHAR) AS a, "
    "CAST(CAST(-1e300 AS DOUBLE) AS VARCHAR) AS b2, "
    "CAST(CAST(1e-7 AS DOUBLE) AS VARCHAR) AS c, "
    "CAST(CAST(0.1 AS FLOAT) AS VARCHAR) AS d, "
    "CAST(CAST(3.4e38 AS FLOAT) AS VARCHAR) AS e",
]


@pytest.fixture(scope="module")
def cast_engine(spark):
    import tempfile

    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_cast_"))


@pytest.mark.parametrize("q", CAST_MATCH_QUERIES)
def test_cast_contract_matches_duckdb(cast_engine, con, q):
    got = [tuple(r) for r in cast_engine.query_df(q).collect()]
    want = con.execute(q).fetchall()
    assert got == want, f"{q}: spark={got!r} duck={want!r}"


CAST_RAISE_QUERIES = [
    "SELECT CAST(300 AS TINYINT) AS v",              # int overflow wraps in Spark
    "SELECT CAST('apple' AS INTEGER) AS v",          # bad string NULLs in Spark
    "SELECT CAST('42' AS BOOLEAN) AS v",             # not in duck's token set
    "SELECT CAST(' true ' AS BOOLEAN) AS v",         # duck does NOT trim
    "SELECT CAST(-1e300 AS FLOAT) AS v",             # float range saturates in Spark
    "SELECT CAST(TIMESTAMP '2024-01-05 01:02:03' AS BIGINT) AS v",  # unimplemented pair
    "SELECT CAST(DATE '2024-01-05' AS DOUBLE) AS v",
    "SELECT CAST(true AS TIMESTAMP) AS v",
]


@pytest.mark.parametrize("q", CAST_RAISE_QUERIES)
def test_cast_contract_raises_like_duckdb(cast_engine, con, q):
    with pytest.raises(Exception):
        con.execute(q).fetchall()
    with pytest.raises(Exception, match="Conversion Error"):
        cast_engine.query_df(q).collect()


# ---- 4. alias() (the last named dialect-tail item) ------------------------
#
# DuckDB alias(expr) returns the SELECT ITEM's output name (measured:
# the user AS/implicit alias wins; a bare whole-item call returns the
# argument's display name and names the column `alias(arg)`; nested
# calls always use the argument's display name). Identifier/literal
# arguments are handled; compound arguments keep the clean raise.

ALIAS_QUERIES = [
    "SELECT alias(c1) AS v FROM (VALUES (1)) t(c1)",
    "SELECT alias(c1) v2 FROM (VALUES (1)) t(c1)",
    "SELECT alias(c1) FROM (VALUES (1)) t(c1)",
    "SELECT alias(t.c1) AS v FROM (VALUES (1)) t(c1)",
    "SELECT alias(42) AS v, alias(4.5) AS w, alias(NULL) AS x",
    "SELECT alias('hello') AS v",
    "SELECT upper(alias(c1)) AS u FROM (VALUES (1)) t(c1)",
    "SELECT c1, alias(c1) AS n FROM (VALUES (1)) t(c1)",
]


@pytest.mark.parametrize("q", ALIAS_QUERIES)
def test_alias_fn_matches_duckdb(spark, con, q):
    d = con.execute(q)
    want, wcols = d.fetchall(), [x[0] for x in d.description]
    df = spark.sql(translate(q))
    assert df.columns == wcols, (df.columns, wcols)
    assert [tuple(r) for r in df.collect()] == want


def test_alias_fn_compound_raises():
    from duckdb_service_spark.service.dialect import UnsupportedDialect

    with pytest.raises(UnsupportedDialect):
        translate("SELECT alias(c1 + 1) FROM t")
