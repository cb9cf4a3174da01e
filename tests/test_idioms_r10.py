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
