"""Round-15 ADVICE regression: rewrite_string_list_casts applied an outer
CAST(... AS VARCHAR) edit with stale offsets when its source contained a
list-literal->list cast already folded by the _LIT_LIST_CAST_RE loop
(nested edit spans; the reverse-sorted splice corrupted the SQL). The
column-cast loop now skips any match whose FULL span overlaps a prior
edit, deferring the outer cast to the fixpoint re-run — differentially
verified against live DuckDB."""

from __future__ import annotations

import tempfile

import duckdb
import pytest


@pytest.fixture(scope="module")
def eng(spark):
    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_r15_"))


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
    assert got == want, f"{sql!r}: engine {got} vs duckdb {want}"


@pytest.mark.parametrize(
    "sql",
    [
        # the confirmed ADVICE repro: outer VARCHAR cast over a folded
        # list-literal cast (previously rewrote to corrupted SQL)
        "SELECT CAST(CAST([1, '2'] AS INTEGER[]) AS VARCHAR) AS v",
        # numeric-literal variant (VERDICT r14 what's-wrong #4 shapes)
        "SELECT CAST(CAST([1.7, 2.2] AS INTEGER[]) AS VARCHAR) AS v",
        "SELECT CAST(CAST([1] AS INTEGER[]) AS VARCHAR) AS v",
        # TRY_CAST twin and the already-working string-source control
        "SELECT TRY_CAST(CAST([1, '2'] AS INTEGER[]) AS VARCHAR) AS v",
        "SELECT CAST(CAST('[1.7]' AS DOUBLE[]) AS VARCHAR) AS v",
    ],
)
def test_chained_list_literal_cast_render(eng, con, sql):
    _differential(eng, con, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # ADVICE r14 low: '*' after '!' — measured against live DuckDB:
        # unspaced '!<op>' is the multi-char operator token (catalog error
        # names '!<op>'), spaced '*' is a parser error at the next token,
        # spaced '+'/'-'/'||' keep the binary-'!' catalog error
        "SELECT 3! * 2 AS v",
        "SELECT 3!*2 AS v",
        "SELECT 3!* 2 AS v",
        "SELECT 3!+2 AS v",
        "SELECT 3!-2 AS v",
        "SELECT 3!/2 AS v",
        "SELECT 3!%2 AS v",
        "SELECT 3!^2 AS v",
        "SELECT 3! + 2 AS v",  # control: existing operators unchanged
        "SELECT 3! - 2 AS v",
        "SELECT 3! || 2 AS v",
        "SELECT (3!) * 2 AS v",  # parenthesized factorial then multiply
    ],
)
def test_factorial_then_multiply(eng, con, sql):
    _differential(eng, con, sql)
