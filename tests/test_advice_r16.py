"""Round-16 ADVICE/VERDICT correctness regressions, differentially verified
against live DuckDB:

- VERDICT r15 task 8 / ADVICE r14 #3: duplicate-map-key VALUE-literal folds
  must raise DuckDB's 'Invalid Input Error: Map keys must be unique.' —
  including value-level duplicates the text comparison can't see ('1' vs
  '01' under INTEGER keys), so the fold emits the same runtime guard the
  string-COLUMN path uses. TRY_CAST raises too (measured).
- ADVICE r15 #1: unspaced '3!||2' lexes '!||' as one operator token —
  DuckDB's catalog error names '!||', not '!'.
- ADVICE r15 #2: spaced '3! / 2', '3! % 2', '3! ^ 2' EVALUATE in DuckDB
  (factorial binds first; '/' returns DOUBLE per HUGEINT/INTEGER rules).
"""

from __future__ import annotations

import tempfile

import duckdb
import pytest


@pytest.fixture(scope="module")
def eng(spark):
    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_r16_"))


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _differential(eng, con, sql):
    from duckdb_service_spark.service.serializer import duck_error_text

    try:
        want = ("OK", con.execute(sql).fetchall())
    except Exception as e:
        want = ("ERR", str(e).splitlines()[0])
    try:
        got = ("OK", [tuple(r) for r in eng.query_df(sql).collect()])
    except Exception as e:
        got = ("ERR", duck_error_text(e).splitlines()[0])
    assert got == want, f"{sql!r}: engine {got} vs duckdb {want}"


@pytest.mark.parametrize(
    "sql",
    [
        # the VERDICT task-8 repro: duplicate literal keys in a map fold
        "SELECT CAST('{a=1, a=2}' AS MAP(VARCHAR, INTEGER)) AS v",
        # value-level duplicate only after the key cast (text differs)
        "SELECT CAST('{1=x, 01=y}' AS MAP(INTEGER, VARCHAR)) AS v",
        # measured: duplicate keys raise even under TRY_CAST
        "SELECT TRY_CAST('{a=1, a=2}' AS MAP(VARCHAR, INTEGER)) AS v",
        # controls: distinct keys must still fold cleanly (compared via
        # map_keys — raw map cells render differently per client)
        "SELECT map_keys(CAST('{a=1, b=2}' AS MAP(VARCHAR, INTEGER))) AS v",
        "SELECT map_keys(CAST('{1=x, 2=y}' AS MAP(INTEGER, VARCHAR))) AS v",
        "SELECT map_values(CAST('{1=x, 2=y}' AS MAP(INTEGER, VARCHAR))) AS v",
    ],
)
def test_map_fold_duplicate_keys(eng, con, sql):
    _differential(eng, con, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # unspaced '!<op>' tokens — catalog error names the full token
        "SELECT 3!||2",
        "SELECT 3!|| 2",
        "SELECT 3!/2",
        "SELECT 3!%2",
        "SELECT 3!^2",
        # spaced '||' still parses '!' as a binary operator (names '!')
        "SELECT 3! || 2",
        # spaced '/', '%', '^' evaluate: factorial first, then the op
        "SELECT 3! / 2",
        "SELECT 7! / 4",
        "SELECT 3! % 2",
        "SELECT 5! % 7",
        "SELECT 3! ^ 2",
        "SELECT 2! ^ 0.5",
        "SELECT NULL! / 2",
        # scan-back operand: factorial binds looser than '+' on its left
        "SELECT 1 + 3! / 2",
    ],
)
def test_factorial_operator_lanes(eng, con, sql):
    _differential(eng, con, sql)
