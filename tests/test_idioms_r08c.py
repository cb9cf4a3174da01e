"""Round-8 batch-4 sweep: list_aggregate NULL/empty semantics (fixes two
silent wrong answers — sum returned 0.0 on [] and NULL on [1,2,NULL]),
string_agg/first/last names, n-ary list_zip with NULL-padding and the
truncate flag, nfc_normalize (pandas UDF), and the emitter arity guard
(json_quote() now raises cleanly instead of IndexError)."""

from __future__ import annotations

import duckdb
import pytest

from duckdb_service_spark.service.dialect import UnsupportedDialect, translate


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


CASES = [
    # list_aggregate NULL/empty semantics (measured: NULLs skipped, empty/
    # all-NULL/NULL list -> NULL, never the fold seed)
    "list_aggregate([1, 2, 3], 'sum')",
    "list_aggregate([1, 2, NULL], 'sum')",
    "list_aggregate([]::INT[], 'sum')",
    "list_aggregate([NULL]::INT[], 'sum')",
    "list_aggregate(NULL::INT[], 'sum')",
    "list_aggregate([1, 2, NULL], 'avg')",
    "list_aggregate([]::INT[], 'avg')",
    "list_aggregate([4, 1, NULL], 'min')",
    "list_aggregate([4, 1, NULL], 'max')",
    "list_aggregate([4, 1, NULL], 'count')",
    # string_agg with and without separator; numeric elements cast
    "list_aggregate(['a', 'b'], 'string_agg', '|')",
    "list_aggregate([1, 2], 'string_agg')",
    "list_aggregate([]::VARCHAR[], 'string_agg')",
    "list_aggregate([NULL]::VARCHAR[], 'string_agg')",
    "list_aggregate([''], 'string_agg')",
    # first/last KEEP NULL elements
    "list_aggregate([NULL, 2, 3], 'first')",
    "list_aggregate([1, 2, NULL], 'last')",
    "list_aggregate([]::INT[], 'first')",
    "list_aggregate([3, 1, 2], 'first')",
    "list_aggregate([3, 1, 2], 'last')",
    "list_aggr([9, 4], 'max')",
    # list_zip: padding, n-ary, NULL list, truncate flag
    "list_zip([1, 2], ['a', 'b', 'c'])",
    "list_zip([1, 2], ['a', 'b', 'c'], true)",
    "list_zip([1, 2], ['a', 'b', 'c'], false)",
    "list_zip([1, 2, 3])",
    "list_zip([1], [2], [3, 4])",
    "list_zip(NULL::INT[], [1])",
    "list_zip([]::INT[], []::INT[])",
    # nfc_normalize: decomposed e + combining acute -> composed é
    "nfc_normalize('école')",
    "nfc_normalize('abc')",
    "nfc_normalize(NULL)",
    "length(nfc_normalize('é'))",
]


def _norm(v):
    if isinstance(v, tuple):
        return tuple(_norm(x) for x in v)
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, dict):
        return tuple(_norm(x) for x in v.values())
    from pyspark.sql import Row

    if isinstance(v, Row):
        return tuple(_norm(x) for x in v)
    return v


@pytest.mark.parametrize("expr", CASES)
def test_r08c_idiom_matches_duckdb(spark, con, expr):
    sql = f"SELECT {expr} AS v"
    want = _norm(con.execute(sql).fetchone()[0])
    got = _norm(spark.sql(translate(sql)).collect()[0][0])
    if isinstance(want, float):
        assert got == pytest.approx(want, abs=1e-9), expr
    else:
        assert got == want, f"{expr}: spark={got!r} duck={want!r}"


def test_json_quote_zero_args_raises_cleanly():
    with pytest.raises(UnsupportedDialect, match="argument count"):
        translate("SELECT json_quote() AS v")


def test_list_aggregate_unknown_name_raises():
    with pytest.raises(UnsupportedDialect, match="median"):
        translate("SELECT list_aggregate([1], 'median') AS v")


# ---- batch-5: value-differential sweep findings ---------------------------

SWEEP_CASES = [
    # log(x) is LOG10 in DuckDB (silent ln if passed through)
    "log(2.5)",
    "log(100)",
    "log(2, 8)",
    # scalar LIST-returning series: inclusive/exclusive, empty on wrong
    # direction (unlike the FROM TVF, which errors)
    "generate_series(1, 3)",
    "generate_series(3)",
    "generate_series(5, 1)",
    "generate_series(1, 6, 2)",
    "generate_series(5, 1, -2)",
    "range(3)",
    "range(1, 4)",
    "range(5, 1)",
    "range(5, 0, -2)",
    "range(0)",
    # default group is 0 in DuckDB (Spark's default 1 errors or silently
    # extracts the wrong group)
    "regexp_extract_all('a1b2', '\\d')",
    "regexp_extract_all('a1b2c3', '[a-z](\\d)', 1)",
    # literal backslashes are VERBATIM in DuckDB strings — the dialect
    # doubles them so Spark's escaped-string parser yields the same value
    "length('\\d')",
    "regexp_matches('a1', '\\d')",
    "'x\\y'",
    # named arithmetic aliases
    "add(2, 3)",
    "subtract(5, 2)",
    "multiply(3, 4)",
    # aliases and 1-arg forms
    "array_cat([1], [2, 3])",
    "ends_with('abc', 'bc')",
    "string_to_array('a,b,c', ',')",
    "greatest(7)",
    "least(7)",
    "trunc(2.7)",
    "trunc(0 - 2.7)",
    # json_array_length: 0 for valid non-array JSON, NULL for NULL
    "json_array_length('{\"k\":1}')",
    "json_array_length('[1,2]')",
    "json_array_length(NULL)",
    "json_array()",
]


@pytest.mark.parametrize("expr", SWEEP_CASES)
def test_r08c_sweep_matches_duckdb(spark, con, expr):
    sql = f"SELECT {expr} AS v"
    want = _norm(con.execute(sql).fetchone()[0])
    got = _norm(spark.sql(translate(sql)).collect()[0][0])
    import decimal

    if isinstance(want, decimal.Decimal):
        want = float(want)
    if isinstance(got, decimal.Decimal):
        got = float(got)
    if isinstance(want, float):
        assert got == pytest.approx(want, abs=1e-9), expr
    else:
        assert got == want, f"{expr}: spark={got!r} duck={want!r}"


def test_divide_named_raises_cleanly():
    with pytest.raises(UnsupportedDialect, match="divide"):
        translate("SELECT divide(7, 2) AS v")


AGG_SWEEP_REL = (
    # s values unique where non-NULL: argmin/argmax ties would otherwise
    # be engine-arbitrary
    "(VALUES (1, 'x'), (2, NULL), (3, 'y'), (2, 'w')) t(i, s)"
)

AGG_SWEEP = [
    "listagg(i)",
    "listagg(i, '|')",
    "string_agg(i)",
    "argmax(i, s)",
    "argmin(i, s)",
    "arg_max_null(s, i)",
    "arg_min_null(s, i)",
    "round(sem(i), 9)",
    "count()",
    "count_star()",
]


@pytest.mark.parametrize("expr", AGG_SWEEP)
def test_r08c_agg_sweep_matches_duckdb(spark, con, expr):
    sql = f"SELECT {expr} AS v FROM {AGG_SWEEP_REL}"
    want = _norm(con.execute(sql).fetchone()[0])
    got = _norm(spark.sql(translate(sql)).collect()[0][0])
    if isinstance(want, float):
        assert got == pytest.approx(want, abs=1e-9), expr
    else:
        assert got == want, f"{expr}: spark={got!r} duck={want!r}"


def test_arg_max_null_keeps_null_at_extreme(spark, con):
    # arg_max skips the NULL value at the max key; arg_max_null returns it
    rel = "(VALUES (CAST(NULL AS INT), 9), (1, 5)) t(v, k)"
    sql = f"SELECT arg_max(v, k) AS a, arg_max_null(v, k) AS b FROM {rel}"
    want = con.execute(sql).fetchone()
    got = spark.sql(translate(sql)).collect()[0]
    assert (got[0], got[1]) == (want[0], want[1]) == (1, None)
