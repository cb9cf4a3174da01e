"""Round-9 value-differential sweep battery (VERDICT r08 task 3): the
aggregate / window / binary-operator sweep (tools/sweep_aggwin.py) probed
every duckdb_functions() aggregate entry, its windowed form, and the
operator surface with typed arguments. Silent wrong answers found and
fixed, each frozen here:

- ``//`` is integer division ONLY for integer operands — with a float/
  decimal literal or cast on either side it is plain DOUBLE division
  (measured: 7.5 // 2 = 3.75, 7 // 2.5 = 2.8),
- list ``||`` is list_concat: a NULL side is treated as empty unless both
  sides are NULL (measured: NULL || [9] = [9]) — Spark concat propagates,
- date − DATE literal returns BIGINT days (Spark: INTERVAL),
- list()/array_agg() KEEP NULL elements and return NULL on an empty
  group/frame (Spark collect_list drops NULLs, returns []),
- max_by/min_by are arg_max/arg_min aliases: rows with NULL values are
  SKIPPED (Spark natives keep the NULL at the extreme key),
- bare quantile() = quantile_disc,
- regr_* always return DOUBLE (Spark keeps DECIMAL inputs decimal and
  truncates the result scale),
- composite aggregate emitters (product/skewness/kurtosis/sem/mad/
  entropy/list) now work as WINDOW functions: the OVER/FILTER clause is
  attached to every inner aggregate of the expansion (previously a Spark
  analysis error — the r08 SPARK-ERR class),
- windowed product over an all-NULL frame is NULL, not the fold seed.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pytest

from duckdb_service_spark.service.dialect import translate

REL = (
    "(VALUES "
    "(1,  10, 2.5,  'Apple',  DATE '2024-01-05', [1, 2], 0),"
    "(-3, 20, -0.5, 'banana', DATE '2024-02-11', [3],    0),"
    "(7,  30, NULL, 'Cherry', DATE '2023-12-31', [],     1),"
    "(NULL,40, 8.25,'apple',  DATE '2024-01-05', [4, 5], 1),"
    "(2,  50, 3.5,  NULL,     DATE '2025-06-01', NULL,   2)"
    ") t(i, u, d, s, dt, li, g)"
)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _norm(v):
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, _norm(x)) for k, x in sorted(v.items()))
    from pyspark.sql import Row

    if isinstance(v, Row):
        return tuple(_norm(x) for x in v)
    return v


def _compare(spark, con, select_list, order=""):
    sql = f"SELECT {select_list} FROM {REL}{order}"
    want = [tuple(_norm(c) for c in r) for r in con.execute(sql).fetchall()]
    got = [tuple(_norm(c) for c in r) for r in spark.sql(translate(sql)).collect()]
    assert got == want, f"{select_list}: spark={got!r} duck={want!r}"


# ---- binary / unary operator sweep (scalar per-row) ------------------------

OP_CASES = [
    # floor division: int//int = integer, any float/decimal side = DOUBLE /
    "7 // 2",
    "(0-7) // 2",
    "7.0 // 2",
    "7 // 2.5",
    "7.5 // 2.0",
    "CAST(7.5 AS DOUBLE) // 2",
    "i // 2",
    "i // nullif(i, 0)",
    # CAST-to-int operand stays integer division (the r09 fuzz regression)
    "CAST(2.9 AS INTEGER) // 2",
    # modulo / power / shifts
    "7 % 3",
    "(0-7) % 3",
    "7.5 % 2",
    "2 ** 10",
    "2 ** 3 ** 2",
    "2 ^ 10",
    "1 << 10",
    "255 >> 4",
    "xor(5, 3)",
    "~5",
    # concat: strings propagate NULL, lists treat NULL as empty
    "'a' || 'b'",
    "NULL || 'x'",
    "[1] || [2, 3]",
    "li || [9]",
    "[9] || li",
    "1 || 'a'",
    # date arithmetic: date - date = BIGINT days, date +/- int = date
    "dt - DATE '2024-01-01'",
    "dt + 1",
    "dt - 1",
    "DATE '2024-03-01' - DATE '2024-02-28'",
    # collation (binary) comparisons, implicit casts
    "'abc' < 'ABD'",
    "s < 'b'",
    "1 = '1'",
    "i BETWEEN 0-1 AND 3",
]


@pytest.mark.parametrize("expr", OP_CASES)
def test_r09_operator_matches_duckdb(spark, con, expr):
    _compare(spark, con, f"u, {expr} AS v", " ORDER BY u")


# ---- aggregate sweep -------------------------------------------------------

AGG_CASES = [
    # NULL-keeping list/array_agg
    "list(i)",
    "array_agg(d)",
    "list(i) FILTER (i > 5)",
    # empty group -> NULL (not [])
    "CASE WHEN list(i) FILTER (i > 99) IS NULL THEN 'null' ELSE 'arr' END",
    # max_by/min_by = arg_max/arg_min: NULL values skipped
    "max_by(i, u)",
    "min_by(i, u)",
    "arg_max(d, u)",
    "arg_max_null(d, u)",
    "arg_min_null(i, u)",
    # quantile family incl. the bare alias
    "quantile(i, 0.5)",
    "quantile_disc(i, 0.25)",
    "quantile_cont(i, 0.25)",
    "median(i)",
    "mode(i)",
    # regr_* return DOUBLE even over decimal literals
    "regr_avgx(i, d)",
    "regr_avgy(i, d)",
    "round(regr_slope(i, d), 9)",
    "round(regr_r2(i, d), 9)",
    "regr_count(i, d)",
    # moments / misc (re-checked post-refactor)
    "round(skewness(d), 9)",
    "round(kurtosis(d), 9)",
    "round(sem(d), 9)",
    "mad(d)",
    "round(entropy(i), 9)",
    "product(d)",
    "product(CASE WHEN false THEN d END)",
    "bit_and(i)",
    "bit_or(i)",
    "bit_xor(i)",
]


@pytest.mark.parametrize("expr", AGG_CASES)
def test_r09_aggregate_matches_duckdb(spark, con, expr):
    _compare(spark, con, f"{expr} AS v")


# ---- windowed forms --------------------------------------------------------

WIN_FRAME = "PARTITION BY g ORDER BY u ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"

WIN_CASES = [
    "list(i){W}",
    "array_agg(d){W}",
    "max_by(i, dt){W}",  # g=1 partition has a NULL value at the max key
    "min_by(i, u){W}",
    "product(d){W}",  # all-NULL frame (g=1 first row) -> NULL, not 1.0
    "round(skewness(i){W}, 9)",
    "round(kurtosis(i){W}, 9)",
    "round(sem(i){W}, 9)",
    "mad(i){W}",
    "round(entropy(i){W}, 9)",
]


@pytest.mark.parametrize("expr", WIN_CASES)
def test_r09_window_matches_duckdb(spark, con, expr):
    sel = expr.replace("{W}", f" OVER ({WIN_FRAME})")
    _compare(spark, con, f"u, {sel} AS v", " ORDER BY u")


def test_r09_window_filter_composite(spark, con):
    _compare(
        spark,
        con,
        f"u, round(sem(i) FILTER (i > 0) OVER ({WIN_FRAME}), 9) AS v",
        " ORDER BY u",
    )


def test_r09_named_window_composite(spark, con):
    sql = (
        f"SELECT u, sem(i) OVER w AS a, list(i) OVER w AS b FROM {REL} "
        f"WINDOW w AS ({WIN_FRAME}) ORDER BY u"
    )
    want = [tuple(_norm(c) for c in r) for r in con.execute(sql).fetchall()]
    got = [tuple(_norm(c) for c in r) for r in spark.sql(translate(sql)).collect()]
    assert got == want


def test_r09_ordered_first_last_still_null_flagged(spark, con):
    # regression guard: the inline-ORDER-BY first/last emission routes
    # through the max_by rename — its struct wrap must keep behaving
    sql = (
        f"SELECT first(i ORDER BY d) AS f, last(i ORDER BY d) AS l FROM {REL}"
    )
    want = con.execute(sql).fetchone()
    got = spark.sql(translate(sql)).collect()[0]
    assert (got[0], got[1]) == (want[0], want[1])


def test_r09_list_distinct_keeps_nulls(spark, con):
    # DISTINCT form: set-equal incl. the NULL element (order is
    # engine-arbitrary in BOTH engines, so compare as sets)
    rel = "(VALUES (1), (7), (NULL), (2), (2)) t(i)"
    for fn in ("list", "array_agg"):
        sql = f"SELECT {fn}(DISTINCT i) AS v FROM {rel}"
        want = sorted(map(str, con.execute(sql).fetchone()[0]))
        got = sorted(map(str, spark.sql(translate(sql)).collect()[0][0]))
        assert got == want, f"{fn}: {got} != {want}"


DISTINCT_FILTER_AGGS = [
    "sum(DISTINCT i)",
    "avg(DISTINCT d)",
    "count(DISTINCT i)",
    "median(DISTINCT i)",
    "corr(DISTINCT i, d)",
    "sum(i) FILTER (i > 0)",
    "count(*) FILTER (s IS NOT NULL)",
    "first(i ORDER BY d)",
    "last(s ORDER BY u DESC)",
    "bool_and(i > 0)",
]


@pytest.mark.parametrize("expr", DISTINCT_FILTER_AGGS)
def test_r09_distinct_filter_agg_matches_duckdb(spark, con, expr):
    _compare(spark, con, f"{expr} AS v")


STRING_SUBSCRIPT_CASES = [
    "'xyz'[1]", "'xyz'[0]", "'xyz'[-1]", "'xyz'[5]", "'xyz'[2:3]",
    "'héllo'[2]", "'abcde'[0:2]", "'abcde'[2:1]", "'abcde'[-2:-1]",
    "'abcde'[2:]", "'abcde'[:2]", "'abcde'[1:99]", "'abcde'[-9:2]",
    "'abcde'[2:-1]", "upper('abc')[2]", "substr('hello', 2)[1]",
    "lpad('x', 3, '_')[1]",
]


@pytest.mark.parametrize("expr", STRING_SUBSCRIPT_CASES)
def test_r09_string_subscript_matches_duckdb(spark, con, expr):
    # string-literal and string-returning-call bases take the substring
    # form (measured: codepoint-based, index 0 / out-of-range -> '',
    # slices identical to list slice math); bare COLUMN bases are
    # schema-resolved at the service layer (test_map_subscript_r09)
    _compare(spark, con, f"u, {expr} AS v", " ORDER BY u")
