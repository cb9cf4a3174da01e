"""Round-8 batch-3 DuckDB function-coverage sweep — found by diffing
duckdb_functions() against the dialect's known-name set and probing each
candidate through translate() (same model as test_idioms_r07/r08):

- bar() with DuckDB's measured byte-based space padding and eighth-block
  partials; min >= max -> all spaces,
- to_base 3-arg min_length (pads, never truncates) + negative-input
  runtime guard,
- jaccard (character-set, case-sensitive),
- constant_or_null (NULL if any condition arg is NULL),
- decode(blob) UTF-8, to_weeks/to_quarters/to_centuries/to_decades/
  to_millennia interval constructors (values checked via date arithmetic —
  interval->VARCHAR rendering is an engine-wide declared difference),
- get_bit/set_bit over the engine's validated BIT strings,
- bare lambda-function aliases: apply/array_apply/array_transform/
  array_filter; shape-dispatched bare aggregate()/reduce() (DuckDB list
  forms vs Spark's native lambda forms emitted by earlier rewrite passes),
- array_* aliases: grade_up, reverse_sort, value, aggr, cross_product,
  distance/cosine/inner/dot products; list_distance,
- element_at (map-only in DuckDB, returns LIST; missing key -> []),
- strlen = BYTE length, unpivot_list,
- bin/to_binary (numeric minimal digits; string literals = per-byte
  UTF-8 pattern), from_binary with 64-bit runtime guard,
- current_query() returns the verbatim submitted statement,
- clean raises: stats, vector_type, (md5_number graduated to a
  real composition in r10),
  in_search_path, txid_current, create_sort_key, bit_position.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from duckdb_service_spark.service.dialect import UnsupportedDialect, translate


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


CASES = [
    "bar(3, 0, 10, 10)",
    "bar(3.3, 0, 10, 10)",
    "bar(0.5, 0, 10, 10)",
    "bar(0.04, 0, 10, 10)",
    "bar(9.99, 0, 10, 10)",
    "bar(12, 0, 10, 10)",
    "bar(-1, 0, 10, 10)",
    "bar(5, 10, 0, 10)",
    "bar(5.5, 0, 10)",
    "to_base(255, 16, 6)",
    "to_base(7, 2, 1)",
    "to_base(255, 36)",
    "to_base(0, 16)",
    "jaccard('duck','luck')",
    "jaccard('abc','abc')",
    "jaccard('aab','ab')",
    "jaccard('ab','AB')",
    "jaccard('héé','hé')",
    "constant_or_null(42, NULL)",
    "constant_or_null(42, 1)",
    "constant_or_null(42, 1, NULL)",
    "constant_or_null(NULL, 1)",
    "decode(encode('héllo'))",
    "DATE '2024-01-01' + to_weeks(2)",
    "DATE '2024-01-01' + to_quarters(5)",
    "DATE '2024-01-01' + to_centuries(1)",
    "DATE '2024-01-01' + to_decades(3)",
    "DATE '2024-01-01' + to_millennia(1)",
    "get_bit('0110'::BIT, 1)",
    "get_bit('1110'::BIT, 0)",
    "get_bit('0110'::BIT, 3)",
    "set_bit('0110'::BIT, 0, 1)",
    "set_bit('0110'::BIT, 3, 1)",
    "set_bit('0110'::BIT, 1, 0)",
    "apply([1,2,3], x -> x + 1)",
    "array_apply([1,2], x -> x * 2)",
    "array_transform([1,2], x -> x * 2)",
    "array_filter([1,2,3], x -> x > 1)",
    "reduce([1,2,3], (a,b) -> a + b)",
    "array_reduce([4,5], (a,b) -> a + b)",
    "aggregate([1,2,3], 'sum')",
    "array_aggregate([1,2], 'sum')",
    "array_aggr([1,2,3], 'max')",
    "list_aggr([1,2,3], 'min')",
    "grade_up([30,10,20,10])",
    "array_grade_up([30,10,20])",
    "element_at(map(['k'],[5]), 'k')",
    "element_at(map(['k'],[5]), 'z')",
    "list_extract([5,6], 2)",
    "array_extract([5,6,7], 2)",
    "unpivot_list('a','b')",
    "unpivot_list('a')",
    "array_value(1,2)",
    "list_pack(1,2)",
    "strlen('héllo')",
    "strlen('abc')",
    "array_reverse_sort([2,1,3])",
    "list_has([1,2], 2)",
    "list_distance([1.0,2.0],[4.0,6.0])",
    "array_distance(array_value(1.0::FLOAT,2.0::FLOAT),"
    " array_value(4.0::FLOAT,6.0::FLOAT))",
    "array_cosine_similarity(array_value(1.0::FLOAT,0.0::FLOAT),"
    " array_value(1.0::FLOAT,0.0::FLOAT))",
    "array_inner_product(array_value(1.0::FLOAT,2.0::FLOAT),"
    " array_value(3.0::FLOAT,4.0::FLOAT))",
    "array_dot_product(array_value(1.0::FLOAT,2.0::FLOAT),"
    " array_value(3.0::FLOAT,4.0::FLOAT))",
    "array_cross_product(array_value(1.0::FLOAT,2.0::FLOAT,3.0::FLOAT),"
    " array_value(4.0::FLOAT,5.0::FLOAT,6.0::FLOAT))",
    "bin(5)",
    "bin(255)",
    "to_binary(5)",
    "to_binary('1010')",
    "bin('abc')",
    "from_binary('00000101')",
    "from_binary('1010')",
]


def _norm(v):
    if isinstance(v, tuple):
        return [_norm(x) for x in v]
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).date().isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


@pytest.mark.parametrize("expr", CASES)
def test_r08b_idiom_matches_duckdb(spark, con, expr):
    sql = f"SELECT {expr} AS v"
    want = con.execute(sql).fetchone()[0]
    got = spark.sql(translate(sql)).collect()[0][0]
    want, got = _norm(want), _norm(got)
    if isinstance(want, float):
        assert got == pytest.approx(want, abs=1e-9), expr
    else:
        assert got == want, f"{expr}: spark={got!r} duck={want!r}"


def test_current_query_verbatim(spark):
    sql = "SELECT current_query()  -- tail comment"
    got = spark.sql(translate(sql)).collect()[0][0]
    assert got == sql


def test_to_base_negative_raises_at_runtime(spark):
    with pytest.raises(Exception, match="to_base"):
        spark.sql(translate("SELECT to_base(0 - 255, 16) AS v")).collect()


def test_from_binary_over_64_bits_raises_at_runtime(spark):
    with pytest.raises(Exception, match="from_binary"):
        spark.sql(
            translate(f"SELECT from_binary('{'0' * 72}') AS v")
        ).collect()


def test_spark_form_aggregate_reduce_roundtrip(spark):
    # the bare-name dispatch must NOT capture Spark's native lambda forms
    # (earlier rewrite passes emit them into the statement)
    r = spark.sql(
        "SELECT aggregate(array(1, 2, 3), 0, (a, x) -> a + x) AS s,"
        " reduce(array(1, 2, 3), 10, (a, x) -> a + x) AS t"
    ).collect()[0]
    assert (r.s, r.t) == (6, 16)


@pytest.mark.parametrize(
    "expr",
    [
        # md5_number left this list in r10: it now composes the full
        # HUGEINT where it fits DECIMAL(38) and raises only at RUNTIME on
        # true overflow (tests/test_idioms_r10.py)
        "stats(5)",
        "vector_type(1)",
        "in_search_path('memory','main')",
        "txid_current()",
        "create_sort_key('a', 'ASC NULLS FIRST')",
        "bit_position('11'::BIT, '0110010'::BIT)",
    ],
)
def test_r08b_clean_raises(expr):
    with pytest.raises(UnsupportedDialect):
        translate(f"SELECT {expr}")
