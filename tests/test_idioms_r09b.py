"""Round-9 JSON tail (VERDICT r08 task 5): json_merge_patch /
json_structure / json_contains as Arrow pandas UDFs with measured DuckDB
semantics (functions/json_udfs.py) — differential against live DuckDB on
every probed edge, replacing the former clean raises."""

from __future__ import annotations

import duckdb
import pytest

from duckdb_service_spark.service.dialect import UnsupportedDialect, translate
from duckdb_service_spark.session import tune


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


MERGE_CASES = [
    # RFC 7386: null deletes, nested recursion, non-object replaces
    """json_merge_patch('{"a":1,"b":2}', '{"b":null,"c":3}')""",
    """json_merge_patch('{"a":{"x":1,"y":2}}', '{"a":{"y":null,"z":9}}')""",
    """json_merge_patch('{}', '{"a":{"b":null}}')""",
    """json_merge_patch('{"a":1}', '"str"')""",
    """json_merge_patch('[1,2]', '{"a":1}')""",
    """json_merge_patch('{"a":[1,2]}', '{"a":[3]}')""",
    """json_merge_patch('1', '2')""",
    """json_merge_patch('{"a":1}', 'null')""",
    # measured SQL-NULL fold asymmetry
    """json_merge_patch('{"a":1}', NULL)""",
    """json_merge_patch(NULL, '{"a":1}')""",
    """json_merge_patch(NULL, NULL)""",
    """json_merge_patch('{"a":1}', NULL, '{"b":2}')""",
    """json_merge_patch(NULL, '{"a":1}', NULL)""",
    # n-ary fold
    """json_merge_patch('{"a":1}', '{"b":2}', '{"c":3}')""",
]

STRUCTURE_CASES = [
    """json_structure('{"a":1,"b":[1,2],"c":{"d":"x"}}')""",
    """json_structure('[1,2,3]')""",
    """json_structure('[{"a":1},{"a":2.5}]')""",
    """json_structure('[{"a":1},{"b":2}]')""",
    """json_structure('"hi"')""",
    """json_structure('[1, "a"]')""",
    """json_structure('{"a": null}')""",
    """json_structure('-1')""",
    """json_structure('true')""",
    """json_structure('1.5e10')""",
    """json_structure('[]')""",
    """json_structure('{}')""",
    """json_structure('[null, 1]')""",
    """json_structure('[[1],[2.5]]')""",
    """json_structure('[1, -1]')""",
    """json_structure('18446744073709551616')""",
    """json_structure(NULL)""",
]

CONTAINS_CASES = [
    """json_contains('{"a":1,"b":2}', '{"a":1}')""",
    """json_contains('{"a":1}', '{"a":2}')""",
    """json_contains('[1,2,3]', '2')""",
    """json_contains('[1,[2,3]]', '[2,3]')""",
    """json_contains('{"a":{"b":1,"c":2}}', '{"a":{"b":1}}')""",
    """json_contains('{"a":{"b":1}}', '{"b":1}')""",  # recursive descent
    """json_contains('"x"', '"x"')""",
    """json_contains('{"a":1}', '1')""",
    """json_contains('[1,2]', '[1]')""",
    """json_contains('[1,2]', '[2,1]')""",
    """json_contains('[[1,2]]', '[1]')""",
    """json_contains('[{"a":1,"b":2}]', '{"a":1}')""",
    """json_contains('{"a":[1,2]}', '{"a":[1]}')""",
    """json_contains('{"a":1}', '{}')""",
    """json_contains('[1,2]', '[]')""",
    """json_contains('1', '1.0')""",  # type-strict scalars
    """json_contains('[1,2]', '"1"')""",
    """json_contains('[1,2]', NULL)""",
    """json_contains('[true]', 'true')""",
]


@pytest.mark.parametrize("expr", MERGE_CASES + STRUCTURE_CASES + CONTAINS_CASES)
def test_r09_json_tail_matches_duckdb(spark, con, expr):
    tune(spark)
    sql = f"SELECT {expr} AS v"
    want = con.execute(sql).fetchone()[0]
    got = spark.sql(translate(sql)).collect()[0][0]
    assert got == want, f"{expr}: spark={got!r} duck={want!r}"


def test_r09_json_merge_patch_single_arg_raises():
    with pytest.raises(UnsupportedDialect, match="two parameters"):
        translate("SELECT json_merge_patch('{}') AS v")


def test_r09_json_tail_over_table_column(spark, con):
    # column-valued (not just literal) inputs through a real projection
    tune(spark)
    rel = (
        "(VALUES ('{\"a\":1}', '{\"a\":1,\"b\":2}'), "
        "('[1,2]', '[2,3]'), (NULL, '{}')) t(needle, doc)"
    )
    sql = (
        f"SELECT json_contains(doc, needle) AS c, "
        f"json_structure(doc) AS s, "
        f"json_merge_patch(doc, needle) AS m FROM {rel}"
    )
    want = con.execute(sql).fetchall()
    got = [tuple(r) for r in spark.sql(translate(sql)).collect()]
    assert got == [tuple(r) for r in want]


# ---- r09: composite cast types (former clean-raise tail) --------------------

COMPLEX_CAST_CASES = [
    "CAST([[1,2],[3]] AS INT[][])",
    "[[1,2],[3]]::BIGINT[][]",
    "CAST(NULL AS VARCHAR[][])",
    "CAST({'a': 1, 'b': 'x'} AS STRUCT(a BIGINT, b VARCHAR))",
    "CAST(NULL AS STRUCT(x INT[], y VARCHAR))",
    "CAST(NULL AS MAP(VARCHAR, INTEGER))",
    "element_at(CAST(map(['a'],[2]) AS MAP(VARCHAR, DOUBLE)), 'a')",
    "map_extract(map(['a'],[1])::MAP(VARCHAR, BIGINT), 'a')",
]


def _norm_cell(v):
    from pyspark.sql import Row

    if isinstance(v, dict):
        # duckdb renders MAP as {'key': [...], 'value': [...]}
        if set(v) == {"key", "value"}:
            return tuple(sorted(zip(map(str, v["key"]), map(str, v["value"]))))
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, Row):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.asDict().items()))
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return str(v)


@pytest.mark.parametrize("expr", COMPLEX_CAST_CASES)
def test_r09_complex_type_casts_match_duckdb(spark, con, expr):
    sql = f"SELECT {expr} AS v"
    want = _norm_cell(con.execute(sql).fetchone()[0])
    got = _norm_cell(spark.sql(translate(sql)).collect()[0][0])
    assert got == want, f"{expr}: spark={got!r} duck={want!r}"
