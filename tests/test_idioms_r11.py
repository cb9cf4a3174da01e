"""Round-11 multi-branch result-type unification, differentially verified
against live DuckDB (VERDICT r10 task 4 — the last unswept lattice;
tools/sweep_branch_types.py final state: 0 DIVERGE / 0 SPARK-ERR /
0 TYPE-DIFF across setop/case/coalesce/greatest/in/values families).

Measured DuckDB rules reproduced:
- Set operations: BOOLEAN branch coerces INTO the other lane (bool ∪
  TINYINT -> TINYINT 0/1, bool ∪ VARCHAR -> VARCHAR 'true'/'false');
  DECIMAL ∪ FLOAT -> FLOAT through the scaled-int float32 lane (Spark
  unified to DOUBLE — a value-level divergence: -99.99::DECIMAL(5,2)
  reads back -99.989998 in DuckDB's float32).
- CASE/COALESCE/IF branches: the same lanes at expression level (Spark
  raises DATA_DIFF_TYPES on bool-vs-int branches DuckDB accepts).
- GREATEST/LEAST: all-integer args promote to BIGINT, any fractional
  arg to DOUBLE (DuckDB itself rejects BOOLEAN args).
- VALUES lists: string literals coerce INTO a numeric/date lane and
  booleans into a numeric lane ((1),('42') -> INTEGER; (1),(true) ->
  INTEGER; (1),(2.5),('7') -> DECIMAL).
- An untyped NULL projection serializes as INTEGER (DuckDB binds bare
  NULL to INTEGER; typeof()'s '"NULL"' is value-level only).

Reference reach: db/db.go:70 (raw SQL passthrough to linked DuckDB).
"""

from __future__ import annotations

import tempfile

import duckdb
import pytest


@pytest.fixture(scope="module")
def eng(spark):
    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_r11i_"))


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


REL = (
    "(SELECT CAST(c0 AS TINYINT) AS i8, CAST(c1 AS INTEGER) AS i32, "
    "CAST(c2 AS DECIMAL(5,2)) AS dc5, CAST(c3 AS DECIMAL(18,6)) AS dc18, "
    "CAST(c4 AS FLOAT) AS flt, CAST(c5 AS DOUBLE) AS dbl, "
    "CAST(c6 AS BOOLEAN) AS b, c7 AS vtxt, c8 AS u "
    "FROM (VALUES (3, -7, 1.25, 123.456789, 0.5, 2.5, true, 'apple', 1), "
    "(-2, 999, -99.99, -0.000001, 4.0, -0.125, false, 'pie', 2), "
    "(NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, 3)"
    ") v(c0,c1,c2,c3,c4,c5,c6,c7,c8))"
)


def _diff(eng, con, sql):
    def n(v):
        if isinstance(v, float) or str(type(v)).find("Decimal") > 0:
            return round(float(v), 6)
        return v

    want = sorted(
        (tuple(n(c) for c in r) for r in con.execute(sql).fetchall()),
        key=repr,
    )
    got = sorted(
        (tuple(n(c) for c in r) for r in eng.query_df(sql).collect()),
        key=repr,
    )
    assert got == want, f"{sql!r}:\n  spark={got}\n  duck ={want}"


# ---- set operations ------------------------------------------------------


def test_setop_bool_vs_int_branch(eng, con):
    _diff(eng, con, f"SELECT i8 AS v FROM {REL} UNION ALL SELECT b FROM {REL}")


def test_setop_bool_vs_varchar_branch(eng, con):
    _diff(eng, con, f"SELECT vtxt AS v FROM {REL} UNION SELECT b FROM {REL}")


def test_setop_decimal_vs_float_is_float32_lane(eng, con):
    # -99.99 must read back -99.989998 (DuckDB's scaled-int float32)
    _diff(eng, con, f"SELECT dc5 AS v FROM {REL} UNION ALL SELECT flt FROM {REL}")
    _diff(eng, con, f"SELECT dc18 AS v FROM {REL} EXCEPT SELECT flt FROM {REL}")


def test_setop_intersect_bool_numeric(eng, con):
    _diff(
        eng, con,
        f"SELECT i32 AS v FROM {REL} INTERSECT SELECT b FROM {REL}",
    )


def test_setop_order_by_tail_stays_outside(eng, con):
    _diff(
        eng, con,
        f"SELECT i8 AS v FROM {REL} UNION ALL SELECT b FROM {REL} "
        "ORDER BY v NULLS LAST LIMIT 4",
    )


def test_null_projection_serializes_integer(eng):
    from duckdb_service_spark.service.serializer import duckdb_type_name

    df = eng.query_df("SELECT NULL AS v UNION ALL SELECT NULL")
    assert duckdb_type_name(df.schema.fields[0].dataType) == "INTEGER"


# ---- CASE / COALESCE / IF ------------------------------------------------


def test_case_bool_vs_int_branches(eng, con):
    _diff(
        eng, con,
        f"SELECT u, CASE WHEN u = 1 THEN i8 ELSE b END AS v FROM {REL}",
    )


def test_case_decimal_vs_float_branches(eng, con):
    _diff(
        eng, con,
        f"SELECT u, CASE WHEN u = 1 THEN dc18 ELSE flt END AS v FROM {REL}",
    )


def test_case_multi_when_mixed(eng, con):
    _diff(
        eng, con,
        f"SELECT u, CASE WHEN u = 1 THEN b WHEN u = 2 THEN i32 "
        f"ELSE i8 END AS v FROM {REL}",
    )


def test_coalesce_bool_int(eng, con):
    _diff(eng, con, f"SELECT u, COALESCE(i32, b) AS v FROM {REL}")


def test_coalesce_decimal_float(eng, con):
    _diff(eng, con, f"SELECT u, COALESCE(dc5, flt) AS v FROM {REL}")
    _diff(eng, con, f"SELECT u, COALESCE(dc18, flt) AS v FROM {REL}")


def test_ifnull_bool_int(eng, con):
    _diff(eng, con, f"SELECT u, IFNULL(b, i8) AS v FROM {REL}")


# ---- GREATEST / LEAST ----------------------------------------------------


def test_greatest_int_widths_promote_bigint(eng, con):
    sql = f"SELECT u, GREATEST(i8, i32) AS v FROM {REL}"
    _diff(eng, con, sql)
    assert eng.query_df(sql).schema.fields[1].dataType.simpleString() == "bigint"


def test_greatest_fractional_promotes_double(eng, con):
    sql = f"SELECT u, LEAST(i8, dc5, flt) AS v FROM {REL}"
    _diff(eng, con, sql)
    assert eng.query_df(sql).schema.fields[1].dataType.simpleString() == "double"


def test_greatest_strings_untouched(eng, con):
    _diff(eng, con, f"SELECT u, GREATEST(vtxt, 'mango') AS v FROM {REL}")


# ---- VALUES-list typing --------------------------------------------------


def test_values_string_into_int_lane(eng, con):
    _diff(eng, con, "SELECT v FROM (VALUES (1), ('42')) t(v)")


def test_values_bool_into_int_lane(eng, con):
    _diff(eng, con, "SELECT v FROM (VALUES (1), (true)) t(v)")


def test_values_string_into_decimal_lane(eng, con):
    _diff(eng, con, "SELECT v FROM (VALUES (1), (2.5), ('7')) t(v)")


def test_values_string_into_date_lane(eng, con):
    _diff(
        eng, con,
        "SELECT v FROM (VALUES (DATE '2024-01-05'), ('2024-02-02')) t(v)",
    )


def test_values_all_strings_untouched(eng, con):
    _diff(eng, con, "SELECT v FROM (VALUES ('a'), ('b')) t(v)")


def test_values_null_rows_keep_lane(eng, con):
    _diff(eng, con, "SELECT v FROM (VALUES (1), (NULL), ('3')) t(v)")


# ---- LIST-literal element unification --------------------------------------


def test_list_string_into_int_lane(eng, con):
    _diff(eng, con, "SELECT [1, '42'] AS v")
    # string -> int ROUNDS through decimal in DuckDB (measured)
    _diff(eng, con, "SELECT ['1.5', 2] AS v")


def test_list_bool_into_int_lane(eng, con):
    _diff(eng, con, "SELECT [true, 1] AS v")


def test_list_string_into_exact_decimal_width(eng, con):
    # the union type is the EXACT decimal union of the numeric cells
    _diff(eng, con, "SELECT [2.55, '1.5'] AS v")
    _diff(eng, con, "SELECT ['7', 1.25] AS v")
    _diff(eng, con, "SELECT [1, 2.5, '7'] AS v")


def test_list_string_into_date_lane(eng, con):
    _diff(eng, con, "SELECT [DATE '2024-01-05', '2024-02-02'] AS v")


def test_list_date_ts_mix_is_timestamp(eng, con):
    _diff(
        eng, con,
        "SELECT [DATE '2024-01-05', TIMESTAMP '2024-02-02 01:00:00'] AS v",
    )


def test_list_subscripts_untouched(eng, con):
    _diff(eng, con, "SELECT ([10, '20'])[2] AS v")
    _diff(eng, con, "SELECT li[1] AS v FROM (SELECT [4, 5] AS li) t")


def test_list_null_and_bigint_cells(eng, con):
    _diff(eng, con, "SELECT [NULL, 1, '3'] AS v")
    _diff(eng, con, "SELECT [1, 4000000000, '7'] AS v")


def test_array_keyword_form_unifies(eng, con):
    _diff(eng, con, "SELECT ARRAY[1, '42'] AS v")


def test_map_literal_values_unify(eng, con):
    # compare via map_values: DuckDB's map cell shape differs from
    # Spark's dict, but the value LIST is directly comparable
    _diff(eng, con, "SELECT map_values(MAP {'x': 1, 'y': '2'}) AS v")
    _diff(eng, con, "SELECT map_values(MAP {'x': true, 'y': 1}) AS v")
    _diff(eng, con, "SELECT map_values(MAP {'a': 1, 'b': 2.5, 'c': '7'}) AS v")


def test_struct_field_list_unifies(eng, con):
    _diff(eng, con, "SELECT s.a AS v FROM (SELECT {'a': [1, '2']} AS s) t")


def test_map_literal_nonstring_keys_unify(eng, con):
    _diff(eng, con, "SELECT map_keys(MAP {1: 'a', '2': 'b'}) AS v")
    _diff(eng, con, "SELECT map_keys(MAP {1: 'a', 2: 'b'}) AS v")
    _diff(
        eng, con,
        "SELECT map_keys(MAP {DATE '2024-01-05': 1, '2024-02-02': 2}) AS v",
    )


def test_map_literal_base_subscript_is_list(eng, con):
    # DuckDB's map[k] returns [value] / []; the literal-base form needs
    # no schema and rewrites statically
    _diff(eng, con, "SELECT (MAP {1: 'a', '2': 'b'})[2] AS v")
    _diff(eng, con, "SELECT (MAP {'a': 1, 'b': 2})['b'] AS v")
    _diff(eng, con, "SELECT MAP {'a': 1}['a'] AS v")
    _diff(eng, con, "SELECT (MAP {'a': 1})['zz'] AS v")


# ---- adversarial literals vs the r11 scanners ------------------------------


def test_setop_keywords_inside_literals_do_not_split(eng, con):
    _diff(
        eng, con,
        "SELECT 'a UNION ALL b' AS v UNION ALL SELECT b FROM "
        "(SELECT true AS b) t",
    )
    _diff(eng, con, "SELECT 'x INTERSECT y' AS v")


def test_case_keywords_inside_literals_do_not_shift_spans(eng, con):
    _diff(
        eng, con,
        "SELECT CASE WHEN 1 = 1 THEN 'a THEN b' ELSE 'c ELSE END d' END AS v",
    )
    _diff(
        eng, con,
        "SELECT u, CASE WHEN u = 1 THEN b ELSE i8 END AS v FROM "
        f"{REL} WHERE vtxt IS NULL OR vtxt <> 'WHEN x THEN y'",
    )


def test_list_brackets_inside_literals_do_not_corrupt(eng, con):
    _diff(eng, con, "SELECT ['a[', ']b'] AS v")
    _diff(eng, con, "SELECT ['it''s', 'fine'] AS v")
    # '4]2' cannot convert to the int lane: BOTH engines raise (error
    # parity — the bracket inside the literal must not derail the scan)
    sql = "SELECT [1, '4]2'] AS v"
    with pytest.raises(Exception, match="(?i)conver"):
        con.execute(sql).fetchall()
    with pytest.raises(Exception, match="(?i)conver"):
        eng.query_df(sql).collect()


def test_map_literal_quoted_edges(eng, con):
    _diff(eng, con, "SELECT map_values(MAP {'a]': 1, 'b[': '2'}) AS v")
    _diff(eng, con, "SELECT (MAP {'it''s': 7})['it''s'] AS v")


# ---- numeric underscores / AT TIME ZONE -------------------------------------


def _diff_tz(eng, con, sql):
    import datetime

    def n(v):
        if isinstance(v, datetime.datetime):
            return v.replace(tzinfo=None).isoformat()
        return v

    want = [tuple(n(c) for c in r) for r in con.execute(sql).fetchall()]
    got = [tuple(n(c) for c in r) for r in eng.query_df(sql).collect()]
    assert got == want, f"{sql!r}: spark={got} duck={want}"


def test_numeric_underscore_literals(eng, con):
    _diff(eng, con, "SELECT 1_000_000 AS v")
    _diff(eng, con, "SELECT 1_000.5_0 AS v")
    _diff(eng, con, "SELECT 1_000 + 2_000 AS v")
    # identifiers with digit-underscore runs stay untouched
    _diff(eng, con, "SELECT a_1 AS v FROM (SELECT 7 AS a_1) t")


def test_at_time_zone_is_timezone_fn(eng, con):
    _diff_tz(
        eng, con,
        "SELECT TIMESTAMP '2024-06-05 01:02:03' "
        "AT TIME ZONE 'America/New_York' AS v",
    )
    _diff_tz(
        eng, con,
        "SELECT (TIMESTAMP '2024-06-05 01:02:03' + INTERVAL 1 DAY) "
        "AT TIME ZONE 'UTC' AS v",
    )
    _diff_tz(
        eng, con,
        "SELECT '2024-06-05 01:02:03'::TIMESTAMP "
        "AT TIME ZONE 'America/New_York' AS v",
    )
    _diff_tz(
        eng, con,
        "SELECT ts AT TIME ZONE 'UTC' AS v FROM "
        "(SELECT TIMESTAMP '2024-06-05 01:02:03' AS ts) t",
    )


# ---- EXTRACT / date_part field routing --------------------------------------


def test_extract_routes_to_measured_field_emitters(eng, con):
    ts = "TIMESTAMP '2024-01-05 01:02:03.123456'"
    for field in ("dow", "isodow", "doy", "week", "isoyear", "era",
                  "second", "millisecond", "microsecond", "millennium",
                  "months", "us", "ms"):
        _diff(eng, con, f"SELECT EXTRACT({field} FROM {ts}) AS v")


def test_extract_epoch_is_fractional_double(eng, con):
    _diff(
        eng, con,
        "SELECT EXTRACT(epoch FROM TIMESTAMP '1969-03-05 23:59:59.5') AS v",
    )
    _diff(eng, con, "SELECT epoch(DATE '2021-12-31') AS v")
    _diff(eng, con, "SELECT date_part('epoch', TIMESTAMP '2024-01-05 01:02:03.5') AS v")


def test_date_part_quoted_and_list_forms(eng, con):
    _diff(eng, con, "SELECT date_part('dow', DATE '2024-01-05') AS v")
    _diff(eng, con, "SELECT datepart('hour', TIMESTAMP '2024-01-05 07:02:03') AS v")
    _diff(
        eng, con,
        "SELECT (date_part(['year','month','dow'], DATE '2024-01-05')).dow AS v",
    )


# ---- COLUMNS(lambda) --------------------------------------------------------


def test_columns_lambda_expansion(eng, con):
    _diff_ordered(
        eng, con,
        "SELECT COLUMNS(c -> c LIKE 'r_%') FROM "
        "(SELECT 1 AS r_a, 2 AS r_b, 3 AS x) t",
    )
    _diff_ordered(
        eng, con,
        "SELECT min(COLUMNS(c -> c SIMILAR TO 'l_q.*')) FROM "
        "(SELECT 1 AS l_qty, 2 AS l_qmax, 3 AS other) t",
    )
    _diff_ordered(
        eng, con,
        "SELECT COLUMNS(c -> length(c) = 1) FROM (SELECT 1 AS a, 2 AS bb) t",
    )


def test_columns_lambda_no_match_raises(eng):
    from duckdb_service_spark.service.dialect import UnsupportedDialect

    with pytest.raises(Exception):
        eng.query_df(
            "SELECT COLUMNS(c -> c LIKE 'zz%') FROM (SELECT 1 AS a) t"
        ).collect()


# ---- DATE literal ± INTERVAL is TIMESTAMP ----------------------------------


def test_date_literal_interval_is_timestamp(eng, con):
    _diff(eng, con, "SELECT DATE '2024-01-05' + INTERVAL 1 DAY AS v")
    _diff(eng, con, "SELECT '2024-01-05'::DATE - INTERVAL 1 DAY AS v")
    _diff(eng, con, "SELECT INTERVAL 1 DAY + DATE '2024-01-05' AS v")
    _diff(
        eng, con,
        "SELECT (('2024-01-05'::DATE + INTERVAL 1 DAY))::VARCHAR AS v",
    )
    # date + INTEGER stays DATE (day arithmetic, unchanged)
    _diff(eng, con, "SELECT DATE '2024-01-05' + 3 AS v")


# ---- COLLATE NOCASE (VERDICT r10 task 5) ----------------------------------


def _diff_ordered(eng, con, sql):
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    got = [tuple(r) for r in eng.query_df(sql).collect()]
    assert got == want, f"{sql!r}:\n  spark={got}\n  duck ={want}"


def test_collate_nocase_equality(eng, con):
    _diff(eng, con, "SELECT 'Apple' COLLATE NOCASE = 'apple' AS v")
    _diff(eng, con, "SELECT 'Apple' = 'apple' COLLATE NOCASE AS v")
    _diff(eng, con, "SELECT 'Ω' COLLATE NOCASE = 'ω' AS v")


def test_collate_nocase_order_by_tie_order(eng, con):
    # case variants tie; both engines keep first-seen order ('A','a','b','B')
    _diff_ordered(
        eng, con,
        "SELECT v FROM (VALUES ('b'), ('A'), ('a'), ('B')) t(v) "
        "ORDER BY v COLLATE NOCASE",
    )


def test_collate_nocase_group_by(eng, con):
    _diff(
        eng, con,
        "SELECT v COLLATE NOCASE AS g, count(*) AS n FROM "
        "(VALUES ('Apple'), ('apple'), ('APPLE'), ('pie')) t(v) GROUP BY g",
    )


def test_collate_nocase_comparison_and_max(eng, con):
    _diff(eng, con, "SELECT 'a' < 'B' COLLATE NOCASE AS v")
    _diff(
        eng, con,
        "SELECT max(v COLLATE NOCASE) AS v FROM (VALUES ('b'), ('A')) t(v)",
    )


def test_collate_icu_locales_order_and_equality(eng, con):
    vals = (
        "('zebra'), ('Österreich'), ('apple'), ('Ähre'), ('côte'), "
        "('cote'), ('coté'), ('straße'), ('ABC'), ('abc')"
    )
    for loc in ("de", "fr", "tr", "sv"):
        _diff_ordered(
            eng, con,
            f"SELECT v FROM (VALUES {vals}) t(v) ORDER BY v COLLATE {loc}",
        )
    # ICU tertiary strength holds on equality in both engines
    _diff(eng, con, "SELECT 'straße' COLLATE de = 'strasse' AS v")
    _diff(eng, con, "SELECT 'i' COLLATE tr = 'İ' AS v")


def test_collate_other_names_raise_cleanly(eng):
    from duckdb_service_spark.service.dialect import UnsupportedDialect

    for name in ("NOACCENT", "NFC", "de_at", "nb", "NOCASE.NOACCENT"):
        with pytest.raises(UnsupportedDialect, match="COLLATE"):
            eng.query_df(f"SELECT 'a' COLLATE {name} = 'b' AS v").collect()
