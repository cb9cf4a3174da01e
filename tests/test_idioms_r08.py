"""Round-8 DuckDB idiom batch — every surface differentially verified
against DuckDB on the verbatim statement (same model as test_idioms_r07):

- path functions: parse_path / parse_dirpath / parse_dirname /
  parse_filename (both-slash mode, extension trim),
- size formatting: format_bytes (binary, TRUNCATED 1-decimal — measured)
  and formatReadableDecimalSize (decimal),
- regexp_escape (DuckDB's escape charset, measured),
- julian / era / timezone_hour / timezone_minute (UTC-pinned session),
- typeof / pg_typeof with DuckDB type NAMES (FLOAT, DECIMAL(p,s), ...),
- time_bucket: 2000-01-03 default origin (Monday-aligned — epoch
  alignment is measurably wrong for multi-day widths), month-space
  buckets, DATE return type, origin/offset third argument,
- like_escape / ilike_escape / not_* (ESCAPE clause lowering),
- editdist3 -> levenshtein, list_reverse -> reverse,
  gen_random_uuid/uuidv4 -> uuid, to_base64 -> base64,
  make_timestamptz under pinned UTC,
- clean UnsupportedDialect raises for the genuinely non-emittable
  (jaro*, damerau_levenshtein, nextafter, gamma, lgamma; alias
  graduated to a real emitter in r10).
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
    "parse_path('/a//b/c.txt')",
    "parse_path('c.txt')",
    "parse_path('a/b/')",
    "parse_dirpath('/a//b/c')",
    "parse_dirpath('a/b/')",
    "parse_dirpath('c.txt')",
    "parse_dirname('/a/b/c')",
    "parse_dirname('a/b')",
    "parse_dirname('c.txt')",
    "parse_filename('/a/b/c.txt')",
    "parse_filename('a/b/')",
    "parse_filename('/a/b/c.tar.gz', true)",
    "format_bytes(0)",
    "format_bytes(1)",
    "format_bytes(1023)",
    "format_bytes(1024)",
    "format_bytes(1536)",
    "format_bytes(1234567)",
    "format_bytes(1000000000)",
    "format_bytes(123456789012)",
    "format_bytes(-1234567)",
    "formatReadableDecimalSize(999)",
    "formatReadableDecimalSize(1000)",
    "formatReadableDecimalSize(999999)",
    "formatReadableDecimalSize(1234567)",
    "regexp_escape('a.b[c]{d}e|f(g)h*i+j?k^l$m-n')",
    "timezone_hour(TIMESTAMP '2024-01-01 10:00:00')",
    "timezone_minute(TIMESTAMP '2024-01-01 10:00:00')",
    "julian(DATE '2024-01-01')",
    "julian(TIMESTAMP '2024-01-01 18:00:00')",
    "era(DATE '2024-01-01')",
    "typeof(1.5::FLOAT)",
    "typeof(1)",
    "typeof('a')",
    "typeof(1.5)",
    "typeof(DATE '2024-01-01')",
    "pg_typeof(1)",
    "pg_typeof('a')",
    "editdist3('kitten','sitting')",
    "list_reverse([1,2,3])",
    "make_timestamptz(2024,1,1,10,30,0.0)",
    "time_bucket(INTERVAL '2 days', DATE '2024-03-05')",
    "time_bucket(INTERVAL '2 days', DATE '2024-03-06')",
    "time_bucket(INTERVAL '1 week', DATE '2024-03-06')",
    "time_bucket(INTERVAL '1 month', DATE '2024-03-06')",
    "time_bucket(INTERVAL '3 months', DATE '2024-05-06')",
    "time_bucket(INTERVAL '2 days', TIMESTAMP '2024-03-05 10:00:00')",
    "time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-03-05 10:37:00')",
    "time_bucket(INTERVAL '1 day', TIMESTAMP '2024-03-05 10:00:00',"
    " TIMESTAMP '2024-03-05 06:00:00')",
    "time_bucket(INTERVAL '1 day', TIMESTAMP '2024-03-05 10:00:00',"
    " INTERVAL '6 hours')",
    "like_escape('a%50', 'a!%5_', '!')",
    "ilike_escape('A%50', 'a!%5_', '!')",
    "not_like_escape('a%50', 'a!%5_', '!')",
    "to_base64(CAST('hi' AS BLOB))",
]


@pytest.mark.parametrize("expr", CASES)
def test_r08_idiom_matches_duckdb(spark, con, expr):
    sql = f"SELECT {expr} AS v"
    want = con.execute(sql).fetchone()[0]
    got = spark.sql(translate(sql)).collect()[0][0]
    if isinstance(want, datetime.datetime) and isinstance(got, datetime.datetime):
        want = want.replace(tzinfo=None)
        got = got.replace(tzinfo=None)
    if isinstance(want, float):
        assert got == pytest.approx(want, abs=1e-9), expr
    else:
        assert got == want, f"{expr}: spark={got!r} duck={want!r}"


def test_uuid_functions_translate_and_run(spark):
    rows = spark.sql(
        translate("SELECT gen_random_uuid() AS a, uuidv4() AS b")
    ).collect()[0]
    assert len(rows[0]) == 36 and len(rows[1]) == 36


@pytest.mark.parametrize(
    "expr",
    [
        # jaro*/damerau and gamma/lgamma/nextafter moved to IMPLEMENTED in
        # late r08 (Arrow pandas UDFs — tests/test_similarity_udfs.py and
        # tests/test_libm_udfs.py cover them)
        # alias() graduated to a real select-item-name emitter in r10
        #   (tests/test_idioms_r10.py::test_alias_fn_matches_duckdb)
    ],
)
def test_r08_unsupported_raise_cleanly(expr):
    with pytest.raises(UnsupportedDialect):
        translate(f"SELECT {expr} AS v")


def test_parse_filename_system_mode_raises():
    with pytest.raises(UnsupportedDialect):
        translate("SELECT parse_path('a/b', 'system') AS v")


# ---- r08 aggregate batch -----------------------------------------------------

AGG_CASES = [
    # DuckDB skewness/kurtosis are bias-corrected SAMPLE statistics; the
    # bare Spark names are population forms — silently different values
    ("skewness(y)", "(VALUES (2.0),(4.5),(7.0),(11.5),(2.0)) t(y)"),
    ("skewness(y)", "(VALUES (1.0),(2.0)) t(y)"),                # n<3 -> NULL
    ("skewness(y)", "(VALUES (2.0),(2.0),(2.0)) t(y)"),          # var=0 -> NULL
    ("kurtosis(y)", "(VALUES (2.0),(4.5),(7.0),(11.5),(2.0)) t(y)"),
    ("kurtosis(y)", "(VALUES (1.0),(2.0),(3.0)) t(y)"),          # n<4 -> NULL
    ("kurtosis_pop(y)", "(VALUES (1.0),(2.0),(3.0),(5.0)) t(y)"),
    ("entropy(x)", "(VALUES (1),(1),(2),(NULL)) t(x)"),          # NULLs skipped
    ("entropy(s)", "(VALUES ('a'),('b'),('b'),('c')) t(s)"),
    ("CAST(mad(x) AS DOUBLE)", "(VALUES (1.0),(3.0),(7.0),(20.0)) t(x)"),
    ("CAST(mad(x) AS DOUBLE)", "(VALUES (5.0)) t(x)"),
    ("CAST(mad(x) AS DOUBLE)", "(VALUES (2.0),(4.5),(7.0),(11.5),(2.0)) t(x)"),
    ("bitstring_agg(x, 1, 8)", "(VALUES (1),(3),(8)) t(x)"),
    ("geomean(y)", "(VALUES (1.0),(4.0),(16.0)) t(y)"),
    ("CAST(favg(y) AS DOUBLE)", "(VALUES (2.0),(4.5)) t(y)"),
    ("sumkahan(y)", "(VALUES (2.0),(4.5)) t(y)"),
    ("arbitrary(s)", "(VALUES ('a'),('b')) t(s)"),
]


@pytest.mark.parametrize("expr,values", AGG_CASES)
def test_r08_aggregate_matches_duckdb(spark, con, expr, values):
    sql = f"SELECT {expr} AS v FROM {values}"
    want = con.execute(sql).fetchone()[0]
    got = spark.sql(translate(sql)).collect()[0][0]
    if isinstance(want, float) or isinstance(got, float):
        if want is None or got is None:
            assert got == want, f"{expr}: {got!r} vs {want!r}"
        else:
            assert float(got) == pytest.approx(float(want), abs=1e-9), expr
    else:
        assert got == want, f"{expr}: spark={got!r} duck={want!r}"


def test_bitstring_agg_without_bounds_raises():
    with pytest.raises(UnsupportedDialect):
        translate("SELECT bitstring_agg(x) FROM t")


# ---- seeded randomized batch differentials ----------------------------------
# One VALUES relation per family (single Spark job), hundreds of random
# inputs, full-column equality vs DuckDB — the sample-based cases above
# pin the measured edges; these sweep the input space.

import random as _random


def test_format_size_random_sweep(spark, con):
    rng = _random.Random(80801)
    vals = [0, 1, -1, 1023, 1024, 1025] + [
        rng.randint(-(10 ** rng.randint(1, 15)), 10 ** rng.randint(1, 15))
        for _ in range(300)
    ]
    values = ", ".join(f"({v})" for v in vals)
    sql = (
        f"SELECT v, format_bytes(v) AS fb, formatReadableDecimalSize(v) AS fd "
        f"FROM (VALUES {values}) t(v)"
    )
    got = sorted(tuple(r) for r in spark.sql(translate(sql)).collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_parse_path_random_sweep(spark, con):
    rng = _random.Random(80802)
    atoms = ["a", "bb", "c.txt", "", ".", "..", "x-y", "d e"]
    paths = []
    for _ in range(200):
        n = rng.randint(1, 5)
        sep_first = rng.random() < 0.4
        p = ("/" if sep_first else "") + "/".join(
            rng.choice(atoms) for _ in range(n)
        )
        paths.append(p.replace("'", ""))
    values = ", ".join(f"('{p}')" for p in set(paths))
    sql = (
        f"SELECT p, array_to_string(parse_path(p), '|') AS parts, "
        f"parse_dirpath(p) AS dp, parse_dirname(p) AS dn, "
        f"parse_filename(p) AS fn, parse_filename(p, true) AS fnt "
        f"FROM (VALUES {values}) t(p)"
    )
    got = sorted(tuple(r) for r in spark.sql(translate(sql)).collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_regexp_escape_random_sweep(spark, con):
    rng = _random.Random(80803)
    chars = "ab1_ .,;:!?*+()[]{}|^$-/\\<>=~@#&\t"
    strs = {
        "".join(rng.choice(chars) for _ in range(rng.randint(0, 12)))
        for _ in range(250)
    }
    values = ", ".join(
        "('" + s.replace("\\", "\\\\").replace("'", "''") + "')" for s in strs
    )
    # DuckDB needs E'' strings for backslash escapes; build via chr() instead
    values = ", ".join(f"({_sql_str(s)})" for s in strs)
    sql = f"SELECT s, regexp_escape(s) AS e FROM (VALUES {values}) t(s)"
    got = sorted(tuple(r) for r in spark.sql(translate(sql)).collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def _sql_str(s: str) -> str:
    """Portable string literal: concat of chr() calls (no escape dialects)."""
    if not s:
        return "''"
    return "(" + " || ".join(f"chr({ord(c)})" for c in s) + ")"


# ---- r08 JSON batch ----------------------------------------------------------

_J = ("'" + '{"a": 1, "s": "x", "n": null, "f": 1.5, "neg": -2, '
      '"b": [10, 20], "o": {"d": "x"}, "k.x": 7}' + "'")

JSON_CASES = [
    f"{_J} -> 'a'",          # JSON-typed extraction (quotes kept on strings)
    f"{_J} -> 's'",
    f"{_J} ->> 'a'",         # text extraction
    f"{_J} ->> 's'",
    f"{_J} -> 'o' ->> 'd'",  # chains
    f"{_J} -> 'b' ->> 1",    # integer index (0-based)
    f"{_J} -> 'b' -> 0",
    f"{_J} -> 'n'",          # json null -> SQL NULL (measured)
    f"{_J} ->> 'n'",
    f"{_J} -> 'missing'",
    f"{_J} -> 'k.x'",        # dotted key (bracket path form)
    f"{_J} -> '$.b[1]'",     # explicit path RHS
    f"{_J}::JSON ->> 'a'",   # cast suffix on the operand
    f"json_extract({_J}, '$.b[1]')",
    f"json_extract({_J}, 'o')",
    f"json_array_length({_J} -> 'b')",
    f"json_type({_J})",
    f"json_type({_J}, '$.b')",
    f"json_type({_J}, '$.f')",      # DOUBLE
    f"json_type({_J}, '$.a')",      # UBIGINT (non-negative int)
    f"json_type({_J}, '$.neg')",    # BIGINT (negative)
    f"json_type({_J}, '$.n')",      # 'NULL'
    f"json_type({_J}, '$.missing')",  # SQL NULL
    f"json_type({_J}, '$.s')",      # VARCHAR
    "json_quote('abc')",
    "json_quote(1.5)",
    "json_array('s', NULL)",
    "json_array(1, 2)",
    "json_object('k', 'txt', 'm', 2)",
    # the lambda arrow must be untouched (constant int body included)
    "list_transform([1, 2], x -> x + 1)",
    "list_transform([1, 2], x -> 1)",
    "list_filter(['a','b'], x -> x = 'a')",
]


@pytest.mark.parametrize("expr", JSON_CASES)
def test_r08_json_matches_duckdb(spark, con, expr):
    sql = f"SELECT {expr} AS v"
    want = con.execute(sql).fetchone()[0]
    got = spark.sql(translate(sql)).collect()[0][0]
    assert got == want, f"{expr}: spark={got!r} duck={want!r}"


def test_r08_json_merge_patch_arity_raise():
    # r09: json_structure/json_contains/json_merge_patch now resolve to
    # the Arrow UDFs in functions/json_udfs.py (tests/test_idioms_r09b.py);
    # only the <2-arg merge form still raises (DuckDB errors on it too)
    with pytest.raises(UnsupportedDialect):
        translate("SELECT json_merge_patch('{}') AS v")


# ---- r08 list/struct/map batch -----------------------------------------------

LIST_STRUCT_CASES = [
    "map_extract(map(['a'],[1]), 'a')",   # DuckDB map extraction: LIST result
    "map_extract(map(['a'],[1]), 'x')",   # miss -> []
    "struct_extract({'a': 5}, 'a')",
    "list_resize([1,2], 4)",              # pad with typed NULLs
    "list_resize([1,2], 4, 0)",           # explicit fill
    "list_resize([1,2,3], 2)",            # truncate
    "list_resize(CAST([] AS INT[]), 2)",
    "array_unique([1,1,2])",
    "list_indexof([5,6],6)",
    "array_has([1,2],2)",
    "CAST(list_sum([1,2,3]) AS DOUBLE)",  # documented DOUBLE ride
    "list_avg([1.0,2.0])",
    "list_min([3,1])",
    "list_max([3,1])",
    "list_pack(1,2)",
    "CAST([1] AS INT[])",                 # array-type cast syntax
    "CAST(['a'] AS VARCHAR[])",
    "[1]::INT[]",
]


@pytest.mark.parametrize("expr", LIST_STRUCT_CASES)
def test_r08_list_struct_map_matches_duckdb(spark, con, expr):
    sql = f"SELECT {expr} AS v"
    want = con.execute(sql).fetchone()[0]
    got = spark.sql(translate(sql)).collect()[0][0]
    assert got == want or str(got) == str(want), (
        f"{expr}: spark={got!r} duck={want!r}"
    )


def test_list_intersect_set_equal(spark, con):
    # DuckDB's result ORDER is hash-dependent; compare as sets
    sql = "SELECT list_intersect([1,2,3],[2,3,4]) AS v"
    got = set(spark.sql(translate(sql)).collect()[0][0])
    want = set(con.execute(sql).fetchone()[0])
    assert got == want


# ---- r08 date/time batch -----------------------------------------------------

DATETIME_CASES = [
    # timezone('tz', naive): interpret in tz -> session-zone instant
    "timezone('America/New_York', TIMESTAMP '2024-06-01 12:00:00')",
    "timezone(TIMESTAMP '2024-06-01 12:00:00')",   # session offset: UTC 0
    "isoyear(DATE '2021-01-01')",                  # ISO year boundary
    "isoyear(DATE '2024-12-30')",
    "weekday(DATE '2024-08-11')",                  # 0 = Sunday (DuckDB)
    "weekday(DATE '2024-08-12')",
    "strftime(TIMESTAMP '2024-02-03 04:05:06.123456', '%H|%I|%M|%S|%p')",
    "strftime(TIMESTAMP '2024-02-03 16:05:06', '%I %p')",
    "try_strptime('bogus', '%Y')",
    "try_strptime('2024', '%Y')",
    # DuckDB returns DATE for day-or-coarser parts regardless of input
    "date_trunc('quarter', DATE '2024-05-06')",
    "date_trunc('week', TIMESTAMP '2024-08-14 10:00:00')",
    "date_trunc('hour', TIMESTAMP '2024-08-14 10:20:00')",
    # floor-division extra parts
    "date_trunc('decade', DATE '2024-05-06')",
    "date_trunc('century', DATE '2024-05-06')",
    "date_trunc('millennium', DATE '2024-05-06')",
    "datetrunc('week', DATE '2024-08-14')",
    # bidirectional epoch_ms
    "epoch_ms(1700000000000)",
    "epoch_ms(TIMESTAMP '2024-01-01 00:00:00.123')",
    "make_time(10, 30, 12.5)",
    "make_time(1, 2, 3.0)",
    "today() = current_date",
    "get_current_timestamp() IS NOT NULL",
    "millennium(DATE '2024-05-06')",
    "millennium(DATE '1999-05-06')",
]


@pytest.mark.parametrize("expr", DATETIME_CASES)
def test_r08_datetime_matches_duckdb(spark, con, expr):
    sql = f"SELECT {expr} AS v"
    want = con.execute(sql).fetchone()[0]
    got = spark.sql(translate(sql)).collect()[0][0]
    if isinstance(want, datetime.datetime) and isinstance(got, datetime.datetime):
        want = want.replace(tzinfo=None)
        got = got.replace(tzinfo=None)
    if isinstance(want, datetime.time):
        want = want.strftime("%H:%M:%S") + (
            f".{want.microsecond:06d}" if want.microsecond else ""
        )
    assert got == want or str(got) == str(want), (
        f"{expr}: spark={got!r} duck={want!r}"
    )


# ---- r08 string batch 2 ------------------------------------------------------

STRING2_CASES = [
    # UBIGINT md5 halves, little-endian byte order (measured)
    "md5_number_lower('x')",
    "md5_number_upper('x')",
    "md5_number_lower('hello world')",
    "md5_number_upper('')",
    # grapheme variants map to codepoint forms (divergence only on
    # multi-codepoint clusters — combining marks / emoji)
    "substring_grapheme('héllo', 2, 3)",
    "left_grapheme('héllo', 2)",
    "right_grapheme('héllo', 2)",
    "array_slice([1,2,3,4], 2, 3)",
    # fmt-style numeric specs
    "format('{:.2f}', 3.14159)",
    "format('{} = {:.1f} ({:d})', 'v', 2.718, 42)",
]


@pytest.mark.parametrize("expr", STRING2_CASES)
def test_r08_string2_matches_duckdb(spark, con, expr):
    sql = f"SELECT {expr} AS v"
    want = con.execute(sql).fetchone()[0]
    got = spark.sql(translate(sql)).collect()[0][0]
    assert got == want or str(got) == str(want), (
        f"{expr}: spark={got!r} duck={want!r}"
    )


def test_nfc_translates_to_passthrough():
    # nfc_normalize gained a pandas-UDF implementation in the r08 batch-4
    # sweep (test_idioms_r08c) — the dialect passes the name through
    assert "nfc_normalize" in translate("SELECT nfc_normalize('a') AS v")
