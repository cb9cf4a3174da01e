"""Round-3 SQL-surface coverage: CREATE MACRO (scalar + table, defaults,
named args, nesting, persistence), PREPARE / EXECUTE / DEALLOCATE, and
ATTACH / DETACH — the remaining passthrough-reachable statements from
VERDICT r02 "What's missing" #6 (reference reach: db/db.go:52,70)."""

from __future__ import annotations

import tempfile

import pytest


@pytest.fixture(scope="module")
def engine(spark):
    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="warehouse_macro_"))
    eng.execute("CREATE TABLE mt (id INTEGER, v DOUBLE, name TEXT)")
    eng.execute(
        "INSERT INTO mt VALUES (1, 10.0, 'a'), (2, 20.0, 'b'), (3, 30.0, 'c')"
    )
    return eng


# ---- scalar macros --------------------------------------------------------


def test_scalar_macro_basic(engine):
    engine.execute("CREATE MACRO add2(a, b) AS a + b")
    rows = engine.query_df("SELECT add2(1, 2) AS s").collect()
    assert rows[0].s == 3


def test_macro_over_table_and_where(engine):
    engine.execute("CREATE MACRO bump(x) AS x * 2 + 1")
    rows = engine.query_df(
        "SELECT id, bump(v) AS b FROM mt WHERE bump(id) > 3 ORDER BY id"
    ).collect()
    assert [(r.id, r.b) for r in rows] == [(2, 41.0), (3, 61.0)]


def test_macro_default_and_named_args(engine):
    engine.execute("CREATE MACRO scaled(x, f := 10) AS x * f")
    assert engine.query_df("SELECT scaled(5) AS s").collect()[0].s == 50
    assert engine.query_df("SELECT scaled(5, 2) AS s").collect()[0].s == 10
    assert engine.query_df("SELECT scaled(5, f := 3) AS s").collect()[0].s == 15


def test_macro_param_shadow_is_parenthesized(engine):
    # argument is an expression: substitution must parenthesize (1+2)*3 = 9,
    # not 1+2*3 = 7
    engine.execute("CREATE MACRO triple(x) AS x * 3")
    assert engine.query_df("SELECT triple(1 + 2) AS s").collect()[0].s == 9


def test_macro_string_literal_untouched(engine):
    engine.execute("CREATE MACRO lab(x) AS concat('x=', CAST(x AS STRING))")
    # the 'x=' inside the literal must NOT be substituted
    assert engine.query_df("SELECT lab(7) AS s").collect()[0].s == "x=7"


def test_nested_macros(engine):
    engine.execute("CREATE MACRO inner1(x) AS x + 1")
    engine.execute("CREATE MACRO outer1(x) AS inner1(x) * 10")
    assert engine.query_df("SELECT outer1(2) AS s").collect()[0].s == 30


def test_macro_in_dml(engine):
    engine.execute("CREATE TABLE mdml (id INTEGER, d DOUBLE)")
    engine.execute("CREATE MACRO half(x) AS x / 2")
    engine.execute("INSERT INTO mdml SELECT id, half(v) FROM mt")
    rows = engine.query_df("SELECT d FROM mdml ORDER BY id").collect()
    assert [r.d for r in rows] == [5.0, 10.0, 15.0]


def test_table_macro(engine):
    engine.execute("CREATE MACRO topv(n) AS TABLE SELECT id, v FROM mt ORDER BY v DESC LIMIT n")
    rows = engine.query_df("SELECT * FROM topv(2) ORDER BY id").collect()
    assert [r.id for r in rows] == [2, 3]


def test_macro_duplicate_and_replace(engine):
    engine.execute("CREATE MACRO dup1(x) AS x")
    with pytest.raises(Exception, match="already exists"):
        engine.execute("CREATE MACRO dup1(x) AS x + 1")
    engine.execute("CREATE OR REPLACE MACRO dup1(x) AS x + 1")
    assert engine.query_df("SELECT dup1(1) AS s").collect()[0].s == 2


def test_drop_macro(engine):
    engine.execute("CREATE MACRO gone(x) AS x")
    engine.execute("DROP MACRO gone")
    with pytest.raises(Exception):
        engine.execute("DROP MACRO gone")
    engine.execute("DROP MACRO IF EXISTS gone")


def test_macro_arity_errors(engine):
    engine.execute("CREATE MACRO two(a, b) AS a + b")
    with pytest.raises(Exception, match="missing argument"):
        engine.query_df("SELECT two(1) AS s").collect()
    with pytest.raises(Exception, match="too many"):
        engine.query_df("SELECT two(1, 2, 3) AS s").collect()


def test_macro_persistence_across_restart(engine, spark):
    from duckdb_service_spark.service.executor import Engine

    engine.execute("CREATE MACRO persisted1(x) AS x * 100")
    eng2 = Engine(spark, engine.catalog.dir)
    assert eng2.query_df("SELECT persisted1(2) AS s").collect()[0].s == 200


# ---- prepared statements --------------------------------------------------


def test_prepare_execute_dollar(engine):
    engine.execute("PREPARE byid AS SELECT id, name FROM mt WHERE id = $1")
    rows = engine.query_df("EXECUTE byid(2)").collect()
    assert [(r.id, r.name) for r in rows] == [(2, "b")]


def test_prepare_execute_question_mark(engine):
    engine.execute("PREPARE rng AS SELECT count(*) AS n FROM mt WHERE v >= ? AND v <= ?")
    assert engine.query_df("EXECUTE rng(10.0, 20.0)").collect()[0].n == 2


def test_prepare_execute_write_path(engine):
    engine.execute("CREATE TABLE pins (id INTEGER)")
    engine.execute("PREPARE ins AS INSERT INTO pins VALUES ($1)")
    assert engine.execute("EXECUTE ins(41)").rows_affected == 1
    assert engine.execute("EXECUTE ins(42)").rows_affected == 1
    rows = engine.query_df("SELECT id FROM pins ORDER BY id").collect()
    assert [r.id for r in rows] == [41, 42]


def test_prepare_param_in_literal_untouched(engine):
    engine.execute("PREPARE lit AS SELECT '$1' AS raw, $1 AS bound")
    r = engine.query_df("EXECUTE lit(9)").collect()[0]
    assert r.raw == "$1" and r.bound == 9


def test_deallocate(engine):
    engine.execute("PREPARE tmp AS SELECT 1 AS one")
    engine.execute("DEALLOCATE tmp")
    with pytest.raises(Exception, match="does not exist"):
        engine.query_df("EXECUTE tmp").collect()
    with pytest.raises(Exception, match="does not exist"):
        engine.execute("DEALLOCATE tmp")


def test_execute_arg_count_errors(engine):
    engine.execute("PREPARE two2 AS SELECT $1 + $2 AS s")
    with pytest.raises(Exception, match="out of range"):
        engine.query_df("EXECUTE two2(1)").collect()


# ---- ATTACH / DETACH ------------------------------------------------------


def test_attach_query_detach(engine, spark):
    from duckdb_service_spark.service.executor import Engine

    other_dir = tempfile.mkdtemp(prefix="warehouse_other_")
    other = Engine(spark, other_dir)
    other.execute("CREATE TABLE ext (k INTEGER, s TEXT)")
    other.execute("INSERT INTO ext VALUES (1, 'x'), (2, 'y')")
    other.execute("CREATE TABLE empty_t (a INTEGER, b TEXT)")

    engine.execute(f"ATTACH '{other_dir}' AS otherdb")
    rows = engine.query_df("SELECT k, s FROM otherdb.ext ORDER BY k").collect()
    assert [(r.k, r.s) for r in rows] == [(1, "x"), (2, "y")]
    # empty table attaches with its declared schema
    assert engine.query_df("SELECT * FROM otherdb.empty_t").collect() == []
    # join across the attached boundary
    n = engine.query_df(
        "SELECT count(*) AS n FROM mt JOIN otherdb.ext ON mt.id = otherdb.ext.k"
    ).collect()[0].n
    assert n == 2

    with pytest.raises(Exception, match="already attached"):
        engine.execute(f"ATTACH '{other_dir}' AS otherdb")

    engine.execute("DETACH otherdb")
    with pytest.raises(Exception):
        engine.query_df("SELECT * FROM otherdb.ext").collect()
    with pytest.raises(Exception, match="not attached"):
        engine.execute("DETACH otherdb")


def test_attach_default_alias(engine, spark):
    from duckdb_service_spark.service.executor import Engine

    d = tempfile.mkdtemp(prefix="aliasdb_")
    Engine(spark, d).execute("CREATE TABLE t1 (x INTEGER)")
    engine.execute(f"ATTACH '{d}'")
    alias = d.strip("/").split("/")[-1].lower()
    assert engine.query_df(f"SELECT * FROM {alias}.t1").collect() == []
    engine.execute(f"DETACH {alias}")


# ---- r08: current_setting() ------------------------------------------------

def test_current_setting_defaults_and_pragma_readback(engine):
    # threads mirrors spark.sql.shuffle.partitions (another test in this
    # module may have SET it — compare against the live conf, not a constant)
    want_threads = int(engine.spark.conf.get("spark.sql.shuffle.partitions"))
    assert engine.query_df(
        "SELECT current_setting('threads') AS t"
    ).collect()[0][0] == want_threads
    assert engine.query_df(
        "SELECT current_setting('TimeZone') AS tz"
    ).collect()[0][0] == "UTC"
    engine.execute("SET memory_limit = '4GB'")
    assert engine.query_df(
        "SELECT current_setting('memory_limit') AS m"
    ).collect()[0][0] == "4GB"


def test_current_setting_unknown_key_raises(engine):
    with pytest.raises(ValueError, match="current_setting"):
        engine.query_df("SELECT current_setting('no_such_setting')")
