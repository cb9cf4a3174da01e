"""PIVOT/UNPIVOT statements + FROM-first syntax at the SQL surface
(VERDICT r03 missing #2 and #6; reference reach: passthrough db/db.go:70).

Statement semantics verified against DuckDB 1.x: count() fills 0 for missing
combos (sum fills NULL), discovered pivot values sort ascending, UNPIVOT
drops NULL cells.
"""

from __future__ import annotations

import tempfile

import pytest


@pytest.fixture(scope="module")
def engine(spark):
    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="warehouse_pivot_"))
    eng.execute("CREATE TABLE pv (pri TEXT, status TEXT, price DOUBLE)")
    eng.execute(
        "INSERT INTO pv VALUES ('1-URGENT','F',10), ('1-URGENT','O',20), "
        "('2-HIGH','F',5), ('3-LOW','P',7)"
    )
    return eng


def _rows(df):
    return [tuple(r) for r in df.orderBy(df.columns[0]).collect()]


def test_pivot_count_dynamic_discovery(engine):
    kind, df = engine.run_statement("PIVOT pv ON status USING count(*) GROUP BY pri")
    assert kind == "query"
    assert df.columns == ["pri", "F", "O", "P"]  # discovered values, sorted
    assert _rows(df) == [
        ("1-URGENT", 1, 1, 0),  # count fills 0, like DuckDB
        ("2-HIGH", 1, 0, 0),
        ("3-LOW", 0, 0, 1),
    ]


def test_pivot_sum_null_fill(engine):
    _, df = engine.run_statement("PIVOT pv ON status USING sum(price) GROUP BY pri")
    assert _rows(df) == [
        ("1-URGENT", 10.0, 20.0, None),  # sum over empty set = NULL
        ("2-HIGH", 5.0, None, None),
        ("3-LOW", None, None, 7.0),
    ]


def test_pivot_in_list_and_multi_agg(engine):
    _, df = engine.run_statement(
        "PIVOT pv ON status IN ('F', 'O') USING sum(price) AS s, count(*) AS n "
        "GROUP BY pri"
    )
    assert df.columns == ["pri", "F_s", "F_n", "O_s", "O_n"]
    assert _rows(df)[0] == ("1-URGENT", 10.0, 1, 20.0, 1)


def test_pivot_implicit_group_by(engine):
    # no GROUP BY: groups on every column not pivoted or aggregated
    _, df = engine.run_statement("PIVOT pv ON status USING sum(price)")
    assert df.columns == ["pri", "F", "O", "P"]


def test_pivot_no_using_defaults_to_count(engine):
    _, df = engine.run_statement("PIVOT pv ON status GROUP BY pri")
    assert _rows(df)[0] == ("1-URGENT", 1, 1, 0)


def test_pivot_subquery_and_order_by(engine):
    _, df = engine.run_statement(
        "PIVOT (SELECT pri, status FROM pv WHERE price > 6) ON status "
        "USING count(*) GROUP BY pri ORDER BY pri LIMIT 2"
    )
    assert [r[0] for r in df.collect()] == ["1-URGENT", "3-LOW"]


def test_unpivot_statement_drops_nulls(engine):
    engine.execute("CREATE TABLE up (id INTEGER, a INTEGER, b INTEGER)")
    engine.execute("INSERT INTO up VALUES (1, 10, NULL), (2, NULL, 20)")
    _, df = engine.run_statement("UNPIVOT up ON a, b INTO NAME k VALUE v")
    assert {(r.id, r.k, r.v) for r in df.collect()} == {(1, "a", 10), (2, "b", 20)}


def test_from_first_bare(engine):
    _, df = engine.run_statement("FROM pv")
    assert df.count() == 4


def test_from_first_where_no_select(engine):
    _, df = engine.run_statement("FROM pv WHERE price > 6")
    assert df.count() == 3


def test_from_first_select_and_clauses(engine):
    _, df = engine.run_statement(
        "FROM pv SELECT pri, count(*) AS n GROUP BY pri ORDER BY pri"
    )
    assert [tuple(r) for r in df.collect()] == [
        ("1-URGENT", 2), ("2-HIGH", 1), ("3-LOW", 1)
    ]


def test_from_first_keyword_inside_literal_untouched(engine):
    _, df = engine.run_statement("FROM pv SELECT 'SELECT WHERE' AS s LIMIT 1")
    assert df.collect()[0].s == "SELECT WHERE"


# ---- COLUMNS() expressions ------------------------------------------------


def test_columns_regex_projection(engine):
    engine.execute("CREATE TABLE cx (ab INTEGER, ac INTEGER, bd TEXT, xab INTEGER)")
    engine.execute("INSERT INTO cx VALUES (1, 2, 'x', 9), (3, 4, 'y', 8)")
    _, df = engine.run_statement("SELECT COLUMNS('a.*') FROM cx")
    # search semantics: 'a.*' also matches xab (verified against DuckDB)
    assert df.columns == ["ab", "ac", "xab"]


def test_columns_star_in_aggregate(engine):
    _, df = engine.run_statement("SELECT min(COLUMNS(*)) FROM cx")
    assert df.columns == ["ab", "ac", "bd", "xab"]
    assert tuple(df.collect()[0]) == (1, 2, "x", 8)


def test_columns_exclude(engine):
    _, df = engine.run_statement("SELECT max(COLUMNS(* EXCLUDE (bd))) FROM cx")
    assert df.columns == ["ab", "ac", "xab"]


def test_columns_alias_backref(engine):
    _, df = engine.run_statement('SELECT min(COLUMNS(\'^a\')) AS "m_\\0" FROM cx')
    assert df.columns == ["m_ab", "m_ac"]


def test_groups_frame_declared_divergence(engine):
    from duckdb_service_spark.service.dialect import UnsupportedDialect, translate

    with pytest.raises(UnsupportedDialect, match="GROUPS frame mode"):
        translate(
            "SELECT sum(x) OVER (ORDER BY y GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t"
        )
    # frame EXCLUDE is SUPPORTED since round 5 (window-algebra rewrite)
    out = translate(
        "SELECT sum(x) OVER (ORDER BY y ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING "
        "EXCLUDE CURRENT ROW) FROM t"
    )
    assert "EXCLUDE" not in out.upper() and "CASE WHEN" in out
    # select-list * EXCLUDE (cols) must NOT trip the frame machinery
    assert "EXCEPT" in translate("SELECT * EXCLUDE (a, b) FROM t")


def test_columns_with_group_by(engine):
    _, df = engine.run_statement(
        "SELECT bd, sum(COLUMNS('^a')) FROM cx GROUP BY bd ORDER BY bd"
    )
    assert df.columns == ["bd", "ab", "ac"]
    assert [tuple(r) for r in df.collect()] == [("x", 1, 2), ("y", 3, 4)]


def test_explain_routed_statements(engine):
    """EXPLAIN over routed constructs shows the actually-executed plan."""
    kind, df = engine.run_statement("EXPLAIN PIVOT pv ON status USING count(*) GROUP BY pri")
    assert kind == "query"
    plan = "\n".join(r[0] for r in df.collect())
    assert "HashAggregate" in plan or "Aggregate" in plan
    kind, df = engine.run_statement("EXPLAIN FROM pv SELECT pri WHERE price > 6")
    assert "Scan" in "\n".join(r[0] for r in df.collect())


def test_pivot_multi_column_multi_agg(engine):
    # DuckDB semantics (verified on 1.x): ON a, b emits the CROSS PRODUCT
    # of per-column value lists — including combinations absent from the
    # data — named value1_value2_alias; with every column pivoted or
    # consumed by an aggregate, the result is one global row
    kind, df = engine.run_statement(
        "PIVOT pv ON pri IN ('1-URGENT', '2-HIGH'), status "
        "USING count(*) AS n, max(price) AS mx"
    )
    assert kind == "query"
    assert df.columns == [
        "1-URGENT_F_n", "1-URGENT_F_mx", "1-URGENT_O_n", "1-URGENT_O_mx",
        "1-URGENT_P_n", "1-URGENT_P_mx", "2-HIGH_F_n", "2-HIGH_F_mx",
        "2-HIGH_O_n", "2-HIGH_O_mx", "2-HIGH_P_n", "2-HIGH_P_mx",
    ]
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["1-URGENT_F_n"], r["1-URGENT_F_mx"]) == (1, 10.0)
    assert (r["2-HIGH_P_n"], r["2-HIGH_P_mx"]) == (0, None)  # absent combo


def test_pivot_multi_column_group_by(engine):
    kind, df = engine.run_statement(
        "PIVOT pv ON pri, status USING count(*) AS n GROUP BY price"
    )
    got = {
        tuple(r)
        for r in df.select("price", "`2-HIGH_F_n`", "`2-HIGH_O_n`").collect()
    }
    assert (5.0, 1, 0) in got  # present combo counts 1, absent combo 0
