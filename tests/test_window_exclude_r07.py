"""Round-7: min/max window-frame EXCLUDE GROUP/TIES/CURRENT ROW under
RANGE and default frames (VERDICT r06 task 4) — differential vs DuckDB on
a fixture with NULLs, duplicate order keys, and duplicate values (the
degenerate cases of the sorted-array peer-minus-self trick)."""

from __future__ import annotations

import duckdb
import pytest

from duckdb_service_spark.service.dialect import UnsupportedDialect, translate

ROWS = [
    (1, 10, 5), (1, 10, 3), (1, 20, None), (1, 20, 7), (1, 30, 7),
    (2, 10, 1), (2, 10, 1), (2, 15, 2), (3, 5, None), (3, 5, None),
]

RB = "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"

SPECS = [
    f"min(x) OVER (PARTITION BY g ORDER BY k {RB} EXCLUDE GROUP)",
    f"max(x) OVER (PARTITION BY g ORDER BY k {RB} EXCLUDE GROUP)",
    f"min(x) OVER (PARTITION BY g ORDER BY k {RB} EXCLUDE TIES)",
    f"max(x) OVER (PARTITION BY g ORDER BY k {RB} EXCLUDE TIES)",
    f"min(x) OVER (PARTITION BY g ORDER BY k {RB} EXCLUDE CURRENT ROW)",
    f"max(x) OVER (PARTITION BY g ORDER BY k {RB} EXCLUDE CURRENT ROW)",
    "min(x) OVER (PARTITION BY g ORDER BY k "
    "RANGE BETWEEN 10 PRECEDING AND CURRENT ROW EXCLUDE GROUP)",
    "max(x) OVER (PARTITION BY g ORDER BY k "
    "RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING EXCLUDE TIES)",
    "min(x) OVER (PARTITION BY g ORDER BY k "
    "RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING EXCLUDE CURRENT ROW)",
    f"min(x) OVER (ORDER BY k {RB} EXCLUDE GROUP)",
    f"max(x) OVER (ORDER BY k {RB} EXCLUDE TIES)",
]


@pytest.fixture(scope="module")
def fixtures(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g INT, k INT, x INT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", ROWS)
    spark.createDataFrame(ROWS, "g int, k int, x int").createOrReplaceTempView("t")
    return con


@pytest.mark.parametrize("spec", SPECS)
def test_minmax_exclude_matches_duckdb(spark, fixtures, spec):
    q = f"SELECT g, k, x, {spec} AS v FROM t ORDER BY g, k, x NULLS LAST"
    want = fixtures.execute(q).fetchall()
    got = [tuple(r) for r in spark.sql(translate(q)).collect()]
    assert got == want


def test_minmax_exclude_rows_group_still_raises():
    with pytest.raises(UnsupportedDialect):
        translate(
            "SELECT min(x) OVER (ORDER BY k ROWS BETWEEN 2 PRECEDING AND "
            "2 FOLLOWING EXCLUDE GROUP) FROM t"
        )
