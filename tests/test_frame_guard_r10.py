"""Round-10 frame-size guard (VERDICT r09 task 4): the O(frame)
collect-based window rewrites — window DISTINCT aggregates, list/array_agg
window forms, RANGE-EXCLUDE min-max/sum/avg — carry a runtime per-frame
element bound (dialect.WINDOW_FRAME_ELEMENT_BOUND, default 1e6, settable
via ``SET window_frame_element_bound``). Within the bound results are
unchanged (differential vs DuckDB); past it the query fails LOUDLY at
runtime instead of OOMing an executor at 100 TB."""

from __future__ import annotations

import duckdb
import pytest

from duckdb_service_spark.service import dialect
from duckdb_service_spark.service.dialect import translate

GUARDED = [
    # window DISTINCT aggregate
    "SELECT g, count(DISTINCT x) OVER (PARTITION BY g) AS c "
    "FROM (VALUES (1, 10), (1, 10), (1, 20), (2, 30)) t(g, x)",
    # list_agg window form
    "SELECT g, list(x) OVER (PARTITION BY g ORDER BY x "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l "
    "FROM (VALUES (1, 10), (1, 20), (1, 25), (1, 28), (2, 30)) t(g, x)",
    # RANGE frame EXCLUDE GROUP min (collect-based segment rewrite)
    "SELECT x, min(x) OVER (ORDER BY x RANGE BETWEEN 5 PRECEDING AND "
    "5 FOLLOWING EXCLUDE GROUP) AS m "
    "FROM (VALUES (1), (2), (3), (8)) t(x)",
]


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _run(spark, sql):
    return sorted(
        (tuple(tuple(v) if isinstance(v, list) else v for v in r))
        for r in spark.sql(translate(sql)).collect()
    )


@pytest.mark.parametrize("sql", GUARDED)
def test_within_bound_results_unchanged(spark, con, sql):
    got = _run(spark, sql)
    want = sorted(
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in con.execute(sql).fetchall()
    )
    assert got == want, f"{sql!r}: spark={got} duckdb={want}"


@pytest.mark.parametrize("sql", GUARDED)
def test_past_bound_raises_loudly(spark, sql, monkeypatch):
    monkeypatch.setattr(dialect, "WINDOW_FRAME_ELEMENT_BOUND", 2)
    with pytest.raises(Exception, match="window_frame_element_bound"):
        spark.sql(translate(sql)).collect()


def test_bound_disabled_with_nonpositive(spark, monkeypatch):
    monkeypatch.setattr(dialect, "WINDOW_FRAME_ELEMENT_BOUND", 0)
    sql = GUARDED[0]
    assert "window_frame_element_bound" not in translate(sql)
    assert len(spark.sql(translate(sql)).collect()) == 4


def test_set_pragma_updates_bound(spark, tmp_path, monkeypatch):
    from duckdb_service_spark.service.executor import Engine

    monkeypatch.setattr(dialect, "WINDOW_FRAME_ELEMENT_BOUND", 1_000_000)
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.execute("SET window_frame_element_bound = 3")
    assert dialect.WINDOW_FRAME_ELEMENT_BOUND == 3
    eng.execute("CREATE TABLE fg (g INTEGER, x INTEGER)")
    eng.execute("INSERT INTO fg VALUES (1,1),(1,2),(1,3),(1,4)")
    with pytest.raises(Exception, match="window_frame_element_bound"):
        eng.query_df(
            "SELECT count(DISTINCT x) OVER (PARTITION BY g) AS c FROM fg"
        ).collect()
    eng.execute("SET window_frame_element_bound = 1000000")
    rows = eng.query_df(
        "SELECT count(DISTINCT x) OVER (PARTITION BY g) AS c FROM fg"
    ).collect()
    assert [r.c for r in rows] == [4, 4, 4, 4]
