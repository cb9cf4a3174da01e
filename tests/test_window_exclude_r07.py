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

# ROWS-frame specs (round 7 late): the unified row-space segment model —
# [fstart, gs-1] / {cur} / [ge+1, fend], unclamped to the frame — including
# the frames that do NOT contain the current row, where DuckDB's segments
# EXTEND the frame toward the current row/peer group. rid breaks ties so
# both engines see the same row order.
ROWS_SPECS = [
    "min(x) OVER (PARTITION BY g ORDER BY k, rid ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP)",
    "max(x) OVER (PARTITION BY g ORDER BY k, rid ROWS BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE TIES)",
    "count(x) OVER (PARTITION BY g ORDER BY k, rid ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP)",
    "count(*) OVER (PARTITION BY g ORDER BY k, rid ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES)",
    "CAST(sum(x) OVER (PARTITION BY g ORDER BY k, rid ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS DOUBLE)",
    "avg(x) OVER (PARTITION BY g ORDER BY k, rid ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES)",
    "min(x) OVER (PARTITION BY g ORDER BY k, rid ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING EXCLUDE TIES)",
    "min(x) OVER (PARTITION BY g ORDER BY k, rid ROWS BETWEEN 3 PRECEDING AND 2 PRECEDING EXCLUDE CURRENT ROW)",
    "max(x) OVER (PARTITION BY g ORDER BY k, rid ROWS BETWEEN 2 FOLLOWING AND 4 FOLLOWING EXCLUDE CURRENT ROW)",
    "CAST(sum(x) OVER (PARTITION BY g ORDER BY k, rid ROWS BETWEEN 3 PRECEDING AND 2 PRECEDING EXCLUDE GROUP) AS DOUBLE)",
    "CAST(sum(x) OVER (PARTITION BY g ORDER BY k, rid ROWS BETWEEN 3 PRECEDING AND 2 PRECEDING EXCLUDE TIES) AS DOUBLE)",
    "count(x) OVER (PARTITION BY g ORDER BY k, rid ROWS BETWEEN 2 FOLLOWING AND 4 FOLLOWING EXCLUDE TIES)",
    "min(x) OVER (PARTITION BY g ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING EXCLUDE TIES)",
    "CAST(sum(x) OVER (PARTITION BY g ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND 5 PRECEDING EXCLUDE GROUP) AS DOUBLE)",
]

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


@pytest.fixture(scope="module")
def fixtures_rid(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE tr (g INT, k INT, x INT, rid INT)")
    rid_rows = [(g, k, x, i + 1) for i, (g, k, x) in enumerate(ROWS)]
    con.executemany("INSERT INTO tr VALUES (?,?,?,?)", rid_rows)
    spark.createDataFrame(
        rid_rows, "g int, k int, x int, rid int"
    ).createOrReplaceTempView("tr")
    return con


@pytest.mark.parametrize("spec", ROWS_SPECS)
def test_rows_frame_exclude_matches_duckdb(spark, fixtures_rid, spec):
    q = f"SELECT rid, {spec} AS v FROM tr ORDER BY rid"
    want = fixtures_rid.execute(q).fetchall()
    got = [tuple(r) for r in spark.sql(translate(q)).collect()]
    assert got == want


# ---- r08: value-bounded RANGE EXCLUDE CURRENT ROW, deterministic subset ----
#
# With UNIQUE order keys the current row is its own peer group, so
# EXCLUDE CURRENT ROW == EXCLUDE GROUP over the frame extended toward the
# current row (probed in DuckDB on unique fractional keys, both frame
# directions). The translation emits that form under a runtime peer-count
# guard: unique-key data flows, tied data raises loudly (the tied result
# is row-position-dependent in DuckDB itself — measured).

RANGE_ECR_SPECS = [
    "sum(x) OVER (ORDER BY u RANGE BETWEEN 5 PRECEDING AND 1 PRECEDING EXCLUDE CURRENT ROW)",
    "count(x) OVER (ORDER BY u RANGE BETWEEN 1 FOLLOWING AND 5 FOLLOWING EXCLUDE CURRENT ROW)",
    "avg(x) OVER (ORDER BY u RANGE BETWEEN 5 PRECEDING AND 1 PRECEDING EXCLUDE CURRENT ROW)",
    "min(x) OVER (ORDER BY u RANGE BETWEEN 1 FOLLOWING AND 5 FOLLOWING EXCLUDE CURRENT ROW)",
    "max(x) OVER (PARTITION BY g ORDER BY u RANGE BETWEEN 5 PRECEDING AND 1 PRECEDING EXCLUDE CURRENT ROW)",
]


@pytest.fixture(scope="module")
def fixtures_unique(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE tu (g INT, u INT, x INT)")
    # u is GLOBALLY unique: the non-partitioned specs' peer groups span the
    # whole table, so per-partition uniqueness would still trip the tie guard
    # (and genuinely be tie-order-dependent in DuckDB)
    uniq = [(g, i * 3 + (g + k) % 3, x) for i, (g, k, x) in enumerate(ROWS)]
    con.executemany("INSERT INTO tu VALUES (?,?,?)", uniq)
    spark.createDataFrame(uniq, "g int, u int, x int").createOrReplaceTempView("tu")
    return con


@pytest.mark.parametrize("spec", RANGE_ECR_SPECS)
def test_range_ecr_unique_keys_matches_duckdb(spark, fixtures_unique, spec):
    q = f"SELECT g, u, {spec} AS v FROM tu ORDER BY g, u"
    want = [
        tuple(float(c) if isinstance(c, (int, float)) and c is not None else c for c in r)
        for r in fixtures_unique.execute(q).fetchall()
    ]
    got = [
        tuple(float(c) if isinstance(c, (int, float)) and c is not None else c for c in r)
        for r in spark.sql(translate(q)).collect()
    ]
    assert got == want


def test_range_ecr_tied_keys_raises_at_runtime(spark):
    """Tied ORDER BY keys under the value-bounded RANGE ECR form must fail
    loudly (runtime guard), never silently diverge."""
    q = (
        "SELECT sum(x) OVER (ORDER BY k RANGE BETWEEN 5 PRECEDING AND "
        "1 PRECEDING EXCLUDE CURRENT ROW) AS v FROM "
        "(VALUES (1, 10), (1, 20), (4, 30)) t(k, x)"
    )
    with pytest.raises(Exception, match="tie-order-dependent"):
        spark.sql(translate(q)).collect()
