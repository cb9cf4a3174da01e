"""SQL-surface routed constructs as driver-checked queries.

The reference passes ASOF JOIN / WITH RECURSIVE strings straight to DuckDB
(db/db.go:70); this engine routes them to DataFrame operators via
service.sql_routing. These queries exercise that ROUTING — the SQL string
goes in, the operator plan comes out — and DuckDB runs the same statements
natively as the oracle, so parity covers parsing + semantics end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..service.dialect import translate
from ..service.sql_routing import route_asof_join, route_with_recursive
from ..sources import load_tables
from .registry import query

_ASOF_SQL = (
    "SELECT c.user_id, c.ts, c.event_id, v.ts AS matched_ts, v.value AS view_value "
    "FROM asof_clicks c ASOF JOIN asof_views v "
    "ON c.user_id = v.user_id AND c.ts >= v.ts"
)


@query(
    "sql_asof_routing",
    oracle="""
    SELECT c.user_id, c.ts, c.event_id, v.ts AS matched_ts, v.value AS view_value
    FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
    ASOF JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def sql_asof_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF JOIN accepted as a SQL string and routed to operators.asof —
    including v.ts resolving to the MATCHED right timestamp."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    ).createOrReplaceTempView("asof_clicks")
    ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    ).createOrReplaceTempView("asof_views")
    return route_asof_join(spark, _ASOF_SQL, spark.table, translate)


_REC_SQL = """
    WITH RECURSIVE f(n, a, b) AS (
      SELECT 1, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
      UNION ALL
      SELECT n + 1, b, a + b FROM f WHERE n < 40
    )
    SELECT n, a AS fib FROM f
"""


@query("sql_recursive_routing", oracle=_REC_SQL)
def sql_recursive_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE accepted as a SQL string and routed to the fixpoint
    operator (operators.recursive) — Fibonacci linear recursion, the same
    statement DuckDB executes natively as the oracle."""
    load_tables(spark, sf_dir)
    return route_with_recursive(spark, _REC_SQL, translate)
