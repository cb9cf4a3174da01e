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


# --------------------------------------------------------------------------
# read_* table functions (SURVEY §2.2a [P] rows — VERDICT r02 missing #1)
# --------------------------------------------------------------------------

def _run_routed(spark: SparkSession, sql: str) -> DataFrame:
    """Exactly what Engine.query_df does for a read_* statement: rewrite the
    table-function calls to temp views over spark.read, then run the dialect
    translation."""
    from ..service.sql_routing import rewrite_read_files

    return spark.sql(translate(rewrite_read_files(spark, sql)))


@query(
    "sql_read_parquet_routing",
    oracle="""
    SELECT p_brand, COUNT(*) AS n, CAST(SUM(p_size) AS BIGINT) AS size_sum,
           MIN(p_name) AS first_name
    FROM part GROUP BY p_brand
    """,
)
def sql_read_parquet_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT ... FROM read_parquet('file')` posted as a SQL string —
    DuckDB's commonest ad-hoc idiom (full passthrough reach, db/db.go:70).
    The routed plan is a plain parquet file-source scan: pushdown, column
    pruning, and glob-based split planning all intact at 100 TB."""
    return _run_routed(
        spark,
        "SELECT p_brand, COUNT(*) AS n, CAST(SUM(p_size) AS BIGINT) AS size_sum, "
        "MIN(p_name) AS first_name "
        f"FROM read_parquet('{sf_dir}/part.parquet') GROUP BY p_brand",
    )


@query(
    "sql_read_csv_routing",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n, MIN(n_name) AS first_nation
    FROM nation GROUP BY n_regionkey
    """,
)
def sql_read_csv_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`read_csv_auto('path', header=true)` routed to spark.read.csv with
    schema inference — lossless for int/string columns, so the result equals
    the direct query on the source table."""
    import os
    import tempfile

    t = load_tables(spark, sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"dss_io_{os.getpid()}", "nation_readfn_csv")
    t["nation"].select("n_nationkey", "n_name", "n_regionkey").write.mode(
        "overwrite"
    ).option("header", "true").csv(path)
    return _run_routed(
        spark,
        "SELECT n_regionkey, COUNT(*) AS n, MIN(n_name) AS first_nation "
        f"FROM read_csv_auto('{path}', header=true) GROUP BY n_regionkey",
    )


@query(
    "sql_read_json_routing",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer GROUP BY c_mktsegment
    """,
)
def sql_read_json_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`read_json_auto('path')` routed to spark.read.json (newline-delimited,
    DuckDB's auto-detected layout for COPY TO json output)."""
    import os
    import tempfile

    t = load_tables(spark, sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"dss_io_{os.getpid()}", "customer_readfn_json")
    t["customer"].select("c_custkey", "c_mktsegment").write.mode("overwrite").json(path)
    return _run_routed(
        spark,
        "SELECT c_mktsegment, COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum "
        f"FROM read_json_auto('{path}') GROUP BY c_mktsegment",
    )


@query(
    "sql_sample_routing",
    oracle="""
    SELECT COUNT(*) AS n, COUNT(DISTINCT o_orderkey) AS distinct_keys
    FROM (SELECT o_orderkey FROM orders USING SAMPLE 100 ROWS) s
    """,
)
def sql_sample_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`USING SAMPLE n ROWS` (SURVEY §2.2f) rewritten in place to Spark's
    TABLESAMPLE — same grammatical position, no statement surgery. The exact
    row-count contract (a 100-row sample has exactly 100 distinct orders) is
    engine-independent, so this is oracle-exact even though the sampled rows
    differ."""
    load_tables(spark, sf_dir).view("orders")
    return spark.sql(
        translate(
            "SELECT COUNT(*) AS n, COUNT(DISTINCT o_orderkey) AS distinct_keys "
            "FROM (SELECT o_orderkey FROM orders USING SAMPLE 100 ROWS) s"
        )
    )


_COMPREHENSION_SQL = """
SELECT n_nationkey,
       array_to_string([upper(w) FOR w IN string_split(n_name, ' ')
                        IF length(w) > 4], '|')                     AS big_words,
       array_to_string([n_nationkey * x FOR x IN [1, 2, 3]], ',')  AS multiples,
       {'key': n_nationkey, 'name': n_name}.name                   AS s_name
FROM nation
"""


@query("sql_list_comprehension", oracle=_COMPREHENSION_SQL)
def sql_list_comprehension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB list comprehensions (`[expr FOR x IN l IF cond]` →
    transform/filter lambdas) and struct literals (`{'k': v}` →
    named_struct) — both statement-level bracket/brace rewrites in the
    dialect shim; whole-stage-codegen expressions, no UDF. Verbatim SQL as
    oracle."""
    load_tables(spark, sf_dir).view("nation")
    return spark.sql(translate(_COMPREHENSION_SQL))


_ORDER_ALL_SQL = (
    "SELECT o_orderpriority, o_orderstatus, count(*) AS n "
    "FROM orders GROUP BY ALL ORDER BY ALL LIMIT 20"
)


@query("sql_order_by_all", oracle=_ORDER_ALL_SQL)
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB `GROUP BY ALL` + `ORDER BY ALL` sugar — both supported
    natively by Spark SQL (3.4+/4.0+), so the statement passes through the
    dialect shim unchanged; registered to keep the parity visible. ORDER BY
    ALL over the full select list makes the LIMIT deterministic."""
    load_tables(spark, sf_dir).view("orders")
    return spark.sql(translate(_ORDER_ALL_SQL))


_COLUMNS_SQL = (
    "SELECT l_returnflag, min(COLUMNS('l_.*price|l_quantity')) "
    "FROM lineitem GROUP BY l_returnflag"
)


@query("sql_columns_expr", oracle=_COLUMNS_SQL)
def sql_columns_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB `COLUMNS('regex')` star expression (VERDICT r03 missing #3):
    schema-resolved expansion of the enclosing expression per matching
    column (search semantics), result columns keeping the bare names.
    Verbatim statement as oracle."""
    from ..service.sql_routing import rewrite_columns_expr

    load_tables(spark, sf_dir).view("lineitem")
    return spark.sql(translate(rewrite_columns_expr(spark, _COLUMNS_SQL, translate)))


_PIVOT_SQL = (
    "PIVOT orders ON o_orderstatus USING count(*) GROUP BY o_orderpriority"
)


@query("sql_pivot_routing", oracle=_PIVOT_SQL)
def sql_pivot_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's simplified `PIVOT t ON col USING agg GROUP BY g` statement
    (VERDICT r03 missing #2) routed to a conditional-aggregation SELECT —
    dynamic IN-list discovery via one DISTINCT scan, then one hash aggregate
    (agg FILTER per discovered value). The oracle is the VERBATIM statement
    run by DuckDB."""
    from ..service.sql_routing import route_pivot_statement

    load_tables(spark, sf_dir).view("orders")
    return route_pivot_statement(spark, _PIVOT_SQL, spark.table, translate)


_PIVOT_MULTI_SQL = (
    "PIVOT orders ON o_orderstatus, o_orderpriority IN ('1-URGENT', '3-MEDIUM') "
    "USING count(*) AS n, max(o_totalprice) AS mx GROUP BY o_orderdate"
)


@query("sql_pivot_multi", oracle=_PIVOT_MULTI_SQL)
def sql_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column, multi-aggregate PIVOT (VERDICT r05 missing #3): the ON
    clause takes several columns (each with an optional per-column IN list;
    IN-less columns are discovered in ONE collect_set pass) and USING takes
    several aggregates — output columns are the cross product, named
    value1_value2_alias exactly as DuckDB names them (combinations absent
    from the data aggregate over zero rows). Verbatim statement as oracle;
    count/max aggregates so every cell is exact cross-engine."""
    from ..service.sql_routing import route_pivot_statement

    load_tables(spark, sf_dir).view("orders")
    return route_pivot_statement(spark, _PIVOT_MULTI_SQL, spark.table, translate)


_UNPIVOT_SQL = (
    "UNPIVOT (SELECT p_partkey, CAST(p_size AS DOUBLE) AS size_v, "
    "CAST(p_retailprice AS DOUBLE) AS price_v FROM part WHERE p_partkey <= 100) "
    "ON size_v, price_v INTO NAME kind VALUE val"
)


@query("sql_unpivot_routing", oracle=_UNPIVOT_SQL)
def sql_unpivot_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's `UNPIVOT t ON cols INTO NAME k VALUE v` statement routed to
    DataFrame.unpivot (+ the NULL-cell drop DuckDB applies). Verbatim
    statement as oracle."""
    from ..service.sql_routing import route_unpivot_statement

    load_tables(spark, sf_dir).view("part")
    return route_unpivot_statement(spark, _UNPIVOT_SQL, spark.table, translate)


_FROM_FIRST_SQL = (
    "FROM customer SELECT c_mktsegment, count(*) AS n, "
    "CAST(sum(c_custkey) AS BIGINT) AS key_sum GROUP BY c_mktsegment"
)


@query("sql_from_first_routing", oracle=_FROM_FIRST_SQL)
def sql_from_first_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB 1.x FROM-first sugar (`FROM t SELECT ... GROUP BY ...`)
    rewritten to standard clause order (VERDICT r03 missing #6). Verbatim
    statement as oracle."""
    from ..service.sql_routing import rewrite_from_first

    load_tables(spark, sf_dir).view("customer")
    return spark.sql(translate(rewrite_from_first(_FROM_FIRST_SQL)))


@query(
    "sql_dml_returning",
    oracle="""
    SELECT 'ins' AS op, 100 AS n_nationkey, 'zed' AS n_name, 9 AS n_regionkey
    UNION ALL
    SELECT 'upd', n_nationkey, upper(n_name), n_regionkey
    FROM nation WHERE n_regionkey = 2
    UNION ALL
    SELECT 'del', 100, 'zed', 9
    ORDER BY op, n_nationkey
    """,
)
def sql_dml_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT/UPDATE/DELETE ... RETURNING through the service executor
    (VERDICT r03 missing #1; reference reach: passthrough db/db.go:52).
    Each statement's RETURNING relation is the affected rows — inserted
    values, post-update images, deleted rows — checked against the
    equivalent SELECTs on the pristine source table."""
    import tempfile

    from ..service.executor import Engine

    t = load_tables(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="wh_ret_"))
    t["nation"].select("n_nationkey", "n_name", "n_regionkey").createOrReplaceTempView(
        "nation_src"
    )
    eng.execute("CREATE TABLE nation_r AS SELECT * FROM nation_src")
    ins = eng.execute(
        "INSERT INTO nation_r VALUES (100, 'zed', 9) RETURNING *"
    ).returning
    upd = eng.execute(
        "UPDATE nation_r SET n_name = upper(n_name) WHERE n_regionkey = 2 "
        "RETURNING n_nationkey, n_name, n_regionkey"
    ).returning
    dele = eng.execute(
        "DELETE FROM nation_r WHERE n_regionkey = 9 RETURNING *"
    ).returning
    out = (
        ins.select(F.lit("ins").alias("op"), "*")
        .unionByName(upd.select(F.lit("upd").alias("op"), "*"))
        .unionByName(dele.select(F.lit("del").alias("op"), "*"))
    )
    return out.orderBy("op", "n_nationkey")


@query(
    "sql_summarize_routing",
    oracle="""
    SELECT column_name, column_type, min, max, count,
           CAST(null_percentage AS DOUBLE) AS null_pct
    FROM (SUMMARIZE SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders)
    """,
)
def sql_summarize_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB `SUMMARIZE` statement accepted by the service executor: one
    aggregation pass computes every per-column statistic (Engine.summarize).
    The oracle projects the deterministic columns (min/max/count/null%);
    approx_unique, avg/std and the quartile sketches are engine-specific
    approximations and stay out of the hash."""
    import tempfile

    from ..service.executor import Engine

    load_tables(spark, sf_dir).view("orders")
    eng = Engine(spark, tempfile.mkdtemp(prefix="wh_summ_"))
    kind, df = eng.run_statement(
        "SUMMARIZE SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders"
    )
    assert kind == "query"
    return df.select(
        "column_name",
        "column_type",
        "min",
        "max",
        "count",
        F.col("null_percentage").cast("double").alias("null_pct"),
    )


_UNNEST_SQL = """
SELECT n_nationkey,
       unnest(string_split(n_name, '_')) AS piece
FROM nation
"""


@query("sql_unnest_select", oracle=_UNNEST_SQL)
def sql_unnest_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB `unnest(list)` in the SELECT list (repeat the row per
    element) → Spark generator-in-select `explode`; identical zero-rows
    semantics for NULL/empty lists. Verbatim SQL as oracle."""
    load_tables(spark, sf_dir).view("nation")
    return spark.sql(translate(_UNNEST_SQL))


_LATERAL_UNNEST_SQL = """
SELECT n_nationkey, u.piece AS piece
FROM nation, UNNEST(string_split(n_name, '_')) AS u(piece)
"""


@query("sql_lateral_unnest", oracle=_LATERAL_UNNEST_SQL)
def sql_lateral_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's correlated FROM-clause UNNEST (`FROM t, UNNEST(expr)
    AS u(c)` where expr references t's columns) → Spark `LATERAL VIEW
    explode`; the standalone `FROM UNNEST(...)` form becomes a derived
    table. Verbatim SQL as oracle."""
    load_tables(spark, sf_dir).view("nation")
    return spark.sql(translate(_LATERAL_UNNEST_SQL))


_PATTERN_OPS_SQL = """
SELECT n_nationkey, n_name,
       n_name SIMILAR TO 'NATION_[0-9]'          AS one_digit,
       n_name SIMILAR TO 'NAT.*[02468]'          AS even_tail,
       n_name NOT SIMILAR TO '.*1.*'             AS no_one,
       n_name GLOB 'NATION_?'                    AS glob_one,
       n_name GLOB '*[13579]'                    AS glob_odd,
       n_name GLOB 'NATION_[!2]*'                AS glob_not2
FROM nation
"""


@query("sql_pattern_operators", oracle=_PATTERN_OPS_SQL)
def sql_pattern_operators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB pattern operators: SIMILAR TO (= regexp_full_match, NOT the
    PostgreSQL %/_-wildcard semantics — verified) and GLOB (*/?/[..]/[!..])
    → anchored RLIKE rewrites. Verbatim SQL as oracle."""
    load_tables(spark, sf_dir).view("nation")
    return spark.sql(translate(_PATTERN_OPS_SQL))


@query(
    "sql_bare_path_from",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    """,
)
def sql_bare_path_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's bare-path relation — `SELECT * FROM 'file.parquet'` with no
    read_* call — rewritten to the corresponding reader by extension
    (parquet/csv/json). The Spark side runs the VERBATIM DuckDB idiom."""
    return _run_routed(
        spark, f"SELECT r_regionkey, r_name FROM '{sf_dir}/region.parquet'"
    )


_EXCLUDE_FRAME_SQL = """
SELECT o_orderkey,
       CAST(sum(CAST(ROUND(o_totalprice * 1e6) AS BIGINT))
            OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
                  EXCLUDE CURRENT ROW) AS DOUBLE) / 1e6  AS neighbors_sum,
       count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
                      RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                      EXCLUDE GROUP)                     AS other_days,
       CAST(sum(CAST(ROUND(o_totalprice * 1e6) AS BIGINT))
            OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                  EXCLUDE TIES) AS DOUBLE) / 1e6         AS upto_no_ties,
       min(o_totalprice) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                               EXCLUDE CURRENT ROW)      AS neighbor_min,
       max(o_totalprice) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                               EXCLUDE CURRENT ROW)      AS prior_max,
       min(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
                               RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                               EXCLUDE GROUP)            AS min_other_days,
       max(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
                               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                               EXCLUDE TIES)             AS max_upto_no_ties,
       min(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
                               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                               EXCLUDE CURRENT ROW)      AS min_upto_no_self,
       count(o_totalprice) OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                                 EXCLUDE GROUP)          AS rows_group_cnt,
       min(o_totalprice) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                               EXCLUDE TIES)             AS rows_ties_min,
       max(o_totalprice) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN 4 PRECEDING AND 2 PRECEDING
                               EXCLUDE CURRENT ROW)      AS rows_ext_max
FROM orders
WHERE o_orderkey <= 2000
"""


@query("win_exclude_frame", oracle=_EXCLUDE_FRAME_SQL)
def win_exclude_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame EXCLUDE (CURRENT ROW / GROUP / TIES — DuckDB 1.x
    surface Spark's grammar lacks), rewritten by window algebra:
    agg(frame) minus the excluded contribution (current row value, or a
    peer-group window partitioned by (partition, order) columns), with
    empty-after-exclusion returning NULL. Verbatim SQL as oracle; exact
    BIGINT units so the subtraction is bit-stable."""
    load_tables(spark, sf_dir).view("orders")
    return spark.sql(translate(_EXCLUDE_FRAME_SQL))


_EXCLUDE_NAMED_SQL = """
SELECT o_orderkey,
       CAST(sum(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT)
                                                           AS neigh_cents,
       CAST(count(*) OVER w AS BIGINT)                     AS neigh_cnt,
       CAST(max(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w2 AS BIGINT)
                                                           AS max_no_ties
FROM orders
WHERE o_orderkey <= 2000
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW),
       base AS (PARTITION BY o_orderpriority ORDER BY o_orderdate),
       w2 AS (base RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              EXCLUDE TIES)
"""


@query("win_exclude_named", oracle=_EXCLUDE_NAMED_SQL)
def win_exclude_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame EXCLUDE inside a NAMED WINDOW clause (r07 verdict gap #2 /
    task 4; reference reach: passthrough db/db.go:70). The dialect inlines
    every named spec into its OVER references — including the chained
    ``w2 AS (base RANGE ... EXCLUDE TIES)`` definition — then the standard
    frame-EXCLUDE algebra applies. Verbatim DuckDB SQL as oracle; integer
    cents keep the subtraction forms bit-stable."""
    load_tables(spark, sf_dir).view("orders")
    return spark.sql(translate(_EXCLUDE_NAMED_SQL))


_IGNORE_NULLS_SQL = """
SELECT o_orderkey,
       last_value(CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END
                  IGNORE NULLS)
         OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_seen_price,
       lag(CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderkey END
           IGNORE NULLS)
         OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS prev_real_key
FROM orders
WHERE o_orderkey <= 3000
"""


@query("win_ignore_nulls", oracle=_IGNORE_NULLS_SQL)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window modifier — DuckDB places it INSIDE the call,
    Spark after it; the dialect moves it (gap-fill / last-observation-
    carried-forward, the canonical time-series idiom). Verbatim oracle."""
    load_tables(spark, sf_dir).view("orders")
    return spark.sql(translate(_IGNORE_NULLS_SQL))


_WIN_DISTINCT_SQL = """
SELECT o_orderkey,
       CAST(count(DISTINCT o_orderstatus)
            OVER (PARTITION BY o_orderpriority) AS BIGINT)       AS n_statuses,
       CAST(sum(DISTINCT CAST(ROUND(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
                                                                 AS run_distinct_cents,
       round(CAST(avg(DISTINCT CAST(ROUND(o_totalprice) AS BIGINT))
             OVER (PARTITION BY o_orderpriority) AS DOUBLE), 6)  AS avg_distinct_price,
       CAST(min(DISTINCT o_custkey)
            OVER (PARTITION BY o_orderpriority) AS BIGINT)       AS min_cust
FROM orders
WHERE o_orderkey <= 2000
"""


@query("win_distinct_agg", oracle=_WIN_DISTINCT_SQL)
def win_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates as WINDOW functions (count/sum/avg/min DISTINCT
    ... OVER) — DuckDB surface Spark's grammar rejects; the dialect rewrites
    them over the per-frame distinct set (collect_set): size() for count,
    a NULL-seeded aggregate() fold for sum/avg, plain min/max for the
    no-op DISTINCTs. The query keeps summed values integer-scaled so the
    fold is order-independent (collect_set has no defined order — float
    inputs would drift in the last ulp). Verbatim DuckDB SQL as oracle."""
    load_tables(spark, sf_dir).view("orders")
    return spark.sql(translate(_WIN_DISTINCT_SQL))


_PREPARE_BODY_SQL = """
SELECT o_orderpriority, count(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM orders
WHERE o_orderdate >= $1 AND o_orderdate < $2 AND o_totalprice > $3
GROUP BY o_orderpriority
"""

_PREPARE_ARGS = ["DATE '1995-01-01'", "DATE '1995-07-01'", "1000.0"]


@query(
    "sql_prepare_execute",
    oracle=f"""
    PREPARE r7_prio AS {_PREPARE_BODY_SQL};
    EXECUTE r7_prio({", ".join(_PREPARE_ARGS)})
    """,
)
def sql_prepare_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREPARE/EXECUTE through the service executor (VERDICT r06 task 7):
    the statement is prepared once (session-scoped, like DuckDB's — the
    reference reaches it via full passthrough, db/db.go:70) and executed
    with $1/$2/$3 arguments bound at EXECUTE time. Binding inlines literal
    argument expressions (macros.bind_prepared) — the same bind-time move
    DuckDB makes, minus the plan cache (Catalyst re-plans per call; plan
    time is not the bottleneck at analytics latencies). The DuckDB oracle
    runs the VERBATIM PREPARE + EXECUTE script."""
    import tempfile

    from ..service.executor import Engine

    load_tables(spark, sf_dir).view("orders")
    eng = Engine(spark, tempfile.mkdtemp(prefix="wh_prepare_"))
    eng.execute(f"PREPARE r7_prio AS {_PREPARE_BODY_SQL}")
    return eng.query_df(f"EXECUTE r7_prio({', '.join(_PREPARE_ARGS)})")


_BRANCH_UNIFY_SQL = """
SELECT o_orderkey AS k,
       CASE WHEN o_orderkey % 2 = 0 THEN is_f ELSE small END AS bool_int_case,
       COALESCE(gap, fl) AS dec_float_coalesce,
       GREATEST(small, big) AS gl_bigint,
       LEAST(small, dc) AS gl_double,
       (o_orderstatus COLLATE NOCASE) = 'f' AS nocase_hit,
       ([10, '42', 6])[2] AS list_lane,
       ((MAP {'x': 5, 'y': '6'})['y'])[1] AS map_lane,
       CASE WHEN o_orderkey % 2 = 0 THEN small ELSE '2' END AS lit_case,
       CAST(COALESCE('7', small) AS VARCHAR) AS lit_coalesce,
       GREATEST(1, '2', big) AS lit_gl,
       COALESCE(NULLIF(big, 0), '9') AS comp_nullif,
       COALESCE(big + 1, '7') AS comp_arith,
       GREATEST(big + 1, '7') AS comp_gl,
       COALESCE(CASE WHEN o_orderkey % 3 = 0 THEN big END, '8') AS comp_case,
       (COALESCE([small], '[2, 3]'))[1] AS complane_list,
       (CASE WHEN o_orderkey % 2 = 0 THEN CAST(NULL AS INTEGER[])
             ELSE '[4]' END)[1] AS complane_parse,
       (COALESCE(CASE WHEN o_orderkey % 3 = 0 THEN {'a': small} END,
                 '{''a'': 9}')).a AS complane_struct
FROM (SELECT o_orderkey, o_orderstatus,
             o_orderstatus = 'F' AS is_f,
             CAST(o_orderkey % 5 AS TINYINT) AS small,
             o_orderkey * 3 AS big,
             CAST(o_totalprice AS DECIMAL(12,2)) AS dc,
             CAST(o_totalprice AS FLOAT) AS fl,
             CASE WHEN o_orderkey % 3 = 0
                  THEN CAST(o_totalprice AS DECIMAL(18,6)) END AS gap
      FROM orders WHERE o_orderkey % 97 = 0) s
UNION ALL
SELECT -o_orderkey, is_f, fl, big, dc, NOT is_f, small, small AS ml,
       CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE '3' END AS lc2,
       CAST(COALESCE(dc, '7') AS VARCHAR) AS co2, LEAST(NULL, '5') AS gl2,
       COALESCE(NULLIF(big, 3), '4') AS cn2, big + 2 AS ca2,
       GREATEST(big, '6') AS cg2, COALESCE(big, '1') AS cc2,
       small AS cl2, CAST(small AS INTEGER) AS cp2, small AS cs2
FROM (SELECT o_orderkey, o_orderstatus = 'F' AS is_f,
             CAST(o_orderkey % 5 AS TINYINT) AS small,
             o_orderkey * 3 AS big,
             CAST(o_totalprice AS DECIMAL(12,2)) AS dc,
             CAST(o_totalprice AS FLOAT) AS fl
      FROM orders WHERE o_orderkey % 89 = 0) s2
"""


@query("sql_branch_unification", oracle=_BRANCH_UNIFY_SQL)
def sql_branch_unification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch result-type unification through the service executor
    (VERDICT r10 task 4 — the last unswept lattice; reference reach:
    db/db.go:70 passthrough). One statement exercises every measured
    DuckDB rule the r11 passes reproduce: a CASE with BOOLEAN-vs-TINYINT
    branches (DuckDB coerces the bool to 0/1, Spark raises
    DATA_DIFF_TYPES), COALESCE over DECIMAL-vs-FLOAT (DuckDB unifies to
    FLOAT through its scaled-int float32 lane — value-visible), GREATEST
    integer promotion to BIGINT and LEAST fractional promotion to DOUBLE,
    a UNION ALL whose second branch puts BOOLEAN under the first branch's
    numeric/varchar columns, and a COLLATE NOCASE comparison (mapped to
    Spark's UTF8_LCASE — measured value-identical down to ORDER BY tie
    order). Round 13 adds COMPOSITE branch operands (NULLIF/arithmetic/
    nested CASE beside a string literal — the LIMIT-0 lane probe in
    _branch_atom types the subexpression like DuckDB's binder, VERDICT
    r12 #1). Round 14 adds COMPOSITE-TYPE lanes (VERDICT r13 #1): a
    LIST lane beside a string literal parses the literal through the
    bracket grammar, a NULL-typed INTEGER[] CASE lane parses the ELSE
    literal, and a STRUCT lane coerces '{''a'': 9}' into its field
    type. The oracle runs the VERBATIM statement in DuckDB."""
    import tempfile

    from ..service.executor import Engine

    load_tables(spark, sf_dir).view("orders")
    eng = Engine(spark, tempfile.mkdtemp(prefix="wh_branch_"))
    return eng.query_df(_BRANCH_UNIFY_SQL)


_COMPOSITE_CAST_SQL = """
SELECT k,
       (CAST(s AS INTEGER[]))[1] AS elem1,
       (CAST(s AS INTEGER[]))[2] AS elem2,
       (CAST(s AS DOUBLE[]))[2] AS elem2_dbl,
       (TRY_CAST(bad AS INTEGER[]))[1] AS try_elem,
       TRY_CAST(bad AS INTEGER[]) IS NULL AS bad_is_null,
       CAST('{''a'': 7}' AS STRUCT(a INTEGER)).a AS struct_lit,
       CAST('{''a'': 2.9}' AS STRUCT(a INTEGER)).a AS struct_round,
       (COALESCE(CAST(NULL AS INTEGER[]), '[5, 6]'))[2] AS lane_parse,
       CAST(st AS STRUCT(a INTEGER)).a AS struct_col_parse,
       CAST(CAST(s AS INTEGER[]) AS VARCHAR) AS list_render,
       CAST(MAP {'x': k % 3} AS VARCHAR) AS map_render,
       MAP {'x': k % 3} = MAP {'x': 1} AS map_eq,
       CAST((CAST(k % 5 AS INTEGER) + 2)! AS BIGINT) AS fact_term,
       CAST('2020-01-01 01:02:03+05:30' AS TIMESTAMP) AS offset_ts,
       TIMESTAMP 'epoch' AS epoch_ts
FROM (SELECT o_orderkey AS k,
             '[' || (o_orderkey % 5) || ', ' || (o_orderkey % 3) || ']' AS s,
             '{''a'': ' || (o_orderkey % 9) || '}' AS st,
             CASE WHEN o_orderkey % 2 = 0 THEN '[1, 2]' ELSE 'junk' END AS bad
      FROM orders WHERE o_orderkey % 101 = 0) t
ORDER BY k
"""


@query("sql_composite_cast", oracle=_COMPOSITE_CAST_SQL)
def sql_composite_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String -> composite casts (VERDICT r13 task 2; reference reach:
    db/db.go:70 passthrough). A string COLUMN cast to INTEGER[]/DOUBLE[]
    parses DuckDB's bracket grammar at runtime (duck_list_split Arrow
    UDF + the measured element cast contract), TRY_CAST NULLs
    grammar-failing rows ('junk'), string LITERALS fold to STRUCT
    targets at rewrite time ({'a': 2.9} rounds into the INTEGER field),
    and a composite-lane COALESCE parses its string literal. The r14
    stretch columns ride along: string-COLUMN STRUCT parse
    (duck_struct_split), composite -> VARCHAR renders, entry-order
    map equality, postfix factorial over a parenthesized term
    (HUGEINT lane on DECIMAL(38,0)), and the epoch/offset datetime
    literal specials. The oracle runs the VERBATIM statement in
    DuckDB."""
    import tempfile

    from ..service.executor import Engine

    load_tables(spark, sf_dir).view("orders")
    eng = Engine(spark, tempfile.mkdtemp(prefix="wh_compcast_"))
    return eng.query_df(_COMPOSITE_CAST_SQL)
