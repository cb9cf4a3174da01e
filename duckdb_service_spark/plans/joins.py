"""Join operators — SURVEY §2.2c. Physical strategy (broadcast vs
sort-merge vs shuffled-hash) is left to Catalyst+AQE except where a
broadcast hint is provably right (small dims)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import dsum, fsum
from ..operators.asof import asof_join, asof_join_fused, positional_join
from ..sources import load_tables
from .registry import query


@query(
    "join_inner_equi",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
    bench=True,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact equi join on the natural key: one co-partitioned shuffle
    (l_orderkey = o_orderkey), partial aggregation map-side."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n"), fsum("l_extendedprice").alias("revenue"))
        .orderBy("priority")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM orders o RIGHT JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"), "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cust AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
                  WHERE c_acctbal > 9000 GROUP BY c_nationkey),
         supp AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
                  GROUP BY s_nationkey)
    SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust,
           COALESCE(s.n_supp, 0) AS n_supp
    FROM cust c FULL OUTER JOIN supp s ON c.c_nationkey = s.s_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER with unmatched rows on both sides (filtered customers vs
    the 10-supplier table). Also exercises CTE composition."""
    t = load_tables(spark, sf_dir)
    cust = (
        t["customer"]
        .filter(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = t["supplier"].groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_supp"))
    return cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left_semi join (Catalyst does this rewrite for SQL EXISTS;
    the DataFrame plan states it directly)."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 300000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "join_anti_not_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "join_in_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderkey <= 3000
    """,
)
def join_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) → left_semi. Uses the SQL surface to exercise Catalyst's
    own rewrite path as well."""
    t = load_tables(spark, sf_dir)
    t.view("orders", "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          AND o_orderkey <= 3000
        """
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, seg.c_mktsegment
    FROM region r CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    segs = t["customer"].select("c_mktsegment").distinct()
    return t["region"].crossJoin(segs).select("r_name", "c_mktsegment")


@query(
    "join_theta_nonequi",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    WHERE c.c_custkey <= 500
    """,
)
def join_theta_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi component keeps it a hash join; the inequality rides
    as a post-join filter (Catalyst extracts the equi keys automatically)."""
    t = load_tables(spark, sf_dir)
    s, c = t["supplier"], t["customer"].filter(F.col("c_custkey") <= 500)
    return s.join(
        c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal)
    ).select("s_suppkey", "c_custkey")


@query(
    "join_range_interval",
    oracle="""
    SELECT o.o_orderkey, COUNT(*) AS n_ship_weeks
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 60 DAY
    WHERE o.o_orderkey <= 1000
    GROUP BY o.o_orderkey
    """,
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate inside the ON clause (BETWEEN over an interval)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") <= 1000)
    l = t["lineitem"]
    cond = (
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
    )
    return o.join(l, cond).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_ship_weeks"))


@query(
    "join_using_natural",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n_nations, MIN(r_name) AS region_name
    FROM nation n
    JOIN (SELECT r_regionkey AS n_regionkey, r_name FROM region) r USING (n_regionkey)
    GROUP BY n_regionkey
    """,
)
def join_using_natural(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USING(col) join — single shared key column in the output."""
    t = load_tables(spark, sf_dir)
    r = t["region"].select(F.col("r_regionkey").alias("n_regionkey"), "r_name")
    return (
        t["nation"]
        .join(F.broadcast(r), ["n_regionkey"])
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n_nations"), F.min("r_name").alias("region_name"))
    )


@query(
    "join_asof",
    oracle="""
    SELECT c.user_id, c.ts, c.event_id, v.ts AS asof_ts, v.value AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
    bench=True,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF JOIN (DuckDB dialect): each click matched to the latest earlier
    view per user. Both sides are disjoint filters of `events`, so this uses
    operators.asof.asof_join_fused — ONE scan of the source with a
    conditional side tag, then the shared last-value-window carry. One
    shuffle, no pair explosion, half the input I/O of a two-scan union
    (scales to 100 TB unlike a range-join rewrite)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    out = asof_join_fused(
        ev,
        left_pred=F.col("event_type") == "click",
        right_pred=F.col("event_type") == "view",
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        left_payload=["event_id"],
        right_payload=["value"],
    )
    return out.select("user_id", "ts", "event_id", "asof_ts", F.col("value").alias("view_value"))


@query(
    "join_positional",
    oracle="""
    WITH a AS (SELECT r_name, row_number() OVER (ORDER BY r_regionkey) AS pos FROM region),
         b AS (SELECT c_mktsegment, row_number() OVER (ORDER BY c_mktsegment) AS pos
               FROM (SELECT DISTINCT c_mktsegment FROM customer))
    SELECT a.r_name, b.c_mktsegment
    FROM a FULL OUTER JOIN b ON a.pos = b.pos
    """,
)
def join_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITIONAL JOIN under an explicit order on each side
    (operators.asof.positional_join)."""
    t = load_tables(spark, sf_dir)
    segs = t["customer"].select("c_mktsegment").distinct()
    out = positional_join(
        t["region"].select("r_name", "r_regionkey"),
        segs,
        left_order=[F.col("r_regionkey")],
        right_order=[F.col("c_mktsegment")],
    )
    return out.select("r_name", "c_mktsegment")


@query(
    "join_lateral_correlated",
    oracle="""
    SELECT c.c_custkey, top_o.o_orderkey, top_o.o_totalprice
    FROM customer c
    JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) top_o ON true
    WHERE c.c_custkey <= 100
    """,
)
def join_lateral_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL top-n-per-group → window rank rewrite (the scalable plan:
    one shuffle by the correlation key instead of a per-row subquery)."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    o = t["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    top2 = o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    c = t["customer"].filter(F.col("c_custkey") <= 100)
    return (
        c.join(top2, c.c_custkey == top2.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "join_asof_left",
    oracle="""
    SELECT c.user_id, c.ts, c.event_id, v.ts AS asof_ts
    FROM (SELECT * FROM events WHERE event_type = 'signup') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def join_asof_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF LEFT JOIN: signups keep a row even when the user has no prior
    purchase (asof_ts NULL) — the 'left' mode, fused single-scan variant
    (both sides filter the same `events` table)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    out = asof_join_fused(
        ev,
        left_pred=F.col("event_type") == "signup",
        right_pred=F.col("event_type") == "purchase",
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        left_payload=["event_id"],
        right_payload=[],
        how="left",
    )
    return out.select("user_id", "ts", "event_id", "asof_ts")
