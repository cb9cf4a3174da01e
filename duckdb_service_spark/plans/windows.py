"""Window function operators — SURVEY §2.2e.

Every window uses a total deterministic ORDER (unique tie-break column) so
both engines produce identical rows. Frames are always explicit: the
default-frame subtlety for last_value (RANGE UNBOUNDED PRECEDING..CURRENT
ROW in both engines) is side-stepped by never relying on defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.stable import dec
from ..sources import load_tables
from .registry import query


@query(
    "win_ranks",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      row_number()   OVER w AS rn,
      rank()         OVER w AS rnk,
      dense_rank()   OVER w AS drnk,
      percent_rank() OVER w AS prnk,
      cume_dist()    OVER w AS cdist,
      ntile(4)       OVER w AS quartile
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    bench=True,
)
def win_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over a named window (WINDOW clause exercised via the
    DataFrame Window object — one definition, six functions)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        t["orders"]
        .filter(F.col("o_custkey") <= 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.percent_rank().over(w).alias("prnk"),
            F.cume_dist().over(w).alias("cdist"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
        )
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT
      user_id,
      event_id,
      lag(value, 1)        OVER w AS prev_value,
      lead(value, 2, -1.0) OVER w AS next2_value,
      lag(event_type, 1, 'none') OVER w AS prev_type
    FROM events
    WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t["events"]
        .filter(F.col("user_id") <= 20)
        .select(
            "user_id",
            "event_id",
            F.lag("value", 1).over(w).alias("prev_value"),
            F.lead("value", 2, -1.0).over(w).alias("next2_value"),
            F.lag("event_type", 1, "none").over(w).alias("prev_type"),
        )
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT
      user_id,
      event_id,
      CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)   AS running_value,
      COUNT(*) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING)           AS nearby_n
    FROM events
    WHERE user_id <= 20
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over ROWS frames: running decimal sum (exact, order-safe)
    + sliding count."""
    t = load_tables(spark, sf_dir)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliding = wo.rowsBetween(-3, 1)
    return (
        t["events"]
        .filter(F.col("user_id") <= 20)
        .select(
            "user_id",
            "event_id",
            F.sum(dec("value")).over(running).cast("double").alias("running_value"),
            F.count(F.lit(1)).over(sliding).alias("nearby_n"),
        )
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT
      o_orderkey,
      COUNT(*) OVER (
        ORDER BY o_totalprice
        RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_similar_price
    FROM orders
    WHERE o_orderkey <= 1000
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed on a numeric ordering column."""
    t = load_tables(spark, sf_dir)
    w = Window.orderBy("o_totalprice").rangeBetween(-10000, Window.currentRow)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 1000)
        .select("o_orderkey", F.count(F.lit(1)).over(w).alias("n_similar_price"))
    )


@query(
    "win_first_last_nth",
    oracle="""
    SELECT
      user_id,
      event_id,
      first_value(event_type) OVER w AS first_type,
      last_value(event_type)  OVER w AS last_type,
      nth_value(event_type, 2) OVER w AS second_type
    FROM events
    WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t["events"]
        .filter(F.col("user_id") <= 20)
        .select(
            "user_id",
            "event_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.nth_value("event_type", 2).over(w).alias("second_type"),
        )
    )


@query(
    "win_partition_agg",
    oracle="""
    SELECT DISTINCT
      l_suppkey,
      CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER (PARTITION BY l_suppkey) AS DOUBLE) AS supp_qty,
      COUNT(*) OVER (PARTITION BY l_suppkey) AS supp_n
    FROM lineitem
    """,
    bench=True,  # the window-over-fact headline: one shuffle by l_suppkey
)
def win_partition_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-partition aggregate window (no ORDER BY → full-frame)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("l_suppkey")
    return (
        t["lineitem"]
        .select(
            "l_suppkey",
            F.sum(dec("l_quantity")).over(w).cast("double").alias("supp_qty"),
            F.count(F.lit(1)).over(w).alias("supp_n"),
        )
        .distinct()
    )


@query(
    "win_qualify",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) = 1
    """,
)
def win_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY (DuckDB dialect) → window + post-filter rewrite (SURVEY §4
    shim item): Spark has no QUALIFY, the rewrite is the documented
    equivalent plan."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        t["orders"]
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
