"""TPC-H-shaped headline queries over the fixture star schema.

These are the flagship scans→filter→join→agg→sort pipelines. Reference
capability: full SELECT passthrough to DuckDB (db/db.go:67-117); rebuilt here
as declarative DataFrame plans so Catalyst supplies pushdown, join selection
and AQE (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import davg, dec, dsum, favg, fsum
from ..sources import load_tables
from .registry import query


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(ROUND(l_quantity * 1e6) AS BIGINT)) AS DOUBLE) / 1e6      AS sum_qty,
      CAST(SUM(CAST(ROUND(l_extendedprice * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_base_price,
      CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_disc_price,
      CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_charge,
      CAST(SUM(CAST(ROUND(l_quantity * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(l_quantity)        AS avg_qty,
      CAST(SUM(CAST(ROUND(l_extendedprice * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(l_extendedprice) AS avg_price,
      CAST(SUM(CAST(ROUND(l_discount * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(l_discount)        AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan → filter (pushed to parquet) → hash agg (partial+final,
    no shuffle beyond the 6-group agg) → sort. Decimal sums for exact,
    order-independent accumulation (functions.stable)."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fsum("l_quantity").alias("sum_qty"),
            fsum("l_extendedprice").alias("sum_base_price"),
            fsum(disc_price).alias("sum_disc_price"),
            fsum(charge).alias("sum_charge"),
            favg("l_quantity").alias("avg_qty"),
            favg("l_extendedprice").alias("avg_price"),
            favg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT
      l.l_orderkey,
      CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue,
      CAST(o.o_orderdate AS DATE) AS orderdate,
      o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '2000-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: filters pushed to the scans, then top-k (Catalyst
    TakeOrderedAndProject — no full sort at scale).

    No broadcast hints: the date filter keeps an sf-proportional fraction of
    orders and the segment filter ~1/5 of customer, so both sides grow with
    the data — forcing a broadcast would OOM executors at 100 TB. Unhinted,
    lineitem⋈orders shuffles on the natural key and AQE may still elect a
    broadcast at small sf from real size stats."""
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("2000-03-15 00:00:00").cast("timestamp")
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < cutoff)
    l = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(fsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT
      n.n_name AS nation,
      CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: five-way join. Truly-small dims (region 5 rows, nation 25)
    are broadcast; supplier is region-filtered (~1/5 of an sf-proportional
    table) and kept broadcast as the borderline case documented in
    SCALING.md. customer is sf-proportional and unfiltered, so it joins
    orders by shuffle on custkey — broadcasting it would be multi-GB at
    sf100. Net: two big-table shuffles (lineitem⋈orders on orderkey,
    +customer on custkey), everything else map-side."""
    t = load_tables(spark, sf_dir)
    r = t["region"].filter(F.col("r_name") == "ASIA")
    n = t["nation"].join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    s = t["supplier"].join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = t["lineitem"]
    c = t["customer"]
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(fsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(F.col("n_name").alias("nation"), "revenue")
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 200
    )
    SELECT
      c.c_name,
      c.c_custkey,
      o.o_orderkey,
      CAST(o.o_orderdate AS DATE) AS orderdate,
      o.o_totalprice,
      CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    bench=True,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): full-fact aggregation feeding a
    semi-join back into the fact, then agg-then-join and top-k.

    Scale shape: the HAVING aggregation and the semi-join both hash on
    l_orderkey, so Spark reuses one shuffle of lineitem for the two; the
    surviving order set is tiny (sub-percent) and AQE can broadcast it at
    runtime. customer joins by shuffle on custkey (sf-proportional — never
    hint-broadcast). Top-k via TakeOrderedAndProject, no global sort.
    (Threshold 200 rather than TPC-H's 300: the synthetic fixture's
    quantity-per-order tops out lower; the plan shape is identical.)"""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"]
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 200)
        .select("l_orderkey")
    )
    o = t["orders"].join(big, t["orders"].o_orderkey == big.l_orderkey, "left_semi")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(t["customer"], o.o_custkey == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").cast("double").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )
