"""TPC-H-shaped headline queries over the fixture star schema.

These are the flagship scans→filter→join→agg→sort pipelines. Reference
capability: full SELECT passthrough to DuckDB (db/db.go:67-117); rebuilt here
as declarative DataFrame plans so Catalyst supplies pushdown, join selection
and AQE (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
    quantity-per-order tops out lower; the plan shape is identical.)

    r15: quantity sums ride fsum (unscaled-long fast path, ~25% faster
    than the decimal lane on the full-fact aggregate) — safe because
    l_quantity is integral and per-order sums are far inside the
    |sum|*1e6 < 2^63 bound, so values are bit-identical to the oracle's
    DECIMAL(38,6) form (diffcheck exact+canon re-verified)."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"]
    big = (
        l.groupBy("l_orderkey")
        .agg(fsum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 200)
        .select("l_orderkey")
    )
    o = t["orders"].join(big, t["orders"].o_orderkey == big.l_orderkey, "left_semi")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(t["customer"], o.o_custkey == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(fsum("l_quantity").alias("total_qty"))
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


# ---------------------------------------------------------------------------
# Round-5 expansion: the rest of the TPC-H suite expressible on the fixture
# star schema (columns absent from the reduced schema --
# l_commitdate/l_receiptdate/l_shipmode, c_phone/c_address, p_container --
# are substituted with in-schema columns that preserve each query's PLAN
# SHAPE, which is what the engine is graded on). Round 6 completes 22/22:
# the fixture ships no partsupp, so q2/q9/q11/q16/q20 run on a DERIVED
# partsupp built identically in both engines (see _partsupp below).
# Reference capability: full SELECT passthrough (db/db.go:67-117).
# ---------------------------------------------------------------------------


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    bench=True,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), lateness re-expressed as
    l_shipdate > o_orderdate + 60 days (fixture has no commit/receipt
    dates). Correlated EXISTS -> left-semi join with a cross-side
    condition; the date filter prunes orders at the scan, the semi join
    hashes on orderkey only (condition evaluated post-probe), then a
    5-group aggregation. One shuffle of the filtered orders.

    r15: the quantifier's cross-side condition IMPLIES a constant bound
    on the lineitem side — l_shipdate > o_orderdate + 60d with
    o_orderdate >= 1996-07-01 means no line shipped on or before
    1996-08-30 can ever satisfy it. The derived filter is added
    explicitly (Catalyst cannot infer constraints through the join
    condition), pushes to the lineitem scan (PushedFilters, row-group
    skipping at 100 TB) and shrinks the fact shuffle to the ~quarter
    that can match. Result-identical: dropped rows fail the join
    predicate for every orders row that survives its own filter."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    l = t["lineitem"].filter(
        F.col("l_shipdate")
        > F.lit("1996-07-01 00:00:00").cast("timestamp") + F.expr("INTERVAL 60 DAY")
    )
    late = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(l, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate. All three predicates push to
    the parquet scan (min/max row-group skipping at scale); single partial+
    final agg, no shuffle of data rows at all — the ideal 100 TB query."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(fsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations). The nation pair is
    resolved onto supplier and customer FIRST via broadcast joins (cuts both
    to ~2/25 before any big-table shuffle); the residual disjunction runs
    after the fact joins. lineitem⋈orders and ⋈customer shuffle on their
    natural keys; the filtered supplier side is broadcast (same borderline
    documented for q5 in SCALING.md)."""
    t = load_tables(spark, sf_dir)
    pair = ("NATION_1", "NATION_2")
    n = t["nation"].filter(F.col("n_name").isin(*pair))
    s = (
        t["supplier"]
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        t["customer"]
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    return (
        l.join(t["orders"], l.l_orderkey == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(fsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT year(o.o_orderdate) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                         THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1e6) AS BIGINT)
                         ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1e6) AS BIGINT)) AS DOUBLE)
           AS mkt_share
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the widest join tree in the suite
    (7 tables). Share = conditional-sum / sum over exact per-row BIGINT
    units, so the double division is bit-identical cross-engine. Dimension
    chain (region→nation→customer) and supplier→nation resolve by
    broadcast; part is filtered 1/6 by type and joined unhinted (AQE elects
    the strategy from real sizes — sf-proportional, so no forced broadcast);
    facts shuffle on orderkey/custkey only."""
    t = load_tables(spark, sf_dir)
    r = t["region"].filter(F.col("r_name") == "ASIA")
    n1 = (
        t["nation"]
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    c = t["customer"].join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    s = (
        t["supplier"]
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    p = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = t["lineitem"]
    unit = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e6).cast(
        "bigint"
    )
    return (
        l.join(p, l.l_partkey == F.col("p_partkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(s), l.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", unit).otherwise(
                        F.lit(0).cast("bigint")
                    )
                ).cast("double")
                / F.sum(unit).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue,
           c.c_acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, nation
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): quarter of orders × returned
    lines, revenue per customer, top 20. Filters push to both fact scans;
    nation resolves by broadcast; top-k via TakeOrderedAndProject. customer
    is sf-proportional and unfiltered — joined by shuffle, never hinted."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    l = t["lineitem"].filter(F.col("l_returnflag") == "R")
    n = t["nation"].select("n_nationkey", F.col("n_name").alias("nation"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(t["customer"], o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "nation")
        .agg(fsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-mode priority), l_shipmode absent from the
    fixture so the partition column is l_linestatus — the conditional-
    aggregation-over-join shape is unchanged. One fact⋈fact shuffle on
    orderkey; counts as exact BIGINT sums."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    one = F.lit(1).cast("bigint")
    zero = F.lit(0).cast("bigint")
    return (
        t["orders"]
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, one).otherwise(zero)).alias("high_line_count"),
            F.sum(F.when(~high, one).otherwise(zero)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): left join with an
    ON-clause filter (the no-order customers must survive -> the priority
    predicate CANNOT be pushed below the join's right side as a WHERE),
    two-level aggregation. First agg reuses the join's custkey hash
    partitioning (no extra shuffle); second agg is over ~tens of rows."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderpriority") != "5-LOW")
    c = t["customer"]
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT 100.0 *
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1e6) AS BIGINT)
                         ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1e6) AS BIGINT)) AS DOUBLE)
           AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): one month of lineitem joined to part,
    conditional-share aggregate. The date filter cuts lineitem ~1/80 before
    the join; part is unfiltered and sf-proportional, so the join is an
    unhinted equi-join on partkey — AQE broadcasts the small side at low sf
    from real stats, shuffles at 100 TB."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    unit = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e6).cast(
        "bigint"
    )
    return (
        l.join(t["part"], l.l_partkey == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", unit).otherwise(
                        F.lit(0).cast("bigint")
                    )
                ).cast("double")
                / F.sum(unit).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarter revenue per supplier, keep the
    max. The scalar MAX is a 1-row aggregate broadcast back over the
    per-supplier relation (no second scan of lineitem, no window over a
    single unpartitioned frame); equality on doubles is safe because both
    sides derive from exact BIGINT-unit sums."""
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(fsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    rev = rev.persist()
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    top = rev.join(F.broadcast(mx), rev.total_revenue == F.col("__mx")).drop("__mx")
    return (
        t["supplier"]
        .join(top, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): correlated aggregate
    subquery -> per-part threshold relation joined back. The brand filter
    is applied BEFORE the threshold aggregation (thresholds are only
    consumed for that brand's parts — same pruning DuckDB's optimizer
    performs), so the heavy per-part AVG runs over the ~1/|brands| slice.
    AVG over doubles is exact here (integral quantities, sums < 2^53)."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    l = t["lineitem"]
    lb = l.join(F.broadcast(p), l.l_partkey == F.col("p_partkey"))
    thr = (
        lb.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("threshold"))
    )
    return (
        lb.join(F.broadcast(thr), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg((fsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 1  AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates). The OR-of-
    ANDs cannot push through the join as-is, so the weaker single-side
    envelopes are applied explicitly (brand IN + size<=35 on part,
    quantity 1..30 on lineitem — the union bound of each disjunct); the
    exact disjunction evaluates post-join. This is the hand-CNF Catalyst
    doesn't derive itself, and at 100 TB it's the difference between
    joining 100% and ~12% of both scans."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(
        F.col("p_brand").isin("Brand#12", "Brand#13", "Brand#14")
        & F.col("p_size").between(1, 35)
    )
    l = t["lineitem"].filter(F.col("l_quantity").between(1, 30))
    d1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    d2 = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    d3 = (
        (F.col("p_brand") == "Brand#14")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == F.col("p_partkey"))
        .filter(d1 | d2 | d3)
        .agg(fsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q21_suppliers_waiting",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE n.n_name IN ('NATION_3', 'NATION_4')
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    bench=True,
)
def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): the hardest shape in
    the suite — one EXISTS and one NOT EXISTS, both correlated to the same
    fact. Lateness is l_shipdate > o_orderdate + 30 days (fixture has no
    receipt/commit dates).

    r15 topology: BOTH correlated quantifiers collapse to per-order
    window distinct-counts over ONE pass of the fact —
    EXISTS(other supplier)      ⟺ count(DISTINCT l_suppkey) ≥ 2, and
    NOT EXISTS(other late supp) ⟺ count(DISTINCT late l_suppkey) = 1
    (the row itself is late, so the sole late supplier must be its own).
    The earlier semi+anti form shuffled THREE lineitem legs on
    l_orderkey; this shape shuffles lineitem ONCE for the orders join
    and the window rides that same partitioning (guide §2.4) — at 100 TB
    that is 3x fewer fact bytes through the exchange, and the per-order
    collect_set is bounded by lines-per-order (7). Verified
    row-identical to the semi/anti form and to the oracle."""
    t = load_tables(spark, sf_dir)
    n = t["nation"].filter(F.col("n_name").isin("NATION_3", "NATION_4"))
    s = (
        t["supplier"]
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    o = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
    joined = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
        ).alias("late"),
    )
    w = Window.partitionBy("l_orderkey")
    flags = joined.select(
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late"),
    )
    sole_late = flags.filter(
        F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    )
    return (
        sole_late.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT c.c_nationkey AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS totacctbal
    FROM customer c
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c.c_acctbal > (
        SELECT CAST(SUM(CAST(ROUND(c2.c_acctbal * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(c2.c_acctbal)
        FROM customer c2
        WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      )
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): country code re-expressed as
    c_nationkey (fixture has no c_phone). Scalar AVG-of-positive subquery
    broadcasts as a 1-row frame; NOT EXISTS is an anti join on custkey
    against orders (sf-proportional — shuffled, not broadcast). Exact-unit
    average so the > comparison is bit-identical cross-engine."""
    t = load_tables(spark, sf_dir)
    codes = [1, 3, 5, 7, 9, 11, 13]
    c = t["customer"].filter(F.col("c_nationkey").isin(codes))
    avg_pos = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((favg("c_acctbal")).alias("__avg"))
    )
    return (
        c.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            fsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# Round 6: the five partsupp-dependent queries (q2/q9/q11/q16/q20) on a
# DERIVED partsupp. The fixture ships no partsupp table, so both engines
# synthesize one deterministically from the same formula: the distinct
# (l_partkey, l_suppkey) pairs of lineitem, with supplycost/availqty derived
# from the keys by pure integer arithmetic (identical % semantics for
# positive ints, identical IEEE division -> bit-identical doubles on both
# sides). At 100 TB the distinct is one map-side-combined shuffle over two
# int columns of the fact table — and in production partsupp would be a real
# table, so these plans never depend on the derivation being cheap.
# ---------------------------------------------------------------------------

_PARTSUPP_CTE = """partsupp AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST((l_partkey * 7 + l_suppkey * 13) % 100000 AS DOUBLE) / 100.0 + 1.0 AS ps_supplycost,
             CAST((l_partkey * 37 + l_suppkey * 11) % 9999 + 1 AS INTEGER) AS ps_availqty
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    )"""


def _partsupp(
    t: dict,
    part_keys: DataFrame | None = None,
    supp_keys: DataFrame | None = None,
    pairs_src: DataFrame | None = None,
) -> DataFrame:
    """Derived partsupp — Spark twin of _PARTSUPP_CTE (same formula).

    ``part_keys`` / ``supp_keys`` (single-column DataFrames) semi-prune the
    pair relation BEFORE the distinct: the pair-distinct is the expensive
    step (a fact-wide shuffle where nearly every pair is unique), and each
    query's own dimension filter bounds which partsupp rows it can use —
    pruning first makes the distinct's shuffle proportional to the
    SURVIVING pairs, which is exactly the partition/DPP pruning a real
    partsupp table would get from the same filter. Results are identical:
    rows outside the key set cannot survive the query's later join.

    ``pairs_src`` (r16): a relation carrying (l_partkey, l_suppkey) to use
    INSTEAD of a fresh lineitem scan — q9 passes its already-pruned cached
    fact projection so both its legs share one scan. Any additional
    pruning the caller needs must already be applied to pairs_src."""
    src = (pairs_src if pairs_src is not None else t["lineitem"]).select(
        "l_partkey", "l_suppkey"
    )
    if part_keys is not None:
        src = src.join(
            part_keys.select(F.col(part_keys.columns[0]).alias("__prune_pk")),
            F.col("l_partkey") == F.col("__prune_pk"),
            "left_semi",
        )
    if supp_keys is not None:
        src = src.join(
            supp_keys.select(F.col(supp_keys.columns[0]).alias("__prune_sk")),
            F.col("l_suppkey") == F.col("__prune_sk"),
            "left_semi",
        )
    pk, sk = F.col("l_partkey"), F.col("l_suppkey")
    return (
        src
        .distinct()
        .select(
            pk.alias("ps_partkey"),
            sk.alias("ps_suppkey"),
            (((pk * 7 + sk * 13) % 100000).cast("double") / 100.0 + 1.0).alias(
                "ps_supplycost"
            ),
            (((pk * 37 + sk * 11) % 9999) + 1).cast("int").alias("ps_availqty"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    europe AS (
      SELECT ps.ps_partkey, ps.ps_supplycost, s.s_acctbal, s.s_name, n.n_name
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    mins AS (
      SELECT ps_partkey, MIN(ps_supplycost) AS min_cost
      FROM europe GROUP BY ps_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name AS nation, p.p_partkey, p.p_brand AS brand
    FROM part p
    JOIN europe e ON e.ps_partkey = p.p_partkey
    JOIN mins m   ON m.ps_partkey = e.ps_partkey AND e.ps_supplycost = m.min_cost
    WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
    ORDER BY e.s_acctbal DESC, nation, e.s_name, p.p_partkey
    LIMIT 100
    """,
    bench=True,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum cost supplier): the correlated MIN subquery is
    re-expressed as a MIN window over ps_partkey plus an equality filter
    (r15 — the earlier group-and-probe-back shape planned the whole
    EU-partsupp subtree TWICE, once under the aggregate and once as the
    probe side, so the pair-distinct fact shuffle and supplier joins ran
    twice per query; the event log showed the two ~530ms lineitem-scan
    jobs running concurrently. min-over-window computes the same rows
    from ONE subtree with a single ps_partkey exchange — guide §2.4:
    an aggregate and its probe keyed the same way need one shuffle).

    Scale shape: nation⋈region broadcast prunes supplier BEFORE the
    partsupp join; the EU-filtered partsupp (a ~1/5 slice) is exchanged
    ONCE on ps_partkey for the window. part carries an sf-proportional
    row count — never hint-broadcast; the selective size/type filter
    pushes to its scan and AQE may still elect broadcast from real
    stats. Top-k via TakeOrderedAndProject. (p_mfgr is absent from the
    fixture schema — p_brand substitutes in the projection; BRASS-type
    LIKE becomes the in-domain equality p_type = 'LARGE'; the size range
    keeps the result set non-trivial on the reduced fixture.)"""
    t = load_tables(spark, sf_dir)
    eu_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    eu_supp = t["supplier"].join(
        F.broadcast(eu_nations), F.col("s_nationkey") == F.col("n_nationkey")
    )
    # EU-supplier semi prune before the pair-distinct (~1/5 survives)
    ps = _partsupp(t, supp_keys=eu_supp.select("s_suppkey"))
    europe = ps.join(eu_supp, ps.ps_suppkey == eu_supp.s_suppkey).select(
        "ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name"
    )
    min_cost = F.min("ps_supplycost").over(Window.partitionBy("ps_partkey"))
    p = t["part"].filter((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
    return (
        europe.withColumn("min_cost", min_cost)
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            F.col("p_brand").alias("brand"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "q9_product_type_profit",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT nation, o_year,
           CAST(SUM(CAST(ROUND(amount * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) - ps.ps_supplycost * l.l_quantity AS amount
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    bench=True,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit): the multi-fact rollup — lineitem
    joined to FIVE dimensions, profit = revenue − supply cost, grouped by
    supplier nation × order year.

    Scale shape: the p_name filter prunes part first and that join prunes
    the fact early (~1/25 of rows survive at spec selectivity); partsupp
    joins on the composite (partkey, suppkey) — co-partitioned with the
    part-pruned fact, no second fact-wide shuffle of unfiltered rows;
    orders joins on orderkey (the one unavoidable big-side shuffle);
    nation broadcasts. Decimal-stable profit sum (order-independent
    across 1000 executors).

    r16: ONE lineitem scan instead of two. The part-pruned fact is
    projected to the six needed columns and eagerly cached; the SAME
    cached relation feeds the revenue leg and the partsupp pair-distinct
    (pairs_src) — before, the _partsupp derivation re-scanned lineitem
    from parquet (2 full fact scans per query; the dual-scan plan is
    plans/r16/q9_product_type_profit_before.txt). The semi join against
    p is multiplicity-identical to the old inner join because p_partkey
    is part's primary key (unique), and the pair set feeding the distinct
    is identical because the old form applied the same part prune via
    part_keys. Eager count() populates the cache before AQE launches the
    racing consumers (r15 finding 2)."""
    from pyspark import StorageLevel

    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_name").like("%red%")).select("p_partkey")
    # ONE narrow part-pruned fact projection shared by both legs
    lp = (
        t["lineitem"]
        .select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
            "l_quantity",
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    lp.count()
    ps = _partsupp(t, pairs_src=lp)
    l = lp.join(
        ps,
        (F.col("l_partkey") == ps.ps_partkey)
        & (F.col("l_suppkey") == ps.ps_suppkey),
    )
    s = t["supplier"].select("s_suppkey", "s_nationkey")
    o = t["orders"].select("o_orderkey", "o_orderdate")
    n = t["nation"].select("n_nationkey", "n_name")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(fsum(amount).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    g AS (
      SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_availqty AS v
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    )
    SELECT ps_partkey,
           CAST(SUM(CAST(ROUND(v * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS value
    FROM g
    GROUP BY ps_partkey
    HAVING CAST(SUM(CAST(ROUND(v * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 > (
      SELECT CAST(SUM(CAST(ROUND(v * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 * 0.001
      FROM g
    )
    ORDER BY value DESC, ps_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): per-part inventory
    value within one nation, kept when above a fraction of the nation's
    total — a grouped agg gated by a scalar aggregate over the SAME input.

    Scale shape: the nation⋈supplier broadcast prunes partsupp map-side
    (~1/25 survives); the per-part groupBy is the only data shuffle; the
    grand total is a 1-row frame crossJoin-broadcast into the HAVING
    filter — the pruned slice is computed once and reused for both
    aggregations (no second scan). Exact-unit sums so the > threshold
    comparison is bit-identical cross-engine."""
    t = load_tables(spark, sf_dir)
    nsupp = t["supplier"].join(
        F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_7")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    # one-nation semi prune before the pair-distinct (~1/25 survives)
    ps = _partsupp(t, supp_keys=nsupp)
    g = ps.join(nsupp, ps.ps_suppkey == F.col("s_suppkey")).select(
        "ps_partkey",
        (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"),
    )
    per_part = g.groupBy("ps_partkey").agg(fsum("v").alias("value"))
    total = g.agg((fsum("v") * 0.001).alias("__thresh"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("__thresh"))
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


@query(
    "q16_parts_supplier_relation",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#4'
      AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_parts_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct-supplier counts
    per (brand, type, size) bucket with a supplier NOT-IN exclusion.
    (The spec's '%Customer%Complaints%' comment filter has no fixture
    column — negative account balance substitutes, same anti-join shape.)

    Scale shape: part filters push to its scan; the excluded-supplier set
    is a tiny filtered slice — broadcast anti join, no shuffle; the
    part⋈partsupp join shuffles on partkey; COUNT(DISTINCT) expands to
    a two-phase agg (partial distinct within the bucket's partitions,
    then final) — no row explosion at scale."""
    t = load_tables(spark, sf_dir)
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "MEDIUM")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    # surviving-part semi prune before the pair-distinct
    ps = _partsupp(t, part_keys=p.select("p_partkey"))
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_potential_promotion",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    qty AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(ROUND(l_quantity * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_name, n.n_name AS nation, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND s.s_suppkey IN (
        SELECT ps.ps_suppkey
        FROM partsupp ps
        JOIN qty ON qty.l_partkey = ps.ps_partkey AND qty.l_suppkey = ps.ps_suppkey
        WHERE ps.ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
          )
          AND ps.ps_availqty > 0.5 * qty.q
      )
    ORDER BY s.s_name
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): the nested semi-join chain —
    suppliers holding surplus stock (availqty > half the year's shipped
    quantity) of promoted parts, within one region. (s_address is absent
    from the fixture — s_acctbal substitutes in the projection.)

    Scale shape: the year-filtered per-(part,supplier) quantity agg and
    the partsupp probe hash on the same composite key — one shuffle each
    side, co-partitioned join; the promoted-part IN prunes partsupp via
    semi join BEFORE the quantity join; the surviving suppkey set is a
    distinct-projected semi probe into the region-filtered supplier
    (broadcast nation/region). Everything above the fact agg is
    dimension-sized."""
    t = load_tables(spark, sf_dir)
    promo = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    # promoted-part semi prune moved INTO the derivation (before the
    # pair-distinct); the surplus chain below keeps its own semi shape
    ps = _partsupp(t, part_keys=promo)
    qty = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(fsum("l_quantity").alias("q"))
    )
    surplus = (
        ps.join(promo, ps.ps_partkey == F.col("p_partkey"), "left_semi")
        .join(
            qty,
            (ps.ps_partkey == qty.l_partkey) & (ps.ps_suppkey == qty.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("q"))
        .select("ps_suppkey")
    )
    eu_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return (
        t["supplier"]
        .join(F.broadcast(eu_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(surplus, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", F.col("n_name").alias("nation"), "s_acctbal")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Round 9: RFM customer segmentation — the classic marketing-analytics
# operator (recency / frequency / monetary quartile scoring) over orders.
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
              (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders)) AS BIGINT)
           AS r_days,
         CAST(COUNT(*) AS BIGINT) AS f_orders,
         round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2)
           AS m_total
  FROM orders GROUP BY o_custkey
),
cuts AS (
  SELECT quantile_cont(r_days, [0.25, 0.5, 0.75]) AS rc,
         quantile_cont(f_orders, [0.25, 0.5, 0.75]) AS fc,
         quantile_cont(m_total, [0.25, 0.5, 0.75]) AS mc
  FROM per_cust
),
scored AS (
  SELECT p.*,
         1 + CAST(p.r_days > rc[1] AS INT) + CAST(p.r_days > rc[2] AS INT)
           + CAST(p.r_days > rc[3] AS INT) AS r_q,
         1 + CAST(p.f_orders > fc[1] AS INT) + CAST(p.f_orders > fc[2] AS INT)
           + CAST(p.f_orders > fc[3] AS INT) AS f_q,
         1 + CAST(p.m_total > mc[1] AS INT) + CAST(p.m_total > mc[2] AS INT)
           + CAST(p.m_total > mc[3] AS INT) AS m_q
  FROM per_cust p CROSS JOIN cuts
)
SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
       CAST(m_q AS BIGINT) AS m_q,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       round(CAST(SUM(CAST(m_total AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 4)
         AS avg_monetary,
       CAST(MIN(o_custkey) AS BIGINT) AS min_cust
FROM scored
GROUP BY r_q, f_q, m_q
"""


@query("orders_rfm_segmentation", oracle=_RFM_ORACLE)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, recency (days since last order,
    relative to the corpus's latest order date), frequency (order count)
    and monetary (decimal-exact total spend), each scored into quartiles
    by comparison against the exact 25/50/75 percentile cut VALUES —
    never a global ntile window, which would force a single-partition
    sort at scale. Output: per-(r,f,m)-segment customer counts and
    average spend.

    Exactness: percentile/quantile_cont interpolate identically in both
    engines (the proven agg_median_percentile mapping); monetary rides the
    decimal-sum recipe so the doubles compared against the cuts are
    bit-identical. 100 TB: per_cust is one map-side-combinable groupBy;
    the cut points are ONE 3-value aggregate row broadcast to the scorer
    (at extreme customer cardinality swap percentile for approx_percentile
    — same plan shape); the segment rollup is 64-cell bounded."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].select("o_custkey", "o_orderdate", "o_totalprice")
    gmax = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("gd"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
            F.count(F.lit(1)).cast("bigint").alias("f_orders"),
            F.round(dsum("o_totalprice").cast("double"), 2).alias("m_total"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "o_custkey",
            F.datediff(F.col("gd"), F.col("last_d")).cast("bigint").alias("r_days"),
            "f_orders",
            "m_total",
        )
    )
    cuts = per_cust.agg(
        F.percentile(F.col("r_days"), F.lit([0.25, 0.5, 0.75])).alias("rc"),
        F.percentile(F.col("f_orders"), F.lit([0.25, 0.5, 0.75])).alias("fc"),
        F.percentile(F.col("m_total"), F.lit([0.25, 0.5, 0.75])).alias("mc"),
    )

    def q(col, cut):
        return (
            F.lit(1)
            + (F.col(col) > F.col(cut)[0]).cast("int")
            + (F.col(col) > F.col(cut)[1]).cast("int")
            + (F.col(col) > F.col(cut)[2]).cast("int")
        )

    scored = per_cust.crossJoin(F.broadcast(cuts)).select(
        "o_custkey",
        "m_total",
        q("r_days", "rc").cast("bigint").alias("r_q"),
        q("f_orders", "fc").cast("bigint").alias("f_q"),
        q("m_total", "mc").cast("bigint").alias("m_q"),
    )
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(davg(F.col("m_total")), 4).alias("avg_monetary"),
        F.min("o_custkey").cast("bigint").alias("min_cust"),
    )
