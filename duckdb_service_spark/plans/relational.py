"""Projection / filter / predicate / cast / distinct / sampling operators.

SURVEY.md §2.2 b+f rows. Reference capability: SQL passthrough
(db/db.go:67-117); rebuilt as declarative DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.stable import dsum
from ..sources import load_tables
from .registry import query


@query(
    "proj_expressions",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      l_quantity * 2.0                          AS qty_x2,
      l_extendedprice * (1 - l_discount)        AS net_price,
      l_returnflag || '/' || l_linestatus       AS flag_status
    FROM lineitem
    WHERE l_orderkey <= 100
    """,
)
def proj_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with arithmetic, concat, aliases (SELECT-list surface).
    Per-row IEEE double ops are bit-identical across engines (no agg)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_quantity") * 2.0).alias("qty_x2"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
        )
    )


@query(
    "select_exclude_replace",
    oracle="""
    SELECT * EXCLUDE (n_regionkey) REPLACE (lower(n_name) AS n_name)
    FROM nation
    """,
)
def select_exclude_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB dialect SELECT * EXCLUDE/REPLACE → df.drop + withColumn."""
    t = load_tables(spark, sf_dir)
    return t["nation"].drop("n_regionkey").withColumn("n_name", F.lower("n_name"))


@query(
    "filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 40
      AND p_brand IN ('Brand#1', 'Brand#7', 'Brand#13')
      AND p_name LIKE '%a%'
      AND p_type NOT LIKE 'PROMO%'
      AND p_retailprice IS NOT NULL
      AND NOT (p_size = 15 AND p_brand = 'Brand#7')
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE surface: BETWEEN / IN / LIKE / NOT LIKE / IS NOT NULL / boolean
    composition. All pushed to the parquet scan by Catalyst."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(
            F.col("p_size").between(10, 40)
            & F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#13")
            & F.col("p_name").like("%a%")
            & ~F.col("p_type").like("PROMO%")
            & F.col("p_retailprice").isNotNull()
            & ~((F.col("p_size") == 15) & (F.col("p_brand") == "Brand#7"))
        )
        .select("p_partkey", "p_name", "p_brand", "p_size")
    )


@query(
    "filter_ilike",
    oracle="""
    SELECT p_partkey, p_type
    FROM part
    WHERE p_type ILIKE '%medium%'
    """,
)
def filter_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["part"].filter(F.col("p_type").ilike("%medium%")).select("p_partkey", "p_type")


@query(
    "case_coalesce_nullif",
    oracle="""
    SELECT
      CASE WHEN o_totalprice < 50000 THEN 'small'
           WHEN o_totalprice < 200000 THEN 'medium'
           ELSE 'large' END                             AS bucket,
      COUNT(*)                                          AS n,
      COUNT(NULLIF(o_orderstatus, 'O'))                 AS n_not_open,
      CAST(SUM(CAST(COALESCE(NULLIF(o_totalprice, 0.0), -1.0) AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
)
def case_coalesce_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        t["orders"]
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.nullif(F.col("o_orderstatus"), F.lit("O"))).alias("n_not_open"),
            dsum(F.coalesce(F.nullif(F.col("o_totalprice"), F.lit(0.0)), F.lit(-1.0)))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("bucket")
    )


@query(
    "cast_try_cast",
    oracle="""
    SELECT
      event_id,
      CAST(user_id AS VARCHAR)                    AS user_str,
      TRY_CAST(event_type AS INTEGER)             AS bad_int,
      TRY_CAST(SUBSTR(props, 7, 2) AS INTEGER)    AS maybe_k,
      CAST(value AS VARCHAR) IS NOT NULL          AS has_value
    FROM events
    WHERE event_id < 200
    """,
)
def cast_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST / TRY_CAST surface (invalid casts → NULL, never error)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("event_id") < 200)
        .select(
            "event_id",
            F.col("user_id").cast("string").alias("user_str"),
            F.expr("try_cast(event_type AS INT)").alias("bad_int"),
            F.expr("try_cast(substr(props, 7, 2) AS INT)").alias("maybe_k"),
            F.col("value").cast("string").isNotNull().alias("has_value"),
        )
    )


@query(
    "distinct_basic",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["customer"].select("c_mktsegment", "c_nationkey").distinct()


@query(
    "distinct_on_latest_order",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def distinct_on_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB `DISTINCT ON (o_custkey) ... ORDER BY o_orderdate DESC` →
    row_number window rewrite (the documented shim, SURVEY §2.2b). Unique
    tie-break on o_orderkey keeps both engines deterministic."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("orderdate"))
    )


@query(
    "values_relation",
    oracle="""
    SELECT id, name, CAST(score * 10 AS DOUBLE) AS score10
    FROM (VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, 'gamma', NULL))
         AS t(id, name, score)
    """,
)
def values_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES relation (cmd/cli/client.go:104-106 exercises VALUES
    inside INSERT; here as a standalone relation)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT id, name, score * 10 AS score10
        FROM VALUES (1, 'alpha', 1.5D), (2, 'beta', 2.5D), (3, 'gamma', CAST(NULL AS DOUBLE))
             AS t(id, name, score)
        """
    )


@query(
    "range_series",
    oracle="""
    SELECT COUNT(*) AS n, CAST(SUM(r) AS BIGINT) AS total, MIN(r) AS lo, MAX(r) AS hi
    FROM (SELECT unnest(range(1, 1001)) AS r)
    """,
)
def range_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range()/generate_series table function → spark.range."""
    load_tables(spark, sf_dir)
    return spark.range(1, 1001).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("total"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
    )


@query(
    "generate_series_step",
    oracle="""
    SELECT r AS v, r * r AS sq
    FROM (SELECT unnest(generate_series(0, 100, 7)) AS r)
    """,
)
def generate_series_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generate_series with step → sequence() + explode."""
    load_tables(spark, sf_dir)
    return (
        spark.range(1)
        .select(F.explode(F.sequence(F.lit(0), F.lit(100), F.lit(7))).alias("v"))
        .select(F.col("v").cast("long").alias("v"), (F.col("v") * F.col("v")).cast("long").alias("sq"))
    )


@query(
    "sample_deterministic",
    oracle="""
    SELECT COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~12.5% sample via md5 bucketing — the portable stand-in
    for USING SAMPLE (rand()-based sampling can't be oracle-compared; at
    100 TB a hash-bucket sample is also restartable and stable across
    retries, unlike per-task RNG)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").cast("double").alias("total"))
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 20
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET over a total deterministic order (unique tie-break)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(20)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "order_nulls_last",
    oracle="""
    SELECT c_custkey, NULLIF(c_acctbal, 0.0) AS bal
    FROM customer
    WHERE c_custkey <= 50
    ORDER BY bal DESC NULLS LAST, c_custkey
    LIMIT 25
    """,
)
def order_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST ordering — pins the cross-engine default
    divergence (DuckDB NULLS LAST vs Spark NULLS FIRST on ASC, SURVEY
    §2.2f) by always being explicit."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_custkey") <= 50)
        .select("c_custkey", F.nullif(F.col("c_acctbal"), F.lit(0.0)).alias("bal"))
        .orderBy(F.col("bal").desc_nulls_last(), F.col("c_custkey"))
        .limit(25)
    )


@query(
    "subquery_correlated_scalar",
    oracle="""
    SELECT c_custkey,
           (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
           (SELECT MAX(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_price
    FROM customer c
    WHERE c_custkey <= 200
    """,
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries — Catalyst decorrelates into outer
    joins automatically (SURVEY §4: RewriteCorrelatedScalarSubquery);
    exercised through the SQL surface to prove the rewrite path."""
    t = load_tables(spark, sf_dir)
    t.view("customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
               (SELECT MAX(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_price
        FROM customer c
        WHERE c_custkey <= 200
        """
    )


@query(
    "window_named_sql",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           CAST(SUM(CAST(ROUND(o_totalprice * 1e6) AS BIGINT)) OVER w AS BIGINT) AS run_unscaled
    FROM orders
    WHERE o_custkey <= 30
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_named_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause through the SQL surface (both dialects support
    it; the DataFrame twin is a shared Window object, plans/windows.py)."""
    t = load_tables(spark, sf_dir)
    t.view("orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS rn,
               SUM(CAST(ROUND(o_totalprice * 1e6) AS BIGINT)) OVER w AS run_unscaled
        FROM orders
        WHERE o_custkey <= 30
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    )


@query(
    "fn_type_fidelity",
    oracle="""
    SELECT
      n_nationkey,
      CAST(n_nationkey AS TINYINT)                          AS t8,
      CAST(n_nationkey AS SMALLINT)                         AS t16,
      CAST(CAST(n_nationkey AS DECIMAL(38,0)) * 1000000000000 AS VARCHAR) AS huge,
      CAST(CAST(n_nationkey AS DECIMAL(10,3)) AS VARCHAR)   AS dec_str,
      hex(CAST(n_name AS BLOB))                             AS as_blob,
      CAST(CAST('2024-06-01' AS DATE) AS VARCHAR)           AS date_str,
      CAST(n_nationkey = 0 AS INTEGER)                      AS bool_int
    FROM nation
    """,
)
def fn_type_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-lattice edges (SURVEY §1.3): TINYINT/SMALLINT, HUGEINT-scale
    DECIMAL(38,0) arithmetic, decimal→string, string→BLOB, date→string,
    bool→int."""
    t = load_tables(spark, sf_dir)
    k = F.col("n_nationkey")
    return t["nation"].select(
        "n_nationkey",
        k.cast("tinyint").alias("t8"),
        k.cast("smallint").alias("t16"),
        (k.cast("decimal(38,0)") * F.lit(1000000000000)).cast("string").alias("huge"),
        k.cast("decimal(10,3)").cast("string").alias("dec_str"),
        F.hex(F.encode(F.col("n_name"), "utf-8")).alias("as_blob"),
        F.lit("2024-06-01").cast("date").cast("string").alias("date_str"),
        (k == 0).cast("int").alias("bool_int"),
    )


@query(
    "sample_native",
    oracle="""
    WITH src AS (SELECT COUNT(*) AS total, MIN(o_orderkey) AS lo,
                        MAX(o_orderkey) AS hi FROM orders),
    s AS (
      SELECT COUNT(*) AS n, COUNT(DISTINCT o_orderkey) AS nd,
             MIN(o_orderkey) AS smin, MAX(o_orderkey) AS smax
      FROM (SELECT o_orderkey FROM orders USING SAMPLE 10% (bernoulli, 42))
    )
    SELECT
      src.total,
      s.n BETWEEN CAST(0.05 * src.total AS BIGINT)
              AND CAST(0.15 * src.total AS BIGINT)  AS n_in_bounds,
      s.nd = s.n                                    AS no_duplicates,
      s.smin >= src.lo AND s.smax <= src.hi         AS keys_in_range
    FROM src, s
    """,
)
def sample_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Bernoulli sampling: df.sample(fraction, seed) — pushed into
    the scan. The sampled ROWS are engine-specific (per-task RNG streams;
    the oracle-exact stand-in is sample_deterministic's md5 hash-bucket),
    so the driver-checkable relation is the statistical CONTRACT both
    engines' samplers satisfy deterministically for a fixed seed: sample
    size within [0.5f, 1.5f]·N (±5σ at these N), no duplicate rows
    (Bernoulli, not with-replacement), and keys within the source range."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    src = o.agg(
        F.count(F.lit(1)).alias("total"),
        F.min("o_orderkey").alias("lo"),
        F.max("o_orderkey").alias("hi"),
    )
    s = (
        o.sample(fraction=0.1, seed=42)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_orderkey").alias("nd"),
            F.min("o_orderkey").alias("smin"),
            F.max("o_orderkey").alias("smax"),
        )
    )
    return src.crossJoin(s).select(
        "total",
        F.col("n").between(
            (0.05 * F.col("total")).cast("bigint"),
            (0.15 * F.col("total")).cast("bigint"),
        ).alias("n_in_bounds"),
        (F.col("nd") == F.col("n")).alias("no_duplicates"),
        ((F.col("smin") >= F.col("lo")) & (F.col("smax") <= F.col("hi"))).alias(
            "keys_in_range"
        ),
    )
