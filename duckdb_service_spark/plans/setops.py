"""Set operations, CTEs, recursive CTE, PIVOT/UNPIVOT — SURVEY §2.2g."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import dsum
from ..operators.recursive import recursive_union
from ..sources import load_tables
from .registry import query


def _seg_nations(t):
    a = t["customer"].select(F.col("c_nationkey").alias("k")).filter(F.col("c_mktsegment") == "BUILDING")
    b = t["supplier"].select(F.col("s_nationkey").alias("k"))
    return a, b


@query(
    "setop_union_all",
    oracle="""
    SELECT k, COUNT(*) AS n FROM (
      SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT s_nationkey AS k FROM supplier
    ) GROUP BY k
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a, b = _seg_nations(t)
    return a.union(b).groupBy("k").agg(F.count(F.lit(1)).alias("n"))


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT s_nationkey AS k FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a, b = _seg_nations(t)
    return a.union(b).distinct()


@query(
    "setop_union_by_name",
    oracle="""
    SELECT n_nationkey AS key, n_name AS name, 'nation' AS src FROM nation
    UNION ALL BY NAME
    SELECT 'region' AS src, r_name AS name, r_regionkey AS key FROM region
    """,
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (ALL) BY NAME — DuckDB dialect → unionByName."""
    t = load_tables(spark, sf_dir)
    a = t["nation"].select(
        F.col("n_nationkey").alias("key"), F.col("n_name").alias("name"), F.lit("nation").alias("src")
    )
    b = t["region"].select(
        F.lit("region").alias("src"), F.col("r_name").alias("name"), F.col("r_regionkey").alias("key")
    )
    return a.unionByName(b)


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a, b = _seg_nations(t)
    return a.intersect(b)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT ALL
    SELECT s_nationkey AS k FROM supplier
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a, b = _seg_nations(t)
    return a.intersectAll(b)


@query(
    "setop_except",
    oracle="""
    SELECT n_nationkey AS k FROM nation
    EXCEPT
    SELECT s_nationkey AS k FROM supplier
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t["nation"].select(F.col("n_nationkey").alias("k"))
    b = t["supplier"].select(F.col("s_nationkey").alias("k"))
    return a.subtract(b)


@query(
    "setop_except_all",
    oracle="""
    SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 100
    EXCEPT ALL
    SELECT s_nationkey AS k FROM supplier
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t["customer"].filter(F.col("c_custkey") <= 100).select(F.col("c_nationkey").alias("k"))
    b = t["supplier"].select(F.col("s_nationkey").alias("k"))
    return a.exceptAll(b)


@query(
    "cte_nested",
    oracle="""
    WITH big_orders AS (
      SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 200000
    ),
    per_cust AS (
      SELECT o_custkey, COUNT(*) AS n, SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS total
      FROM big_orders GROUP BY o_custkey
    )
    SELECT c.c_nationkey, COUNT(*) AS n_cust, CAST(SUM(p.total) AS DOUBLE) AS nation_total
    FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
)
def cte_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested CTEs — DataFrame locals compose the same plan."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 200000).select("o_custkey", "o_totalprice")
    per_cust = big.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )
    return (
        per_cust.join(t["customer"], per_cust.o_custkey == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("total").cast("double").alias("nation_total"))
    )


@query(
    "cte_recursive_series",
    oracle="""
    WITH RECURSIVE t(n) AS (
      SELECT 1
      UNION ALL
      SELECT n * 2 FROM t WHERE n < 512
    )
    SELECT n FROM t
    """,
)
def cte_recursive_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE → operators.recursive.recursive_union fixpoint loop."""
    load_tables(spark, sf_dir)
    seed = spark.range(1, 2).select(F.col("id").cast("int").alias("n"))
    out = recursive_union(
        seed, lambda df: df.filter(F.col("n") < 512).select((F.col("n") * 2).alias("n"))
    )
    return out


@query(
    "cte_recursive_graph",
    oracle="""
    WITH RECURSIVE reach(k, depth) AS (
      SELECT n_nationkey, 0 FROM nation WHERE n_nationkey = 0
      UNION ALL
      SELECT n.n_nationkey, r.depth + 1
      FROM reach r JOIN nation n ON n.n_nationkey = r.k + 5
      WHERE r.depth < 4
    )
    SELECT k, depth FROM reach
    """,
)
def cte_recursive_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive traversal with a join in the step (graph-walk shape)."""
    t = load_tables(spark, sf_dir)
    n = t["nation"]
    seed = (
        n.filter(F.col("n_nationkey") == 0)
        .select(F.col("n_nationkey").alias("k"))
        .withColumn("depth", F.lit(0))
    )

    def step(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.col("depth") < 4)
            .join(n, n.n_nationkey == df.k + 5)
            .select(F.col("n_nationkey").alias("k"), (F.col("depth") + 1).alias("depth"))
        )

    return recursive_union(seed, step)


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT
      o_orderpriority AS priority,
      COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_n,
      COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
      COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT → groupBy().pivot(values).agg; oracle expressed as the
    equivalent FILTER aggregation (same result relation)."""
    t = load_tables(spark, sf_dir)
    out = (
        t["orders"]
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return (
        out.select(
            "priority",
            F.coalesce("F", F.lit(0)).alias("f_n"),
            F.coalesce("O", F.lit(0)).alias("o_n"),
            F.coalesce("P", F.lit(0)).alias("p_n"),
        )
    )


@query(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, kind, val
    FROM (
      SELECT p_partkey, CAST(p_size AS DOUBLE) AS size_v, p_retailprice AS price_v
      FROM part WHERE p_partkey <= 100
    )
    UNPIVOT (val FOR kind IN (size_v AS 'size', price_v AS 'price'))
    """,
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt → DataFrame.unpivot (Spark 3.4+)."""
    t = load_tables(spark, sf_dir)
    base = (
        t["part"]
        .filter(F.col("p_partkey") <= 100)
        .select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("price"),
        )
    )
    return base.unpivot("p_partkey", ["size", "price"], "kind", "val")
