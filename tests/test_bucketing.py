"""Scale-pattern tests: bucketed co-located joins (zero-shuffle fact-fact
join) and salted skew joins — the two strategies the session's AQE doesn't
already provide."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_eliminates_shuffle(spark, sf_dir):
    """Write lineitem+orders bucketed by the join key, then join: the plan
    must contain NO shuffle (Exchange) — the pre-bucketing IS the shuffle,
    paid once at write time. This is the recurring-fact-join pattern for
    100 TB (bucket pruning + co-located joins)."""
    from duckdb_service_spark.sources import load_tables

    t = load_tables(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="bucketed_wh_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{wh}'")
    for name, df, key in [
        ("l_b", t["lineitem"].select("l_orderkey", "l_quantity"), "l_orderkey"),
        ("o_b", t["orders"].select("o_orderkey", "o_orderpriority"), "o_orderkey"),
    ]:
        df.write.mode("overwrite").bucketBy(8, key).sortBy(key).saveAsTable(f"bkt.{name}")

    # force the sort-merge path (at the scale this models, neither side is
    # broadcastable); bucketing must then satisfy the join's distribution
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("bkt.l_b")
            .join(spark.table("bkt.o_b"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        joined.collect()
        executed = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    assert "SortMergeJoin" in executed, executed
    # neither join input may be re-shuffled on its key — bucket layout
    # already satisfies hashpartitioning(l_orderkey/o_orderkey, 8)
    assert "Exchange hashpartitioning(l_orderkey" not in executed, executed
    assert "Exchange hashpartitioning(o_orderkey" not in executed, executed
    # sanity: same result as the unbucketed join
    base = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .count()
    )
    assert {(r.o_orderpriority, r.n) for r in joined.collect()} == {
        (r.o_orderpriority, r["count"]) for r in base.collect()
    }


def test_salted_join_correctness(spark, sf_dir):
    """salted_join must produce exactly the rows of the plain join."""
    from duckdb_service_spark.operators.skew import salted_join
    from duckdb_service_spark.sources import load_tables

    t = load_tables(spark, sf_dir)
    # simulate skew: all lineitems of a few orders
    skewed = t["lineitem"].select("l_orderkey", "l_linenumber").withColumn(
        "l_orderkey", F.when(F.col("l_orderkey") % 7 == 0, 1).otherwise(F.col("l_orderkey"))
    )
    other = t["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    plain = skewed.join(other, "l_orderkey").count()
    salted = salted_join(skewed, other, "l_orderkey", salt_factor=4).count()
    assert plain == salted and plain > 0
