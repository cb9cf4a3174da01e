"""Physical-plan assertions: the scale-critical optimizations must actually
appear in the executed plan, not just be intended. `.explain("formatted")`
output is machine-checked for parquet predicate pushdown, column pruning,
broadcast joins on dim tables, and whole-stage codegen coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    from duckdb_service_spark.sources import load_tables

    t = load_tables(spark, sf_dir)
    df = t["part"].filter(F.col("p_size") > 20).select("p_partkey", "p_size")
    plan = _plan(df)
    assert "PushedFilters:" in plan
    assert "GreaterThan(p_size,20)" in plan, plan


def test_column_pruning(spark, sf_dir):
    from duckdb_service_spark.sources import load_tables

    t = load_tables(spark, sf_dir)
    df = t["lineitem"].select("l_orderkey", "l_quantity")
    plan = _plan(df)
    # ReadSchema must not include unprojected columns like l_comment-ish ones
    assert "l_extendedprice" not in plan.split("ReadSchema")[1].split("\n")[0]


def _plan_no_auto_broadcast(spark, sf_dir, name):
    """Plan with size-based broadcast disabled, so any BroadcastHashJoin
    left is hint-driven — the thing that must never target an
    sf-proportional side (it would OOM executors at 100 TB)."""
    from duckdb_service_spark.plans import QUERIES, load_all

    load_all()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        return _plan(QUERIES[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q3_no_hinted_broadcast_of_big_sides(spark, sf_dir):
    # q3's filtered orders and segment-filtered customer are both
    # sf-proportional: no broadcast hint is allowed anywhere in the query
    plan = _plan_no_auto_broadcast(spark, sf_dir, "q3_shipping_priority")
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan


def test_q5_broadcasts_only_small_dims(spark, sf_dir):
    # region/nation/supplier chain is hint-broadcast (bounded); the
    # customer⋈orders join must stay a shuffle join
    plan = _plan_no_auto_broadcast(spark, sf_dir, "q5_local_supplier_volume")
    assert "SortMergeJoin" in plan
    # broadcasts present (the supplier-chain hints)…
    assert "BroadcastHashJoin" in plan
    # …but lineitem/orders/customer never sit under a BroadcastExchange
    for section in plan.split("BroadcastExchange")[1:]:
        subtree_head = section.split("\n\n")[0]
        assert "lineitem" not in subtree_head
        assert "orders" not in subtree_head
        assert "customer.parquet" not in subtree_head


def test_q18_no_hinted_broadcast(spark, sf_dir):
    plan = _plan_no_auto_broadcast(spark, sf_dir, "q18_large_volume_customer")
    assert "BroadcastHashJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan


def test_q1_single_shuffle(spark, sf_dir):
    from duckdb_service_spark.plans import QUERIES, load_all

    load_all()
    plan = _plan(QUERIES["q1_pricing_summary"](spark, sf_dir))
    # partial+final hash aggregate with exactly one exchange between them
    # (plus the final orderBy's range exchange) — count actual shuffle nodes
    assert plan.count("Arguments: hashpartitioning") <= 1, plan
    assert "HashAggregate" in plan
    assert "partial_sum" in plan, "map-side partial aggregation missing"


def test_wholestage_codegen_covers_hot_path(spark, sf_dir):
    from duckdb_service_spark.plans import QUERIES, load_all

    load_all()
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    df.collect()  # AQE finalizes the physical plan on execution
    executed = df._jdf.queryExecution().executedPlan().toString()
    # "*(n)" markers = whole-stage-codegen'd operators
    assert "*(" in executed, executed


def test_semi_join_physical(spark, sf_dir):
    from duckdb_service_spark.plans import QUERIES, load_all

    load_all()
    plan = _plan(QUERIES["join_semi_exists"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    from duckdb_service_spark.plans import QUERIES, load_all

    load_all()
    plan = _plan(QUERIES["q3_shipping_priority"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "ORDER BY+LIMIT should not global-sort"
