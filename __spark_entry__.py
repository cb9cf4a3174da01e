"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over duckdb_service_spark.plans: the registry maps every
implemented operator from SURVEY.md §2 to a (PySpark plan, DuckDB oracle SQL)
pair. See duckdb_service_spark/plans/registry.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from duckdb_service_spark.plans import ORACLES, QUERIES, load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    load_all()
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
