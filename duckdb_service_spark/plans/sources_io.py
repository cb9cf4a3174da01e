"""Source/sink operators — SURVEY §2.2a: COPY TO/FROM and the
read_csv_auto / read_json_auto table functions, expressed as lossless
round-trips so they stay oracle-checkable (the oracle reads the ORIGINAL
table; the query must survive write→read unchanged)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_tables
from .registry import query


def _tmp(name: str) -> str:
    d = os.path.join(tempfile.gettempdir(), f"dss_io_{os.getpid()}")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


@query(
    "io_csv_roundtrip",
    oracle="""
    SELECT o_orderstatus AS status, COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders GROUP BY o_orderstatus
    """,
)
def io_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY TO (FORMAT csv) + read_csv_auto: write keys+status as headered
    CSV, read back with schema inference, aggregate. Integer/string columns
    survive CSV losslessly, so the result must equal the direct query."""
    t = load_tables(spark, sf_dir)
    path = _tmp("orders_csv")
    t["orders"].select("o_orderkey", "o_orderstatus").write.mode("overwrite").option(
        "header", "true"
    ).csv(path)
    back = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    return (
        back.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("key_sum"))
    )


@query(
    "io_json_roundtrip",
    oracle="""
    SELECT event_type, COUNT(*) AS n, CAST(SUM(user_id) AS BIGINT) AS user_sum
    FROM events GROUP BY event_type
    """,
)
def io_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY TO (FORMAT json) + read_json_auto equivalent: JSON-lines write,
    schema-inferred read."""
    t = load_tables(spark, sf_dir)
    path = _tmp("events_json")
    t["events"].select("event_id", "user_id", "event_type").write.mode("overwrite").json(path)
    back = spark.read.json(path)
    return (
        back.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("user_sum"))
    )


@query(
    "io_parquet_roundtrip",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n, MIN(l_shipdate) AS first_ship
    FROM lineitem WHERE l_orderkey <= 2000 GROUP BY l_returnflag
    """,
)
def io_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPORT/COPY (FORMAT parquet) + re-read — parquet is the native
    snapshot format (store/store.go:263), lossless for every type."""
    t = load_tables(spark, sf_dir)
    path = _tmp("lineitem_parquet")
    (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 2000)
        .select("l_orderkey", "l_returnflag", "l_shipdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.min("l_shipdate").alias("first_ship")
    )
