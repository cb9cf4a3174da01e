"""One-off perf experiment: asof_join carrying strategies at sf0.1.

Variants:
  struct   — current operators.asof.asof_join (payload rides as ONE struct
             through last(ignorenulls) — correct, r02 shape)
  joinback — window carries ONLY the matched right ts (one primitive column);
             payload fetched afterwards by an equi-join on (keys, matched_ts)
             against right deduped on (keys, ts)
  percol   — r01 shape (independent last per payload column; WRONG when a
             matched payload field is NULL — timing reference only)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from duckdb_service_spark.session import get_spark
from duckdb_service_spark.sources import load_tables
from duckdb_service_spark.operators.asof import asof_join

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sides(spark):
    t = load_tables(spark, SF_DIR)
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    return clicks, views


def v_struct(spark) -> DataFrame:
    clicks, views = _sides(spark)
    out = asof_join(clicks, views, on=["user_id"], left_ts="ts", right_ts="ts",
                    right_payload=["value"])
    return out.select("user_id", "ts", "event_id", "asof_ts", F.col("value").alias("view_value"))


def v_joinback(spark) -> DataFrame:
    clicks, views = _sides(spark)
    on = ["user_id"]
    tagged_r = views.select(*on, F.col("ts").alias("__ts"), F.lit(0).alias("__side"),
                            F.lit(None).cast("long").alias("__l_event_id"))
    tagged_l = clicks.select(*on, F.col("ts").alias("__ts"), F.lit(1).alias("__side"),
                             F.col("event_id").alias("__l_event_id"))
    w = (Window.partitionBy(*on).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = tagged_r.unionByName(tagged_l).select(
        *on, "__ts", "__side",
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(w).alias("asof_ts"),
        "__l_event_id",
    )
    matched = carried.filter(F.col("__side") == 1)
    rded = views.groupBy("user_id", "ts").agg(F.last("value").alias("value"))
    out = matched.join(
        rded,
        (matched.user_id == rded.user_id) & (matched.asof_ts == rded.ts),
        "inner",
    ).select(matched.user_id, F.col("__ts").alias("ts"),
             F.col("__l_event_id").alias("event_id"), "asof_ts",
             F.col("value").alias("view_value"))
    return out


def v_percol(spark) -> DataFrame:
    clicks, views = _sides(spark)
    on = ["user_id"]
    tagged_r = views.select(*on, F.col("ts").alias("__ts"), F.lit(0).alias("__side"),
                            F.col("ts").alias("__r_ts"), F.col("value").alias("__r_value"),
                            F.lit(None).cast("long").alias("__l_event_id"))
    tagged_l = clicks.select(*on, F.col("ts").alias("__ts"), F.lit(1).alias("__side"),
                             F.lit(None).cast("timestamp").alias("__r_ts"),
                             F.lit(None).cast("double").alias("__r_value"),
                             F.col("event_id").alias("__l_event_id"))
    w = (Window.partitionBy(*on).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = tagged_r.unionByName(tagged_l).select(
        *on, "__ts", "__side",
        F.last("__r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        F.last("__r_value", ignorenulls=True).over(w).alias("view_value"),
        "__l_event_id",
    )
    return carried.filter(F.col("__side") == 1).select(
        *on, F.col("__ts").alias("ts"), F.col("__l_event_id").alias("event_id"),
        "asof_ts", "view_value")


def main():
    spark = get_spark("perf-asof")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {"struct": v_struct, "joinback": v_joinback, "percol": v_percol}
    counts = {}
    for name, fn in variants.items():
        counts[name] = len(fn(spark).collect())
    print("row counts:", counts)
    for name, fn in variants.items():
        fn(spark).collect()  # warm
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark).collect()
            runs.append(time.perf_counter() - t0)
        print(f"{name:9s} median {statistics.median(runs):.3f}s  runs "
              + " ".join(f"{r:.3f}" for r in runs))


if __name__ == "__main__":
    main()
