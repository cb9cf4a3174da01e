"""10x + skew harness for the r08 event operators (VERDICT r08 task 8):
events_funnel_conversion and events_gapfill_locf.

Laws under test, ASSERTED (not just printed), at 1x and 10x events with a
deliberately skewed mega-user (one user holding `mega` events across all
funnel stages — the "bot account" every real event stream has):

1. **Funnel per-stage scan bound**: the per-stage persists bound the
   event-source scan count at ONE per stage — counted from the executed
   physical plan (the uncached r08 plan re-scanned events 11x for 4
   stages). Holds at 10x and with the mega-user.
2. **Funnel skew correctness**: each stage's relation is
   groupBy(user_id).min(ts) — the mega-user collapses to ONE row per
   stage regardless of their event count; asserted by diffing stage
   counts with/without the mega-user (each stage grows by exactly 1).
3. **Gapfill grid law**: the LOCF window and gap join run on BUCKET
   cardinality (types x hours), never on events — asserted by checking
   output rows == n_types * n_hours at 1x and 10x (same time range:
   10x more events, IDENTICAL grid), and that a sparse far-future
   mega-user event grows the grid by HOURS, not by events.

Usage: python tools/scale_events.py [sf_dir] [mega]
       (defaults /root/testdata/sf0.1, mega=50000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

STAGES = ["signup", "view", "click", "purchase"]


def build_events(spark, sf_dir: str, copies: int, mega: int, out_dir: str):
    """Replicated events with disjoint user spaces (+ optional mega-user),
    written to ONE parquet so scan counts in the plan are meaningful."""
    from duckdb_service_spark.sources import load_tables

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_type", "value"
    )
    reps = [
        ev.select(
            (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
            "ts",
            "event_type",
            "value",
        )
        for i in range(copies)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    if mega:
        n_stage = mega // len(STAGES)
        mega_rows = (
            spark.range(n_stage)
            .select(
                F.lit(999_999_999).cast("long").alias("user_id"),
                F.explode(
                    F.array(*[
                        F.struct(
                            # stage i's events strictly after stage i-1's
                            # earliest: minute offset i*100000 + id
                            (
                                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                                + F.make_interval(
                                    F.lit(0), F.lit(0), F.lit(0), F.lit(0),
                                    F.lit(0),
                                    F.lit(i * 100_000) + F.col("id").cast("int"),
                                    F.lit(0),
                                )
                            ).alias("ts"),
                            F.lit(s).alias("event_type"),
                        )
                        for i, s in enumerate(STAGES)
                    ])
                ).alias("e"),
            )
            .select(
                "user_id", "e.ts", "e.event_type", F.lit(1.0).alias("value")
            )
        )
        out = out.unionByName(mega_rows)
    out.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)


def scan_count(df) -> int:
    """Formatted-explain scan count — the same counting the plan-quality
    test pins (numbered operator nodes only; the raw plan string expands
    every InMemoryRelation's child subtree and overcounts wildly)."""
    import re

    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    return len(re.findall(r"\(\d+\) Scan parquet", plan))


def main() -> None:
    import tempfile

    from duckdb_service_spark.plans.streams_batch import (
        funnel_conversion,
        gapfill_locf,
    )
    from duckdb_service_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    mega = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark("scale-events")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="scale_events_")

    grid_rows: dict[int, int] = {}
    for copies in (1, 10):
        ev = build_events(
            spark, sf_dir, copies, mega, os.path.join(tmp, f"ev{copies}")
        )
        n_events = ev.count()

        # --- funnel: scan bound + skew correctness -----------------------
        t0 = time.perf_counter()
        fdf = funnel_conversion(ev.select("user_id", "ts", "event_type"))
        rows = {r["stage"]: r["n_users"] for r in fdf.collect()}
        f_wall = time.perf_counter() - t0
        scans = scan_count(fdf)
        assert scans <= len(STAGES), (
            f"funnel executed plan scans events {scans}x (> {len(STAGES)})"
        )
        base = funnel_conversion(
            ev.filter(F.col("user_id") != 999_999_999).select(
                "user_id", "ts", "event_type"
            )
        )
        rows_nomega = {r["stage"]: r["n_users"] for r in base.collect()}
        for s in STAGES:
            assert rows[s] == rows_nomega[s] + 1, (
                f"mega-user must add exactly 1 to stage {s}: "
                f"{rows[s]} vs {rows_nomega[s]}"
            )

        # --- gapfill: grid law -------------------------------------------
        t0 = time.perf_counter()
        gdf = gapfill_locf(ev.select("event_type", "ts", "value"))
        n_out = gdf.count()
        g_wall = time.perf_counter() - t0
        agg = ev.agg(
            F.countDistinct("event_type").alias("nt"),
            F.min(F.date_trunc("hour", "ts")).alias("lo"),
            F.max(F.date_trunc("hour", "ts")).alias("hi"),
        ).collect()[0]
        n_hours = int(
            (agg["hi"] - agg["lo"]).total_seconds() // 3600
        ) + 1
        assert n_out == agg["nt"] * n_hours, (
            f"gapfill output {n_out} != types({agg['nt']}) x hours({n_hours})"
        )
        grid_rows[copies] = n_out

        print(
            f"copies={copies} mega={mega}: events={n_events:,} "
            f"funnel scans={scans} (<= {len(STAGES)}) "
            f"stages={[rows[s] for s in STAGES]} wall={f_wall:.2f}s | "
            f"gapfill out={n_out:,} = {agg['nt']} types x {n_hours} hours "
            f"wall={g_wall:.2f}s"
        )

    # 10x more events, same time range -> IDENTICAL grid cardinality
    assert grid_rows[1] == grid_rows[10], (
        f"grid must be event-count-independent: {grid_rows}"
    )
    print("ALL ASSERTIONS PASSED")


if __name__ == "__main__":
    main()
