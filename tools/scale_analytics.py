"""10x + skew harness for the r09 analytics operators (VERDICT r09 task 7):
events_retention_cohorts, events_transition_matrix, events_windowed_funnel,
orders_rfm_segmentation.

The harness materializes a scaled fixture directory (replicated events /
orders with DISJOINT user/customer id spaces, optional skew injections)
and runs the REGISTERED query plans against it unchanged — same code path
the driver checks, no parallel re-implementation to drift.

Laws ASSERTED (not just printed):

1. **Retention cells-not-events**: the output is cohort x offset CELLS.
   10x events via disjoint-user copies of the same stream → IDENTICAL
   cell set, per-cell n_active exactly 10x, retention ratios identical.
   Cell count is bounded by weeks² regardless of event count.
2. **Transition cells law**: output rows <= |types|²; 10x disjoint-user
   copies → identical cell set, per-cell n exactly 10x, probabilities
   identical. A 50k-event mega-user perturbs counts but NEVER the cell
   bound (type x type), because the groupBy runs on cells, not events.
3. **Windowed-funnel mega-user collapse**: a mega-user holding `mega`
   events across all four stages inside the 72h windows adds EXACTLY ONE
   user to every stage count — each stage's relation is
   groupBy(user_id).min(ts), so the bot account collapses to one row per
   stage no matter how many events it fires.
4. **RFM cells law**: output is (r,f,m) quartile cells — at most 4³=64
   rows at ANY customer count. 10x disjoint-customer copies keep the
   cell set identical and the TOTAL customer count exactly 10x; per-cell
   counts drift only at quartile borders (percentile interpolation over
   10n copies lands between different order statistics than over n) —
   the churn is an ABSOLUTE boundary count, so it is asserted as a share
   of the population (<= 0.5%), not of the cell. A mega-customer with
   `mega` orders lands in exactly one cell (+1 customer overall).

Usage: python tools/scale_analytics.py [sf_dir] [mega]
       (defaults /root/testdata/sf0.1, mega=50000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

STAGES = ["signup", "view", "click", "purchase"]
MEGA_USER = 999_999_999


def _fixture_dir(tmp: str, tag: str) -> str:
    d = os.path.join(tmp, tag)
    os.makedirs(d, exist_ok=True)
    return d


def build_events_dir(spark, sf_dir, copies, mega, out_dir) -> str:
    """Scaled events fixture: `copies` disjoint-user replicas, plus an
    optional mega-user firing `mega` events across all funnel stages
    within the 72h windows (so it completes the windowed funnel)."""
    from duckdb_service_spark.sources import load_tables

    ev = load_tables(spark, sf_dir)["events"].select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    out = None
    for i in range(copies):
        rep = ev.select(
            (F.col("event_id") + F.lit(i * 1_000_000_000)).alias("event_id"),
            (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
            "ts",
            "event_type",
            "value",
        )
        out = rep if out is None else out.unionByName(rep)
    if mega:
        base_ts = ev.agg(F.min("ts")).collect()[0][0]
        n_stage = max(mega // len(STAGES), 1)
        mega_rows = None
        for si, stage in enumerate(STAGES):
            # stage events start si*60h after base (inside each 72h window)
            # and repeat every few seconds
            r = spark.range(n_stage).select(
                (F.lit(2_000_000_000) + F.lit(si * n_stage) + F.col("id"))
                .alias("event_id"),
                F.lit(MEGA_USER).cast("long").alias("user_id"),
                (
                    F.lit(base_ts)
                    + F.expr(f"INTERVAL {si * 60} HOURS")
                    + (F.col("id") * F.expr("INTERVAL 1 SECOND"))
                ).cast("timestamp_ntz").alias("ts"),
                F.lit(stage).alias("event_type"),
                F.lit(1.0).alias("value"),
            )
            mega_rows = r if mega_rows is None else mega_rows.unionByName(r)
        out = out.unionByName(mega_rows)
    path = os.path.join(out_dir, "events.parquet")
    out.write.mode("overwrite").parquet(path)
    return out_dir


def build_orders_dir(spark, sf_dir, copies, mega, out_dir) -> str:
    """Scaled orders fixture: `copies` disjoint-customer replicas, plus an
    optional mega-customer holding `mega` orders (uniform price/date)."""
    from duckdb_service_spark.sources import load_tables

    o = load_tables(spark, sf_dir)["orders"]
    cols = o.columns
    out = None
    for i in range(copies):
        rep = o.select(
            *[
                (F.col(c) + F.lit(i * 100_000_000)).alias(c)
                if c in ("o_orderkey", "o_custkey")
                else F.col(c)
                for c in cols
            ]
        )
        out = rep if out is None else out.unionByName(rep)
    if mega:
        gmax = o.agg(F.max(F.col("o_orderdate").cast("date"))).collect()[0][0]
        r = spark.range(mega).select(
            *[
                (F.lit(3_000_000_000) + F.col("id")).alias(c)
                if c == "o_orderkey"
                else F.lit(MEGA_USER).cast("long").alias(c)
                if c == "o_custkey"
                else F.lit(gmax).cast("date").cast("string").alias(c)
                if c == "o_orderdate"
                else F.lit(100.0).cast("decimal(15,2)").alias(c)
                if c == "o_totalprice"
                else F.lit(None).cast(dict(o.dtypes)[c]).alias(c)
                for c in cols
            ]
        )
        # keep o_orderdate's original dtype
        odt = dict(o.dtypes)["o_orderdate"]
        r = r.withColumn("o_orderdate", F.col("o_orderdate").cast(odt))
        out = out.unionByName(r)
    path = os.path.join(out_dir, "orders.parquet")
    out.write.mode("overwrite").parquet(path)
    return out_dir


def rows_map(df, keycols):
    return {
        tuple(r[k] for k in keycols): r
        for r in df.collect()
    }


def main() -> None:
    import tempfile

    from duckdb_service_spark.plans import QUERIES, load_all
    from duckdb_service_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    mega = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    load_all()
    spark = get_spark("scale-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="scale_analytics_")

    retention = QUERIES["events_retention_cohorts"]
    transition = QUERIES["events_transition_matrix"]
    wfunnel = QUERIES["events_windowed_funnel"]
    rfm = QUERIES["orders_rfm_segmentation"]

    # ---- events-based laws (1x vs 10x, no mega) --------------------------
    cells_r, cells_t = {}, {}
    for copies in (1, 10):
        d = build_events_dir(
            spark, sf_dir, copies, 0, _fixture_dir(tmp, f"ev{copies}")
        )
        t0 = time.perf_counter()
        r = rows_map(retention(spark, d), ("cohort_week", "week_offset"))
        rw = time.perf_counter() - t0
        t0 = time.perf_counter()
        tr = rows_map(transition(spark, d), ("prev_type", "next_type"))
        tw = time.perf_counter() - t0
        cells_r[copies], cells_t[copies] = r, tr
        print(
            f"copies={copies}: retention cells={len(r)} wall={rw:.2f}s | "
            f"transition cells={len(tr)} wall={tw:.2f}s"
        )

    # retention law
    assert set(cells_r[1]) == set(cells_r[10]), "retention cell set must be event-count-independent"
    for k, row1 in cells_r[1].items():
        row10 = cells_r[10][k]
        assert row10["n_active"] == 10 * row1["n_active"], (k, row1, row10)
        assert row10["retention"] == row1["retention"], (k, row1, row10)
    n_weeks = len({k[0] for k in cells_r[1]}) + max(
        k[1] for k in cells_r[1]
    )
    assert len(cells_r[1]) <= n_weeks * n_weeks, "cells must be weeks^2-bounded"

    # transition law
    types = {k[0] for k in cells_t[1]} | {k[1] for k in cells_t[1]}
    assert len(cells_t[1]) <= len(types) ** 2
    assert set(cells_t[1]) == set(cells_t[10])
    for k, row1 in cells_t[1].items():
        row10 = cells_t[10][k]
        assert row10["n"] == 10 * row1["n"], (k, row1, row10)
        assert row10["p"] == row1["p"], (k, row1, row10)

    # transition mega-user bound: cells still <= |types|^2
    d_mega = build_events_dir(spark, sf_dir, 1, mega, _fixture_dir(tmp, "evmega"))
    tr_mega = rows_map(transition(spark, d_mega), ("prev_type", "next_type"))
    types_m = {k[0] for k in tr_mega} | {k[1] for k in tr_mega}
    assert len(tr_mega) <= len(types_m) ** 2, (
        f"mega-user must not break the cell bound: {len(tr_mega)}"
    )

    # ---- windowed funnel mega-user collapse ------------------------------
    base = {
        r["stage"]: r["n_users"]
        for r in wfunnel(
            spark, _fixture_dir(tmp, "ev1")
        ).collect()
    }
    with_mega = {
        r["stage"]: r["n_users"] for r in wfunnel(spark, d_mega).collect()
    }
    for s in STAGES:
        assert with_mega[s] == base[s] + 1, (
            f"mega-user must add exactly 1 to windowed stage {s}: "
            f"{with_mega[s]} vs {base[s]}"
        )
    print(
        f"windowed funnel: stages={list(base.values())} -> "
        f"+mega={list(with_mega.values())} (each +1, "
        f"{mega:,} mega events collapsed)"
    )

    # ---- RFM laws ---------------------------------------------------------
    rfm_cells = {}
    for copies in (1, 10):
        d = build_orders_dir(
            spark, sf_dir, copies, 0, _fixture_dir(tmp, f"ord{copies}")
        )
        t0 = time.perf_counter()
        rfm_cells[copies] = rows_map(rfm(spark, d), ("r_q", "f_q", "m_q"))
        print(
            f"copies={copies}: rfm cells={len(rfm_cells[copies])} "
            f"wall={time.perf_counter() - t0:.2f}s"
        )
    assert len(rfm_cells[1]) <= 64 and len(rfm_cells[10]) <= 64
    assert set(rfm_cells[1]) == set(rfm_cells[10]), "RFM cell set must be customer-count-independent"
    total_1x = sum(r["n_customers"] for r in rfm_cells[1].values())
    total_10x = sum(r["n_customers"] for r in rfm_cells[10].values())
    assert total_10x == 10 * total_1x, (total_1x, total_10x)
    for k, row1 in rfm_cells[1].items():
        row10 = rfm_cells[10][k]
        # quartile-border churn only: percentile interpolation over 10n
        # copies lands between different order statistics than over n.
        # The churn is the ABSOLUTE number of customers sitting at a
        # moved boundary — independent of cell size — so bound it as a
        # share of the POPULATION, not of the cell.
        drift = abs(row10["n_customers"] - 10 * row1["n_customers"])
        assert drift <= max(2, 0.005 * total_10x), (k, row1, row10)

    d = build_orders_dir(spark, sf_dir, 1, mega, _fixture_dir(tmp, "ordmega"))
    cells_m = rows_map(rfm(spark, d), ("r_q", "f_q", "m_q"))
    assert len(cells_m) <= 64
    total_1 = sum(r["n_customers"] for r in rfm_cells[1].values())
    total_m = sum(r["n_customers"] for r in cells_m.values())
    assert total_m == total_1 + 1, (
        f"mega-customer must add exactly 1 customer: {total_m} vs {total_1}"
    )
    print(
        f"rfm: {len(rfm_cells[1])} cells; mega-customer ({mega:,} orders) "
        f"adds exactly 1 customer, cells={len(cells_m)}"
    )
    print("ALL ASSERTIONS PASSED")


if __name__ == "__main__":
    main()
