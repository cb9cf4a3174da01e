"""Benchmark harness — times headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. The driver records this per-round as
BENCH_r{N}.json and compares against BASELINE.md (within 2x of DuckDB
wall-clock on the same query set at the same sf).

Methodology: one warm-up execution per query (to exclude one-off JVM/codegen
and parquet footer reads — the reference's `took` field likewise measures
per-request execution, not process startup, http/service.go:241), then the
median of 5 timed runs, each fully materializing the result via a collect.
(5, not 3: SCALING.md's round-5 variance measurement saw ±40% run-to-run on
sub-second queries from machine load alone; the median of 5 discards two
outliers instead of one.)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _materialize(df):
    # collect() on the final (small) result mirrors what the service layer
    # does before JSON serialization; all heavy work happens distributed.
    return df.collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from duckdb_service_spark.plans import BENCH, QUERIES, load_all
    from duckdb_service_spark.session import get_spark

    load_all()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in BENCH if n in QUERIES]
    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        _materialize(fn(spark, sf_dir))  # warm-up
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            _materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)

    # DuckDB wall-clock on the same queries' oracle SQL at the same sf, so
    # the spark/duck ratio is tracked automatically per round.
    oracle_timings = _oracle_timings(sf_dir, names)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    total = round(sum(timings.values()), 4)
    oracle_total = round(sum(oracle_timings.values()), 4) if oracle_timings else None
    print(
        json.dumps(
            {
                "metric": "headline-query wall-clock (median of 3, warm)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "oracle_duckdb_sec": oracle_total,
                "oracle_queries": oracle_timings,
                "spark_over_duckdb": (
                    round(total / oracle_total, 3) if oracle_total else None
                ),
            }
        )
    )


def _oracle_timings(sf_dir: str, names: list[str]) -> dict[str, float]:
    """Median-of-3 warm DuckDB timings for each bench query's oracle SQL."""
    try:
        import duckdb
    except ImportError:
        return {}
    from duckdb_service_spark.plans import ORACLES
    from duckdb_service_spark.sources import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    out: dict[str, float] = {}
    for name in names:
        sql = ORACLES.get(name)
        if sql is None:
            continue
        try:
            con.execute(sql).fetchall()  # warm-up
            runs = []
            for _ in range(5):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                runs.append(time.perf_counter() - t0)
            out[name] = round(statistics.median(runs), 4)
        except Exception:  # noqa: BLE001 — oracle timing is informational
            continue
    return out


if __name__ == "__main__":
    main()
