"""Quick iteration harness for the three >2x corpus-pipeline bench queries
(VERDICT r08 task 2). Times Spark vs DuckDB interleaved, min-of-N, at
$SPARK_GRAFT_SF_DIR (default sf0.1) — same protocol shape as bench.py but
scoped to the queries under repair so the edit loop is fast."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = sys.argv[1:] or [
    "text_line_dedup",
    "dedup_minhash_lsh",
    "pipeline_corpus_curation",
]
PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import _duck_connect
    from duckdb_service_spark.plans import ORACLES, QUERIES, load_all
    from duckdb_service_spark.session import get_spark

    load_all()
    spark = get_spark("bench-three")
    spark.sparkContext.setLogLevel("ERROR")
    con = _duck_connect(sf_dir)

    def _clear_cache():
        # honest-recompute protocol (bench.py r10): without this, Spark's
        # plan-keyed CacheManager silently substitutes the previous pass's
        # materialized persists and min-of-N measures warm-cache re-reads
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass

    for name in NAMES:  # warm pass
        QUERIES[name](spark, sf_dir).collect()
        _clear_cache()
        if name in ORACLES:
            con.execute(ORACLES[name]).fetchall()

    best_s: dict[str, float] = {}
    best_d: dict[str, float] = {}
    for _ in range(PASSES):
        for name in NAMES:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).collect()
            s = time.perf_counter() - t0
            best_s[name] = min(best_s.get(name, 9e9), s)
            if name in ORACLES:
                t0 = time.perf_counter()
                con.execute(ORACLES[name]).fetchall()
                d = time.perf_counter() - t0
                best_d[name] = min(best_d.get(name, 9e9), d)
            _clear_cache()
    print(f"loadavg={os.getloadavg()[0]:.1f}")
    for name in NAMES:
        s, d = best_s[name], best_d.get(name)
        r = f"{s / d:.2f}x" if d else "-"
        print(f"{name:36s} spark={s:.3f}s duck={d:.3f}s ratio={r}")


if __name__ == "__main__":
    main()
