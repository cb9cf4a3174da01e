"""Per-query breakdown: plan-build (Python+analysis) vs execute (collect).

Usage: python tools/profile_breakdown.py [name ...]
Runs each bench query twice (warm), reports build/exec seconds and job count.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from duckdb_service_spark.plans import BENCH, QUERIES, load_all
    from duckdb_service_spark.session import get_spark

    load_all()
    spark = get_spark("profile-breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or [n for n in BENCH if n in QUERIES]
    tracker = spark.sparkContext.statusTracker()

    # warm pass
    for name in names:
        QUERIES[name](spark, sf_dir).collect()
        spark.catalog.clearCache()

    print(f"{'query':32s} {'build':>7s} {'exec':>7s} {'total':>7s} {'jobs':>5s}")
    for name in names:
        jobs0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.collect()
        t2 = time.perf_counter()
        jobs1 = len(tracker.getJobIdsForGroup(None) or [])
        print(
            f"{name:32s} {t1 - t0:7.3f} {t2 - t1:7.3f} {t2 - t0:7.3f} "
            f"{jobs1 - jobs0:5d}"
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
