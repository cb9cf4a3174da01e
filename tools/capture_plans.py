"""Capture .explain('formatted') for bench queries into plans/<round>/.

Usage: python tools/capture_plans.py before|after [name ...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt (round defaults to
r16). CPU-light (no execution).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from duckdb_service_spark.plans import BENCH, QUERIES, load_all
    from duckdb_service_spark.session import get_spark

    load_all()
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[2:] or [n for n in BENCH if n in QUERIES]
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_exch = text.count("Exchange")
        joins = [
            k
            for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
            if k in text
        ]
        print(f"{name}: {n_exch} Exchange, joins={joins} -> {path}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
