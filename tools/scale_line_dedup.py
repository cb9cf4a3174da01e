"""10x scale check for the line-level (chunk) dedup plan.

Replicates the sf0.1 documents table 10x — every token suffixed with the
replica id, so chunk hashes are FULLY distinct across replicas (boilerplate
frequency and removal work scale 10x; nothing collapses across replicas) —
then runs the IDENTICAL line_dedup_corpus plan the registry/bench query
runs, at 1x and 10x, and compares walls + exchange shapes. Claim under
test: 10x input -> same exchange structure, roughly linear data-stage cost
inside the fixed scheduling floor.

Usage: python tools/scale_line_dedup.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, sf_dir: str, copies: int):
    from duckdb_service_spark.sources import load_tables

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "lang", "text")
    reps = []
    for i in range(copies):
        reps.append(
            d.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                "lang",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "), lambda x: F.concat(x, F.lit(f"r{i}"))
                    ),
                    " ",
                ).alias("text"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def run(spark, sf_dir: str, copies: int):
    from duckdb_service_spark.plans.textops import line_dedup_corpus
    from duckdb_service_spark.session import default_parallelism

    corpus = build_corpus(spark, sf_dir, copies).repartition(default_parallelism())
    df = line_dedup_corpus(corpus)
    t0 = time.perf_counter()
    rows = df.count()
    wall = time.perf_counter() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    shapes = sorted(set(re.findall(r"Exchange (\w+)", plan)))
    n = plan.count("Exchange")
    spark.catalog.clearCache()
    return wall, rows, shapes, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from duckdb_service_spark.session import get_spark

    spark = get_spark("scale-line-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, sf_dir, 1)  # session warm-up (JIT/codegen) — not timed
    w1, r1, s1, n1 = run(spark, sf_dir, 1)
    w10, r10, s10, n10 = run(spark, sf_dir, 10)
    print(f"1x : wall={w1:.2f}s rows={r1} exchange_shapes={s1} exchange_nodes~{n1}")
    print(f"10x: wall={w10:.2f}s rows={r10} exchange_shapes={s10} exchange_nodes~{n10}")
    print(f"scale factor: input 10x -> wall {w10 / w1:.2f}x")
    print(f"exchange shapes identical: {'YES' if s1 == s10 else 'NO'}")


if __name__ == "__main__":
    main()
