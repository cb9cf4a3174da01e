"""10x scale check for the exact substring-span dedup plan (Lee et al.).

Replicates the sf0.1 documents table 10x with every token suffixed by the
replica id, so K-gram hashes are FULLY distinct across replicas: each
replica's duplicated-span structure must reproduce the 1x result exactly
(shifted doc ids), the dup-gram set and hit volume scale exactly 10x, and
nothing collapses across replicas. Claims under test:

1. membership/accounting invariance: replica r's per-doc
   (total_tokens, n_spans, dup_tokens) == the 1x run's, for every doc —
   i.e. the plan's answers don't depend on what else is in the corpus
   beyond the docs that actually share spans;
2. same exchange structure at 1x and 10x (no plan degradation);
3. wall grows ~linearly inside the fixed scheduling floor.

Usage: python tools/scale_substring_dedup.py [sf_dir] (default /root/testdata/sf0.1)
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

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    reps = []
    for i in range(copies):
        reps.append(
            d.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
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
    from duckdb_service_spark.plans.textops import substring_dedup_corpus
    from duckdb_service_spark.session import default_parallelism

    corpus = build_corpus(spark, sf_dir, copies).repartition(default_parallelism())
    df = substring_dedup_corpus(corpus)
    t0 = time.perf_counter()
    rows = {r.doc_id: (r.total_tokens, r.n_spans, r.dup_tokens) for r in df.collect()}
    wall = time.perf_counter() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    shapes = sorted(set(re.findall(r"Exchange (\w+)", plan)))
    n = plan.count("Exchange")
    spark.catalog.clearCache()
    return wall, rows, shapes, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from duckdb_service_spark.session import get_spark

    spark = get_spark("scale-substring-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, sf_dir, 1)  # session warm-up (JIT/codegen) — not timed
    w1, r1, s1, n1 = run(spark, sf_dir, 1)
    w10, r10, s10, n10 = run(spark, sf_dir, 10)
    dup1 = sum(v[2] for v in r1.values())
    dup10 = sum(v[2] for v in r10.values())
    print(f"1x : wall={w1:.2f}s docs={len(r1)} dup_tokens={dup1} "
          f"exchange_shapes={s1} exchange_nodes~{n1}")
    print(f"10x: wall={w10:.2f}s docs={len(r10)} dup_tokens={dup10} "
          f"exchange_shapes={s10} exchange_nodes~{n10}")
    print(f"scale factor: input 10x -> wall {w10 / w1:.2f}x, "
          f"dup_tokens {dup10 / max(dup1, 1):.2f}x")
    # claim 1: every replica reproduces the 1x accounting exactly
    ok = all(
        r10.get(d + i * 1_000_000) == v
        for i in range(10)
        for d, v in r1.items()
    )
    print(f"per-replica accounting identical to 1x: {'YES' if ok else 'NO'}")
    print(f"exchange shapes identical: {'YES' if s1 == s10 else 'NO'}")
    assert ok, "replica accounting diverged from 1x run"
    assert dup10 == 10 * dup1, "dup token volume must scale exactly 10x"


if __name__ == "__main__":
    main()
