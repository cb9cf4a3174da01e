"""10x scale check for the curation pipeline (VERDICT r05 next #9).

Replicates the sf0.1 documents table 10x — each replica gets a distinct
doc_id range and per-replica salt tokens so exact dedup cannot collapse
the copies and cross-replica Jaccard stays below the near-dup cut — then
runs the IDENTICAL curate_corpus plan the bench query runs, at 1x and at
10x, and prints walls plus an exchange-shape comparison of the two
physical plans. The claim under test: the LSH/persist topology holds when
the corpus no longer fits a couple of partitions — 10x input must mean
the SAME exchange structure (no new shuffle shapes), not a re-planned
pipeline.

Usage: python tools/scale_curation.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, sf_dir: str, copies: int):
    """copies x the documents table, each replica made FULLY distinct by
    suffixing every token with the replica id (zero cross-replica shingle
    overlap — the survivors really are ~copies x), and each replica given
    the same near-dup twin the bench query constructs, so per-replica
    near-dup work also scales copies x."""
    from duckdb_service_spark.sources import load_tables

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "lang", "text")
    reps = []
    for i in range(copies):
        tagged = d.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            "lang",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "), lambda x: F.concat(x, F.lit(f"r{i}"))
                ),
                " ",
            ).alias("text"),
        )
        reps.append(tagged)
        reps.append(
            tagged.select(
                (F.col("doc_id") + 500_000).alias("doc_id"),
                "lang",
                F.concat("text", F.lit(" zq yq xq")).alias("text"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def exchange_shapes(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    shapes = re.findall(r"Exchange (\w+)", plan)
    return sorted(set(shapes)), plan


def run(spark, sf_dir: str, copies: int):
    from duckdb_service_spark.plans.pipeline_curation import curate_corpus

    corpus = build_corpus(spark, sf_dir, copies)
    df = curate_corpus(corpus)
    t0 = time.perf_counter()
    rows = df.collect()
    wall = time.perf_counter() - t0
    shapes, plan = exchange_shapes(df)
    n_exchanges = plan.count("Exchange")
    spark.catalog.clearCache()
    return wall, rows, shapes, n_exchanges


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from duckdb_service_spark.session import get_spark

    spark = get_spark("scale-curation")
    spark.sparkContext.setLogLevel("ERROR")

    w1, rows1, shapes1, n1 = run(spark, sf_dir, 1)
    w10, rows10, shapes10, n10 = run(spark, sf_dir, 10)
    print(f"1x : wall={w1:.2f}s rows={sum(r.n_docs for r in rows1)} docs "
          f"exchange_shapes={shapes1} exchange_nodes~{n1}")
    print(f"10x: wall={w10:.2f}s rows={sum(r.n_docs for r in rows10)} docs "
          f"exchange_shapes={shapes10} exchange_nodes~{n10}")
    print(f"scale factor: input 10x -> wall {w10 / w1:.2f}x")
    same = set(shapes10) <= set(shapes1) | {"SinglePartition"}
    print("exchange shapes identical:" , "YES" if shapes1 == shapes10 else ("SUBSET" if same else "NO"))


if __name__ == "__main__":
    main()
