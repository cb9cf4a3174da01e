"""SemDeDup K-scaling experiment (round 7).

SemDeDup's candidate cost is sum(|cluster|^2): with K fixed, a 10x corpus
makes clusters 10x and the pair space 100x — the published method scales K
WITH the corpus (K ~ n / target-cluster-size) to keep per-cluster work
bounded. This harness measures exactly that trade on the real pipeline:

  (1x corpus,  K=8)   — baseline
  (10x corpus, K=8)   — WRONG K: pair space ~100x the baseline
  (10x corpus, K=80)  — published rule: pair space ~10x the baseline

Usage: python tools/scale_semdedup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, sf_dir: str, copies: int):
    from duckdb_service_spark.sources import load_tables

    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    reps = []
    for i in range(copies):
        # deterministic per-replica rotation of the id space + a small
        # per-replica offset so replicas cluster like fresh data
        reps.append(
            e.select(
                (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
                F.transform(
                    "v", lambda x, j: x + ((j + 1 + i) % 5 - 2) * 0.003 * i
                ).alias("v"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def run(spark, corpus, k: int):
    from duckdb_service_spark.plans.similarity import kmeans_assign

    assign = kmeans_assign(corpus, k=k).select("vec_id", "cluster")
    sizes = assign.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    t0 = time.perf_counter()
    row = sizes.agg(
        F.sum("n").alias("n_vec"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("bigint").alias("n_pairs"),
        F.max("n").alias("max_cluster"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    return row.n_vec, row.n_pairs, row.max_cluster, wall


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from duckdb_service_spark.session import get_spark

    spark = get_spark("scale-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"loadavg {os.getloadavg()}")
    c1 = build_corpus(spark, sf_dir, 1)
    c10 = build_corpus(spark, sf_dir, 10)
    run(spark, c1, 8)  # warm
    n1, p1, m1, w1 = run(spark, c1, 8)
    n10a, p10a, m10a, w10a = run(spark, c10, 8)
    n10b, p10b, m10b, w10b = run(spark, c10, 80)
    print(f"1x  K=8 : vectors {n1:>7}  pair-space {p1:>12}  max-cluster {m1}  ({w1:.2f}s)")
    print(f"10x K=8 : vectors {n10a:>7}  pair-space {p10a:>12}  max-cluster {m10a}  ({w10a:.2f}s)")
    print(f"10x K=80: vectors {n10b:>7}  pair-space {p10b:>12}  max-cluster {m10b}  ({w10b:.2f}s)")
    print(f"pair-space growth at fixed K: {p10a / p1:.1f}x (quadratic blowup)")
    print(f"pair-space growth with K~n : {p10b / p1:.1f}x (the published rule)")
    assert p10a / p1 > 20, "fixed-K blowup should be near-quadratic"
    assert p10b / p1 < p10a / p1 / 2, "scaling K must shrink the pair space"

    # r10 (VERDICT r09 task 3): K ∝ n crosses _KMEANS_LITERAL_MAX at
    # n ≈ 256 * target-cluster-size — past it kmeans_assign delivers the
    # SAME centroid structs through a single-row broadcast relation
    # instead of a literal plan. Assert the crossover at the law's scale:
    # both forms bit-identical on the 10x corpus at K=80, and the
    # projected K at 1000x (K=8 * 1000 = 8000) lands on the broadcast
    # side of the threshold.
    from duckdb_service_spark.plans import similarity as S

    lit_max = S._KMEANS_LITERAL_MAX
    rows_lit = sorted(
        (r.vec_id, r.cluster) for r in S.kmeans_assign(c10, 80).collect()
    )
    try:
        S._KMEANS_LITERAL_MAX = 0  # force the broadcast form
        rows_bc = sorted(
            (r.vec_id, r.cluster) for r in S.kmeans_assign(c10, 80).collect()
        )
    finally:
        S._KMEANS_LITERAL_MAX = lit_max
    assert rows_lit == rows_bc, "broadcast/literal centroid forms diverged"
    assert 8 * 1000 > lit_max, (
        "K ∝ n at 1000x exceeds the literal-plan bound — the auto-switch "
        "is the form that runs there"
    )
    print(
        f"kmeans crossover: literal for K <= {lit_max}, broadcast beyond; "
        f"forms identical at K=80 on the 10x corpus ({len(rows_lit)} rows)"
    )
    print("PASS")


if __name__ == "__main__":
    main()
