"""10x scale + recall harness for the ANN family (VERDICT r07 task 7).

The three ANN searches (sim_lsh_topk / sim_ivf_search / sim_pq_search) are
oracle-EXACT at fixture scale; this harness measures the property that
matters at 100 TB — per-query PROBE COST is governed by bucket/cell
occupancy, which the index parameters control, NOT by the corpus size n:

  LSH law:  candidates/query ~= n_tables * n / 2^planes_per_table.
            With fixed planes, 10x corpus -> ~10x candidates (measured &
            asserted); RE-TUNING planes to match the corpus (+2 planes =
            4x more buckets at 10x data) pulls the per-query probe cost
            back toward the 1x level (asserted) — the planes knob, not n,
            bounds probe cost.
  IVF law:  probed-cell size ~= n / K. Fixed K at 10x corpus -> ~10x probe
            cost (asserted); K proportional to n keeps the probed cell
            ~constant (asserted) — the same K-scaling rule measured for
            SemDeDup in tools/scale_semdedup.py.

Recall@10 vs exact brute force on the SAME corpus is reported for every
configuration (ground truth recomputed per corpus — the replicas change
every query's true neighbor set, so recall is never compared across
corpora, only within).

Usage: python tools/scale_ann.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_QUERIES = 20
K = 10


def build_corpus(spark, sf_dir: str, copies: int):
    """(vec_id, embedding) replicated `copies`x. Replica i>0 gets new ids
    (+i*1e6) and a deterministic per-replica, per-dimension perturbation so
    replicas are near but not identical to their originals (realistic
    near-duplicate mass: each query's true top-10 changes with n)."""
    from duckdb_service_spark.sources import load_tables

    e = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
    reps = [e]
    for i in range(1, copies):
        reps.append(
            e.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, j: x
                    + F.lit(0.05) * F.sin(j.cast("double") * F.lit(float(i))),
                ).alias("embedding"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def _queries(corpus):
    return corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )


def _topk(scored):
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "neighbor_id")
    )


def brute_force(corpus, queries):
    from duckdb_service_spark.operators.similarity import cosine

    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    return _topk(scored)


def _recall(got_pairs, truth_pairs):
    t = {}
    for q, n in truth_pairs:
        t.setdefault(q, set()).add(n)
    g = {}
    for q, n in got_pairs:
        g.setdefault(q, set()).add(n)
    per_q = [len(g.get(q, set()) & t[q]) / len(t[q]) for q in t]
    return sum(per_q) / len(per_q)


def _buckets_expr(vec_col: str, n_tables: int, planes_per_table: int):
    """lsh_table_buckets generalized to arbitrary (tables, planes) — same
    deterministic _w hyperplanes, so n_tables*planes_per_table may exceed
    the module's precomputed PLANES list."""
    from duckdb_service_spark.operators.similarity import DIM, _w, dot

    entries = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("bigint")
        for j in range(planes_per_table):
            plane_idx = t * planes_per_table + j
            plane = F.array(*[F.lit(float(_w(plane_idx, i))) for i in range(DIM)])
            bucket = bucket + F.when(
                dot(plane, F.col(vec_col)) > 0, F.lit(1 << j).cast("bigint")
            ).otherwise(0)
        entries.append(F.struct(F.lit(t).alias("table_id"), bucket.alias("bucket")))
    return F.array(*entries)


def lsh_search(corpus, queries, n_tables: int, planes_per_table: int):
    """Returns (topk_df, mean_candidates_per_query)."""
    from duckdb_service_spark.operators.similarity import cosine

    b = corpus.select(
        "vec_id",
        "embedding",
        F.explode(_buckets_expr("embedding", n_tables, planes_per_table)).alias("tb"),
    ).select("vec_id", "embedding", F.col("tb.table_id"), F.col("tb.bucket"))
    qb = b.join(queries, b.vec_id == F.col("query_id")).select(
        "query_id", "qv", "table_id", "bucket"
    )
    cand = (
        b.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", "vec_id", "embedding")
        .distinct()
    )
    n_cand = cand.groupBy("query_id").count().agg(F.avg("count")).collect()[0][0]
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("embedding")), 6).alias("cos_sim"),
    )
    return _topk(scored), float(n_cand or 0.0)


def ivf_search(corpus, queries, k_cells: int):
    """IVF over deterministic k-means cells (kmeans_assign — the shared
    engine core): assign corpus + queries to cells, probe only the query's
    cell. Returns (topk_df, mean_probed_cell_size)."""
    from duckdb_service_spark.operators.similarity import cosine
    from duckdb_service_spark.plans.similarity import kmeans_assign

    vecs = corpus.select("vec_id", F.col("embedding").alias("v"))
    assign = kmeans_assign(vecs, k=k_cells).select("vec_id", "cluster")
    c = corpus.join(assign, "vec_id")
    qa = queries.join(
        assign.withColumnRenamed("vec_id", "query_id"), "query_id"
    )
    cell_sizes = c.groupBy("cluster").count()
    probed = (
        qa.join(cell_sizes, "cluster").agg(F.avg("count")).collect()[0][0]
    )
    cand = c.join(F.broadcast(qa.select("query_id", "qv", "cluster")), "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("embedding")), 6).alias("cos_sim"),
    )
    return _topk(scored), float(probed or 0.0)


def run_config(name, corpus, queries, truth, fn):
    t0 = time.perf_counter()
    topk, probe = fn(corpus, queries)
    pairs = [(r[0], r[1]) for r in topk.collect()]
    wall = time.perf_counter() - t0
    rec = _recall(pairs, truth)
    print(
        f"{name:34s} recall@{K} {rec:6.3f}  probe/query {probe:10.1f}  "
        f"wall {wall:6.2f}s"
    )
    return rec, probe, wall


def main() -> None:
    from duckdb_service_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_ann")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for copies in (1, 10):
        corpus = build_corpus(spark, sf_dir, copies).persist()
        n = corpus.count()
        queries = _queries(corpus).persist()
        truth = [(r[0], r[1]) for r in brute_force(corpus, queries).collect()]
        print(f"--- corpus {copies}x = {n} vectors ---")
        results[(copies, "lsh_8x4")] = run_config(
            f"LSH 8 tables x 4 planes @ {copies}x",
            corpus, queries, truth,
            lambda c, q: lsh_search(c, q, 8, 4),
        )
        if copies == 10:
            results[(copies, "lsh_8x6")] = run_config(
                f"LSH 8 tables x 6 planes @ {copies}x",
                corpus, queries, truth,
                lambda c, q: lsh_search(c, q, 8, 6),
            )
        k_fixed = 10
        results[(copies, "ivf_fixed")] = run_config(
            f"IVF K={k_fixed} (fixed) @ {copies}x",
            corpus, queries, truth,
            lambda c, q: ivf_search(c, q, k_fixed),
        )
        k_prop = 10 * copies
        if copies > 1:
            results[(copies, "ivf_prop")] = run_config(
                f"IVF K={k_prop} (K~n) @ {copies}x",
                corpus, queries, truth,
                lambda c, q: ivf_search(c, q, k_prop),
            )
        corpus.unpersist()
        queries.unpersist()

    # ---- the scaling laws, asserted ----
    lsh1, lsh10 = results[(1, "lsh_8x4")], results[(10, "lsh_8x4")]
    cand_ratio = lsh10[1] / lsh1[1]
    assert 5.0 <= cand_ratio <= 15.0, (
        f"LSH fixed-planes probe cost must track n (~10x): got {cand_ratio:.1f}x"
    )
    lsh_tuned = results[(10, "lsh_8x6")]
    assert lsh_tuned[1] <= lsh10[1] / 2.5, (
        "adding 2 planes (4x buckets) at 10x corpus must cut probe cost "
        f">=2.5x: {lsh10[1]:.0f} -> {lsh_tuned[1]:.0f}"
    )
    ivf1, ivf10 = results[(1, "ivf_fixed")], results[(10, "ivf_fixed")]
    cell_ratio = ivf10[1] / ivf1[1]
    assert 5.0 <= cell_ratio <= 15.0, (
        f"IVF fixed-K probed cell must track n (~10x): got {cell_ratio:.1f}x"
    )
    ivf_prop = results[(10, "ivf_prop")]
    prop_ratio = ivf_prop[1] / ivf1[1]
    assert prop_ratio <= 2.5, (
        f"IVF K~n probed cell must stay ~flat vs 1x: got {prop_ratio:.1f}x"
    )
    print("\nLAWS ASSERTED:")
    print(f"  LSH fixed planes: probe {cand_ratio:.1f}x at 10x data (linear in n)")
    print(f"  LSH +2 planes:    probe back to {lsh_tuned[1]/lsh1[1]:.1f}x of 1x level")
    print(f"  IVF fixed K:      probed cell {cell_ratio:.1f}x at 10x data")
    print(f"  IVF K~n:          probed cell {prop_ratio:.1f}x of 1x level (flat)")


if __name__ == "__main__":
    main()
