"""One-off perf experiment: materialization strategy for the curation
pipeline and the minhash-LSH dedup at sf0.1.

Variants (per query):
  ckpt2   — current: eager localCheckpoint on exact_kept AND shingles
  persist — lazy persist() on both, no separate materialization jobs
  sh_only — eager localCheckpoint on shingles only; exact_kept recomputed
  none    — no materialization at all (shared subtrees recomputed)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from duckdb_service_spark.operators.dedup import (
    explode_shingles,
    jaccard_verify,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signatures,
    normalize_text,
    tokens_expr,
)
from duckdb_service_spark.session import default_parallelism, get_spark
from duckdb_service_spark.sources import load_tables

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MIN_TOKENS = 30
JACCARD_CUT = 0.5


def curation(spark, mode):
    t = load_tables(spark, SF)
    d = t["documents"].select("doc_id", "lang", "text")
    corpus = d.unionByName(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "lang",
                 F.concat("text", F.lit(" zq yq xq")).alias("text"))
    ).repartition(default_parallelism(), F.col("doc_id"))
    quality = corpus.withColumn("n_tokens", F.size(tokens_expr(F.col("text")))).filter(
        F.col("n_tokens") >= MIN_TOKENS)
    w = Window.partitionBy(F.md5(normalize_text(F.col("text")))).orderBy("doc_id")
    exact_kept = (quality.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1).drop("rn")
                  .repartition(default_parallelism(), F.col("doc_id")))
    if mode == "ckpt2":
        exact_kept = exact_kept.localCheckpoint(eager=True)
    elif mode == "persist":
        exact_kept = exact_kept.persist(StorageLevel.MEMORY_AND_DISK)
    sh = explode_shingles(exact_kept, "doc_id", "text")
    if mode in ("ckpt2", "sh_only"):
        sh = sh.localCheckpoint(eager=True)
    elif mode == "persist":
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sig = minhash_signatures(exact_kept, "doc_id", "text", num_perms=64, shingles=sh)
    pairs = lsh_candidate_pairs(lsh_bands(sig, "doc_id"), "doc_id")
    dup_ids = (jaccard_verify(exact_kept, pairs, "doc_id", "text", shingles=sh)
               .filter(F.col("jaccard") >= JACCARD_CUT)
               .select(F.col("id_b").alias("drop_id")).distinct())
    survivors = exact_kept.join(dup_ids, exact_kept.doc_id == dup_ids.drop_id, "left_anti")
    out = survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("min_doc"))
    rows = out.collect()
    if mode == "persist":
        exact_kept.unpersist()
        sh.unpersist()
    return rows


def minhash(spark, mode):
    t = load_tables(spark, SF)
    d = t["documents"].select("doc_id", "text")
    corpus = d.unionByName(
        d.select((F.col("doc_id") + 100000).alias("doc_id"),
                 F.concat("text", F.lit(" zq yq xq")).alias("text"))
    ).repartition(default_parallelism(), F.col("doc_id"))
    sh = explode_shingles(corpus, "doc_id", "text")
    if mode in ("ckpt2", "sh_only"):
        sh = sh.localCheckpoint(eager=True)
    elif mode == "persist":
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sig = minhash_signatures(corpus, "doc_id", "text", num_perms=64, shingles=sh)
    bands = lsh_bands(sig, "doc_id", num_perms=64, bands=16)
    pairs = lsh_candidate_pairs(bands, "doc_id")
    verified = jaccard_verify(corpus, pairs, "doc_id", "text", shingles=sh)
    out = (verified.filter(F.col("jaccard") >= 0.5)
           .groupBy().agg(F.count(F.lit(1)).alias("n_pairs"),
                          F.min("id_a").alias("min_a")))
    rows = out.collect()
    if mode == "persist":
        sh.unpersist()
    return rows


def main():
    spark = get_spark("perf-curation")
    spark.sparkContext.setLogLevel("ERROR")
    for qname, fn in (("curation", curation), ("minhash", minhash)):
        modes = ["ckpt2", "persist", "sh_only", "none"]
        base = fn(spark, "ckpt2")
        for m in modes[1:]:
            assert sorted(map(tuple, fn(spark, m))) == sorted(map(tuple, base)), m
        times = {m: [] for m in modes}
        for rnd in range(3):
            for m in modes:
                t0 = time.perf_counter()
                fn(spark, m)
                times[m].append(time.perf_counter() - t0)
        for m in modes:
            print(f"{qname:9s} {m:8s} median {statistics.median(times[m]):.3f}s  "
                  + " ".join(f"{r:.3f}" for r in times[m]))


if __name__ == "__main__":
    main()
