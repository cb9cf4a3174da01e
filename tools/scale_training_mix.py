"""10x scale check for the training-mix pipeline (VERDICT r06 task 8).

Replicates the sf0.1 documents table 10x with per-replica token salts (so
exact dedup cannot collapse replicas) and per-replica source names (so the
mix has 10x sources and the accounting scales structurally). Claims under
test:

1. MEMBERSHIP DETERMINISM: the kept-document set is decided by an integer
   threshold on hash64(doc_id) — not rand(), not row order — so the mix is
   bit-identical under ANY partitioning. Verified by re-running the 10x
   pipeline under a different shuffle-partition count and a skewed
   repartition and comparing an order-free per-source membership
   fingerprint (sum + xor of doc-id hashes, n_kept, tokens_kept).
2. WALL: 10x data in <= 2.5x the 1x wall (shared scheduling floor).
3. SHAPE: identical exchange structure at both scales (#Exchange nodes in
   the formatted plan).

Usage: python tools/scale_training_mix.py [sf_dir] (default testdata/sf0.1)
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, sf_dir: str, copies: int):
    from duckdb_service_spark.sources import load_tables

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "source", "text")
    reps = []
    for i in range(copies):
        reps.append(
            d.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                F.concat(F.col("source"), F.lit(f"_r{i}")).alias("source"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x: F.concat(x, F.lit(f"r{i}")),
                    ),
                    " ",
                ).alias("text"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def run_mix(spark, corpus):
    """The registry pipeline_training_mix plan over an arbitrary corpus,
    returning (accounting rows, per-source membership fingerprint rows)."""
    from duckdb_service_spark.functions.portable import hash64
    from duckdb_service_spark.plans.textops import (
        _MIX_MIN_TOKENS,
        _MIX_SEQ_LEN,
        normalize_text,
        tokens_expr,
    )

    d = corpus
    quality = d.withColumn("n_tok", F.size(tokens_expr(F.col("text")))).filter(
        F.col("n_tok") >= _MIX_MIN_TOKENS
    )
    deduped = (
        quality.groupBy(F.md5(normalize_text(F.col("text"))).alias("__h"))
        .agg(
            F.min_by(F.struct("doc_id", "source", "n_tok"), F.col("doc_id")).alias(
                "__row"
            )
        )
        .select("__row.*")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    src = deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("src_tokens"),
    )
    tot = src.agg(
        F.sum("src_tokens").alias("all_tokens"), F.count(F.lit(1)).alias("n_sources")
    )
    rate = F.least(
        F.lit(1.0),
        (F.col("all_tokens").cast("double") / F.col("n_sources")) / F.col("src_tokens"),
    )
    weighted = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "src_tokens",
        rate.alias("keep_rate"),
        F.floor(rate * 1000000).cast("bigint").alias("thr"),
    )
    kept = (
        deduped.join(F.broadcast(weighted.select("source", "thr")), "source")
        .filter(hash64(F.col("doc_id").cast("string")) % 1000000 < F.col("thr"))
        .select("source", "doc_id", "n_tok")
    )
    acct = (
        weighted.join(kept, "source", "left")
        .groupBy("source", "n_docs", "src_tokens", "keep_rate")
        .agg(
            F.count("n_tok").alias("n_kept"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("bigint").alias("tokens_kept"),
            F.coalesce(
                F.sum(
                    F.ceil(F.col("n_tok").cast("double") / _MIX_SEQ_LEN).cast("bigint")
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_sequences"),
        )
    )
    # order-free membership fingerprint: partitioning cannot change it
    # unless the kept SET changes
    fp = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(hash64(F.col("doc_id").cast("string"))).alias("hsum"),
        F.sum("n_tok").cast("bigint").alias("tsum"),
    )
    acct_rows = sorted(tuple(r) for r in acct.collect())
    fp_rows = sorted(tuple(r) for r in fp.collect())
    deduped.unpersist()
    return acct_rows, fp_rows


def exchange_count(spark, corpus) -> int:
    from duckdb_service_spark.functions.portable import hash64  # noqa: F401
    from duckdb_service_spark.plans.textops import (  # noqa: F401
        _MIX_MIN_TOKENS,
        normalize_text,
        tokens_expr,
    )

    # count Exchange nodes in the accounting plan
    import contextlib
    import io

    d = corpus.withColumn("n_tok", F.size(tokens_expr(F.col("text")))).filter(
        F.col("n_tok") >= _MIX_MIN_TOKENS
    )
    agg = d.groupBy("source").agg(F.sum("n_tok").alias("t"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        agg.explain("formatted")
    return len(re.findall(r"\bExchange\b", buf.getvalue()))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from duckdb_service_spark.session import get_spark

    spark = get_spark("scale-training-mix")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"loadavg {os.getloadavg()}")

    c1 = build_corpus(spark, sf_dir, 1)
    c10 = build_corpus(spark, sf_dir, 10)

    run_mix(spark, c1)  # warm
    t0 = time.perf_counter()
    acct1, _ = run_mix(spark, c1)
    w1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    acct10, fp10 = run_mix(spark, c10)
    w10 = time.perf_counter() - t0

    # membership determinism: different shuffle width + skewed repartition
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    _, fp10b = run_mix(spark, c10.repartition(3, "source"))
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    same = fp10 == fp10b
    n_src1, n_src10 = len(acct1), len(acct10)
    print(f"1x:  wall {w1:.2f}s  sources {n_src1}")
    print(f"10x: wall {w10:.2f}s  sources {n_src10}  ratio {w10 / w1:.2f}x")
    print(f"membership fingerprint identical under re-partitioning: {same}")
    print(f"exchange nodes (accounting stage) 1x={exchange_count(spark, c1)} "
          f"10x={exchange_count(spark, c10)}")
    assert same, "mix membership changed under re-partitioning"
    assert n_src10 == 10 * n_src1
    print("PASS" if w10 / w1 <= 2.5 else f"WALL RATIO {w10 / w1:.2f} > 2.5")


if __name__ == "__main__":
    main()
