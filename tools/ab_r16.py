"""r16 isolated interleaved A/B: old (r15/bc2563c) vs new (r16) forms of the
queries rewritten this round, alternated in ONE process so box drift cannot
masquerade as a plan effect (the SCALING.md r14 discipline).

Usage: python tools/ab_r16.py [q9|line_dedup|simhash] [passes] [sf_dir]

The OLD builders are copied VERBATIM from bc2563c (git show) — they run
against the same registry helpers, so the only delta is the rewrite under
test. Reports per-pass walls and the min, old vs new.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def old_q9(spark, sf_dir):
    # bc2563c q9_product_type_profit body, verbatim
    from duckdb_service_spark.functions.stable import fsum
    from duckdb_service_spark.plans.tpch import _partsupp
    from duckdb_service_spark.sources import load_tables

    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_name").like("%red%")).select("p_partkey")
    ps = _partsupp(t, part_keys=p)
    l = t["lineitem"].join(p, F.col("l_partkey") == F.col("p_partkey"))
    l = l.join(
        ps,
        (F.col("l_partkey") == ps.ps_partkey)
        & (F.col("l_suppkey") == ps.ps_suppkey),
    )
    s = t["supplier"].select("s_suppkey", "s_nationkey")
    o = t["orders"].select("o_orderkey", "o_orderdate")
    n = t["nation"].select("n_nationkey", "n_name")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(fsum(amount).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def old_line_dedup(spark, sf_dir):
    # bc2563c line_dedup_corpus body, verbatim (single lazy wide persist)
    from pyspark import StorageLevel

    from duckdb_service_spark.operators.dedup import tokens_expr
    from duckdb_service_spark.plans.textops import (
        _LD_CHUNK,
        _LD_MIN_DOCS,
        _docs_parallel,
    )
    from duckdb_service_spark.sources import load_tables

    t = load_tables(spark, sf_dir)
    docs = _docs_parallel(t).select("doc_id", "lang", "text")
    cs, md = _LD_CHUNK, _LD_MIN_DOCS
    toks = docs.select("doc_id", "lang", tokens_expr(F.col("text")).alias("t"))
    chunked = (
        toks.select(
            "doc_id",
            "lang",
            F.expr(
                f"transform(sequence(0, cast(ceil(size(t)/{cs}.0) as int) - 1),"
                f" i -> array_join(slice(t, i*{cs}+1, {cs}), ' '))"
            ).alias("chunks"),
        )
        .withColumn(
            "h_arr",
            F.expr(
                "transform(chunks, c -> "
                "CAST(conv(substring(md5(c), 1, 15), 16, 10) AS BIGINT))"
            ),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    boiler = (
        chunked.select(F.explode(F.array_distinct("h_arr")).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= md)
        .select("h")
    )
    slim = chunked.select("doc_id", F.posexplode("h_arr").alias("chunk_idx", "h"))
    kept_idx = (
        slim.join(boiler, "h", "left_anti")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("chunk_idx")).alias("kidx"))
    )
    n_kept = F.when(F.col("kidx").isNull(), F.lit(0)).otherwise(F.size("kidx"))
    return chunked.join(kept_idx, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.size("chunks").cast("long").alias("n_chunks"),
        n_kept.cast("long").alias("kept_chunks"),
        (F.size("chunks") - n_kept).cast("long").alias("removed_chunks"),
        F.round(n_kept / F.size("chunks").cast("double"), 4).alias("kept_ratio"),
        F.coalesce(
            F.array_join(
                F.transform(
                    "kidx", lambda i: F.element_at(F.col("chunks"), i + F.lit(1))
                ),
                " ",
            ),
            F.lit(""),
        ).alias("cleaned_text"),
        (n_kept * 2 >= F.size("chunks")).alias("keep"),
    )


def old_simhash(spark, sf_dir):
    # bc2563c dedup_simhash body, verbatim (no persist of sh)
    from duckdb_service_spark.operators.dedup import simhash
    from duckdb_service_spark.plans.dedup import TWIN_OFFSET, _corpus
    from duckdb_service_spark.session import default_parallelism

    corpus = _corpus(spark, sf_dir).repartition(
        default_parallelism(), F.col("doc_id")
    )
    sh = simhash(corpus, "doc_id", "text", bits=32)
    orig = sh.filter(F.col("doc_id") < TWIN_OFFSET)
    twin = sh.filter(F.col("doc_id") >= TWIN_OFFSET).select(
        (F.col("doc_id") - TWIN_OFFSET).alias("doc_id"),
        F.col("simhash").alias("twin_sim"),
    )
    return orig.join(twin, "doc_id").select(
        "doc_id",
        "simhash",
        F.bit_count(F.col("simhash").bitwiseXOR(F.col("twin_sim")))
        .cast("tinyint")
        .alias("twin_hamming"),
    )


NEW = {
    "q9": "q9_product_type_profit",
    "line_dedup": "text_line_dedup",
    "simhash": "dedup_simhash",
}
OLD = {"q9": old_q9, "line_dedup": old_line_dedup, "simhash": old_simhash}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "q9"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from duckdb_service_spark.plans import QUERIES, load_all
    from duckdb_service_spark.session import get_spark

    load_all()
    spark = get_spark("ab-r16")
    spark.sparkContext.setLogLevel("ERROR")
    old_fn = OLD[which]
    new_fn = QUERIES[NEW[which]]

    def run(fn):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    # warm both once
    run(old_fn)
    run(new_fn)
    olds, news = [], []
    for i in range(passes):
        olds.append(run(old_fn))
        news.append(run(new_fn))
        print(
            f"pass {i}: old {olds[-1]:.3f}s  new {news[-1]:.3f}s  "
            f"load {os.getloadavg()[0]:.2f}"
        )
    print(
        f"{which} @ {sf_dir}: old min {min(olds):.3f}s  "
        f"new min {min(news):.3f}s  ({min(olds) / min(news):.2f}x)"
    )


if __name__ == "__main__":
    main()
