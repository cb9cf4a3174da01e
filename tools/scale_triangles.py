"""Skew + 10x scale check for the triangle-count plan (VERDICT r08 task 6).

Two claims under test, both ASSERTED (not just printed):

1. **Mega-order shuffle bound**: the co-occurrence pair generation is
   C(k,2) per order. A deliberately skewed mega-order (one synthetic
   order containing `mega` suppliers) explodes the pair stream — but the
   r09 plan sparsifies BEFORE the dedup shuffle, so the rows entering
   DISTINCT are ~C(k,2)/_TRI_MOD, not C(k,2). Asserted by counting the
   post-filter pair stream directly against the binomial bound.

2. **Degree-ordered wedge bound**: the wedge join's per-middle-node work
   is out_deg * in_deg of the oriented edges. Under id-ordering a hub
   node h (mega-order edges all share suppliers) can hold O(deg^2)
   wedges; under (degree, id)-ordering every node's OUT-degree is
   bounded by ~sqrt(2m) (arboricity bound), so max wedges per node
   collapses. Asserted: max out-degree under degree ordering <=
   ceil(sqrt(2m)) + slack, and the triangle RESULT is identical to the
   id-oriented reference plan (orientation invariance).

Usage: python tools/scale_triangles.py [sf_dir] [mega]
       (defaults /root/testdata/sf0.1, mega=400)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_lineitem(spark, sf_dir: str, copies: int, mega: int):
    """lineitem co-purchase input, replicated `copies`x with disjoint
    supplier id spaces, plus ONE mega-order of `mega` distinct suppliers."""
    from duckdb_service_spark.sources import load_tables

    li = load_tables(spark, sf_dir)["lineitem"].select("l_orderkey", "l_suppkey")
    reps = [
        li.select(
            (F.col("l_orderkey") + F.lit(i * 100_000_000)).alias("l_orderkey"),
            (F.col("l_suppkey") + F.lit(i * 10_000_000)).alias("l_suppkey"),
        )
        for i in range(copies)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    if mega:
        mega_rows = spark.range(mega).select(
            F.lit(999_999_999).cast("long").alias("l_orderkey"),
            (F.col("id") + 500_000_000).cast("long").alias("l_suppkey"),
        )
        out = out.unionByName(mega_rows)
    return out


def sparse_edges(li):
    from duckdb_service_spark.functions.portable import hash64
    from duckdb_service_spark.plans.graphs import _TRI_MOD

    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
    ).select(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
    kept = pairs.filter(
        hash64(
            F.concat(F.col("u").cast("string"), F.lit(":"), F.col("v").cast("string"))
        )
        % _TRI_MOD
        == 0
    )
    return pairs, kept


def id_oriented_triangles(sparse):
    """The r08 id-oriented reference plan (orientation-invariance check)."""
    e1 = sparse.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = sparse.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = sparse.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


def main() -> None:
    from duckdb_service_spark.plans.graphs import _TRI_MOD, triangle_counts
    from duckdb_service_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    mega = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = get_spark("scale-triangles")
    spark.sparkContext.setLogLevel("ERROR")

    for copies in (1, 10):
        li = build_lineitem(spark, sf_dir, copies, mega)
        pairs, kept = sparse_edges(li)

        # claim 1: the dedup shuffle sees ~1/_TRI_MOD of the raw pairs
        raw_mega = mega * (mega - 1) // 2
        n_raw = pairs.count()
        n_kept = kept.count()
        frac = n_kept / n_raw
        assert frac < 2.0 / _TRI_MOD, (
            f"sparsifier fraction {frac:.3f} not ~1/{_TRI_MOD}"
        )

        sparse = kept.distinct().persist()
        m = sparse.count()

        # claim 2a: degree-ordered max out-degree obeys the sqrt bound
        deg = (
            sparse.select(F.explode(F.array("u", "v")).alias("n"))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        oriented = (
            sparse.join(deg.select(F.col("n").alias("u"), F.col("deg").alias("du")), "u")
            .join(deg.select(F.col("n").alias("v"), F.col("deg").alias("dv")), "v")
            .select(
                F.when(
                    (F.col("du") < F.col("dv"))
                    | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                    F.col("u"),
                )
                .otherwise(F.col("v"))
                .alias("x")
            )
        )
        max_out_deg = (
            oriented.groupBy("x").agg(F.count(F.lit(1)).alias("od"))
            .agg(F.max("od"))
            .collect()[0][0]
        )
        max_id_out = (
            sparse.groupBy("u").agg(F.count(F.lit(1)).alias("od"))
            .agg(F.max("od"))
            .collect()[0][0]
        )
        bound = math.ceil(math.sqrt(2 * m)) + 8
        assert max_out_deg <= bound, (
            f"degree-ordered max out-degree {max_out_deg} > sqrt bound {bound}"
        )

        # claim 2b: orientation invariance — same per-node triangle counts
        t0 = time.perf_counter()
        got = {r[0]: r[1] for r in triangle_counts(sparse).collect()}
        wall = time.perf_counter() - t0
        want = {r[0]: r[1] for r in id_oriented_triangles(sparse).collect()}
        assert got == want, "degree-oriented result != id-oriented result"

        print(
            f"copies={copies} mega={mega}: raw_pairs={n_raw:,} "
            f"(mega alone C(k,2)={raw_mega:,}), kept={n_kept:,} "
            f"(frac {frac:.4f} ~ 1/{_TRI_MOD}), edges={m:,}, "
            f"max_out_deg degree-ordered={max_out_deg} vs id-ordered={max_id_out} "
            f"(sqrt bound {bound}), nodes_with_triangles={len(got):,}, "
            f"wall={wall:.2f}s"
        )
        sparse.unpersist()

    print("ALL ASSERTIONS PASSED")


if __name__ == "__main__":
    main()
