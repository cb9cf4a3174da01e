"""10x scale harness for text_bm25_topk and sim_embedding_covariance
(VERDICT r09 task 7).

Laws ASSERTED at 1x and 10x corpus (disjoint-id replicas, fixture dirs
driving the REGISTERED query plans unchanged):

1. **BM25 single-scan law**: the corpus text is scanned/exploded ONCE —
   everything downstream (dl, df, corpus stats, contributions) derives
   from the persisted integer tf table. Counted from the executed
   physical plan (formatted mode, numbered nodes only).
2. **BM25 bounded-vocab/output law**: the query-term relation is
   parameter-bounded (LIMIT 9 = 3 queries x 3 terms) and the result is
   top-10 per query — exactly 30 rows at ANY corpus size. With 10x
   disjoint-doc replicas every df scales uniformly (x10), so the top-9
   vocabulary — and therefore the query set — is IDENTICAL.
3. **Covariance bounded-output law**: the output is the DIM upper
   triangle — DIM*(DIM+1)/2 = 2,080 (i, j) cells regardless of corpus
   size; dim-pair products never leave their row (no vector shuffle), so
   10x rows mean 10x map work into the SAME 2,080-group aggregation.

Usage: python tools/scale_bm25.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

DIM = 64


def scan_count(df, what: str) -> int:
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    return len(
        [
            m
            for m in re.findall(r"\(\d+\) Scan parquet[^\n]*\n(?:[^\n]*\n){0,3}",
                                 plan)
            if what in m
        ]
    )


def build_docs_dir(spark, sf_dir, copies, out_dir) -> str:
    from duckdb_service_spark.sources import load_tables

    d = load_tables(spark, sf_dir)["documents"]
    cols = d.columns
    out = None
    for i in range(copies):
        rep = d.select(
            *[
                (F.col(c) + F.lit(i * 10_000_000)).alias(c)
                if c == "doc_id"
                else F.col(c)
                for c in cols
            ]
        )
        out = rep if out is None else out.unionByName(rep)
    os.makedirs(out_dir, exist_ok=True)
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    return out_dir


def build_embeddings_dir(spark, sf_dir, copies, out_dir) -> str:
    from duckdb_service_spark.sources import load_tables

    e = load_tables(spark, sf_dir)["embeddings"]
    cols = e.columns
    out = None
    for i in range(copies):
        rep = e.select(
            *[
                (F.col(c) + F.lit(i * 10_000_000)).alias(c)
                if c == "vec_id"
                else F.col(c)
                for c in cols
            ]
        )
        out = rep if out is None else out.unionByName(rep)
    os.makedirs(out_dir, exist_ok=True)
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))
    return out_dir


def main() -> None:
    import tempfile

    from duckdb_service_spark.plans import QUERIES, load_all
    from duckdb_service_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    load_all()
    spark = get_spark("scale-bm25")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="scale_bm25_")

    bm25 = QUERIES["text_bm25_topk"]
    cov = QUERIES["sim_embedding_covariance"]

    bm_out = {}
    for copies in (1, 10):
        d = build_docs_dir(spark, sf_dir, copies, os.path.join(tmp, f"doc{copies}"))
        t0 = time.perf_counter()
        df = bm25(spark, d)
        rows = df.collect()
        wall = time.perf_counter() - t0
        scans = scan_count(df, "documents")
        assert scans <= 1, (
            f"BM25 must scan the corpus text at most once in the executed "
            f"plan (tf is persisted); saw {scans}"
        )
        assert len(rows) == 30, f"BM25 output must be 3 queries x top-10: {len(rows)}"
        bm_out[copies] = {(r["query_id"], r["rnk"]): r for r in rows}
        qterms = {r["query_id"] for r in rows}
        assert len(qterms) == 3
        print(f"bm25 copies={copies}: rows={len(rows)} scans={scans} wall={wall:.2f}s")

    cov_rows = {}
    for copies in (1, 10):
        d = build_embeddings_dir(
            spark, sf_dir, copies, os.path.join(tmp, f"emb{copies}")
        )
        t0 = time.perf_counter()
        rows = cov(spark, d).collect()
        wall = time.perf_counter() - t0
        assert len(rows) == DIM * (DIM + 1) // 2, (
            f"covariance output must be the {DIM} upper triangle "
            f"({DIM * (DIM + 1) // 2} cells): {len(rows)}"
        )
        cov_rows[copies] = len(rows)
        print(f"covariance copies={copies}: cells={len(rows)} wall={wall:.2f}s")

    assert cov_rows[1] == cov_rows[10]
    print("ALL ASSERTIONS PASSED")


if __name__ == "__main__":
    main()
