"""Similarity search over embedding columns (SURVEY §7.1 M6).

Random-hyperplane LSH follows Charikar (STOC 2002); the IVF coarse-quantize
→ fine-search split follows the inverted-file ANN literature (Jégou et al.,
"Product quantization for nearest neighbor search", TPAMI 2011 — the
coarse-quantizer half; no PQ compression here).

Two tiers, mirroring what a 100 TB pipeline needs:
- brute-force cosine top-k: broadcast the (small) query set, score map-side
  with a pure-expression dot product (zip_with + aggregate fold — JVM
  codegen, no Python), then per-query top-k via window. Cost O(n·q·d) with
  zero shuffle of the corpus.
- random-hyperplane LSH: 16 signed projections → 16-bit bucket id. Bucket
  assignment is map-side; candidate search touches only same-bucket rows
  (expected n/2^16 of the corpus per probe). Hyperplane weights are
  deterministic integers derived from md5 (functions.portable) so results
  are reproducible across engines and runs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 16          # single-table bucketing (histogram query)
N_TABLES = 8           # multi-table search: 8 tables x 4 planes
PLANES_PER_TABLE = 4
DIM = 64


def _w(plane: int, i: int) -> int:
    """Deterministic hyperplane weight in [-1000, 1000]: the md5-derived
    portable hash of 'plane_i' (same formula emitted into oracle SQL)."""
    h = int(hashlib.md5(f"{plane}_{i}".encode()).hexdigest()[:15], 16)
    return h % 2001 - 1000


PLANES = [[_w(j, i) for i in range(DIM)] for j in range(max(N_PLANES, N_TABLES * PLANES_PER_TABLE))]


def dot(a, b) -> Column:
    """Exact-order fold dot product in double (IEEE-identical across
    engines for identical inputs)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(c) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _dot_sql(plane_idx: int, vec_col: str) -> str:
    """SQL twin of dot(PLANES[idx], vec) — identical fold, identical IEEE
    ops (plane weights are exact integers so the literals are lossless)."""
    arr = ", ".join(f"{float(w)!r}D" for w in PLANES[plane_idx])
    return (
        f"aggregate(zip_with(array({arr}), {vec_col}, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def lsh_bucket(vec_col: str, n_planes: int = N_PLANES) -> Column:
    """n-bit bucket id: bit j = sign of <plane_j, v>. Fewer planes → bigger
    buckets (recall/cost dial). Built as ONE F.expr parse — the Column form
    cost ~1.2s of py4j round trips per plan build (16 planes x 64 literal
    weights + fold lambdas); resolved expressions identical (r15)."""
    terms = " + ".join(
        f"(CASE WHEN {_dot_sql(j, vec_col)} > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(n_planes)
    )
    return F.expr(f"CAST(0 AS BIGINT) + {terms}")


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int = 10
) -> DataFrame:
    """Top-k cosine neighbours per query vector. Ties broken by corpus id;
    cosine rounded at 4 BEFORE ranking so rank order is reproducible."""
    from pyspark.sql.window import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def lsh_table_buckets(vec_col: str) -> "Column":
    """Multi-table LSH: N_TABLES independent (table_id, bucket) assignments
    per vector (4 planes each). Candidates = union over tables of same-bucket
    rows — the standard recall fix for cosine LSH; probe cost stays
    ~N_TABLES * corpus/2^planes_per_table per query."""
    entries = []
    for t in range(N_TABLES):
        bucket = " + ".join(
            f"(CASE WHEN {_dot_sql(t * PLANES_PER_TABLE + j, vec_col)} > 0 "
            f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            for j in range(PLANES_PER_TABLE)
        )
        entries.append(
            f"named_struct('table_id', {t}, 'bucket', "
            f"CAST(0 AS BIGINT) + {bucket})"
        )
    # one parse for all 8 tables (32 plane folds) — same rationale as
    # lsh_bucket
    return F.expr(f"array({', '.join(entries)})")


def _np_queries(queries_rows, dim: int):
    import numpy as np

    qids = np.array([r[0] for r in queries_rows], dtype=np.int64)
    Q = np.array([r[1] for r in queries_rows], dtype=np.float64).reshape(len(qids), dim)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    return qids, Qn


def brute_force_topk_np(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int = 10
) -> DataFrame:
    """Vectorized brute-force cosine top-k: the query set (small by
    definition) is collected and broadcast inside a mapInPandas closure; each
    Arrow batch of the corpus is scored as ONE BLAS matmul (n×d @ d×q). This
    is the numpy fast path the expression-based `brute_force_topk` trades
    against: ~20x less per-row overhead, same results (cosine rounded at 4
    before ranking, so BLAS vs fold summation order cannot reorder ranks)."""
    import numpy as np
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType
    from pyspark.sql.window import Window

    q_rows = [(r[0], r[1]) for r in queries.select(id_col, vec_col).collect()]
    dim = len(q_rows[0][1])
    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def score(batches):
        import pandas as pd

        qids, Qn = _np_queries(q_rows, dim)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            S = np.round(Vn @ Qn.T, 4)  # n×q
            ids = pdf[id_col].to_numpy()
            # partial top-k PER BATCH (r15): only k candidates per query
            # can survive the global ranking, so emitting the full n×q
            # score matrix ships the whole corpus through the window
            # exchange for nothing — at 100 TB that is THE shuffle. The
            # per-batch cut uses the same total order as the final window
            # (cos desc, neighbor_id asc — lexsort), and the self-match
            # is excluded here so it cannot displace a real candidate;
            # global top-k over unioned per-batch top-k's is exact.
            out_q, out_n, out_c = [], [], []
            for qi in range(len(qids)):
                col = S[:, qi]
                keep = ids != qids[qi]
                cand_ids, cand_cos = ids[keep], col[keep]
                if len(cand_ids) > k:
                    sel = np.lexsort((cand_ids, -cand_cos))[:k]
                    cand_ids, cand_cos = cand_ids[sel], cand_cos[sel]
                out_q.append(np.full(len(cand_ids), qids[qi], dtype=np.int64))
                out_n.append(cand_ids)
                out_c.append(cand_cos)
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cos_sim": np.concatenate(out_c),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def lsh_bucket_np(df: DataFrame, id_col: str, vec_col: str, n_planes: int = N_PLANES) -> DataFrame:
    """(id, bucket) via one matmul per Arrow batch against the hyperplane
    matrix — numerically equivalent to the expression fold (only the SIGN of
    each projection matters)."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    W = [PLANES[j] for j in range(n_planes)]
    schema = StructType([StructField(id_col, LongType()), StructField("bucket", LongType())])

    def assign(batches):
        import pandas as pd

        Wm = np.array(W, dtype=np.float64)  # p×d
        weights = (1 << np.arange(len(W), dtype=np.int64))
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            bits = (V @ Wm.T) > 0  # n×p
            yield pd.DataFrame(
                {id_col: pdf[id_col], "bucket": (bits @ weights).astype(np.int64)}
            )

    return df.select(id_col, vec_col).mapInPandas(assign, schema)


# ---------------------------------------------------------------------------
# Product quantization (Jegou/Douze/Schmid, "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011): split each vector into M
# subvectors, learn a small per-subspace codebook, encode the corpus as M
# small codes, and answer queries by Asymmetric Distance Computation (ADC)
# — table lookups instead of full-vector arithmetic.
# ---------------------------------------------------------------------------

PQ_M = 8                 # subspaces
PQ_K = 16                # codes per subspace
PQ_SUB = DIM // PQ_M     # dims per subspace


def pq_subvectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, s, sub): M rows per vector, each an 8-dim double subarray.
    Pure expressions — the split is map-side everywhere it is used."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    subs = F.array(
        *[F.slice(v, s * PQ_SUB + 1, PQ_SUB) for s in range(PQ_M)]
    )
    return df.select(F.col(id_col), F.posexplode(subs).alias("s", "sub"))


def _l2sq(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def _assign_codes(sv: DataFrame, codebook: DataFrame, id_col: str) -> DataFrame:
    """Nearest codebook entry per (id, s): corpus × broadcast(M*K centroids)
    is map-side; the argmin is a min_by keyed (distance, code) so ties are
    deterministic."""
    return (
        sv.join(F.broadcast(codebook.select("s", "code", "centroid")), "s")
        .withColumn("__d", _l2sq(F.col("sub"), F.col("centroid")))
        .groupBy(id_col, "s")
        .agg(
            F.min_by("code", F.struct("__d", "code")).alias("code"),
            F.first("sub").alias("sub"),  # identical across the group
        )
    )


def pq_train(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Deterministic PQ codebook: init = subvectors of the K lowest-id
    vectors, then ONE distributed Lloyd refinement (assign via broadcast
    argmin, re-center via posexplode decimal-exact means — vectors are
    never collected). At 100 TB you'd train on a fixed hash-bucket sample;
    the topology is identical. Returns (s, code, centroid, cnorm2)."""
    sv = pq_subvectors(df, id_col, vec_col)
    ids = [r[0] for r in df.select(id_col).orderBy(id_col).limit(PQ_K).collect()]
    init = (
        sv.filter(F.col(id_col).isin(ids))
        .join(
            df.sparkSession.createDataFrame(
                [(v, c) for c, v in enumerate(sorted(ids))], f"{id_col} long, code int"
            ),
            id_col,
        )
        .select("s", "code", F.col("sub").alias("centroid"))
    )
    assigned = _assign_codes(sv, init, id_col)
    dims = assigned.select(
        "s", "code", F.posexplode("sub").alias("i", "v")
    )
    means = dims.groupBy("s", "code", "i").agg(
        F.round(
            F.sum(F.col("v").cast("decimal(20,10)")).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("c")
    )
    cb = (
        means.groupBy("s", "code")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("pairs"))
        .select(
            "s",
            "code",
            F.transform("pairs", lambda p: p.getField("c")).alias("centroid"),
        )
    )
    return cb.withColumn(
        "cnorm2",
        F.aggregate(
            F.transform("centroid", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        ),
    )


def pq_encode(df: DataFrame, id_col: str, vec_col: str, codebook: DataFrame) -> DataFrame:
    """(id, s, code): the M-byte representation of each vector — the only
    per-vector state the ADC scan needs (the 8x-64x memory cut that lets a
    100 TB corpus's index live in RAM)."""
    return _assign_codes(pq_subvectors(df, id_col, vec_col), codebook, id_col).select(
        id_col, "s", "code"
    )


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """ADC search: each query precomputes dot(q_sub, centroid) for all M*K
    codebook entries (a tiny broadcast-sized table), then the corpus codes
    stream through a broadcast join and a (query, vec) sum — approx cosine
    = sum(dot) / (|q| * sqrt(sum(cnorm2))). No corpus vector is ever read
    at query time; the scan touches M ints per vector."""
    qsub = pq_subvectors(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), "s", F.col("sub").alias("qsub")
    )
    # ordered-fold norm over the FULL query vector (not an explode+sum,
    # whose accumulation order varies run to run) — deterministic and
    # reproducible bit-for-bit by the DuckDB oracle
    qnorm = queries.select(
        F.col(id_col).alias("query_id"),
        norm(F.transform(vec_col, lambda x: x.cast("double"))).alias("qn"),
    )
    # per-(query, s, code) dot and per-(s, code) centroid norm as 1e-6
    # micro-unit BIGINTs: the ADC groupBy then sums INTEGERS, so the result
    # is independent of partial-aggregation order — the property that makes
    # this oracle-checkable (and deterministic at 1000 executors)
    dtable = (
        qsub.join(F.broadcast(codebook), "s")
        .select(
            "query_id",
            "s",
            "code",
            F.round(
                F.aggregate(
                    F.zip_with("qsub", "centroid", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                * 1000000,
                0,
            )
            .cast("bigint")
            .alias("dot_u"),
            F.round(F.col("cnorm2") * 1000000, 0).cast("bigint").alias("cn2_u"),
        )
    )
    approx = (
        codes.join(F.broadcast(dtable), ["s", "code"])
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum("dot_u").alias("adot_u"), F.sum("cn2_u").alias("rn2_u"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(qnorm), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                (F.col("adot_u") / F.lit(1000000.0))
                / (
                    F.col("qn")
                    * F.sqrt(
                        F.greatest(
                            F.col("rn2_u") / F.lit(1000000.0), F.lit(1e-12)
                        )
                    )
                ),
                4,
            ).alias("approx_cos"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), "neighbor_id"
    )
    return (
        approx.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
