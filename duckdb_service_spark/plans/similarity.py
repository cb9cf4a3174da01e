"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.similarity import (
    DIM,
    N_PLANES,
    PLANES,
    brute_force_topk,
    brute_force_topk_np,
    cosine,
    lsh_bucket,
    lsh_bucket_np,
)
from ..sources import load_tables
from .registry import query


@query(
    "sim_topk_bruteforce",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) AS cos_sim
      FROM embeddings c CROSS JOIN q
      WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 10
    """,
    bench=True,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN baseline: brute-force cosine top-10 for 5 query vectors.
    Uses the numpy/Arrow scorer (operators.similarity.brute_force_topk_np):
    one BLAS matmul per corpus batch — the vectorized-UDF fast path for
    linear algebra; the pure-expression twin (brute_force_topk) remains for
    UDF-free deployments."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    return brute_force_topk_np(e, e.filter(F.col("vec_id") < 5), "vec_id", "embedding", k=10)


def _lsh_oracle() -> str:
    # literal weight arrays, generated from the same PLANES constants
    planes_sql = ", ".join(
        "[" + ", ".join(f"CAST({w} AS DOUBLE)" for w in PLANES[j]) + "]" for j in range(N_PLANES)
    )
    dots = " + ".join(
        f"(CASE WHEN list_dot_product(planes[{j + 1}], CAST(embedding AS DOUBLE[])) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(N_PLANES)
    )
    return f"""
    WITH p AS (SELECT [{planes_sql}] AS planes),
    bucketed AS (
      SELECT vec_id, CAST({dots} AS BIGINT) AS bucket
      FROM embeddings, p
    )
    SELECT bucket, COUNT(*) AS n, MIN(vec_id) AS min_vec
    FROM bucketed GROUP BY bucket
    """


@query("sim_lsh_buckets", oracle=_lsh_oracle())
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing (the scale path for ANN): 16 signed
    projections → bucket id; output the bucket histogram. Deterministic
    integer hyperplanes make this oracle-exact."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    return (
        lsh_bucket_np(e, "vec_id", "embedding")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("min_vec"))
    )


def _lsh_topk_oracle() -> str:
    """DuckDB twin of the multi-table LSH search: 8 per-table buckets from
    the same integer hyperplanes, same-bucket candidate union, exact cosine
    rounded at 4 before ranking. Only the SIGN of each projection feeds the
    bucket id, so list_dot_product vs the Spark fold cannot diverge (the
    precedent is the oracle-exact sim_lsh_buckets)."""
    from ..operators.similarity import N_TABLES, PLANES_PER_TABLE

    n_planes = N_TABLES * PLANES_PER_TABLE
    planes_sql = ", ".join(
        "[" + ", ".join(f"CAST({w} AS DOUBLE)" for w in PLANES[j]) + "]"
        for j in range(n_planes)
    )
    per_table = []
    for t in range(N_TABLES):
        dots = " + ".join(
            f"(CASE WHEN list_dot_product(planes[{t * PLANES_PER_TABLE + j + 1}], "
            f"embedding) > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(PLANES_PER_TABLE)
        )
        per_table.append(
            f"SELECT vec_id, {t} AS table_id, CAST({dots} AS BIGINT) AS bucket "
            f"FROM c, p"
        )
    union = " UNION ALL ".join(per_table)
    return f"""
    WITH p AS (SELECT [{planes_sql}] AS planes),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
    b AS ({union}),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, x.vec_id AS neighbor_id
      FROM b q JOIN b x ON q.table_id = x.table_id AND q.bucket = x.bucket
      WHERE q.vec_id < 50 AND x.vec_id <> q.vec_id
    ),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             round(list_cosine_similarity(cq.embedding, cx.embedding), 4) AS cos_sim
      FROM cand
      JOIN c cq ON cq.vec_id = cand.query_id
      JOIN c cx ON cx.vec_id = cand.neighbor_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 10
    """


@query("sim_lsh_topk", oracle=_lsh_topk_oracle())
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN search through multi-table LSH (8 tables × 4 hyperplanes):
    candidates = union of same-bucket rows across tables, then exact cosine
    top-10. At 100 TB the bucket join replaces the full cross join;
    candidates ≈ 8·n/16 per query, tunable via tables/planes."""
    from ..operators.similarity import lsh_table_buckets

    t = load_tables(spark, sf_dir)
    base = t["embeddings"].select(
        "vec_id", "embedding", F.explode(lsh_table_buckets("embedding")).alias("tb")
    ).select("vec_id", "embedding", "tb.table_id", "tb.bucket")
    q = base.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "table_id", "bucket"
    )
    cand = (
        base.join(F.broadcast(q), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", "vec_id", "embedding")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("embedding")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


@query(
    "sim_centroid_per_label",
    oracle=f"""
    WITH dims AS (SELECT unnest(generate_series(1, {DIM})) AS i),
    expanded AS (
      SELECT e.label, d.i, CAST(e.embedding[d.i] AS DOUBLE) AS v
      FROM embeddings e CROSS JOIN dims d
    ),
    cent AS (
      SELECT label, i,
             round(CAST(SUM(CAST(v AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6) AS c
      FROM expanded GROUP BY label, i
    )
    SELECT label,
           array_to_string(list_transform(list(c ORDER BY i),
             x -> CAST(CAST(ROUND(x * 1000000) AS BIGINT) AS VARCHAR)), '|') AS centroid
    FROM cent GROUP BY label
    """,
)
def sim_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (the IVF coarse-quantizer build step) — driver-
    checkable form: the centroid array is serialized to a '|'-joined string
    of 1e6-scaled integers (array cells are unhashable in the driver's
    pandas canonicalizer). The array-valued internal twin is
    ``centroids_per_label`` (used by sim_ivf_search)."""
    return centroids_per_label(spark, sf_dir).select(
        "label",
        F.array_join(
            F.transform(
                "centroid",
                lambda c: F.round(c * 1000000).cast("long").cast("string"),
            ),
            "|",
        ).alias("centroid"),
    )


def centroids_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode embeddings → decimal-exact mean per (label, dim) →
    re-assemble ordered array. One shuffle by (label, dim); at scale this is
    how IVF cells are trained without ever collecting vectors."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    exploded = e.select("label", F.posexplode("embedding").alias("i0", "v")).select(
        "label", (F.col("i0") + 1).alias("i"), F.col("v").cast("double").alias("v")
    )
    cent = exploded.groupBy("label", "i").agg(
        F.round(
            F.sum(F.col("v").cast("decimal(20,10)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("c")
    )
    return (
        cent.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("pairs"))
        .select("label", F.transform("pairs", lambda s: s.getField("c")).alias("centroid"))
    )


def _ivf_oracle() -> str:
    """DuckDB twin of the IVF search: label centroids from the same
    decimal-exact means (the oracle-exact sim_centroid_per_label recipe),
    query→cell assignment by cosine rounded at 6 (both engines round the
    same IEEE value — the fold vs list_cosine_similarity difference is
    ~1e-16), then exact cosine top-10 within the assigned cell."""
    return f"""
    WITH dims AS (SELECT unnest(generate_series(1, {DIM})) AS i),
    expanded AS (
      SELECT e.label, d.i, CAST(e.embedding[d.i] AS DOUBLE) AS v
      FROM embeddings e CROSS JOIN dims d
    ),
    cent AS (
      SELECT label, i,
             round(CAST(SUM(CAST(v AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6) AS c
      FROM expanded GROUP BY label, i
    ),
    cent_arr AS (
      SELECT label, list(c ORDER BY i) AS centroid FROM cent GROUP BY label
    ),
    q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 20
    ),
    qc AS (
      SELECT q.query_id, q.qv, ca.label,
             round(list_cosine_similarity(q.qv, ca.centroid), 6) AS sim
      FROM q CROSS JOIN cent_arr ca
    ),
    assign AS (
      SELECT query_id, qv, label FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, label) AS r
        FROM qc
      ) WHERE r = 1
    ),
    scored AS (
      SELECT a.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.qv, CAST(e.embedding AS DOUBLE[])), 4) AS cos_sim
      FROM embeddings e JOIN assign a ON e.label = a.label
      WHERE e.vec_id <> a.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 10
    """


@query("sim_ivf_search", oracle=_ivf_oracle())
def sim_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign each query to its nearest label-centroid, then
    search only that cell. Demonstrates the two-stage (coarse quantize →
    fine search) pattern; recall is asserted against brute force in tests.
    The cell-assignment similarity is rounded at 6 BEFORE the argmax so the
    assignment is reproducible bit-for-bit across engines."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    cent = centroids_per_label(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    # nearest centroid per query (tiny cross join: queries × labels)
    qc = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qv",
            "label",
            F.round(cosine(F.col("qv"), F.col("centroid")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("label"))
    assign = qc.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1).select(
        "query_id", "qv", "label"
    )
    cand = e.join(F.broadcast(assign), "label").filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("embedding")), 4).alias("cos_sim"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


@query(
    "sim_quantize_int8",
    oracle=f"""
    WITH amax AS (
      SELECT vec_id, label,
             CAST(embedding AS DOUBLE[]) AS v,
             greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 1e-12) AS a
      FROM embeddings WHERE vec_id < 200
    ),
    quant AS (
      SELECT vec_id, label, a,
             list_transform(v, x -> CAST(round(x / a * 127) AS BIGINT)) AS q,
             v
      FROM amax
    )
    SELECT vec_id, label,
           round(a, 6) AS scale_factor,
           q[1] AS q_first,
           q[{DIM}] AS q_last,
           CAST(list_aggregate(list_transform(q, x -> abs(x)), 'max') AS BIGINT) AS q_amax,
           round(list_aggregate(list_transform(
             generate_series(1, {DIM}),
             i -> abs(v[i] - q[i] * a / 127)), 'max'), 6) AS max_abs_err
    FROM quant
    """,
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of embeddings (the compression half of an
    IVF/PQ index): per-vector absmax scale, q_i = round(v_i/a*127), plus the
    reconstruction-error bound. Pure expressions (quantize at scan time,
    8x memory cut for the ANN candidate store); deterministic arithmetic
    keeps it oracle-exact."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].filter(F.col("vec_id") < 200)
    v = F.transform("embedding", lambda x: x.cast("double"))
    base = e.select("vec_id", "label", v.alias("v"))
    a = F.greatest(
        F.array_max(F.transform("v", lambda x: F.abs(x))), F.lit(1e-12)
    )
    quant = base.withColumn("a", a).withColumn(
        "q", F.transform("v", lambda x: F.round(x / F.col("a") * 127).cast("bigint"))
    )
    recon_err = F.array_max(
        F.zip_with("v", "q", lambda x, qi: F.abs(x - qi * F.col("a") / 127))
    )
    return quant.select(
        "vec_id",
        "label",
        F.round("a", 6).alias("scale_factor"),
        F.element_at("q", 1).alias("q_first"),
        F.element_at("q", DIM).alias("q_last"),
        F.array_max(F.transform("q", lambda x: F.abs(x))).alias("q_amax"),
        F.round(recon_err, 6).alias("max_abs_err"),
    )


def _pq_oracle() -> str:
    """DuckDB twin of the full PQ pipeline (train → encode → ADC). Exactness
    levers mirrored from the Spark side: seeds = 16 lowest ids; argmin ties
    break on code; centroid means are decimal-exact rounded at 6; dot/cnorm2
    enter the ADC as 1e-6 micro-unit BIGINTs so the per-neighbor sums are
    integer (order-free); the query norm is one left-associative fold. Every
    float expression below is written left-associative to match the Spark
    fold bit-for-bit."""
    from ..operators.similarity import PQ_K, PQ_M, PQ_SUB

    def _l2sq(a: str, b: str) -> str:
        return " + ".join(
            f"(({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}]))"
            for i in range(1, PQ_SUB + 1)
        )

    def _dot(a: str, b: str) -> str:
        return " + ".join(f"({a}[{i}] * {b}[{i}])" for i in range(1, PQ_SUB + 1))

    qn_sum = " + ".join(f"(qv[{i}] * qv[{i}])" for i in range(1, DIM + 1))
    return f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    svals AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS s),
    sv AS (
      SELECT vec_id, s, list_slice(v, s * {PQ_SUB} + 1, s * {PQ_SUB} + {PQ_SUB}) AS sub
      FROM c CROSS JOIN svals
    ),
    seeds AS (
      SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {PQ_K})
    ),
    init AS (
      SELECT sv.s, seeds.code, sv.sub AS centroid
      FROM sv JOIN seeds ON sv.vec_id = seeds.vec_id
    ),
    a1 AS (
      SELECT vec_id, s, code FROM (
        SELECT sv.vec_id, sv.s, i.code,
               row_number() OVER (PARTITION BY sv.vec_id, sv.s
                                  ORDER BY ({_l2sq('sv.sub', 'i.centroid')}), i.code) AS r
        FROM sv JOIN init i ON sv.s = i.s
      ) WHERE r = 1
    ),
    dims8 AS (SELECT unnest(generate_series(1, {PQ_SUB})) AS i),
    m1 AS (
      SELECT a1.s, a1.code, d8.i,
             round(CAST(SUM(CAST(sv.sub[d8.i] AS DECIMAL(20,10))) AS DOUBLE)
                   / COUNT(*), 6) AS cval
      FROM a1 JOIN sv ON sv.vec_id = a1.vec_id AND sv.s = a1.s
      CROSS JOIN dims8 d8
      GROUP BY a1.s, a1.code, d8.i
    ),
    cb AS (
      SELECT s, code, list(cval ORDER BY i) AS centroid FROM m1 GROUP BY s, code
    ),
    enc AS (
      SELECT vec_id, s, code FROM (
        SELECT sv.vec_id, sv.s, cb.code,
               row_number() OVER (PARTITION BY sv.vec_id, sv.s
                                  ORDER BY ({_l2sq('sv.sub', 'cb.centroid')}), cb.code) AS r
        FROM sv JOIN cb ON sv.s = cb.s
      ) WHERE r = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 20),
    qsub AS (
      SELECT query_id, s,
             list_slice(qv, s * {PQ_SUB} + 1, s * {PQ_SUB} + {PQ_SUB}) AS qs
      FROM q CROSS JOIN svals
    ),
    dt AS (
      SELECT qsub.query_id, qsub.s, cb.code,
             CAST(round(({_dot('qsub.qs', 'cb.centroid')}) * 1000000) AS BIGINT) AS dot_u,
             CAST(round(({_dot('cb.centroid', 'cb.centroid')}) * 1000000) AS BIGINT) AS cn2_u
      FROM qsub JOIN cb ON qsub.s = cb.s
    ),
    qn AS (SELECT query_id, sqrt({qn_sum}) AS qn FROM q),
    approx AS (
      SELECT dt.query_id, enc.vec_id AS neighbor_id,
             CAST(SUM(dt.dot_u) AS BIGINT) AS adot_u,
             CAST(SUM(dt.cn2_u) AS BIGINT) AS rn2_u
      FROM enc JOIN dt ON enc.s = dt.s AND enc.code = dt.code
      GROUP BY dt.query_id, enc.vec_id
    ),
    scored AS (
      SELECT a.query_id, a.neighbor_id,
             round((a.adot_u / 1000000.0)
                   / (qn.qn * sqrt(greatest(a.rn2_u / 1000000.0, 1e-12))), 4)
               AS approx_cos
      FROM approx a JOIN qn ON a.query_id = qn.query_id
      WHERE a.neighbor_id <> a.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY approx_cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, approx_cos, rank FROM ranked WHERE rank <= 10
    """


@query("sim_pq_search", oracle=_pq_oracle())
def sim_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jegou et al., TPAMI 2011): deterministic
    codebook (K lowest-id seeds + one distributed Lloyd step), M=8 x K=16
    encoding, Asymmetric Distance Computation top-10. The full pipeline —
    train, encode, search — runs as DataFrame ops with the codebook and the
    per-query distance table broadcast; corpus vectors are read once at
    encode time and never at query time. Recall vs the oracle-checked
    brute-force twin is asserted in tests/test_operators.py."""
    from pyspark import StorageLevel

    from ..operators.similarity import pq_adc_topk, pq_encode, pq_train

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    cb = pq_train(e, "vec_id", "embedding").persist(StorageLevel.MEMORY_AND_DISK)
    codes = pq_encode(e, "vec_id", "embedding", cb)
    q = e.filter(F.col("vec_id") < 20)
    return pq_adc_topk(q, codes, cb, "vec_id", "embedding", k=10)


def _semantic_lsh_oracle(n_planes: int = 6, cut: float = 0.5) -> str:
    planes_sql = ", ".join(
        "[" + ", ".join(f"CAST({w} AS DOUBLE)" for w in PLANES[j]) + "]"
        for j in range(n_planes)
    )
    dots = " + ".join(
        f"(CASE WHEN list_dot_product(planes[{j + 1}], embedding) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes)
    )
    return f"""
    WITH p AS (SELECT [{planes_sql}] AS planes),
    corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 10000,
             list_transform(list_zip(CAST(embedding AS DOUBLE[]),
                                     generate_series(1, len(embedding))),
                            z -> z[1] + ((vec_id + z[2]) % 7 - 3) * 0.01)
      FROM embeddings
    ),
    b AS (
      SELECT vec_id, embedding, CAST({dots} AS BIGINT) AS bucket
      FROM corpus, p
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b, a.bucket,
             round(list_cosine_similarity(a.embedding, c.embedding), 4) AS cos_sim
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    )
    SELECT id_a, id_b, bucket, cos_sim FROM pairs WHERE cos_sim >= {cut}
    """


@query("dedup_semantic_lsh", oracle=_semantic_lsh_oracle())
def dedup_semantic_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    embeddings are blocked by a random-hyperplane LSH bucket (6 planes ->
    64 buckets; the published method blocks by k-means cluster — same
    topology) and exact cosine runs only WITHIN buckets — the pair space is
    O(sum of bucket^2), never corpus^2, and the bucket assignment is a
    map-side expression. Deterministic integer plane weights make the whole
    pipeline oracle-exact."""
    from ..operators.similarity import dot as _dot
    from ..operators.similarity import norm as _norm

    t = load_tables(spark, sf_dir)
    base = t["embeddings"].select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    twin = base.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i0) ->"
            " x + CAST((vec_id + i0 + 1) % 7 - 3 AS DOUBLE) * 0.01)"
        ).alias("embedding"),
    )
    corpus = base.unionByName(twin)
    e = corpus.select(
        "vec_id", "embedding", lsh_bucket("embedding", n_planes=6).alias("bucket")
    )
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "bucket"
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "bucket"
    )
    va = F.transform("va", lambda x: x.cast("double"))
    vb = F.transform("vb", lambda x: x.cast("double"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "bucket",
            F.round(
                _dot(va, vb) / (_norm(va) * _norm(vb)), 4
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.5)
    )


_KMEANS_K = 8
# literal-centroid plans carry K x DIM doubles in the plan tree itself;
# past this bound the single-row broadcast form delivers the same structs
# without a multi-megabyte plan (K=256 x 64 dims x ~20 chars ≈ 300 KB of
# plan text is the sanity edge; K ∝ n per tools/scale_semdedup.py)
_KMEANS_LITERAL_MAX = 256


def _kmeans_oracle() -> str:
    """DuckDB twin of the deterministic k-means pass: seeds = K lowest-id
    vectors, ONE distributed Lloyd refinement (argmin ties break on
    cluster id; decimal-exact means rounded at 6), final assignment with
    L2^2 rounded at 4. All distance sums are generated LEFT-ASSOCIATIVE so
    they are bit-identical to the Spark fold."""

    def _l2(a: str, b: str) -> str:
        return " + ".join(
            f"(({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}]))"
            for i in range(1, DIM + 1)
        )

    return f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    seeds AS (
      SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_KMEANS_K})
    ),
    init AS (
      SELECT seeds.cluster, c.v AS centroid FROM c JOIN seeds USING (vec_id)
    ),
    a1 AS (
      SELECT vec_id, cluster FROM (
        SELECT c.vec_id, i.cluster,
               row_number() OVER (PARTITION BY c.vec_id
                                  ORDER BY ({_l2('c.v', 'i.centroid')}), i.cluster) AS r
        FROM c CROSS JOIN init i
      ) WHERE r = 1
    ),
    dims AS (SELECT unnest(generate_series(1, {DIM})) AS i),
    m1 AS (
      SELECT a1.cluster, d.i,
             round(CAST(SUM(CAST(c.v[d.i] AS DECIMAL(20,10))) AS DOUBLE)
                   / COUNT(*), 6) AS cv
      FROM a1 JOIN c USING (vec_id) CROSS JOIN dims d
      GROUP BY a1.cluster, d.i
    ),
    cent AS (SELECT cluster, list(cv ORDER BY i) AS centroid FROM m1 GROUP BY cluster),
    final AS (
      SELECT vec_id, cluster, d2 FROM (
        SELECT c.vec_id, ct.cluster, ({_l2('c.v', 'ct.centroid')}) AS d2,
               row_number() OVER (PARTITION BY c.vec_id
                                  ORDER BY ({_l2('c.v', 'ct.centroid')}), ct.cluster) AS r
        FROM c CROSS JOIN cent ct
      ) WHERE r = 1
    )
    SELECT vec_id, cluster, round(d2, 4) AS dist2 FROM final
    """


@query("sim_kmeans", oracle=_kmeans_oracle())
def sim_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distributed k-means over the embeddings table (the
    clustering pass SemDeDup/"cluster-then-dedup" curation pipelines need;
    also the IVF coarse-quantizer trainer for unlabeled corpora): K lowest-
    id seeds, one Lloyd refinement, per-vector (cluster, L2^2) out.

    Exactness levers (same recipe as the oracle-exact PQ pipeline):
    centroid means are decimal-exact rounded at 6, argmin distances are the
    ordered 64-term fold (bit-identical across engines), ties break on
    cluster id, final distance rounded at 4.

    100 TB design: vectors are NEVER collected — seeds come from a bounded
    id lookup, centroids broadcast (K x 64 doubles), assignment is map-side
    argmin, re-centering is one posexplode groupBy with map-side partials.
    More Lloyd iterations = more of the same step, cost linear per pass."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    return kmeans_assign(e)


def _argmin_over(cent_array):
    """(d, cluster) of the nearest centroid over ANY array<struct<cluster,
    centroid>> expression: `array_min` over per-centroid (L2^2, cluster)
    structs — lexicographic struct ordering IS the (distance, cluster-id)
    tie-break. The ordered 64-term `_l2sq` fold keeps values bit-identical
    across both centroid-delivery forms (literal / broadcast)."""
    from ..operators.similarity import _l2sq

    return F.array_min(
        F.transform(
            cent_array,
            lambda ct: F.struct(
                _l2sq(F.col("v"), ct["centroid"]).alias("d"),
                ct["cluster"].alias("cluster"),
            ),
        )
    )


def _kmeans_argmin(cents: list[tuple[int, list[float]]]):
    """(d, cluster) of the nearest centroid as a single map-side expression:
    the K centroids are embedded as a literal array of structs. Same
    ordered 64-term `_l2sq` fold as before, so values are bit-identical;
    what changed (round 9, VERDICT r08 task 4) is topology: no K x n cross
    join, no groupBy(vec_id) carrying the vector through a SortAggregate —
    assignment is pure projection inside whole-stage codegen."""
    lit = F.array(
        *[
            F.struct(
                F.lit(c).alias("cluster"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("centroid"),
            )
            for c, vec in cents
        ]
    )
    return _argmin_over(lit)


def _assign_with_centroids(
    e: DataFrame, cents: list[tuple[int, list[float]]], k: int
) -> tuple[DataFrame, "F.Column"]:
    """(relation, argmin-struct-column) for one Lloyd assignment pass,
    auto-switching centroid delivery on K (VERDICT r09 task 3):

    - K <= _KMEANS_LITERAL_MAX: centroids as a literal array — pure
      projection, zero joins, zero exchanges in the assignment stage;
    - larger K: a SINGLE-ROW broadcast relation carrying the same
      array<struct> cross-joined in (BroadcastNestedLoopJoin against one
      row = a map over `e`; no shuffle Exchange, no per-row K-way
      expansion, no multi-megabyte literal plan for K ~ 10^4 per the
      K ∝ n law in tools/scale_semdedup.py).

    Both forms evaluate the IDENTICAL argmin expression over the identical
    centroid structs, so results are bit-identical (asserted in
    tests/test_operators.py::test_kmeans_broadcast_form_identical)."""
    if k <= _KMEANS_LITERAL_MAX:
        return e, _kmeans_argmin(cents)
    spark = e.sparkSession
    payload = [
        {"cluster": int(c), "centroid": [float(x) for x in vec]}
        for c, vec in cents
    ]
    cdf = spark.createDataFrame(
        [(payload,)],
        schema="__cents array<struct<cluster:int,centroid:array<double>>>",
    )
    joined = e.crossJoin(F.broadcast(cdf))
    return joined, _argmin_over(F.col("__cents"))


def kmeans_assign(
    e: DataFrame, k: int = _KMEANS_K, with_vector: bool = False
) -> DataFrame:
    """(vec_id, cluster, dist2) for any (vec_id, v: array<double>) relation —
    the deterministic k-means core sim_kmeans and pipeline_semdedup share:
    K lowest-id seeds, one Lloyd refinement with decimal-exact means,
    per-vector argmin with cluster-id tie-break, L2^2 rounded at 4.

    The K centroids are driver-collected (K x 64 doubles — bounded by K
    like the seed-id list, never corpus-proportional). Centroid delivery
    auto-switches on K (_assign_with_centroids): literals for
    K <= _KMEANS_LITERAL_MAX (map-only projection), a single-row broadcast
    relation beyond (same argmin expression, BroadcastNestedLoopJoin
    against one row, still no shuffle in the assignment stage) — so a
    caller at K ~ 10^4 per the K ∝ n law in tools/scale_semdedup.py never
    builds a multi-megabyte literal plan. The only shuffle either way is
    the K*DIM-group re-centering mean."""
    # ids AND vectors in ONE TakeOrdered job (K rows over the wire)
    seeds = e.select("vec_id", "v").orderBy("vec_id").limit(k).collect()
    init = [(c, list(r[1])) for c, r in enumerate(seeds)]

    rel1, best1 = _assign_with_centroids(e, init, k)
    a1 = rel1.withColumn("cluster", best1["cluster"])
    mean_rows = (
        a1.select("cluster", F.posexplode("v").alias("i", "val"))
        .groupBy("cluster", "i")
        .agg(
            F.round(
                F.sum(F.col("val").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("cv")
        )
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = {}
    for r in mean_rows:
        by_cluster.setdefault(r["cluster"], {})[r["i"]] = r["cv"]
    cent = [
        (c, [dims[i] for i in sorted(dims)])
        for c, dims in sorted(by_cluster.items())
    ]
    rel2, best = _assign_with_centroids(e, cent, k)
    cols = [
        F.col("vec_id"),
        best["cluster"].alias("cluster"),
        F.round(best["d"], 4).alias("dist2"),
    ]
    if with_vector:
        # consumers that need (cluster, v) together (semdedup's in-cluster
        # verify) take it straight off the projection — a vec_id join back
        # to the corpus would shuffle the vectors twice for nothing
        cols.append(F.col("v"))
    return rel2.select(*cols)


_SEMDEDUP_CUT = 0.5


def _semdedup_oracle() -> str:
    """DuckDB twin of the faithful SemDeDup pipeline: the mutated-twin
    corpus, the deterministic k-means assignment (same CTE recipe as the
    oracle-exact sim_kmeans, sourced on the corpus), in-cluster exact
    cosine, and per-cluster dedup accounting."""

    def _l2(a: str, b: str) -> str:
        return " + ".join(
            f"(({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}]))"
            for i in range(1, DIM + 1)
        )

    return f"""
    WITH c AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 10000,
             list_transform(list_zip(CAST(embedding AS DOUBLE[]),
                                     generate_series(1, len(embedding))),
                            z -> z[1] + ((vec_id + z[2]) % 7 - 3) * 0.01)
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster
      FROM (SELECT vec_id FROM c ORDER BY vec_id LIMIT {_KMEANS_K})
    ),
    init AS (
      SELECT seeds.cluster, c.v AS centroid FROM c JOIN seeds USING (vec_id)
    ),
    a1 AS (
      SELECT vec_id, cluster FROM (
        SELECT c.vec_id, i.cluster,
               row_number() OVER (PARTITION BY c.vec_id
                                  ORDER BY ({_l2('c.v', 'i.centroid')}), i.cluster) AS r
        FROM c CROSS JOIN init i
      ) WHERE r = 1
    ),
    dims AS (SELECT unnest(generate_series(1, {DIM})) AS i),
    m1 AS (
      SELECT a1.cluster, d.i,
             round(CAST(SUM(CAST(c.v[d.i] AS DECIMAL(20,10))) AS DOUBLE)
                   / COUNT(*), 6) AS cv
      FROM a1 JOIN c USING (vec_id) CROSS JOIN dims d
      GROUP BY a1.cluster, d.i
    ),
    cent AS (SELECT cluster, list(cv ORDER BY i) AS centroid FROM m1 GROUP BY cluster),
    assign AS (
      SELECT vec_id, cluster FROM (
        SELECT c.vec_id, ct.cluster,
               row_number() OVER (PARTITION BY c.vec_id
                                  ORDER BY ({_l2('c.v', 'ct.centroid')}), ct.cluster) AS r
        FROM c CROSS JOIN cent ct
      ) WHERE r = 1
    ),
    pairs AS (
      SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_cosine_similarity(ca.v, cb.v), 4) AS cos_sim
      FROM assign a
      JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN c ca ON ca.vec_id = a.vec_id
      JOIN c cb ON cb.vec_id = b.vec_id
    ),
    dups AS (SELECT * FROM pairs WHERE cos_sim >= {_SEMDEDUP_CUT})
    SELECT a.cluster,
           CAST(COUNT(DISTINCT a.vec_id) AS BIGINT) AS n_vectors,
           CAST(COALESCE(d.n_pairs, 0) AS BIGINT)   AS n_dup_pairs,
           CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
           CAST(COUNT(DISTINCT a.vec_id) - COALESCE(d.n_dropped, 0) AS BIGINT)
             AS n_kept
    FROM assign a
    LEFT JOIN (
      SELECT cluster, COUNT(*) AS n_pairs, COUNT(DISTINCT id_b) AS n_dropped
      FROM dups GROUP BY cluster
    ) d ON a.cluster = d.cluster
    GROUP BY a.cluster, d.n_pairs, d.n_dropped
    """


@query("pipeline_semdedup", oracle=_semdedup_oracle())
def pipeline_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAITHFUL SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding corpus with k-means, then remove near-duplicates by exact
    cosine WITHIN clusters only — the published cluster-then-dedup
    topology (dedup_semantic_lsh is the LSH-blocked variant of the same
    idea). Corpus = embeddings plus deterministic mutated twins, so every
    cluster contains real near-duplicates to find.

    100 TB design: the k-means pass never collects vectors (seeds by id,
    centroids broadcast, means via posexplode groupBy); the dedup
    pair-space is per-cluster, not corpus-wide — candidate cost is
    sum(|cluster|^2) instead of n^2, tunable by K exactly as published.
    Per-cluster accounting (vectors, dup pairs, dropped, kept) is the
    1-row-per-cluster diagnostic a curation run reads."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # two-step select: in one select, Spark's LATERAL column-alias
    # resolution would bind the lambda's vec_id to the ALIASED +10000 id
    twins = (
        t["embeddings"]
        .select(
            F.col("vec_id").alias("orig_id"),
            F.transform(
                "embedding",
                lambda x, i: x.cast("double")
                + ((F.col("vec_id") + i + 1) % 7 - 3) * 0.01,
            ).alias("v"),
        )
        .select((F.col("orig_id") + 10000).alias("vec_id"), "v")
    )
    corpus = e.unionByName(twins)
    # (vec_id, cluster, v) in ONE map-only projection (with_vector) — no
    # join back to the corpus. NOT persisted: re-deriving the projection
    # per consumer (both pair-join sides + the accounting) measured FASTER
    # than caching the 64-dim vectors (15.7s vs 28.9s at sf0.01 — the
    # recompute-over-cache rule that also holds for text_dsir_selection)
    withv = kmeans_assign(corpus, with_vector=True).select(
        "vec_id", "cluster", "v"
    )
    assign = withv.select("vec_id", "cluster")
    a = withv.select("cluster", F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = withv.select("cluster", F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "cluster",
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim"),
        )
    )
    dups = pairs.filter(F.col("cos_sim") >= _SEMDEDUP_CUT)
    dstats = dups.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_pairs"),
        F.countDistinct("id_b").cast("bigint").alias("n_dropped"),
    )
    return (
        assign.groupBy("cluster")
        .agg(F.countDistinct("vec_id").cast("bigint").alias("n_vectors"))
        .join(dstats, "cluster", "left")
        .select(
            "cluster",
            "n_vectors",
            F.coalesce("n_dup_pairs", F.lit(0)).cast("bigint").alias("n_dup_pairs"),
            F.coalesce("n_dropped", F.lit(0)).cast("bigint").alias("n_dropped"),
            (F.col("n_vectors") - F.coalesce("n_dropped", F.lit(0)))
            .cast("bigint")
            .alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Cluster-balanced sampling (round 8): the DataComp/SemDeDup-family
# "cluster then equalize" selection step — embed, k-means, keep a fixed
# per-cluster budget so over-represented modes are downsampled and rare
# modes survive (diversity-preserving alternative to uniform sampling).
# ---------------------------------------------------------------------------

_CBS_BUDGET = 25  # per-cluster keep budget


def _cluster_balanced_oracle() -> str:
    from ..functions.portable import hash64_sql

    return f"""
    WITH asg AS ({_kmeans_oracle()}),
    ranked AS (
      SELECT vec_id, cluster,
             row_number() OVER (
               PARTITION BY cluster
               ORDER BY {hash64_sql("CAST(vec_id AS VARCHAR)")}, vec_id
             ) AS rn
      FROM asg
    )
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE rn <= {_CBS_BUDGET}) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn <= {_CBS_BUDGET} THEN vec_id ELSE 0 END)
                AS BIGINT) AS kept_id_sum
    FROM ranked GROUP BY cluster
    """


@query("pipeline_cluster_balanced_sample", oracle=_cluster_balanced_oracle())
def pipeline_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling (the DataComp-style diversity sampler):
    k-means the embeddings (the proven sim_kmeans pass), then keep a fixed
    per-cluster budget chosen by deterministic hash rank — equalizing
    cluster mass so dominant modes shrink and rare modes survive. Output is
    per-cluster accounting plus an order-free kept-membership fingerprint
    (integer id sum), so the driver check pins the EXACT kept set.

    Determinism: ranking key is (md5-hash of vec_id, vec_id) — no rand(),
    no row order — the kept set is bit-identical under any partitioning
    (same contract as text_stratified_sample / pipeline_training_mix).

    100 TB design: clustering is the sim_kmeans topology (vectors never
    collected, K-row centroid broadcast); the rank is one window per
    cluster — with the K-proportional-to-n rule the per-cluster sort stays
    bounded (the same scaling law tools/scale_semdedup.py measures), and
    the budget filter is map-side after the rank. The final accounting is
    one groupBy(cluster) with map-side partials."""
    from ..functions.portable import hash64

    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    asg = kmeans_assign(e)
    w = Window.partitionBy("cluster").orderBy(
        hash64(F.col("vec_id").cast("string")), "vec_id"
    )
    ranked = asg.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.count_if(F.col("rn") <= _CBS_BUDGET).cast("bigint").alias("n_kept"),
        F.sum(
            F.when(F.col("rn") <= _CBS_BUDGET, F.col("vec_id")).otherwise(0)
        )
        .cast("bigint")
        .alias("kept_id_sum"),
    )


# ---------------------------------------------------------------------------
# Round 9: embedding covariance — the whitening / PCA build statistic
# (compute sum(x_i * x_j) and the mean vector distributed; the 64x64 eigen
# step is a bounded driver-side operation downstream, like the K-centroid
# collect). Output is the upper triangle of the centered covariance matrix
# in integer micro-units, so the driver check pins every cell exactly.
# ---------------------------------------------------------------------------


@query(
    "sim_embedding_covariance",
    oracle=f"""
    WITH dims AS (SELECT unnest(generate_series(1, {DIM})) AS i),
    x AS (
      SELECT e.vec_id, d.i, CAST(e.embedding[d.i] AS DOUBLE) AS v
      FROM embeddings e CROSS JOIN dims d
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
    means AS (
      SELECT i, CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / (SELECT n FROM n) AS m
      FROM x GROUP BY i
    ),
    prods AS (
      SELECT a.i AS i, b.i AS j,
             CAST(SUM(CAST(round(a.v * b.v * 1e6) AS BIGINT)) AS BIGINT) AS sxy_u
      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY a.i, b.i
    )
    SELECT p.i, p.j,
           CAST(round(
             (CAST(p.sxy_u AS DOUBLE) / 1e6 / (SELECT n FROM n)
              - mi.m * mj.m) * 1e6) AS BIGINT) AS cov_u
    FROM prods p
    JOIN means mi ON mi.i = p.i
    JOIN means mj ON mj.i = p.j
    """,
)
def sim_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered covariance of the embedding dimensions (upper triangle,
    E[xy] - E[x]E[y], 1e-6-unit integers): the distributed half of
    whitening / PCA — the 64x64 matrix this emits is what a driver-side
    eigendecomposition (bounded: DIM^2 doubles, like the K-centroid
    collect) turns into a projection.

    Exactness: per-row products x_i*x_j are identical doubles in both
    engines; they enter the sums as 1e-6-unit INTEGERS (order-independent,
    overflow-free at 38 digits) and the means ride a DECIMAL(38,12) sum —
    the only float ops after aggregation are one division and one
    subtract on identical doubles, re-rounded to integer units.

    100 TB design: the per-row dim-pair expansion (DIM^2/2 products) is a
    map-side projection feeding ONE combinable groupBy on (i, j) — a
    2,080-group aggregation regardless of corpus size; the join is
    per-row (vec_id) within the same scan, not a shuffle join (Spark
    plans the posexplode pair as a single pass); nothing vector-shaped
    shuffles. In production the same statistic comes from a per-batch
    BLAS X^T X in mapInPandas — this form stays whole-stage-codegen."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    n = e.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    x = e.select("vec_id", F.posexplode("v").alias("i0", "xv")).select(
        "vec_id", (F.col("i0") + 1).alias("i"), "xv"
    )
    means = x.groupBy("i").agg(
        (F.sum(F.col("xv").cast("decimal(38,12)")).cast("double")).alias("s")
    )
    # dim-pair products stay INSIDE one row: explode (i, x_i), then pair
    # each with the full vector's j >= i slice — no self-join shuffle
    pairs = e.select(
        "vec_id", F.posexplode("v").alias("i0", "xi"), F.col("v").alias("vv")
    ).select(
        (F.col("i0") + 1).alias("i"),
        F.posexplode(F.slice("vv", F.col("i0") + 1, DIM)).alias("j0", "xj"),
        "xi",
    )
    prods = pairs.select(
        F.col("i").cast("bigint").alias("i"),
        (F.col("i") + F.col("j0")).cast("bigint").alias("j"),
        F.round(F.col("xi") * F.col("xj") * 1e6).cast("bigint").alias("p_u"),
    ).groupBy("i", "j").agg(F.sum("p_u").cast("bigint").alias("sxy_u"))
    mi = means.select(F.col("i").cast("bigint").alias("i"), F.col("s").alias("si"))
    mj = means.select(F.col("i").cast("bigint").alias("j"), F.col("s").alias("sj"))
    return (
        prods.join(mi, "i")
        .join(mj, "j")
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            F.round(
                (
                    F.col("sxy_u") / 1e6 / F.col("n")
                    - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n"))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("cov_u"),
        )
    )
