"""Connected-components queries (plans for operators/components.py).

Two oracle-checked entries:

- ``graph_connected_components``: synthetic chains + cycles built from
  ``range()`` on both engines — exercises the multi-round large-star /
  small-star fixpoint (chain diameter 49 forces several contractions; the
  ring closures add non-tree edges).
- ``dedup_cluster_components``: the real pipeline composition — MinHash-LSH
  verified near-dup pairs over a corpus where every doc has a CHAIN of two
  mutated twins, resolved to duplicate clusters. This is the step that makes
  a keep-policy exact when near-dup relations chain (A~B~C without A~C).

Both oracles are DuckDB recursive transitive closures (min reachable id per
node) — exponentially slower than the star contraction at scale, but exact
at sf0.01, which is the point of the oracle.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.components import connected_components
from ..operators.dedup import (
    MINHASH_PRIME,
    doc_shingle_arrays,
    jaccard_pairs_from_arrays,
    lsh_bands_arr,
    lsh_candidate_pairs,
    minhash_sig_arr,
)
from ..session import default_parallelism
from ..sources import load_tables
from .registry import query


@query(
    "graph_connected_components",
    oracle="""
    WITH RECURSIVE
    chain_edges AS (
      SELECT i AS src, i + 1 AS dst
      FROM generate_series(0, 998) t(i)
      WHERE i % 50 <> 49
    ),
    ring_edges AS (
      SELECT 50 * k AS src, 50 * k + 49 AS dst
      FROM generate_series(0, 19) t(k)
      WHERE k % 2 = 0
    ),
    base AS (SELECT src, dst FROM chain_edges UNION ALL SELECT src, dst FROM ring_edges),
    bidir AS (SELECT src, dst FROM base UNION SELECT dst AS src, src AS dst FROM base),
    nodes AS (SELECT DISTINCT src AS n FROM bidir),
    reach(n, r) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT b.dst AS n, reach.r FROM reach JOIN bidir b ON b.src = reach.n
    ),
    lab AS (SELECT n, MIN(r) AS component FROM reach GROUP BY n)
    SELECT component, COUNT(*) AS n_nodes, MAX(n) AS max_node
    FROM lab
    GROUP BY component
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20 chains of 50 nodes (0-49, 50-99, …), every even chain closed into a
    ring — 20 components of 50 nodes each, found by star contraction."""
    chain = (
        spark.range(0, 999)
        .filter(F.col("id") % 50 != 49)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    ring = (
        spark.range(0, 20)
        .filter(F.col("id") % 2 == 0)
        .select((F.col("id") * 50).alias("src"), (F.col("id") * 50 + 49).alias("dst"))
    )
    comp = connected_components(chain.unionByName(ring))
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_nodes"), F.max("node").alias("max_node")
    )


TWIN1_OFFSET = 100000
TWIN2_OFFSET = 200000
TWIN1_SUFFIX = " zq yq xq"
TWIN2_SUFFIX = " zq yq xq pq"


def _corpus3(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    t1 = d.select(
        (F.col("doc_id") + TWIN1_OFFSET).alias("doc_id"),
        F.concat("text", F.lit(TWIN1_SUFFIX)).alias("text"),
    )
    t2 = d.select(
        (F.col("doc_id") + TWIN2_OFFSET).alias("doc_id"),
        F.concat("text", F.lit(TWIN2_SUFFIX)).alias("text"),
    )
    return d.unionByName(t1).unionByName(t2)


# Same portable MinHash pipeline as plans/dedup.py's oracle (driver-green
# there), over the 3-part corpus, then a recursive closure over the verified
# pairs. Kept inline: the oracle must be a single self-contained statement.
_CLUSTER_ORACLE = f"""
WITH RECURSIVE
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {TWIN1_OFFSET}, text || '{TWIN1_SUFFIX}' FROM documents
  UNION ALL
  SELECT doc_id + {TWIN2_OFFSET}, text || '{TWIN2_SUFFIX}' FROM documents
),
toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tok FROM corpus
),
shingles AS (
  SELECT DISTINCT doc_id, s
  FROM toks, UNNEST(list_transform(
         generate_series(1, greatest(len(tok) - 2, 0)),
         i -> array_to_string(list_slice(tok, i, i + 2), ' '))) AS u(s)
),
hashed AS (
  SELECT doc_id,
         CAST('0x' || SUBSTR(MD5(s), 1, 15) AS BIGINT) % {MINHASH_PRIME} AS h
  FROM shingles
),
perms AS (SELECT unnest(generate_series(0, 63)) AS pi),
mh AS (
  SELECT doc_id, pi,
         MIN(((1103515245 * (pi + 1) + 12345) % {MINHASH_PRIME} * h
              + (69069 * (pi + 1) + 362437) % {MINHASH_PRIME}) % {MINHASH_PRIME}) AS v
  FROM hashed CROSS JOIN perms
  GROUP BY doc_id, pi
),
bands AS (
  SELECT doc_id, pi // 4 AS band_id,
         md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY pi)) AS band_hash
  FROM mh GROUP BY doc_id, pi // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.id_a
  JOIN shingles sb ON sb.doc_id = c.id_b AND sb.s = sa.s
  GROUP BY c.id_a, c.id_b
),
edges AS (
  SELECT i.id_a AS src, i.id_b AS dst
  FROM inter i
  JOIN sizes na ON na.doc_id = i.id_a
  JOIN sizes nb ON nb.doc_id = i.id_b
  WHERE CAST(i.n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - i.n_inter) >= 0.3
),
bidir AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
reach(n, r) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT b.dst AS n, reach.r FROM reach JOIN bidir b ON b.src = reach.n
),
lab AS (SELECT n, MIN(r) AS component FROM reach GROUP BY n)
SELECT component AS cluster_rep, COUNT(*) AS n_docs, MAX(n) AS max_doc
FROM lab
GROUP BY component
"""


@query("dedup_cluster_components", oracle=_CLUSTER_ORACLE)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: every doc has a chain of two
    mutated twins (orig ~ twin1 ~ twin2); LSH-verified pairs feed the star
    contraction, so each cluster resolves to (min doc_id, 3 docs) even when
    some orig~twin2 pair is below the Jaccard cut. Singletons (docs whose
    pairs all fail verification) stay as 1-doc clusters via the nodes
    relation."""
    corpus = _corpus3(spark, sf_dir).repartition(default_parallelism(), F.col("doc_id"))
    # ARRAY topology (round 6, operators/dedup.py): per-doc shingle-hash
    # arrays, zero-shuffle per-row signatures, array_intersect verify.
    # The component loop itself still localCheckpoints per round (lineage
    # cutting across iterations is checkpoint's legitimate job).
    per_doc = doc_shingle_arrays(corpus, "doc_id", "text").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # eager (r15): AQE launches the three consumer stages (signature map,
    # both verification join sides) concurrently — populate the cache
    # first or each racing stage recomputes the shingle pipeline.
    per_doc.count()
    # no sig persist (r15): the bucket pre-aggregation leaves the
    # signature exactly one consumer (lsh_bands) — the persist was a pure
    # extra materialization, same finding as minhash r10.
    sig = per_doc.filter(F.col("n_sh") > 0).select(
        "doc_id", minhash_sig_arr("sh_arr", num_perms=64).alias("sig")
    )
    pairs = lsh_candidate_pairs(lsh_bands_arr(sig, "doc_id"), "doc_id")
    edges = (
        jaccard_pairs_from_arrays(pairs, per_doc, "doc_id")
        .filter(F.col("jaccard") >= 0.3)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    comp = connected_components(edges, nodes=corpus.select("doc_id"))
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_docs"), F.max("node").alias("max_doc")
    ).select(F.col("component").alias("cluster_rep"), "n_docs", "max_doc")


# ---------------------------------------------------------------------------
# PageRank — the third iterative-algorithm demonstration (components and
# WITH RECURSIVE are the other two), in ALL-INTEGER arithmetic so five
# fixed iterations are bit-identical across engines and execution orders
# ---------------------------------------------------------------------------

_PR_SCALE = 10**12
_PR_ITERS = 5


def _pagerank_oracle() -> str:
    """Supplier -> customer bipartite graph from lineitem x orders; 5
    unrolled iterations of m' = floor(0.15*S/N) + sum(m_u*85 // (100*deg_u))
    (integer floor division in both engines; dangling mass dropped — the
    standard simplified variant, applied identically on both sides)."""
    S = _PR_SCALE
    cte = f"""
    WITH edges AS (
      SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 1000000 AS dst
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    nodes AS (
      SELECT DISTINCT n FROM (
        SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges)
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n_nodes FROM nodes),
    r0 AS (SELECT n, CAST({S} AS BIGINT) // (SELECT n_nodes FROM nn) AS m FROM nodes)
    """
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        cte += f""",
    r{i} AS (
      SELECT nodes.n,
             CAST(15 * {S} // (100 * (SELECT n_nodes FROM nn)) AS BIGINT)
             + CAST(COALESCE(SUM(({prev}.m * 85) // (100 * deg.d)), 0) AS BIGINT) AS m
      FROM nodes
      LEFT JOIN edges ON edges.dst = nodes.n
      LEFT JOIN deg   ON deg.src = edges.src
      LEFT JOIN {prev} ON {prev}.n = edges.src
      GROUP BY nodes.n
    )"""
        prev = f"r{i}"
    return cte + f"""
    SELECT n AS node, m AS rank_micro
    FROM {prev}
    ORDER BY m DESC, n
    LIMIT 20
    """


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier->customer graph, 5 fixed iterations in
    integer micro-units: contribution = (m*85) DIV (100*deg) — floor
    division both engines, so every iteration is bit-identical under ANY
    partitioning/order (no float accumulation at 1000 executors).

    100 TB design: each iteration is one shuffle (contributions grouped by
    dst) against a static, re-used edge relation; lineage is cut per round
    with localCheckpoint exactly like the components fixpoint. Top-20 via
    TakeOrderedAndProject."""
    t = load_tables(spark, sf_dir)
    edges = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + 1000000).alias("dst"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        edges.select(F.col("src").alias("n"))
        .unionByName(edges.select(F.col("dst").alias("n")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    n_nodes = nodes.count()  # scalar; O(1) driver data
    base = (15 * _PR_SCALE) // (100 * n_nodes)
    ranks = nodes.select("n", F.lit(_PR_SCALE // n_nodes).alias("m"))
    contrib_edges = edges.join(deg, "src")  # (src, dst, d) — static, reused
    for _ in range(_PR_ITERS):
        contribs = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.n)
            .select("dst", F.expr("(m * 85) DIV (100 * d)").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, nodes.n == contribs.dst, "left")
            .select("n", (F.lit(base) + F.coalesce("s", F.lit(0))).alias("m"))
            .localCheckpoint(eager=False)
        )
    return (
        ranks.select(F.col("n").alias("node"), F.col("m").alias("rank_micro"))
        .orderBy(F.col("rank_micro").desc(), "node")
        .limit(20)
    )


_TRI_MOD = 5  # DOULION keep-probability p = 1/_TRI_MOD (deterministic)

_TRIANGLE_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
   AND a.l_suppkey < b.l_suppkey
),
sparse AS (
  SELECT u, v FROM pairs
  WHERE CAST('0x' || SUBSTR(MD5(u || ':' || v), 1, 15) AS BIGINT)
        % {_TRI_MOD} = 0
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM sparse e1
  JOIN sparse e2 ON e2.u = e1.v
  JOIN sparse e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT nd AS node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM tri, UNNEST([a, b, c]) AS un(nd)
GROUP BY nd
"""


@query("graph_triangle_count", oracle=_TRIANGLE_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the DOULION-sparsified supplier
    co-purchase graph (Tsourakakis et al. 2009, KDD — count triangles on a
    p-sparsified graph, estimate total as count/p^3; Suri & Vassilvitskii
    2011 for the MapReduce join shape). Edges: suppliers co-occurring in an
    order, vertex-ordered (u < v) so each triangle materializes exactly
    once; sparsifier: deterministic md5 hash of the edge — reproducible
    across engines and retries, unlike coin-flip DOULION. The per-node
    count is each node's clustering-coefficient numerator; the global
    DOULION estimate is sum(n_triangles)/3 * {_TRI_MOD}^3.

    100 TB design: the wedge join (e1 ⋈ e2 on the shared vertex) is the
    only quadratic-risk step — the sparsifier cuts it by p^2 and the
    vertex ordering halves it; at web scale the standard refinement is
    ordering vertices by DEGREE instead of id (bounds the wedge count per
    node by the arboricity), same plan shape. Everything is
    map-side-combinable groupBys and equi-joins — no collect, no
    cartesian. Reference parity: reference serves SQL via linked DuckDB
    (db/db.go:67-117); this extends the graph surface next to
    connected-components and PageRank."""
    from ..functions.portable import hash64

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_suppkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
    ).select(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
    # sparsify BEFORE the distinct (r09 skew-proofing, step 1): the hash
    # depends only on (u, v), so duplicates filter identically and the
    # filter commutes with DISTINCT — but a skewed mega-order's C(k,2)
    # pair explosion now hits the dedup shuffle at 1/_TRI_MOD of its
    # volume (the pair GENERATION is pipelined map-side; the shuffle was
    # the actual blowup). Asserted at 10x with a deliberate mega-order in
    # tools/scale_triangles.py.
    sparse = pairs.filter(
        hash64(
            F.concat(
                F.col("u").cast("string"), F.lit(":"), F.col("v").cast("string")
            )
        )
        % _TRI_MOD
        == 0
    ).distinct()
    return triangle_counts(sparse)


def triangle_counts(sparse: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected (u < v) edge relation.

    r09 skew-proofing, step 2 — DEGREE-ordered wedge join (the refinement
    the r08 docstring named): each edge is re-oriented x -> y by
    (degree, id) order before the wedge self-join, which bounds each
    middle node's wedge count by O(sqrt(m)) (arboricity bound; Chiba &
    Nishizeki) instead of O(max_degree) under id ordering. The triangle
    SET is orientation-invariant — any total vertex order materializes
    each triangle exactly once — so the oracle (id-ordered SQL) is
    unchanged; only the join workload distribution moves. Degrees come
    from the sparsified edges themselves (one map-side-combinable
    groupBy; node-proportional relation, never hint-broadcast).

    persist: the oriented edge list feeds all three legs of the triangle
    join — uncached, the co-occurrence self-join + distinct recomputes
    per leg (measured 5.5s -> 1.8s in r08)."""
    from pyspark import StorageLevel

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
                F.struct(F.col("u").alias("x"), F.col("v").alias("y")),
            )
            .otherwise(F.struct(F.col("v").alias("x"), F.col("u").alias("y")))
            .alias("e")
        )
        .select("e.x", "e.y")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e1 = oriented.select(F.col("x").alias("a"), F.col("y").alias("b"))
    e2 = oriented.select(F.col("x").alias("b"), F.col("y").alias("c"))
    e3 = oriented.select(F.col("x").alias("a"), F.col("y").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
