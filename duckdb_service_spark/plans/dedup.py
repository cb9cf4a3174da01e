"""Deduplication queries over the documents table — exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine (SURVEY §7.1 M6 extensions).

The fixture has no natural duplicates, so each query deterministically
synthesizes near-duplicates: every doc is unioned with a twin
(doc_id + 100000, text || ' zq yq xq') — both engines build the identical
corpus, making the whole pipeline oracle-checkable end to end (a rarity for
LSH implementations; enabled by the portable md5 hash).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    MINHASH_PRIME,
    doc_shingle_arrays,
    exact_dedup,
    jaccard_pairs_from_arrays,
    lsh_bands_arr,
    lsh_candidate_pairs,
    minhash_sig_arr,
    perm_coeffs,
    shingles_expr,
    simhash,
)
from ..sources import load_tables
from .registry import query

TWIN_OFFSET = 100000
TWIN_SUFFIX = " zq yq xq"

# Shared oracle CTE: the same twinned corpus + shingle sets in DuckDB SQL.
_CORPUS_SQL = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {TWIN_OFFSET} AS doc_id, text || '{TWIN_SUFFIX}' AS text FROM documents
),
toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tok FROM corpus
),
shingles AS (
  SELECT DISTINCT doc_id, s
  FROM toks, UNNEST(list_transform(
         generate_series(1, greatest(len(tok) - 2, 0)),
         i -> array_to_string(list_slice(tok, i, i + 2), ' '))) AS u(s)
)
"""


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    d = t["documents"].select("doc_id", "text")
    twin = d.select(
        (F.col("doc_id") + TWIN_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(TWIN_SUFFIX)).alias("text"),
    )
    return d.unionByName(twin)


@query(
    "dedup_exact",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text FROM documents   -- exact copies this time
    ),
    hashed AS (
      SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS content_hash,
             doc_id
      FROM corpus
    )
    SELECT content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM hashed
    GROUP BY content_hash
    """,
    bench=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash-groupBy, keep-min-id) over a corpus where every doc
    has one exact copy → every group has n_copies=2."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].select("doc_id", "text")
    corpus = d.unionByName(
        d.select((F.col("doc_id") + TWIN_OFFSET).alias("doc_id"), "text")
    )
    return exact_dedup(corpus, "text", "doc_id")


_MINHASH_PAIRS_ORACLE = f"""
    WITH {_CORPUS_SQL},
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
    )
    SELECT i.id_a, i.id_b,
           round(CAST(i.n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.id_a
    JOIN sizes nb ON nb.doc_id = i.id_b
    WHERE CAST(i.n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - i.n_inter) >= 0.3
    """


@query("dedup_minhash_lsh", oracle=_MINHASH_PAIRS_ORACLE, bench=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → 64-perm signature →
    16 bands → candidate pairs → exact-Jaccard verify ≥ 0.3. Finds each
    doc's mutated twin. Oracle runs the byte-identical algorithm in SQL."""
    from ..session import default_parallelism

    # Repartition the (small) doc corpus BEFORE shingling: the source scans
    # are 1-row-group files (serial), and shingling is the CPU-heavy step —
    # shuffling raw docs is cheap.
    corpus = _corpus(spark, sf_dir).repartition(default_parallelism(), F.col("doc_id"))
    # ARRAY topology (round 6): shingle hashes stay as ONE array row per doc
    # (doc_shingle_arrays) instead of an exploded relation. The signature is
    # then a pure per-row projection (array_min over 64 permuted transforms
    # — zero Exchange, one codegen stage) and verification is an
    # array_intersect over candidate pairs. vs the exploded form this
    # removes the signature groupBy shuffle AND both shingle-side
    # verification joins; the only remaining shuffles are the band
    # self-join + pair distinct. per_doc persists MEMORY_AND_DISK because
    # it feeds the signature AND both verification sides.
    per_doc = doc_shingle_arrays(corpus, "doc_id", "text").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # EAGER materialization (r15, measured from the event log): AQE
    # submits the three consumer stages (bands map-side, both jaccard
    # join sides) CONCURRENTLY, and a lazily persisted relation is then
    # computed once per racing stage (3x the shingle+hash CPU; three
    # ~680ms stages at sf0.1 where one suffices). One count() populates
    # the cache before the consumers launch — at 1000 executors the race
    # is 3x cluster CPU, not just wall noise.
    per_doc.count()
    # No signature persist (r10): since the bucket pre-aggregation replaced
    # the band SELF-join (r06), the signature has exactly ONE consumer —
    # the old "would re-run the 64 transforms per side" rationale is
    # vestigial, and dropping the persist removes a materialization stage
    # (measured ~5% at sf0.1, strictly less executor memory at 100 TB).
    # Docs with zero shingles (<3 tokens) produced no aggregate row in the
    # exploded form; filter them for identical semantics.
    sig = per_doc.filter(F.col("n_sh") > 0).select(
        "doc_id", minhash_sig_arr("sh_arr", num_perms=64).alias("sig")
    )
    bands = lsh_bands_arr(sig, "doc_id", num_perms=64, bands=16)
    pairs = lsh_candidate_pairs(bands, "doc_id")
    verified = jaccard_pairs_from_arrays(pairs, per_doc, "doc_id")
    return (
        verified.filter(F.col("jaccard") >= 0.3)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


@query(
    "dedup_cross_source_matrix",
    oracle=f"""
    WITH pairs AS ({{_MINHASH_PAIRS_ORACLE_BODY}})
    SELECT least(sa.source, sb.source)    AS source_a,
           greatest(sa.source, sb.source) AS source_b,
           CAST(COUNT(*) AS BIGINT)       AS n_pairs,
           CAST(SUM(CAST(ROUND(p.jaccard * 1000000) AS BIGINT)) AS BIGINT)
                                          AS jacc_sum_u
    FROM pairs p
    JOIN documents sa ON sa.doc_id = p.id_a % {TWIN_OFFSET}
    JOIN documents sb ON sb.doc_id = p.id_b % {TWIN_OFFSET}
    GROUP BY 1, 2
    ORDER BY 1, 2
    """.replace("{_MINHASH_PAIRS_ORACLE_BODY}", _MINHASH_PAIRS_ORACLE),
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PROVENANCE matrix: which source pairs share duplicate
    mass — the question a curation run asks before dropping a source
    (e.g. CommonCrawl snapshots overlapping each other vs. overlapping
    curated sets). Reuses the verified MinHash-LSH pairs (same plan as
    dedup_minhash_lsh — candidate-scoped, no all-pairs work) and joins
    each side back to its source (twin ids map to their original via
    doc_id % TWIN_OFFSET), aggregating to a #sources² matrix — tiny at
    any corpus scale; the joins shuffle on doc_id, the aggregate is
    map-side partial. Jaccard mass rides 1e6-unit BIGINTs (order-free,
    driver-hashable)."""
    t = load_tables(spark, sf_dir)
    pairs = dedup_minhash_lsh(spark, sf_dir)
    src = t["documents"].select("doc_id", "source")
    joined = (
        pairs.select(
            (F.col("id_a") % TWIN_OFFSET).alias("da"),
            (F.col("id_b") % TWIN_OFFSET).alias("db"),
            "jaccard",
        )
        .join(src.select(F.col("doc_id").alias("da"), F.col("source").alias("sa")), "da")
        .join(src.select(F.col("doc_id").alias("db"), F.col("source").alias("sb")), "db")
    )
    return (
        joined.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            F.round(F.col("jaccard") * 1000000, 0).cast("bigint").alias("ju"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("ju").cast("bigint").alias("jacc_sum_u"),
        )
        .orderBy("source_a", "source_b")
    )


def _simhash_oracle(bits: int = 32) -> str:
    bit_sums = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}" for j in range(bits)
    )
    recompose = " + ".join(f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits))
    return f"""
    WITH {_CORPUS_SQL},
    tokh AS (
      SELECT doc_id, CAST('0x' || SUBSTR(MD5(u.tok1), 1, 15) AS BIGINT) AS h
      FROM toks, UNNEST(tok) AS u(tok1)
    ),
    bitsums AS (
      SELECT doc_id,
             {bit_sums}
      FROM tokh GROUP BY doc_id
    ),
    sh AS (SELECT doc_id, CAST({recompose} AS BIGINT) AS simhash FROM bitsums)
    SELECT o.doc_id, o.simhash,
           bit_count(xor(o.simhash, tw.simhash)) AS twin_hamming
    FROM sh o JOIN sh tw ON tw.doc_id = o.doc_id + {TWIN_OFFSET}
    """


@query("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (32-bit, sign-of-bit-sums) + Hamming distance to
    each doc's near-dup twin — twins land within a few bits while unrelated
    docs are ~16 bits apart."""
    from ..session import default_parallelism

    corpus = _corpus(spark, sf_dir).repartition(default_parallelism(), F.col("doc_id"))
    # EAGER persist of the (doc_id, simhash) result (r16): the orig/twin
    # self-join references the simhash subtree TWICE, and without a cache
    # the whole tokenize+hash+32-bit-sum pipeline was planned and executed
    # once PER SIDE (4 documents scans in the before-plan,
    # plans/r16/dedup_simhash_before.txt) — 2x the pipeline CPU at any
    # scale. The cached relation is two BIGINTs per doc, so the eager
    # count()'s cache write is trivial (the minhash recipe, r15 finding 2).
    sh = simhash(corpus, "doc_id", "text", bits=32).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sh.count()
    orig = sh.filter(F.col("doc_id") < TWIN_OFFSET)
    twin = sh.filter(F.col("doc_id") >= TWIN_OFFSET).select(
        (F.col("doc_id") - TWIN_OFFSET).alias("doc_id"), F.col("simhash").alias("twin_sim")
    )
    return orig.join(twin, "doc_id").select(
        "doc_id",
        "simhash",
        F.bit_count(F.col("simhash").bitwiseXOR(F.col("twin_sim"))).cast("tinyint").alias("twin_hamming"),
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_CORPUS_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_id, COUNT(*) AS n_inter
      FROM shingles a JOIN shingles b
        ON b.doc_id = a.doc_id + {TWIN_OFFSET} AND b.s = a.s
      GROUP BY a.doc_id
    )
    SELECT i.doc_id,
           round(CAST(i.n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - i.n_inter), 6) AS twin_jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_id
    JOIN sizes nb ON nb.doc_id = i.doc_id + {TWIN_OFFSET}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard between each doc and its twin (the verification
    primitive used standalone)."""
    from ..session import default_parallelism

    corpus = _corpus(spark, sf_dir).repartition(default_parallelism(), F.col("doc_id"))
    pairs = corpus.filter(F.col("doc_id") < TWIN_OFFSET).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + TWIN_OFFSET).alias("id_b")
    )
    per_doc = doc_shingle_arrays(corpus, "doc_id", "text")
    out = jaccard_pairs_from_arrays(pairs, per_doc, "doc_id")
    return out.select(F.col("id_a").alias("doc_id"), F.round("jaccard", 6).alias("twin_jaccard"))


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.5
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: cosine ≥ 0.5 within label blocks (blocking keeps
    the pair space O(block²) instead of O(n²); at scale the block key would
    be an LSH bucket — see similarity plans)."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    a = e.select(F.col("vec_id").alias("id_a"), F.col("label"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("label"), F.col("embedding").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return (
        a.join(b, "label")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(dot / (norm("va") * norm("vb")), 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.5)
    )


@query(
    "dedup_exact_keep_longest",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text || ' extra tail tokens appended here' FROM documents
    ),
    keyed AS (
      -- near-identical pairs share the fingerprint of their first 40 chars;
      -- the keep policy selects the LONGEST member (training-data curation
      -- usually keeps the most complete copy)
      SELECT md5(substr(text, 1, 40)) AS fp, doc_id, text, length(text) AS n FROM corpus
    )
    SELECT fp,
           max_by(doc_id, n + doc_id * 1e-9) AS keep_id,   -- unique tie-break
           MAX(n) AS kept_len,
           COUNT(*) AS n_members
    FROM keyed
    GROUP BY fp
    """,
)
def dedup_exact_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup keep-policy variant: groups keyed by a prefix fingerprint keep
    their LONGEST member (max_by with a unique tie-break) — every group here
    keeps the extended twin, exercising policy-parameterized dedup."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].select("doc_id", "text")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + TWIN_OFFSET).alias("doc_id"),
            F.concat("text", F.lit(" extra tail tokens appended here")).alias("text"),
        )
    )
    keyed = corpus.select(
        F.md5(F.substring("text", 1, 40)).alias("fp"),
        "doc_id",
        F.length("text").alias("n"),
    )
    return keyed.groupBy("fp").agg(
        F.max_by("doc_id", F.col("n") + F.col("doc_id") * 1e-9).alias("keep_id"),
        F.max("n").cast("bigint").alias("kept_len"),
        F.count(F.lit(1)).alias("n_members"),
    )


@query(
    "dedup_incremental_lsh",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text FROM documents
    ),
    batch AS (
      SELECT doc_id + {TWIN_OFFSET} AS doc_id, lang,
             CASE WHEN doc_id % 2 = 0 THEN text || '{TWIN_SUFFIX}'
                  ELSE reverse(text) END AS text
      FROM documents
    ),
    allc AS (
      SELECT doc_id, text FROM base
      UNION ALL
      SELECT doc_id, text FROM batch
    ),
    toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tok FROM allc
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
    cand AS (  -- incremental: ONLY batch x base pairs, never batch x batch
      SELECT DISTINCT nb.doc_id AS new_id, ob.doc_id AS old_id
      FROM bands nb JOIN bands ob
        ON nb.band_id = ob.band_id AND nb.band_hash = ob.band_hash
       AND nb.doc_id >= {TWIN_OFFSET} AND ob.doc_id < {TWIN_OFFSET}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
    dropped AS (
      SELECT DISTINCT c.new_id
      FROM cand c
      JOIN shingles sa ON sa.doc_id = c.new_id
      JOIN shingles sb ON sb.doc_id = c.old_id AND sb.s = sa.s
      JOIN sizes na ON na.doc_id = c.new_id
      JOIN sizes nb ON nb.doc_id = c.old_id
      GROUP BY c.new_id, c.old_id, na.n_sh, nb.n_sh
      HAVING CAST(COUNT(*) AS DOUBLE) / (na.n_sh + nb.n_sh - COUNT(*)) >= 0.5
    )
    SELECT b.lang,
           COUNT(*) AS n_batch,
           CAST(SUM(CASE WHEN d.new_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN d.new_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM batch b LEFT JOIN dropped d ON b.doc_id = d.new_id
    GROUP BY b.lang
    """,
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup: a NEW batch (half near-duplicates of the
    corpus, half fresh) deduplicated AGAINST an existing corpus — the
    production daily-increment shape. Candidates come from joining the
    batch's LSH bands to the CORPUS bands only (never batch x batch, never
    corpus x corpus): at 100 TB the corpus band table is a precomputed,
    bucketed artifact and each increment's cost scales with the BATCH size,
    not the corpus size. Exact-Jaccard verification on candidates only;
    per-language kept/dropped accounting."""
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    base = d.select("doc_id", "text")
    batch = d.select(
        (F.col("doc_id") + TWIN_OFFSET).alias("doc_id"),
        "lang",
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(TWIN_SUFFIX))
        ).otherwise(F.reverse(F.col("text"))).alias("text"),
    )

    # ARRAY topology (round 6): per-doc shingle-hash arrays + zero-shuffle
    # per-row signatures; at production scale the corpus side (pd_b +
    # bands_b) is the precomputed artifact — only the batch side is new
    # work per increment.
    pd_b = doc_shingle_arrays(
        base.repartition(F.col("doc_id")), "doc_id", "text"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    pd_n = doc_shingle_arrays(
        batch.repartition(F.col("doc_id")), "doc_id", "text"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # eager: each persist has 2+ consumer stages AQE launches concurrently
    # (signature map + the pd_all verification union) — populate the cache
    # first so the shingle pipeline runs once, not once per racing stage
    pd_b.count()
    pd_n.count()
    sig_b = pd_b.filter(F.col("n_sh") > 0).select(
        "doc_id", minhash_sig_arr("sh_arr", num_perms=64).alias("sig")
    )
    sig_n = pd_n.filter(F.col("n_sh") > 0).select(
        "doc_id", minhash_sig_arr("sh_arr", num_perms=64).alias("sig")
    )
    bands_b = lsh_bands_arr(sig_b, "doc_id")
    bands_n = lsh_bands_arr(sig_n, "doc_id")
    cand = (
        bands_n.select(F.col("doc_id").alias("new_id"), "band_id", "band_hash")
        .join(
            bands_b.select(F.col("doc_id").alias("old_id"), "band_id", "band_hash"),
            ["band_id", "band_hash"],
        )
        .select("new_id", "old_id")
        .distinct()
    )
    pd_all = pd_n.unionByName(pd_b)
    dropped = (
        jaccard_pairs_from_arrays(
            cand.select(F.col("old_id").alias("id_a"), F.col("new_id").alias("id_b")),
            pd_all,
            "doc_id",
        )
        .filter(F.col("jaccard") >= 0.5)
        .select(F.col("id_b").alias("new_id"))
        .distinct()
    )
    return (
        batch.join(dropped, batch.doc_id == dropped.new_id, "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_batch"),
            F.sum(F.when(F.col("new_id").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
            F.sum(F.when(F.col("new_id").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
    )


@query(
    "dedup_incremental_exact",
    oracle=f"""
    WITH base AS (SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
                  FROM documents),
    batch AS (
      SELECT doc_id + {TWIN_OFFSET} AS doc_id, lang,
             md5(regexp_replace(trim(lower(CASE WHEN doc_id % 2 = 0 THEN text
                                               ELSE text || ' fresh {TWIN_SUFFIX}' END)),
                 '\\s+', ' ', 'g')) AS h
      FROM documents
    ),
    vs_corpus AS (
      SELECT b.doc_id, b.lang, b.h,
             EXISTS (SELECT 1 FROM base c WHERE c.h = b.h) AS in_corpus
      FROM batch b
    ),
    first_in_batch AS (
      SELECT doc_id, lang, in_corpus,
             row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      FROM vs_corpus
    )
    SELECT lang,
           COUNT(*)                                                     AS n_batch,
           CAST(SUM(CASE WHEN in_corpus THEN 1 ELSE 0 END) AS BIGINT)   AS dup_of_corpus,
           CAST(SUM(CASE WHEN NOT in_corpus AND rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                                        AS dup_within_batch,
           CAST(SUM(CASE WHEN NOT in_corpus AND rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                                        AS n_new
    FROM first_in_batch
    GROUP BY lang
    """,
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EXACT dedup — the first tier of the production
    daily-increment pipeline (dedup_incremental_lsh is the near-dup tier):
    a new batch (half verbatim corpus copies, half fresh) is classified
    per-language into corpus-duplicate / within-batch-duplicate / new.

    100 TB design: the corpus side reduces to its content-hash set (at
    scale a precomputed, bucketed artifact); the batch semi-joins that set
    on the 128-bit hash — increment cost scales with the BATCH, never the
    corpus; the within-batch first-copy pick is a min-per-hash aggregate
    over batch-sized data only. Text never shuffles — hashes do."""
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    base_h = d.select(
        F.md5(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        ).alias("h")
    ).distinct()
    batch = d.select(
        (F.col("doc_id") + TWIN_OFFSET).alias("doc_id"),
        "lang",
        F.md5(
            F.regexp_replace(
                F.trim(
                    F.lower(
                        F.when(F.col("doc_id") % 2 == 0, F.col("text")).otherwise(
                            F.concat(F.col("text"), F.lit(" fresh " + TWIN_SUFFIX.strip()))
                        )
                    )
                ),
                r"\s+",
                " ",
            )
        ).alias("h"),
    )
    in_corpus = batch.join(base_h, "h", "left_semi").select("doc_id")
    tagged = batch.join(
        in_corpus.withColumn("__in", F.lit(True)), "doc_id", "left"
    ).withColumn("in_corpus", F.coalesce("__in", F.lit(False)))
    first = (
        tagged.filter(~F.col("in_corpus"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("first_id"))
    )
    classified = tagged.join(
        first.select(F.col("first_id").alias("doc_id"), F.lit(True).alias("__first")),
        "doc_id",
        "left",
    )
    return classified.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.sum(F.when(F.col("in_corpus"), 1).otherwise(0)).cast("bigint").alias("dup_of_corpus"),
        F.sum(
            F.when(~F.col("in_corpus") & F.col("__first").isNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("dup_within_batch"),
        F.sum(
            F.when(~F.col("in_corpus") & F.col("__first").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_new"),
    )
