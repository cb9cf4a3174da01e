"""End-to-end corpus-curation pipeline — the composed training-data
preprocessing flow every large-scale pipeline runs, as ONE oracle-checked
query: quality-filter → exact dedup → near-dup (MinHash-LSH) removal →
per-language token accounting of the surviving corpus.

This is the integration showcase: each stage is an operator already proven
individually (text_quality, dedup_exact, dedup_minhash_lsh); here they
compose into a single declarative plan that Catalyst pipelines end to end —
no intermediate materialization except the shared shingle checkpoint.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    MINHASH_PRIME,
    doc_shingle_arrays,
    shingle_hash_arr,
    jaccard_pairs_from_arrays,
    lsh_bands_arr,
    lsh_candidate_pairs,
    minhash_sig_arr,
    normalize_text,
    tokens_expr,
)
from ..session import default_parallelism
from ..sources import load_tables
from .registry import query

# Stage thresholds (shared with the oracle below).
MIN_TOKENS = 30
JACCARD_CUT = 0.5


@query(
    "pipeline_corpus_curation",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, lang, text || ' zq yq xq' AS text FROM documents
    ),
    quality AS (  -- stage 1: drop short docs
      SELECT doc_id, lang, text,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens
      FROM corpus
      WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= {MIN_TOKENS}
    ),
    exact_kept AS (  -- stage 2: exact dedup, keep min doc_id per content hash
      SELECT doc_id, lang, text, n_tokens FROM (
        SELECT *, row_number() OVER (
          PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
          ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    ),
    toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tok FROM exact_kept
    ),
    shingles AS (
      SELECT DISTINCT doc_id, s
      FROM toks, UNNEST(list_transform(
             generate_series(1, greatest(len(tok) - 2, 0)),
             i -> array_to_string(list_slice(tok, i, i + 2), ' '))) AS u(s)
    ),
    hashed AS (
      SELECT doc_id, CAST('0x' || SUBSTR(MD5(s), 1, 15) AS BIGINT) % {MINHASH_PRIME} AS h
      FROM shingles
    ),
    perms AS (SELECT unnest(generate_series(0, 63)) AS pi),
    mh AS (
      SELECT doc_id, pi,
             MIN(((1103515245 * (pi + 1) + 12345) % {MINHASH_PRIME} * h
                  + (69069 * (pi + 1) + 362437) % {MINHASH_PRIME}) % {MINHASH_PRIME}) AS v
      FROM hashed CROSS JOIN perms GROUP BY doc_id, pi
    ),
    bands AS (
      SELECT doc_id, pi // 4 AS band_id,
             md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY pi)) AS band_hash
      FROM mh GROUP BY doc_id, pi // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
    neardup AS (  -- stage 3: drop the HIGHER doc_id of each verified pair
      SELECT DISTINCT c.id_b AS drop_id
      FROM cand c
      JOIN shingles sa ON sa.doc_id = c.id_a
      JOIN shingles sb ON sb.doc_id = c.id_b AND sb.s = sa.s
      JOIN sizes na ON na.doc_id = c.id_a
      JOIN sizes nb ON nb.doc_id = c.id_b
      GROUP BY c.id_a, c.id_b, na.n_sh, nb.n_sh
      HAVING CAST(COUNT(*) AS DOUBLE) / (na.n_sh + nb.n_sh - COUNT(*)) >= {JACCARD_CUT}
    )
    SELECT lang,                   -- stage 4: surviving-corpus accounting
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS min_doc
    FROM exact_kept
    WHERE doc_id NOT IN (SELECT drop_id FROM neardup)
    GROUP BY lang
    """,
    bench=True,
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality filter → exact dedup → MinHash-LSH near-dup removal →
    per-language accounting, one declarative plan."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].select("doc_id", "lang", "text")
    # No repartition here: the quality filter + dedup partial-agg run fine
    # on the scan's natural partitioning (at 100 TB the scan is thousands
    # of splits), and an extra full-text shuffle before the dedup groupBy
    # (which shuffles anyway) measured ~20% of the pipeline wall. The
    # explicit spread happens AFTER dedup, where the CPU-heavy shingling
    # actually needs it.
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            "lang",
            F.concat("text", F.lit(" zq yq xq")).alias("text"),
        )
    )
    return curate_corpus(corpus)


def curate_corpus(corpus: DataFrame) -> DataFrame:
    """The curation pipeline proper, parameterized on the input corpus
    (doc_id, lang, text) so the 10x scale harness (tools/scale_curation.py)
    drives the IDENTICAL plan the registry query runs."""
    # stage 1: quality filter
    quality = corpus.withColumn("n_tokens", F.size(tokens_expr(F.col("text")))).filter(
        F.col("n_tokens") >= MIN_TOKENS
    )

    # stage 2: exact dedup (keep min doc_id per normalized-content hash).
    # min_by over a struct, NOT row_number over a window: the hash agg gets
    # map-side partial aggregation (shuffle bytes drop with the dup rate)
    # and skips the per-partition sort a window frame forces — measured ~2x
    # faster here, and the strictly better shape at 100 TB.
    exact_kept = (
        quality.groupBy(F.md5(normalize_text(F.col("text"))).alias("__h"))
        .agg(
            F.min_by(
                F.struct("doc_id", "lang", "text", "n_tokens"), F.col("doc_id")
            ).alias("__row")
        )
        .select("__row.*")
        # AQE coalesces the dedup exchange to ~2 partitions (docs are few
        # BYTES) — but the next stage is CPU-heavy shingling, so force the
        # spread back out with an explicit repartition (user repartitions
        # with a partition count are exempt from AQE coalescing).
        .repartition(default_parallelism(), F.col("doc_id"))
    )

    # stage 3: near-dup removal (drop higher id of each verified pair).
    # ARRAY topology (round 6, see operators/dedup.py): shingle hashes stay
    # one array row per doc, the 64-slot signature is a zero-shuffle
    # projection (array_min over permuted transforms), verification is an
    # array_intersect over candidate pairs — removes the signature groupBy
    # Exchange and both exploded-shingle verification joins.
    #
    # ONE persisted relation (r15): shingling folds into the same cached
    # projection as the accounting columns and TEXT IS DROPPED before the
    # cache — the old shape persisted exact_kept (with full text) AND
    # per_doc separately, paying two materializations and caching the
    # document bytes twice. Every downstream consumer (signature, both
    # verification sides, the survivor anti-join, the accounting groupBy)
    # needs only (doc_id, lang, n_tokens, sh_arr, n_sh).
    per_doc = (
        exact_kept.select(
            "doc_id", "lang", "n_tokens", shingle_hash_arr("text").alias("sh_arr")
        )
        # two-step select (as in doc_shingle_arrays) so CollapseProject
        # doesn't duplicate the shingle transform into size()
        .select("doc_id", "lang", "n_tokens", "sh_arr", F.size("sh_arr").alias("n_sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # EAGER materialization (r15, measured from the event log): AQE
    # launches the persisted relation's consumer stages concurrently, and
    # a lazy persist is then computed once per racing stage (the sf0.1
    # event log showed two trios of ~600-1200ms duplicate stages). One
    # count() populates the cache before any consumer runs.
    per_doc.count()
    # No sig persist (r10): the bucket pre-aggregation leaves the signature
    # with exactly one consumer — see plans/dedup.py dedup_minhash_lsh.
    sig = per_doc.filter(F.col("n_sh") > 0).select(
        "doc_id", minhash_sig_arr("sh_arr", num_perms=64).alias("sig")
    )
    pairs = lsh_candidate_pairs(lsh_bands_arr(sig, "doc_id"), "doc_id")
    dup_ids = (
        jaccard_pairs_from_arrays(pairs, per_doc, "doc_id")
        .filter(F.col("jaccard") >= JACCARD_CUT)
        .select(F.col("id_b").alias("drop_id"))
        .distinct()
    )
    survivors = per_doc.join(
        dup_ids, per_doc.doc_id == dup_ids.drop_id, "left_anti"
    )

    # stage 4: accounting
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("min_doc"),
    )


# ---------------------------------------------------------------------------
# Quality-filter funnel (round 7): the FineWeb/RefinedWeb-style ensemble of
# published document filters applied sequentially, with per-stage survivor
# accounting — the "how much does each rule cost me" diagnostic every
# curation run starts with.
# ---------------------------------------------------------------------------

NLL_CUT = 3.40  # ~median of the corpus nll distribution — splits meaningfully


def _funnel_oracle() -> str:
    from .textops import _LM_PERPLEXITY_ORACLE, _REPETITION_ORACLE, _gopher_oracle, _langid_oracle

    return f"""
    WITH gph AS (SELECT doc_id,
                    (ok_word_count AND ok_mean_len AND ok_alpha AND ok_symbols)
                      AS gopher_core FROM ({_gopher_oracle()}) g),
    rep AS (SELECT doc_id, repetitive FROM ({_REPETITION_ORACLE}) r),
    lng AS (SELECT doc_id, pred_lang = lang AS lang_ok FROM ({_langid_oracle()}) l),
    ppl AS (SELECT doc_id, nll <= {NLL_CUT} AS ppl_ok FROM ({_LM_PERPLEXITY_ORACLE}) p)
    SELECT
      CAST(COUNT(*) AS BIGINT)                                   AS docs_total,
      CAST(COUNT(*) FILTER (WHERE gopher_core) AS BIGINT)        AS after_gopher,
      CAST(COUNT(*) FILTER (WHERE gopher_core AND NOT repetitive)
           AS BIGINT)                                            AS after_repetition,
      CAST(COUNT(*) FILTER (WHERE gopher_core AND NOT repetitive
                            AND lang_ok) AS BIGINT)              AS after_langid,
      CAST(COUNT(*) FILTER (WHERE gopher_core AND NOT repetitive
                            AND lang_ok AND COALESCE(ppl_ok, FALSE))
           AS BIGINT)                                            AS after_perplexity
    FROM gph
    JOIN rep USING (doc_id)
    JOIN lng USING (doc_id)
    LEFT JOIN ppl USING (doc_id)
    """


@query("pipeline_quality_funnel", oracle=_funnel_oracle())
def pipeline_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter FUNNEL: Gopher heuristics (Rae et al. 2021) →
    repetition rules (ibid. §A1.1) → language-ID agreement → bigram-LM
    perplexity cut (CCNet, Wenzek et al. 2020), applied conjunctively with
    per-stage survivor counts. Composes four independently-oracle-proven
    operators into one Catalyst plan; the output is the 1-row funnel every
    curation run reads first.

    100 TB design: gopher/langid flags are map-side column expressions;
    repetition and perplexity are the two aggregation families (n-gram
    rollups, Zipf-bounded model join); the four flag relations join on
    doc_id and collapse into ONE conditional-count aggregate — no
    intermediate materialization, and every stage's shuffle is keyed the
    same way (doc_id), so Catalyst reuses the partitioning."""
    from .textops import text_gopher_rules, text_langid, text_lm_perplexity, text_repetition_filter

    # gopher_core = the four rules that discriminate on this corpus (the
    # required-stopword rule rejects EVERY synthetic document — its flag
    # stays reported in text_gopher_rules, but a funnel stage that drops
    # 100% tells you nothing about the later stages)
    g = text_gopher_rules(spark, sf_dir).select(
        "doc_id",
        (
            F.col("ok_word_count")
            & F.col("ok_mean_len")
            & F.col("ok_alpha")
            & F.col("ok_symbols")
        ).alias("gopher_core"),
    )
    r = text_repetition_filter(spark, sf_dir).select("doc_id", "repetitive")
    lg = text_langid(spark, sf_dir).select(
        "doc_id", (F.col("pred_lang") == F.col("lang")).alias("lang_ok")
    )
    p = text_lm_perplexity(spark, sf_dir).select(
        "doc_id", (F.col("nll") <= NLL_CUT).alias("ppl_ok")
    )
    flags = (
        g.join(r, "doc_id")
        .join(lg, "doc_id")
        .join(p, "doc_id", "left")
        .select(
            "gopher_core",
            "repetitive",
            "lang_ok",
            F.coalesce("ppl_ok", F.lit(False)).alias("ppl_ok"),
        )
    )
    gp = F.col("gopher_core")
    s2 = gp & ~F.col("repetitive")
    s3 = s2 & F.col("lang_ok")
    s4 = s3 & F.col("ppl_ok")
    cnt = lambda c: F.count_if(c).cast("bigint")  # noqa: E731
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_total"),
        cnt(gp).alias("after_gopher"),
        cnt(s2).alias("after_repetition"),
        cnt(s3).alias("after_langid"),
        cnt(s4).alias("after_perplexity"),
    )
