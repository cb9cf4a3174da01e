"""Text-analysis queries over documents (SURVEY §7.1 M6: langid, quality,
token counting, fingerprinting) + multimodal binary-column plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import hash64, hash64_sql
from ..operators.dedup import explode_shingles, ngrams_expr, normalize_text, tokens_expr
from ..operators.text import (
    PII_PATTERNS,
    STOPWORDS,
    fingerprint,
    pii_scrub,
    predict_lang,
    quality_features,
    quality_score,
    token_counts,
)
from ..session import default_parallelism
from ..sources import load_tables
from .registry import query


def _docs_parallel(t):
    """The documents file is a single parquet row group (serial scan); the
    text operators are CPU-bound per row, so spread the (small) table across
    the cores before the heavy map work."""
    return t["documents"].repartition(default_parallelism())


def _sw_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"CAST(len(list_filter(toks, t -> list_contains([{lst}], t))) AS DOUBLE)"
        f" / greatest(len(toks), 1)"
    )


def _langid_oracle() -> str:
    scores = {lang: _sw_sql(lang) for lang in STOPWORDS}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    chain = "'und'"
    for lang in reversed(list(STOPWORDS)):
        chain = f"CASE WHEN ({scores[lang]}) = best THEN '{lang}' ELSE {chain} END"
    return f"""
    WITH toksed AS (
      SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, toks, {best} AS best FROM toksed
    )
    SELECT doc_id, lang, CASE WHEN best > 0 THEN {chain} ELSE 'und' END AS pred_lang,
           round(best, 6) AS best_score
    FROM scored
    """


@query("text_langid", oracle=_langid_oracle(), bench=True)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via stopword-overlap argmax (operators.text.predict_lang);
    identical arithmetic in the oracle."""
    t = load_tables(spark, sf_dir)
    d = _docs_parallel(t)
    # SQL-text path (r16): the Column builders cost ~0.2s of py4j round
    # trips per plan build (measured via tools/profile_breakdown.py on a
    # 0.44s total wall); resolved expressions identical — sameSemantics
    # asserted in tests/test_text_sqltext_r16.py
    from ..operators.dedup import _tokens_sql
    from ..operators.text import _sw_best_sql

    toks = _tokens_sql("text")
    return d.select(
        "doc_id",
        "lang",
        predict_lang(toks).alias("pred_lang"),
        F.expr(f"round({_sw_best_sql(toks)}, 6)").alias("best_score"),
    )


@query(
    "text_quality",
    oracle="""
    WITH base AS (
      SELECT doc_id, text,
             string_split_regex(trim(lower(text)), '\\s+') AS toks,
             length(text) AS n_chars
      FROM documents
    ),
    feats AS (
      SELECT doc_id,
        CAST(n_chars AS BIGINT) AS n_chars,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        round(CAST(n_chars - (len(toks) - 1) AS DOUBLE) / greatest(len(toks), 1), 4) AS mean_token_len,
        round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
              / greatest(length(text), 1), 6) AS digit_ratio,
        round(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
              / greatest(length(text), 1), 6) AS punct_ratio,
        round(CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
              / greatest(length(text), 1), 6) AS space_ratio,
        round(CAST(len(list_filter(toks, t -> list_contains(
                ['the','a','and','of','to','in','is','with','for','on'], t))) AS DOUBLE)
              / greatest(len(toks), 1), 6) AS en_stopword_ratio
      FROM base
    )
    SELECT *,
      round((least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
             + (1.0 - least((digit_ratio + punct_ratio) * 5, 1.0))
             + (CASE WHEN mean_token_len >= 2 AND mean_token_len <= 12 THEN 1.0 ELSE 0.3 END)
            ) / 3, 6) AS quality
    FROM feats
    """,
    bench=True,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features + composite score (operators.text.quality_*)."""
    t = load_tables(spark, sf_dir)
    d = _docs_parallel(t)
    # SQL-text feature builders (r16 plan-build diet; sameSemantics
    # asserted in tests/test_text_sqltext_r16.py)
    feats = quality_features("text")
    out = d.select("doc_id", *[c.alias(k) for k, c in feats.items()])
    feats_cols = {k: F.col(k) for k in feats}
    return out.withColumn("quality", quality_score(feats_cols))


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
      CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)  AS word_tokens,
      CAST(list_aggregate(list_transform(string_split_regex(trim(lower(text)), '\\s+'),
                          t -> CAST(ceil(length(t) / 4.0) AS BIGINT)), 'sum') AS BIGINT) AS bpe_estimate
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    counts = token_counts(F.col("text"))
    return _docs_parallel(t).select("doc_id", *[c.alias(k) for k, c in counts.items()])


@query(
    "text_fingerprint",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_sort(list_transform(
               list_distinct(list_transform(
                 generate_series(1, greatest(len(string_split_regex(trim(lower(text)), '\\s+')) - 2, 0)),
                 i -> array_to_string(list_slice(string_split_regex(trim(lower(text)), '\\s+'), i, i + 2), ' '))),
               s -> substr(md5(s), 1, 8))) AS hs
      FROM documents
    )
    SELECT doc_id, array_to_string(list_slice(hs, 1, 5), ',') AS fp
    FROM sh
    """,
    bench=True,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-5 shingle-hash fingerprint (operators.text.fingerprint)."""
    t = load_tables(spark, sf_dir)
    return _docs_parallel(t).select("doc_id", fingerprint(F.col("text")).alias("fp"))


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))            AS n_bytes,
           md5(text)                             AS payload_md5,  -- duckdb 1.0 md5 takes VARCHAR; bytes identical to the utf-8 payload
           substr(hex(encode(substr(text, 1, 8))), 1, 16) AS head_hex
    FROM documents
    WHERE doc_id <= 100
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payloads + typed metadata. The
    fixture has no media files, so payloads are utf-8 encodings of text —
    the schema/expression path (BinaryType, length, hashing, hex slicing)
    is exactly what image/audio columns use."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") <= 100)
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.substring(F.hex(F.encode(F.substring(F.col("text"), 1, 8), "utf-8")), 1, 16).alias(
            "head_hex"
        ),
    )


@query(
    "mm_decode_features",
    oracle="""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id <= 200),
    chars AS (
      SELECT doc_id, ord(substr(text, CAST(i AS INT), 1)) % 8 AS bkt
      FROM d, UNNEST(generate_series(1, length(text))) AS g(i)
    ),
    counts AS (
      SELECT c.doc_id, b.bkt,
             count(ch.bkt) AS c
      FROM (SELECT DISTINCT doc_id FROM chars) c
      CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bkt) b
      LEFT JOIN chars ch ON ch.doc_id = c.doc_id AND ch.bkt = b.bkt
      GROUP BY c.doc_id, b.bkt
    ),
    tot AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM d),
    feats AS (
      SELECT counts.doc_id,
             list(CAST(round(CAST(counts.c AS DOUBLE)
                             / greatest(tot.n_bytes, 1), 6) * 1000000 AS BIGINT)
                  ORDER BY counts.bkt) AS f
      FROM counts JOIN tot ON counts.doc_id = tot.doc_id
      GROUP BY counts.doc_id
    )
    SELECT feats.doc_id, tot.n_bytes,
           array_to_string(list_transform(f, x -> CAST(x AS VARCHAR)), '|')
             AS features_u
    FROM feats JOIN tot ON feats.doc_id = tot.doc_id
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/feature-extract pipeline via mapInPandas
    (operators.multimodal): binary payload → deterministic fake 'decoder' →
    fixed-length feature vector. Arrow-batched; the real image/audio decoder
    drops into decode_batch without touching the Spark plumbing.

    r07: oracle-EXACT. The fake decoder is a byte histogram with half-away
    rounding at 1e-6, so DuckDB reproduces every feature from
    ord(substr(...)) counts; the query boundary serializes the float32
    features back to their 1e6-scaled integers ('|'-joined — array cells
    are unhashable in the driver's pandas canonicalizer). The float32
    round-trip is lossless: |float32(v)−v|·1e6 ≤ 0.06 and v·1e6 is an
    integer by construction, so round() recovers it exactly. The
    array<float> form stays available through
    operators.multimodal.extract_features for internal composition."""
    from ..operators.multimodal import extract_features

    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") <= 200).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    feats = extract_features(d, id_col="doc_id", payload_col="payload", n_features=8)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.array_join(
            F.transform(
                "features",
                lambda f: F.round(f.cast("double") * 1000000)
                .cast("bigint")
                .cast("string"),
            ),
            "|",
        ).alias("features_u"),
    )


@query(
    "mm_frame_sample",
    oracle="""
    SELECT d.doc_id,
           CAST(u.f - 1 AS BIGINT)                       AS frame_no,
           CAST((u.f - 1) * 64 AS BIGINT)                AS "offset",
           CAST(ord(substr(d.text, (u.f - 1) * 64 + 1, 1)) AS BIGINT) AS frame_byte
    FROM (SELECT doc_id, text FROM documents WHERE doc_id <= 50) d,
         UNNEST(generate_series(1, (octet_length(encode(d.text)) + 63) // 64)) AS u(f)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling (operators.multimodal.frame_sample): video →
    row-per-frame explosion through mapInPandas, sampling one byte every 64.
    The fixture payloads are ASCII text, so DuckDB can reproduce the byte
    values with ord(substr(...)) — making the pandas-UDF path oracle-exact,
    not just rows-only."""
    from ..operators.multimodal import frame_sample

    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") <= 50).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return frame_sample(d, id_col="doc_id", payload_col="payload", every_n_bytes=64)


@query(
    "text_stratified_sample",
    oracle=f"""
    WITH sampled AS (
      SELECT lang, n_chars
      FROM documents
      WHERE {hash64_sql("CAST(doc_id AS VARCHAR)")} % 10 < 2
    )
    SELECT s.lang,
           COUNT(*)                                  AS n_sampled,
           t.n_total,
           CAST(SUM(n_chars) AS BIGINT)              AS chars_sampled
    FROM sampled s
    JOIN (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang) t
      ON s.lang = t.lang
    GROUP BY s.lang, t.n_total
    """,
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified training-mix sampling: a deterministic ~20% hash-bucket
    sample per language stratum, with per-stratum accounting against the
    full corpus. Hash-bucket (not rand()) so the sample is reproducible
    across retries/partitionings — the property a 100 TB data mix needs.
    Map-side filter + one shuffle per groupBy; the stratum-totals join is
    broadcast-sized (one row per language)."""
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    sampled = d.filter(hash64(F.col("doc_id").cast("string")) % 10 < 2).select(
        "lang", "n_chars"
    )
    totals = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        sampled.join(F.broadcast(totals), "lang")
        .groupBy("lang", "n_total")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
        )
        .select("lang", "n_sampled", "n_total", "chars_sampled")
    )


# The fixture corpus is a digit-free word salad, so deterministic PII is
# seeded onto both engines' inputs with the SAME concat expression — the
# scrub then has real matches to find (emails, SSNs, dashed+dotted phones,
# IPv4s) instead of vacuously counting zero.
_PII_SEED_SQL = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN"
    " ' contact bob.smith+ml@data-eng.example.org or 555-867-5309' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN"
    " ' ssn 123-45-6789 from host 10.0.42.177' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN"
    " ' fallback 555.867.1234 at 192.168.1.9 alt.user@example.co' ELSE '' END"
)


def _pii_seed_col():
    return F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit(" contact bob.smith+ml@data-eng.example.org or 555-867-5309"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit(" ssn 123-45-6789 from host 10.0.42.177")
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit(" fallback 555.867.1234 at 192.168.1.9 alt.user@example.co"),
        ).otherwise(F.lit("")),
    )


def _pii_oracle() -> str:
    """Staged CTE chain generated from the SAME PII_PATTERNS list the Spark
    side compiles, so the two engines can never drift on pattern text or
    application order."""
    stages = [f"seeded AS (SELECT doc_id, {_PII_SEED_SQL} AS t0 FROM documents)"]
    prev = "t0"
    for i, (name, pat, repl) in enumerate(PII_PATTERNS):
        cur = f"t{i + 1}"
        carry = ", ".join(f"n_{n}" for n, _, _ in PII_PATTERNS[:i])
        carry = carry + ", " if carry else ""
        stages.append(
            f"s{i + 1} AS (SELECT doc_id, {carry}"
            f"CAST(len(regexp_extract_all({prev}, '{pat}')) AS INT) AS n_{name}, "
            f"regexp_replace({prev}, '{pat}', '{repl}', 'g') AS {cur} "
            f"FROM {'seeded' if i == 0 else f's{i}'})"
        )
        prev = cur
    names = ", ".join(f"n_{n}" for n, _, _ in PII_PATTERNS)
    return (
        "WITH " + ",\n".join(stages) + f"\nSELECT doc_id, {names}, {prev} AS scrubbed"
        f" FROM s{len(PII_PATTERNS)}"
    )


@query("text_pii_scrub", oracle=_pii_oracle())
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over documents (operators.text.pii_scrub): sequential
    regex scrub of emails, SSNs, phone numbers, IPv4s, with per-class match
    counts taken on the progressively-scrubbed text. Map-only JVM codegen —
    no shuffle, no Python; at 100 TB this pipelines with the scan."""
    t = load_tables(spark, sf_dir)
    d = _docs_parallel(t).select("doc_id", _pii_seed_col().alias("seeded"))
    scrubbed, counts = pii_scrub(F.col("seeded"))
    return d.select(
        "doc_id",
        *[c.cast("int").alias(k) for k, c in counts.items()],
        scrubbed.alias("scrubbed"),
    )


# 6-gram benchmark-contamination check (the GPT-3 report's 13-gram collision
# test, shrunk to the fixture's ~60-token docs). The "benchmark" is every
# 23rd doc; the training corpus is everything else PLUS a prefixed copy of
# each benchmark doc (doc_id + 500000) whose interior 6-grams still collide
# — guaranteed true positives without hand-built fixtures.
_CONTAM_N = 6
_CONTAM_SHINGLE_SQL = """
  SELECT DISTINCT doc_id, {h} AS s
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tok FROM {src}) t,
       UNNEST(list_transform(
         generate_series(1, greatest(len(tok) - {nm1}, 0)),
         i -> array_to_string(list_slice(tok, i, i + {nm1}), ' '))) AS u(g)
"""


def _contam_oracle() -> str:
    sh = lambda src: _CONTAM_SHINGLE_SQL.format(  # noqa: E731
        h=hash64_sql("g"), src=src, nm1=_CONTAM_N - 1
    )
    return f"""
    WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 23 = 0),
    train AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 23 <> 0
      UNION ALL
      SELECT doc_id + 500000, 'zz qq ' || text FROM bench
    ),
    tsh AS ({sh("train")}),
    bsh AS (SELECT DISTINCT s FROM ({sh("bench")})),
    totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tsh GROUP BY doc_id),
    hits AS (SELECT t.doc_id, COUNT(*) AS n_hits FROM tsh t JOIN bsh USING (s) GROUP BY t.doc_id)
    SELECT totals.doc_id, n_shingles,
           CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
           round(CAST(COALESCE(n_hits, 0) AS DOUBLE) / n_shingles, 6) AS contamination,
           COALESCE(n_hits, 0) > 0 AS contaminated
    FROM totals LEFT JOIN hits ON totals.doc_id = hits.doc_id
    """


@query("text_contamination", oracle=_contam_oracle())
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: per-training-doc overlap of its
    distinct 6-gram set with the benchmark corpus's 6-gram set.

    Scale shape: the benchmark side of the join is an eval set — thousands
    of docs even at 100 TB of training data — so its distinct shingle-hash
    set is explicitly broadcast and the training shingles NEVER shuffle for
    the membership probe (map-side broadcast hash join); the only shuffle is
    the per-doc count groupBy. Shingles travel as 60-bit portable hashes
    (operators.dedup.explode_shingles), not strings."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].select("doc_id", "text")
    bench_docs = d.filter(F.col("doc_id") % 23 == 0)
    train = (
        d.filter(F.col("doc_id") % 23 != 0)
        .unionByName(
            bench_docs.select(
                (F.col("doc_id") + 500000).alias("doc_id"),
                F.concat(F.lit("zz qq "), F.col("text")).alias("text"),
            )
        )
        .repartition(default_parallelism(), F.col("doc_id"))
    )
    bench_sh = explode_shingles(bench_docs, "doc_id", "text", _CONTAM_N).select("s").distinct()
    tr_sh = explode_shingles(train, "doc_id", "text", _CONTAM_N)
    totals = tr_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        tr_sh.join(F.broadcast(bench_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / F.col("n_shingles"), 6
        ).alias("contamination"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
    )


@query(
    "pipeline_shard_assignment",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, {hash64_sql("CAST(doc_id AS VARCHAR)")} % 16 AS shard
      FROM documents
    )
    SELECT shard, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM assigned
    GROUP BY shard
    """,
)
def pipeline_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment for training-data writes: content-hash
    mod N (not round-robin) so shard membership is stable across reruns and
    independent of input partitioning. The write path would be
    .repartition(N, shard).write — here the assignment itself is the
    oracle-checked artifact. Purely map-side + one count shuffle."""
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    return (
        d.select("doc_id", (hash64(F.col("doc_id").cast("string")) % 16).alias("shard"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Repetition filtering (Gopher-style rules, token-fraction variants)
# ---------------------------------------------------------------------------

# DuckDB n-gram list (non-distinct, order preserved) — the multiplicity-
# preserving twin of the shingle SQL used by the dedup oracles.
def _ngram_sql(n: int) -> str:
    return (
        "list_transform(generate_series(1, greatest(len(tok) - {m}, 0)), "
        "i -> array_to_string(list_slice(tok, i, i + {m}), ' '))"
    ).format(m=n - 1)


_REPETITION_ORACLE = f"""
WITH toksed AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tok FROM documents
),
words AS (
  SELECT doc_id, w, COUNT(*) AS c
  FROM toksed, UNNEST(tok) AS u(w) GROUP BY doc_id, w
),
wstat AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_tok FROM words GROUP BY doc_id),
bigrams AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM toksed, UNNEST({_ngram_sql(2)}) AS u(g) GROUP BY doc_id, g
),
bstat AS (SELECT doc_id, MAX(c) AS top_bc, SUM(c) AS n_bi FROM bigrams GROUP BY doc_id),
trigrams AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM toksed, UNNEST({_ngram_sql(3)}) AS u(g) GROUP BY doc_id, g
),
tstat AS (SELECT doc_id, SUM(c) AS n_tri, COUNT(*) AS n_tri_distinct FROM trigrams GROUP BY doc_id)
SELECT w.doc_id,
       CAST(w.n_tok AS BIGINT) AS n_tokens,
       round(CAST(w.top_c AS DOUBLE) / w.n_tok, 6) AS top_word_ratio,
       round(COALESCE(CAST(b.top_bc AS DOUBLE) / b.n_bi, 0.0), 6) AS top_bigram_ratio,
       round(COALESCE(1.0 - CAST(t.n_tri_distinct AS DOUBLE) / t.n_tri, 0.0), 6) AS dup_trigram_ratio,
       (CAST(w.top_c AS DOUBLE) / w.n_tok > 0.20
        OR COALESCE(CAST(b.top_bc AS DOUBLE) / b.n_bi, 0.0) > 0.18
        OR COALESCE(1.0 - CAST(t.n_tri_distinct AS DOUBLE) / t.n_tri, 0.0) > 0.30) AS repetitive
FROM wstat w
LEFT JOIN bstat b ON w.doc_id = b.doc_id
LEFT JOIN tstat t ON w.doc_id = t.doc_id
"""


def _gram_stats(d: DataFrame, gram_col, prefix: str) -> DataFrame:
    """(doc_id, {prefix}_top, {prefix}_total, {prefix}_distinct) from a
    non-distinct gram array: explode -> per-gram counts -> per-doc rollup.
    Two shuffles on (doc_id[, gram]) — the scale shape; never builds an
    in-memory frequency map per doc (a 10^6-token doc would blow it)."""
    per_gram = (
        d.select("doc_id", F.explode(gram_col).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_gram.groupBy("doc_id").agg(
        F.max("c").alias(f"{prefix}_top"),
        F.sum("c").alias(f"{prefix}_total"),
        F.count(F.lit(1)).alias(f"{prefix}_distinct"),
    )


@query("text_repetition_filter", oracle=_REPETITION_ORACLE)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition rules (Rae et al. 2021 §A1.1, token-fraction
    variants): most-common-word fraction, most-common-bigram fraction, and
    duplicate-trigram fraction, with the composite `repetitive` drop flag.

    Scale: each n-gram family is explode -> count -> rollup (map-side
    partial aggs, AQE skew-split on hot docs); the three per-doc stats
    join on doc_id. No Python, no per-doc in-memory maps."""
    t = load_tables(spark, sf_dir)
    d = _docs_parallel(t).select("doc_id", "text")
    toks = tokens_expr(F.col("text"))
    w = _gram_stats(d, toks, "w")
    b = _gram_stats(d, ngrams_expr(F.col("text"), 2), "b")
    tri = _gram_stats(d, ngrams_expr(F.col("text"), 3), "t")
    top_word = F.col("w_top").cast("double") / F.col("w_total")
    top_bi = F.coalesce(F.col("b_top").cast("double") / F.col("b_total"), F.lit(0.0))
    dup_tri = F.coalesce(
        F.lit(1.0) - F.col("t_distinct").cast("double") / F.col("t_total"), F.lit(0.0)
    )
    return (
        w.join(b, "doc_id", "left")
        .join(tri, "doc_id", "left")
        .select(
            "doc_id",
            F.col("w_total").alias("n_tokens"),
            F.round(top_word, 6).alias("top_word_ratio"),
            F.round(top_bi, 6).alias("top_bigram_ratio"),
            F.round(dup_tri, 6).alias("dup_trigram_ratio"),
            ((top_word > 0.20) | (top_bi > 0.18) | (dup_tri > 0.30)).alias("repetitive"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-split token budgeting for training batches)
# ---------------------------------------------------------------------------

_SEQ_LEN = 256

_PACKING_ORACLE = f"""
WITH sized AS (
  SELECT doc_id, len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tok
  FROM documents
),
cum AS (
  SELECT doc_id, n_tok,
         CAST(SUM(n_tok) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
  FROM sized
),
spans AS (
  SELECT doc_id, n_tok, c,
         (c - n_tok) // {_SEQ_LEN} AS s0,
         (c - 1) // {_SEQ_LEN} AS s1
  FROM cum WHERE n_tok > 0
),
placed AS (
  SELECT CAST(u.seq_id AS BIGINT) AS seq_id, doc_id,
         least(c, (u.seq_id + 1) * {_SEQ_LEN}) - greatest(c - n_tok, u.seq_id * {_SEQ_LEN}) AS toks_here
  FROM spans, UNNEST(generate_series(s0, s1)) AS u(seq_id)
)
SELECT seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(toks_here) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM placed
GROUP BY seq_id
"""


@query("pipeline_sequence_packing", oracle=_PACKING_ORACLE)
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing (the GPT-style pretraining batch
    layout): documents in deterministic doc_id order form one token stream,
    cut every {SEQ_LEN} tokens; each doc is attributed to every sequence it
    overlaps with its exact token contribution.

    The global running token total comes from operators.prefix.prefix_sum —
    range-partitioned two-phase prefix sum, NOT a single-partition window,
    so the packing plan survives 100 TB (driver traffic is one row per
    partition). Span explosion is sequence()+explode; final accounting is
    one groupBy(seq_id)."""
    from ..operators.prefix import prefix_sum

    t = load_tables(spark, sf_dir)
    sized = t["documents"].select(
        "doc_id", F.size(tokens_expr(F.col("text"))).cast("long").alias("n_tok")
    )
    cum = prefix_sum(sized, order=[F.col("doc_id")], value=F.col("n_tok"), out_col="c")
    L = F.lit(_SEQ_LEN)
    spans = cum.filter(F.col("n_tok") > 0).select(
        "doc_id",
        "n_tok",
        "c",
        F.floor((F.col("c") - F.col("n_tok")) / L).alias("s0"),
        F.floor((F.col("c") - 1) / L).alias("s1"),
    )
    placed = spans.select(
        "doc_id",
        "c",
        "n_tok",
        F.explode(F.sequence(F.col("s0"), F.col("s1"))).alias("seq_id"),
    ).select(
        F.col("seq_id").cast("long").alias("seq_id"),
        "doc_id",
        (
            F.least(F.col("c"), (F.col("seq_id") + 1) * L)
            - F.greatest(F.col("c") - F.col("n_tok"), F.col("seq_id") * L)
        ).alias("toks_here"),
    )
    return placed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks_here").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Source-mix rebalancing (training-mixture weights per source)
# ---------------------------------------------------------------------------


@query(
    "pipeline_source_mix",
    oracle="""
    WITH per_source AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(len(string_split_regex(trim(lower(text)), '\\s+'))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n_tokens) AS all_tokens, COUNT(*) AS n_sources FROM per_source)
    SELECT source, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / all_tokens, 6) AS actual_frac,
           round((CAST(all_tokens AS DOUBLE) / n_sources) / n_tokens, 6) AS resample_weight
    FROM per_source, tot
    """,
)
def pipeline_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture accounting: per-source token share and the resample
    weight that would equalize the mix (target = uniform across sources;
    weight = target_tokens / actual_tokens, >1 upsample, <1 downsample).
    One groupBy(source); the totals side is a broadcast-sized crossJoin
    (one row)."""
    t = load_tables(spark, sf_dir)
    per_source = (
        t["documents"]
        .select("source", F.size(tokens_expr(F.col("text"))).cast("long").alias("n_tok"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )
    tot = per_source.agg(
        F.sum("n_tokens").alias("all_tokens"), F.count(F.lit(1)).alias("n_sources")
    )
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("all_tokens"), 6).alias("actual_frac"),
        F.round(
            (F.col("all_tokens").cast("double") / F.col("n_sources")) / F.col("n_tokens"), 6
        ).alias("resample_weight"),
    )


# ---------------------------------------------------------------------------
# Line-level (chunk) dedup — CCNet-style boilerplate removal
# ---------------------------------------------------------------------------

_LD_CHUNK = 3  # tokens per "line" (fixture text has no newlines; real corpora
# would split on '\n' — the topology below is identical either way)
_LD_MIN_DOCS = 3  # a chunk present in >= this many distinct docs is boilerplate


def _line_dedup_oracle() -> str:
    cs, md = _LD_CHUNK, _LD_MIN_DOCS
    h = hash64_sql("chunk")
    return f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents
    ),
    idx AS (
      SELECT doc_id, lang, t,
             unnest(range(0, CAST(ceil(len(t) / {cs}.0) AS BIGINT))) AS i
      FROM toks
    ),
    chunks AS (
      SELECT doc_id, lang, CAST(i AS INT) AS chunk_idx,
             array_to_string(t[i*{cs}+1 : i*{cs}+{cs}], ' ') AS chunk
      FROM idx
    ),
    boiler AS (
      SELECT {h} AS h
      FROM chunks GROUP BY 1 HAVING count(DISTINCT doc_id) >= {md}
    ),
    kept AS (
      SELECT c.doc_id, c.lang,
             count(*) AS kept_chunks,
             string_agg(c.chunk, ' ' ORDER BY c.chunk_idx) AS cleaned_text
      FROM chunks c ANTI JOIN boiler b ON {hash64_sql("c.chunk")} = b.h
      GROUP BY c.doc_id, c.lang
    ),
    totals AS (
      SELECT doc_id, lang, CAST(ceil(len(t) / {cs}.0) AS BIGINT) AS n_chunks FROM toks
    )
    SELECT t.doc_id, t.lang, t.n_chunks,
           coalesce(k.kept_chunks, 0)               AS kept_chunks,
           t.n_chunks - coalesce(k.kept_chunks, 0)  AS removed_chunks,
           round(coalesce(k.kept_chunks, 0) / CAST(t.n_chunks AS DOUBLE), 4) AS kept_ratio,
           coalesce(k.cleaned_text, '')             AS cleaned_text,
           coalesce(k.kept_chunks, 0) * 2 >= t.n_chunks AS keep
    FROM totals t LEFT JOIN kept k ON t.doc_id = k.doc_id
    """


@query("text_line_dedup", oracle=_line_dedup_oracle(), bench=True)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style line-level dedup (Wenzek et al., 2020): split every doc
    into fixed {3}-token chunks (the fixture's stand-in for lines), hash each
    chunk, count DISTINCT docs per chunk hash across the corpus, strip chunks
    that appear in >= 3 docs (boilerplate: headers, navigation, license
    blurbs), reassemble the surviving chunks in order, and flag docs that
    keep >= half their content.

    100 TB design (round-6 array form): the chunk + 64-bit hash arrays are
    computed ONCE per doc and persisted; the boilerplate frequency count
    explodes per-doc-DISTINCT hashes only (a plain map-side-combinable
    count — 8 bytes/chunk through the shuffle, never the text); the
    boilerplate set is the head of the chunk-frequency Zipf so the removal
    anti-join broadcasts; reassembly ships only kept chunk INDICES (ints)
    back through the doc_id shuffle and rebuilds cleaned_text per-row from
    the persisted chunk array — document text never enters a shuffle or a
    collect_list. Nothing all-pairs, nothing driver-side.

    Reference parity: reference has no pipeline ops at all (serves SQL via
    linked DuckDB, db/db.go:67-117); this is part of the LLM-curation
    extension surface."""
    t = load_tables(spark, sf_dir)
    return line_dedup_corpus(_docs_parallel(t).select("doc_id", "lang", "text"))


def line_dedup_corpus(docs: DataFrame) -> DataFrame:
    """The line-dedup plan proper, parameterized on (doc_id, lang, text) so
    the 10x scale harness (tools/scale_line_dedup.py) drives the IDENTICAL
    plan the registry query runs."""
    from pyspark import StorageLevel

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
    # LAZY wide persist, KEPT after the r16 split-persist A/B (VERDICT r15
    # task 3 measured and REJECTED — tools/ab_r16.py, interleaved mins):
    #   r15 wide-lazy (this form)      1.17-1.59s sf0.1   2.37s sf1
    #   eager narrow split + count()   1.51s              2.90s
    #   lazy narrow split              1.43s              2.73s
    # Mechanism: only the FIRST-wave consumers (boiler + slim legs, below)
    # race-compute this subtree under AQE — the reassembly join runs after
    # kept_idx completes, by which point the race's winner has FILLED the
    # cache, so the text-bearing final consumer reads it instead of
    # recomputing. Splitting the cache to narrow (doc_id, h_arr) forces
    # the final leg to recompute tokenize+chunk (slower at sf1); an eager
    # count() adds a serial full-pass barrier that costs more than the
    # overlapped 2-way race it removes (the racing subtree is expression
    # CPU only — the _docs_parallel repartition exchange output is reused
    # across the racing stages, no re-scan). The remaining waste is
    # 1x~140ms of concurrent CPU at sf0.1 — below every materialization
    # alternative measured.
    # count(*) over per-doc-distinct hashes == count(DISTINCT doc_id) over
    # all chunk instances, but gets map-side partial aggregation
    boiler = (
        chunked.select(F.explode(F.array_distinct("h_arr")).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= md)
        .select("h")
    )
    slim = chunked.select("doc_id", F.posexplode("h_arr").alias("chunk_idx", "h"))
    # boiler (chunks repeated in ≥ md docs) is bounded in EXPECTATION but
    # corpus-derived — no forced broadcast; AQE picks the strategy from
    # measured size at runtime (repo rule: sf-proportional relations are
    # never hint-broadcast, test_plan_quality.py enforces it)
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


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models: ...
# Gopher", Appendix A) — the published heuristic document filter
# ---------------------------------------------------------------------------

_GOPHER_REQ_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _gopher_oracle() -> str:
    req = ", ".join(f"'{w}'" for w in _GOPHER_REQ_WORDS)
    return f"""
    WITH base AS (
      SELECT doc_id, text, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents
    ),
    feats AS (
      SELECT doc_id,
        CAST(len(t) AS BIGINT) AS n_words,
        round(CAST(list_aggregate(list_transform(t, w -> length(w)), 'sum') AS DOUBLE)
              / greatest(len(t), 1), 4) AS mean_word_len,
        round(CAST(len(list_filter(t, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
              / greatest(len(t), 1), 6) AS alpha_ratio,
        CAST(len(list_intersect(t, [{req}])) AS INTEGER) AS n_req_stopwords,
        round((CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
               + (length(text) - length(replace(text, '...', ''))) / 3)
              / greatest(len(t), 1), 6) AS symbol_ratio
      FROM base
    )
    SELECT *,
      n_words BETWEEN 50 AND 100000                 AS ok_word_count,
      mean_word_len BETWEEN 3 AND 10                AS ok_mean_len,
      alpha_ratio >= 0.8                            AS ok_alpha,
      n_req_stopwords >= 2                          AS ok_stopwords,
      symbol_ratio <= 0.1                           AS ok_symbols,
      (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3 AND 10)
        AND alpha_ratio >= 0.8 AND n_req_stopwords >= 2 AND symbol_ratio <= 0.1
                                                    AS gopher_pass
    FROM feats
    """


@query("text_gopher_rules", oracle=_gopher_oracle())
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule document filter (Rae et al. 2021, Appendix A):
    word-count bounds, mean-word-length bounds, alphabetic-word ratio,
    required-stopword presence, symbol(#/ellipsis)-to-word ratio — each
    rule emitted as a flag plus the conjunctive gopher_pass.

    100 TB design: every feature is a per-row column expression over the
    token array (whole-stage codegen, zero shuffle, zero UDF) — the filter
    is map-side and composes in front of any dedup/mix stage for free."""
    t = load_tables(spark, sf_dir)
    d = _docs_parallel(t)
    toks = tokens_expr(F.col("text"))
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
    req = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in _GOPHER_REQ_WORDS]))
    )
    hashes = F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
    ellipses = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("...")))
    ) / 3
    symbol = F.round(
        (hashes.cast("double") + ellipses) / F.greatest(n_words, F.lit(1)), 6
    )
    out = d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha.alias("alpha_ratio"),
        req.cast("int").alias("n_req_stopwords"),
        symbol.alias("symbol_ratio"),
    )
    ok_wc = F.col("n_words").between(50, 100000)
    ok_ml = F.col("mean_word_len").between(3, 10)
    ok_al = F.col("alpha_ratio") >= 0.8
    ok_sw = F.col("n_req_stopwords") >= 2
    ok_sy = F.col("symbol_ratio") <= 0.1
    return out.select(
        "*",
        ok_wc.alias("ok_word_count"),
        ok_ml.alias("ok_mean_len"),
        ok_al.alias("ok_alpha"),
        ok_sw.alias("ok_stopwords"),
        ok_sy.alias("ok_symbols"),
        (ok_wc & ok_ml & ok_al & ok_sw & ok_sy).alias("gopher_pass"),
    )


# ---------------------------------------------------------------------------
# Unigram frequency-class scoring — the integer-exact stand-in for CCNet's
# LM-perplexity bucketing (Wenzek et al. 2020): score docs by how rare
# their tokens are under the corpus's own unigram distribution, bucket
# into head/middle/tail
# ---------------------------------------------------------------------------


@query(
    "text_unigram_fc_buckets",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents
    ),
    cnts AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
    scored AS (
      SELECT t.doc_id, length(bin(c.cnt)) AS fc
      FROM toks t JOIN cnts c ON t.w = c.w
    ),
    per_doc AS (
      SELECT doc_id,
             count(*)                          AS n_tok,
             CAST(SUM(fc) AS BIGINT)           AS sum_fc,
             round(CAST(SUM(fc) AS DOUBLE) / count(*), 6) AS avg_fc,
             round(CAST(SUM(CASE WHEN fc <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*), 6)              AS rare_ratio
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_tok, sum_fc, avg_fc, rare_ratio,
           ntile(3) OVER (ORDER BY avg_fc DESC, doc_id) AS bucket
    FROM per_doc
    """,
)
def text_unigram_fc_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing without the external LM: per-token
    frequency class fc = floor(log2(corpus_count)) + 1, computed EXACTLY as
    length(bin(cnt)) (integer in both engines — no float log at all), then
    per-doc average and an ntile(3) head/middle/tail split (bucket 1 =
    common-token docs, 3 = rare-token docs).

    100 TB design: one token explode feeds a map-side-combinable unigram
    count (the shuffle carries words once per map partition, not per
    occurrence); the count relation is Zipf-headed and broadcasts back onto
    the exploded tokens (AQE picks broadcast from real stats — at web scale
    you'd cap the vocabulary the same way CCNet's SentencePiece does); the
    per-doc aggregate is one doc_id shuffle of three ints. The integer
    frequency class keeps the score bit-identical across engines and across
    any execution order — no float-accumulation drift at 1000 executors.

    The head/middle/tail split is a GLOBAL ranking — the naive
    ``ntile(3) OVER (ORDER BY ...)`` plans a single-partition window (the
    100 TB scale-killer), so the bucket is computed instead from a
    two-phase range-partitioned global row number (operators/prefix) plus
    the closed-form ntile arithmetic on (row_number, N) — bit-identical to
    DuckDB's ntile, never funnelling rows through one task.

    Reference parity: extension surface (reference serves SQL only,
    db/db.go:67-117). Published basis: Wenzek et al., "CCNet: Extracting
    High Quality Monolingual Datasets from Web Crawl Data", LREC 2020."""
    from ..operators.prefix import prefix_sum

    t = load_tables(spark, sf_dir)
    toks = _docs_parallel(t).select(
        "doc_id", F.explode(tokens_expr(F.col("text"))).alias("w")
    )
    cnts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    scored = toks.join(cnts, "w").select(
        "doc_id", F.length(F.bin("cnt")).alias("fc")
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum("fc").cast("bigint").alias("sum_fc"),
        F.round(F.sum("fc").cast("double") / F.count(F.lit(1)), 6).alias("avg_fc"),
        F.round(
            F.sum(F.when(F.col("fc") <= 2, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("rare_ratio"),
    )
    ranked = prefix_sum(
        per_doc, [F.col("avg_fc").desc(), F.col("doc_id")], F.lit(1), "__rn"
    )
    tot = ranked.agg(F.count(F.lit(1)).alias("__n"))
    rn, n, k = F.col("__rn"), F.col("__n"), F.lit(3)
    base, rem = F.floor(n / k), n % k
    # exact ntile semantics: the first (N mod k) buckets hold ceil(N/k) rows
    bucket = F.when(
        rn <= rem * (base + 1), F.floor((rn + base) / (base + 1))
    ).otherwise(rem + F.floor((rn - rem * (base + 1) + base - 1) / base))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_tok",
            "sum_fc",
            "avg_fc",
            "rare_ratio",
            bucket.cast("long").alias("bucket"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per document — the classic two-level corpus statistic
# (Sparck Jones 1972), the standard keyword-extraction primitive
# ---------------------------------------------------------------------------


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents
    ),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w),
    df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.w AS term, tf.tf, df.df,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.w = df.w CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf, rnk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document.

    100 TB design: term frequency is one map-side-combinable groupBy on
    (doc_id, term); document frequency derives FROM the tf relation (it is
    already distinct doc-term, so df is a second combinable groupBy — the
    raw token stream is shuffled exactly once); the df table is the Zipf
    vocabulary, broadcast back onto tf; the top-5 cut is a per-doc window
    after one doc_id exchange. Float use is confined to the final
    tf·ln(N/df), rounded to 1e-6, with every input an exact integer — both
    engines compute ln on identical doubles."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    docs = _docs_parallel(t)
    toks = docs.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("w"))
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.col("w").alias("term"),
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.select("*", F.row_number().over(w).cast("bigint").alias("rnk"))
        .filter(F.col("rnk") <= 5)
    )


# ---------------------------------------------------------------------------
# Composed training-mix assembly pipeline: quality -> exact dedup ->
# uniform-target source weights -> deterministic hash-bucket downsampling ->
# per-source accounting (the data-mix half of a training-data build, as ONE
# oracle-checked declarative plan; pipeline_corpus_curation is the other)
# ---------------------------------------------------------------------------

_MIX_MIN_TOKENS = 30
_MIX_SEQ_LEN = 512


@query(
    "pipeline_training_mix",
    oracle=f"""
    WITH quality AS (
      SELECT doc_id, source,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tok, text
      FROM documents
      WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= {_MIX_MIN_TOKENS}
    ),
    deduped AS (
      SELECT doc_id, source, n_tok FROM (
        SELECT *, row_number() OVER (
          PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
          ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    ),
    src AS (
      SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS src_tokens
      FROM deduped GROUP BY source
    ),
    tot AS (SELECT SUM(src_tokens) AS all_tokens, COUNT(*) AS n_sources FROM src),
    weighted AS (
      SELECT s.source, s.n_docs, s.src_tokens,
             least(1.0, (CAST(t.all_tokens AS DOUBLE) / t.n_sources) / s.src_tokens)
               AS keep_rate,
             CAST(floor(least(1.0, (CAST(t.all_tokens AS DOUBLE) / t.n_sources)
                                   / s.src_tokens) * 1000000) AS BIGINT) AS thr
      FROM src s CROSS JOIN tot t
    ),
    kept AS (
      SELECT d.source, d.n_tok
      FROM deduped d JOIN weighted w ON d.source = w.source
      WHERE {hash64_sql("CAST(d.doc_id AS VARCHAR)")} % 1000000 < w.thr
    )
    SELECT w.source, w.n_docs, w.src_tokens,
           round(w.keep_rate, 6)                          AS keep_rate,
           COUNT(k.n_tok)                                 AS n_kept,
           CAST(coalesce(SUM(k.n_tok), 0) AS BIGINT)      AS tokens_kept,
           CAST(coalesce(SUM(CAST(ceil(CAST(k.n_tok AS DOUBLE) / {_MIX_SEQ_LEN})
                                  AS BIGINT)), 0) AS BIGINT) AS n_sequences
    FROM weighted w LEFT JOIN kept k ON w.source = k.source
    GROUP BY w.source, w.n_docs, w.src_tokens, w.keep_rate
    """,
)
def pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix assembly: quality filter -> exact dedup -> uniform-
    target per-source resample rates -> deterministic hash-bucket
    downsampling -> per-source accounting (docs/tokens kept, packed
    {_MIX_SEQ_LEN}-token sequence count).

    100 TB design: quality is a map-side filter; dedup is the min_by hash
    aggregate (one content-hash shuffle, map-side partials); the source
    weight table is sources-sized and BROADCASTS onto the corpus, so
    sampling is a map-side filter against a per-source integer threshold —
    hash-bucket, not rand(), so the mix is reproducible across retries and
    partitionings; the final accounting is one groupBy(source). The only
    corpus-wide shuffles are the dedup hash and the last accounting
    groupBy. The float keep_rate is floored to an integer threshold in
    BOTH engines, so the kept set is bit-identical — no float comparison
    decides membership."""
    from pyspark import StorageLevel

    t = load_tables(spark, sf_dir)
    d = t["documents"].select("doc_id", "source", "text")
    quality = d.withColumn("n_tok", F.size(tokens_expr(F.col("text")))).filter(
        F.col("n_tok") >= _MIX_MIN_TOKENS
    )
    deduped = (
        quality.groupBy(F.md5(normalize_text(F.col("text"))).alias("__h"))
        .agg(
            F.min_by(F.struct("doc_id", "source", "n_tok"), F.col("doc_id")).alias(
                "__row"
            )
        )
        .select("__row.*")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    src = deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("src_tokens"),
    )
    tot = src.agg(
        F.sum("src_tokens").alias("all_tokens"), F.count(F.lit(1)).alias("n_sources")
    )
    rate = F.least(
        F.lit(1.0),
        (F.col("all_tokens").cast("double") / F.col("n_sources")) / F.col("src_tokens"),
    )
    weighted = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "src_tokens",
        rate.alias("keep_rate"),
        F.floor(rate * 1000000).cast("bigint").alias("thr"),
    )
    kept = (
        deduped.join(F.broadcast(weighted.select("source", "thr")), "source")
        .filter(hash64(F.col("doc_id").cast("string")) % 1000000 < F.col("thr"))
        .select("source", "n_tok")
    )
    return (
        weighted.join(kept, "source", "left")
        .groupBy("source", "n_docs", "src_tokens", "keep_rate")
        .agg(
            F.count("n_tok").alias("n_kept"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("bigint").alias("tokens_kept"),
            F.coalesce(
                F.sum(
                    F.ceil(F.col("n_tok").cast("double") / _MIX_SEQ_LEN).cast("bigint")
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_sequences"),
        )
        .select(
            "source",
            "n_docs",
            "src_tokens",
            F.round("keep_rate", 6).alias("keep_rate"),
            "n_kept",
            "tokens_kept",
            "n_sequences",
        )
    )


@query(
    "mm_audio_energy",
    oracle="""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id <= 50),
    win AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS w
      FROM d
    ),
    samp AS (
      SELECT doc_id, CAST(w AS INT) AS window_idx,
             list_transform(
               generate_series(1, least(64, length(text) - CAST(w AS INT) * 64)),
               j -> ord(substr(text, CAST(w * 64 + j AS INT), 1))) AS s
      FROM win
    )
    SELECT doc_id, window_idx,
           CAST(len(s) AS BIGINT)                      AS n_samples,
           CAST(list_aggregate(s, 'max') AS BIGINT)    AS peak,
           round(sqrt(CAST(list_aggregate(list_transform(s, x -> x * x), 'sum')
                           AS DOUBLE) / len(s)), 6)    AS rms,
           round(CAST(list_aggregate(s, 'sum') AS DOUBLE) / len(s), 6) AS mean_level
    FROM samp
    """,
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-curation feature pass: binary payload as unsigned 8-bit PCM ->
    per-64-sample-window peak / RMS / mean level through Arrow-batched
    mapInPandas (operators.multimodal.audio_window_energy). Deterministic
    byte math makes the pandas-UDF path ORACLE-EXACT (DuckDB reproduces
    every window with ord(substr(...)) — integer sums, IEEE sqrt). The
    fixture payload is the utf-8 text (ASCII, so bytes == codepoints);
    a real codec drops into the operator without touching the plumbing."""
    t = load_tables(spark, sf_dir)
    from ..operators.multimodal import audio_window_energy

    d = t["documents"].filter(F.col("doc_id") <= 50).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return audio_window_energy(d, "doc_id", "payload", window=64)


@query(
    "mm_image_resize",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, CAST(length(text) // 32 AS INT) AS h
      FROM documents WHERE doc_id <= 30
    ),
    dims AS (SELECT doc_id, text, h, h // 2 AS oh FROM d WHERE h >= 2),
    pooled AS (
      SELECT doc_id,
             CAST(32 AS INT) AS in_w, h AS in_h,
             CAST(16 AS INT) AS out_w, CAST(oh AS INT) AS out_h,
             list_transform(generate_series(0, oh * 16 - 1), k ->
                 ord(substr(text, CAST((k // 16) * 2 * 32 + (k % 16) * 2 + 1 AS INT), 1))
               + ord(substr(text, CAST((k // 16) * 2 * 32 + (k % 16) * 2 + 2 AS INT), 1))
               + ord(substr(text, CAST(((k // 16) * 2 + 1) * 32 + (k % 16) * 2 + 1 AS INT), 1))
               + ord(substr(text, CAST(((k // 16) * 2 + 1) * 32 + (k % 16) * 2 + 2 AS INT), 1))
             ) AS s4
      FROM dims
    )
    SELECT doc_id, in_w, in_h, out_w, out_h,
           array_to_string(list_transform(s4, x -> CAST(CAST(x AS BIGINT) AS VARCHAR)), ',')
             AS pooled_sums
    FROM pooled
    """,
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize (2x2 average pooling) over binary payloads laid out as
    32-px-wide 8-bit grayscale images — the downsample step of a vision
    curation pipeline, through Arrow-batched mapInPandas
    (operators.multimodal.image_resize_pool). The pooled block means ride
    as x4 integer sums at the comparison boundary, so the pandas-UDF path
    is oracle-EXACT (DuckDB rebuilds each 2x2 block with ord(substr));
    a real decoder (PIL -> numpy) swaps in without touching the plumbing."""
    from ..operators.multimodal import image_resize_pool

    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") <= 30).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    out = image_resize_pool(d, "doc_id", "payload", width=32, factor=2)
    return out.select(
        "doc_id",
        "in_w",
        "in_h",
        "out_w",
        "out_h",
        F.array_join(
            F.transform("pooled", lambda x: F.round(x * 4).cast("bigint").cast("string")),
            ",",
        ).alias("pooled_sums"),
    )


@query(
    "text_bigram_lm",
    oracle="""
    WITH toks AS (
      SELECT string_split_regex(trim(lower(text)), '\\s+') AS tok FROM documents
    ),
    pairs AS (
      SELECT tok[CAST(i AS INT)] AS w1, tok[CAST(i AS INT) + 1] AS w2
      FROM toks, UNNEST(generate_series(1, len(tok) - 1)) AS g(i)
    ),
    bi AS (SELECT w1, w2, count(*) AS cnt FROM pairs GROUP BY w1, w2),
    pref AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS prefix_cnt FROM bi GROUP BY w1)
    SELECT b.w1, b.w2, b.cnt, p.prefix_cnt,
           round(CAST(b.cnt AS DOUBLE) / p.prefix_cnt, 6) AS cond_p
    FROM bi b JOIN pref p ON b.w1 = p.w1
    ORDER BY b.cnt DESC, b.w1, b.w2
    LIMIT 20
    """,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model counts (the count-collection pass of
    KenLM-style n-gram LM training): bigram frequencies plus the
    conditional probability P(w2|w1) = c(w1,w2)/c(w1-prefix), top-20 with
    a total deterministic order.

    100 TB design: ONE bigram explode feeds a map-side-combinable pair
    count; the prefix counts derive FROM the bigram relation (a second
    combinable groupBy — the token stream is never re-read); the join back
    is Zipf-headed and broadcastable. Counts are exact integers, so the
    only float is the final rounded division."""
    t = load_tables(spark, sf_dir)
    toks = _docs_parallel(t).select(tokens_expr(F.col("text")).alias("tok"))
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice("tok", 1, F.greatest(F.size("tok") - 1, F.lit(0))),
                F.slice("tok", 2, F.greatest(F.size("tok") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    pref = bi.groupBy("w1").agg(F.sum("cnt").cast("bigint").alias("prefix_cnt"))
    return (
        bi.join(pref, "w1")
        .select(
            "w1",
            "w2",
            "cnt",
            "prefix_cnt",
            F.round(F.col("cnt").cast("double") / F.col("prefix_cnt"), 6).alias("cond_p"),
        )
        .orderBy(F.col("cnt").desc(), "w1", "w2")
        .limit(20)
    )


@query(
    "pipeline_multimodal_curation",
    oracle="""
    WITH clips AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id <= 300
      UNION ALL
      SELECT doc_id + 1000, lang, text FROM documents WHERE doc_id <= 300
    ),
    win AS (
      SELECT doc_id, lang, text,
             unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS w
      FROM clips
    ),
    samp AS (
      SELECT doc_id, lang, text, CAST(w AS INT) AS window_idx,
             list_transform(
               generate_series(1, least(64, length(text) - CAST(w AS INT) * 64)),
               j -> ord(substr(text, CAST(w * 64 + j AS INT), 1))) AS s
      FROM win
    ),
    per_clip AS (
      SELECT doc_id, lang,
             count(*)                                             AS n_windows,
             CAST(max(list_aggregate(s, 'max')) AS BIGINT)        AS max_peak,
             CAST(SUM(CAST(list_aggregate(s, 'sum') AS BIGINT)) AS BIGINT) AS sum_level,
             CAST(SUM(len(s)) AS BIGINT)                          AS n_samples
      FROM samp GROUP BY doc_id, lang
    ),
    quality AS (
      SELECT * FROM per_clip WHERE n_windows >= 3 AND max_peak <= 126
    ),
    keep AS (
      SELECT MIN(doc_id) AS doc_id
      FROM clips GROUP BY md5(text)
    )
    SELECT q.lang,
           COUNT(*)                                   AS n_clips,
           CAST(SUM(q.n_windows) AS BIGINT)           AS total_windows,
           round(CAST(SUM(q.sum_level) AS DOUBLE) / SUM(q.n_samples), 6) AS mean_level
    FROM quality q JOIN keep k ON k.doc_id = q.doc_id
    GROUP BY q.lang
    """,
)
def pipeline_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed multimodal curation: Arrow-batched energy pass
    (mapInPandas) -> per-clip quality gate -> exact payload dedup (each
    clip has a planted exact duplicate) -> per-language accounting — the
    audio half of a multimodal data build as ONE plan mixing the pandas-UDF
    operator with relational stages.

    100 TB design: the energy pass is map-side (no shuffle in the UDF
    path); per-clip aggregation and the payload-hash dedup are the only
    corpus shuffles, both map-side-combinable; accounting is one tiny
    groupBy(lang). Integer sample sums keep the mapInPandas output
    oracle-exact end to end."""
    from ..operators.multimodal import audio_window_energy

    t = load_tables(spark, sf_dir)
    base = t["documents"].filter(F.col("doc_id") <= 300).select("doc_id", "lang", "text")
    clips = base.unionByName(
        base.select((F.col("doc_id") + 1000).alias("doc_id"), "lang", "text")
    )
    d = clips.select(
        "doc_id", "lang", F.encode("text", "utf-8").alias("payload")
    )
    energy = audio_window_energy(d, "doc_id", "payload", window=64)
    per_clip = (
        energy.withColumn(
            "sum_level", F.round(F.col("mean_level") * F.col("n_samples")).cast("bigint")
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.max("peak").alias("max_peak"),
            F.sum("sum_level").cast("bigint").alias("sum_level"),
            F.sum("n_samples").cast("bigint").alias("n_samples"),
        )
    )
    quality = per_clip.filter((F.col("n_windows") >= 3) & (F.col("max_peak") <= 126))
    keep = (
        d.groupBy(F.md5("payload").alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        quality.join(keep, "doc_id", "left_semi")
        .join(clips.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("n_windows").cast("bigint").alias("total_windows"),
            F.round(
                F.sum("sum_level").cast("double") / F.sum("n_samples"), 6
            ).alias("mean_level"),
        )
    )


_LM_PERPLEXITY_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tok
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, tok[CAST(i AS INT)] AS w1, tok[CAST(i AS INT) + 1] AS w2
      FROM toks, UNNEST(generate_series(1, len(tok) - 1)) AS g(i)
    ),
    bi AS (SELECT w1, w2, count(*) AS cnt FROM pairs GROUP BY w1, w2),
    pref AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS prefix_cnt FROM bi GROUP BY w1),
    v AS (SELECT count(DISTINCT w2) AS vsz FROM pairs),
    lp AS (
      SELECT b.w1, b.w2,
             CAST(round(ln((b.cnt + 1.0) / (p.prefix_cnt + v.vsz)) * 1000000)
                  AS BIGINT) AS logp_u
      FROM bi b JOIN pref p ON b.w1 = p.w1 CROSS JOIN v
    ),
    scored AS (
      SELECT pr.doc_id, count(*) AS n_bigrams,
             CAST(SUM(lp.logp_u) AS BIGINT) AS lsum
      FROM pairs pr JOIN lp ON pr.w1 = lp.w1 AND pr.w2 = lp.w2
      GROUP BY pr.doc_id
    )
    SELECT doc_id, n_bigrams, round(-(lsum / 1000000.0) / n_bigrams, 4) AS nll
    FROM scored
    """


def _lm_doc_nll(d: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, *carry, n_bigrams, lsum): per-doc NLL numerators under the
    corpus's own add-one-smoothed bigram model, lsum in 1e-6 micro-unit
    BIGINTs (order-free integer reduction — see text_lm_perplexity).
    Shared by text_lm_perplexity and pipeline_domain_reweighting; ``d`` is
    (doc_id, *carry, tok)."""
    pairs = d.select(
        "doc_id",
        *carry,
        F.explode(
            F.zip_with(
                F.slice("tok", 1, F.greatest(F.size("tok") - 1, F.lit(0))),
                F.slice("tok", 2, F.greatest(F.size("tok") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", *carry, "p.w1", "p.w2")
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    pref = bi.groupBy("w1").agg(F.sum("cnt").cast("bigint").alias("prefix_cnt"))
    vocab = pairs.agg(F.countDistinct("w2").alias("vsz"))
    lp = (
        bi.join(pref, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("cnt") + F.lit(1.0))
                    / (F.col("prefix_cnt") + F.col("vsz"))
                )
                * 1000000,
                0,
            )
            .cast("bigint")
            .alias("logp_u"),
        )
    )
    # NO broadcast hint on lp: bigram TYPES grow with the corpus (Heaps'
    # law — tens of billions at web scale), so a forced broadcast OOMs the
    # executors at 100 TB. Left unhinted, AQE elects broadcast from real
    # runtime stats when the model actually is small.
    return (
        pairs.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            *[F.max(c).alias(c) for c in carry],
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("logp_u").cast("bigint").alias("lsum"),
        )
    )


@query("text_lm_perplexity", oracle=_LM_PERPLEXITY_ORACLE)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020, arXiv:1911.00359
    score docs by LM perplexity; here the LM is the corpus's own add-one-
    smoothed bigram model, so the pass is self-contained): per-doc average
    negative log-likelihood over its bigrams. High nll = improbable word
    sequences = the candidate-removal tail of the quality distribution.

    Exactness: per-bigram-TYPE log-prob is rounded to 1e-6 micro-units as a
    BIGINT once (ln of identical IEEE doubles; the rounding absorbs any
    last-ulp libm difference between engines), and the per-doc reduction is
    an INTEGER sum — order-free, so the result is identical under any
    partitioning and hash-exact vs the DuckDB oracle.

    100 TB design: one bigram explode feeds three map-side-combinable
    groupBys (type counts, prefix counts, doc reduction); the model relation
    (distinct bigram types — Zipf-bounded vocab^2, NOT corpus-sized)
    broadcasts onto the doc-bigram stream; the token stream is read once."""
    t = load_tables(spark, sf_dir)
    d = _docs_parallel(t).select("doc_id", tokens_expr(F.col("text")).alias("tok"))
    return _lm_doc_nll(d).select(
        "doc_id",
        "n_bigrams",
        F.round(
            -(F.col("lsum") / F.lit(1000000.0)) / F.col("n_bigrams"), 4
        ).alias("nll"),
    )


# ---------------------------------------------------------------------------
# Exact substring-span dedup (round 8): Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better" — find every token span of
# length >= K that appears verbatim in more than one document, merge the
# overlapping/adjacent hits into maximal duplicated spans per document, and
# account for how much of each document is duplicated text. This is the
# span-level complement to the existing whole-doc (dedup_exact), chunk-level
# (text_line_dedup) and set-similarity (dedup_minhash_lsh) operators: it
# catches the quote/boilerplate/license-block duplication that sits BELOW
# the near-dup threshold but still leaks memorized text into training runs.
# ---------------------------------------------------------------------------

_SSD_K = 8  # span length in whitespace tokens (paper uses 50 BPE tokens on
#             web corpora; the fixture docs average ~54 tokens, so 8 keeps
#             spans strictly sub-document while real corpora would use 50)
_SSD_MIN_DOCS = 2  # a gram counts as duplicated when >= 2 DISTINCT docs have it

_SUBSTRING_DEDUP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
),
grams AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(t, i + 1, i + {_SSD_K}), ' ') AS g
  FROM toks, UNNEST(generate_series(0, len(t) - {_SSD_K})) AS u(i)
  WHERE len(t) >= {_SSD_K}
),
dupg AS (
  SELECT g FROM (SELECT DISTINCT doc_id, g FROM grams)
  GROUP BY g HAVING COUNT(*) >= {_SSD_MIN_DOCS}
),
hits AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dupg)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(MAX(pos) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -{_SSD_K} - 2) + {_SSD_K} THEN 1 ELSE 0 END AS new_island
  FROM hits
),
spans AS (
  SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + {_SSD_K} - 1 AS e
  FROM (SELECT doc_id, pos,
               SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM isl)
  GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_spans, SUM(e - s + 1) AS dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS total_tokens,
       CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens
FROM toks t LEFT JOIN per_doc p USING (doc_id)
"""


@query("text_substring_dedup", oracle=_SUBSTRING_DEDUP_ORACLE)
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span accounting (Lee et al. 2022): per doc, the
    number of maximal >= K-token spans that appear verbatim elsewhere in the
    corpus and the token count they cover.

    100 TB design: the K-gram hash array is ONE projection per doc (text is
    tokenized once, never shuffled); the duplicated-gram set is a plain
    map-side-combinable count over per-doc-DISTINCT hashes (8 bytes/gram
    through the shuffle); hit positions are (doc_id, pos, hash) int triples;
    the interval merge is a per-doc window over ints (per-doc cardinality is
    bounded by doc length, so no skew beyond doc size itself). The dup-gram
    set is corpus-derived — NOT hint-broadcast (repo rule; AQE decides from
    runtime stats). Nothing all-pairs, no driver-side materialization.

    Reference parity: reference serves SQL via linked DuckDB (db/db.go:
    67-117) and has no pipeline operators; this extends the LLM-curation
    surface. Oracle identifies duplicate grams by string equality, the plan
    by 60-bit md5 equality (functions/portable.hash64) — identical modulo
    md5 collision."""
    t = load_tables(spark, sf_dir)
    return substring_dedup_corpus(_docs_parallel(t).select("doc_id", "text"))


def substring_dedup_corpus(
    docs: DataFrame, k: int = _SSD_K, min_docs: int = _SSD_MIN_DOCS
) -> DataFrame:
    """The span-dedup plan proper, parameterized on (doc_id, text) and the
    span length so unit tests and scale harnesses drive the IDENTICAL plan
    the registry query runs."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    K = k
    base = (
        docs.select("doc_id", tokens_expr(F.col("text")).alias("t"))
        .withColumn("n", F.size("t"))
        .withColumn(
            "gh_arr",
            F.when(
                F.col("n") >= K,
                F.transform(
                    F.sequence(F.lit(0), F.col("n") - K),
                    lambda i: hash64(F.array_join(F.slice("t", i + 1, K), " ")),
                ),
            ).otherwise(F.expr("array()").cast("array<bigint>")),
        )
        .select("doc_id", "n", "gh_arr")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dupg = (
        base.select(F.explode(F.array_distinct("gh_arr")).alias("gh"))
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("gh")
    )
    hits = (
        base.select("doc_id", F.posexplode("gh_arr").alias("pos", "gh"))
        .join(dupg, "gh", "left_semi")
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    # merge-adjacent islands: a hit at pos starts a NEW span only when it
    # leaves a gap after the furthest end seen so far (prev_max_pos + K - 1)
    spans = (
        hits.withColumn(
            "new_island",
            (
                F.col("pos")
                > F.coalesce(F.max("pos").over(wprev), F.lit(-K - 2)) + K
            ).cast("int"),
        )
        .withColumn("island", F.sum("new_island").over(w))
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("s"), (F.max("pos") + K - 1).alias("e"))
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
    )
    return (
        base.select("doc_id", F.col("n").cast("bigint").alias("total_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "total_tokens",
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
        )
    )

# ---------------------------------------------------------------------------
# DSIR data selection (round 8): Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling" (arXiv:2302.03169) — score every
# raw document by how target-like its hashed-n-gram feature distribution is,
# then resample without replacement via Gumbel-top-k. This is the standard
# pretraining-mix selection step that sits between quality filtering and
# dedup in large-scale curation runs (used for The Pile/RedPajama-style
# domain targeting).
# ---------------------------------------------------------------------------

_DSIR_B = 1024  # hashed feature buckets (paper uses 10k; scaled to fixture
#                 vocab so buckets stay multi-occupied and the ratio model
#                 is non-degenerate)
_DSIR_K = 100  # documents to select
_DSIR_TARGET_LANG = "en"  # target-domain proxy: the English sub-corpus

_DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
feats AS (  -- unigrams + bigrams, multiplicity preserved (paper section 3.1)
  SELECT doc_id, lang, f FROM toks, UNNEST(t) AS u(f)
  UNION ALL
  SELECT doc_id, lang, t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS f
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
),
bk AS (
  SELECT doc_id, lang, {hash64_sql('f')} % {_DSIR_B} AS bkt FROM feats
),
counts AS (
  SELECT bkt, COUNT(*) AS cnt_raw,
         COUNT(*) FILTER (WHERE lang = '{_DSIR_TARGET_LANG}') AS cnt_t
  FROM bk GROUP BY bkt
),
tot AS (
  SELECT CAST(SUM(cnt_raw) AS BIGINT) AS tot_raw,
         CAST(SUM(cnt_t) AS BIGINT) AS tot_t
  FROM counts
),
lr AS (  -- add-1-smoothed per-bucket log p_target/p_raw, 1e-6 micro-units
  SELECT bkt,
         CAST(round((ln((cnt_t + 1.0) / (tot_t + {_DSIR_B}.0))
                   - ln((cnt_raw + 1.0) / (tot_raw + {_DSIR_B}.0)))
                    * 1000000) AS BIGINT) AS lr_u
  FROM counts CROSS JOIN tot
),
w AS (  -- per-doc log importance weight: sum of per-occurrence log-ratios
  SELECT bk.doc_id, MAX(bk.lang) AS lang,
         CAST(SUM(lr.lr_u) AS BIGINT) AS logw_u
  FROM bk JOIN lr USING (bkt) GROUP BY bk.doc_id
),
gk AS (  -- Gumbel-top-k sampling without replacement, seeded by doc_id
  SELECT doc_id, lang, logw_u,
         logw_u + CAST(round(-ln(-ln(
             (({hash64_sql("CAST(doc_id AS VARCHAR) || ':gumbel'")} % 1000000)
              + 0.5) / 1000000.0)) * 1000000) AS BIGINT) AS key_u
  FROM w
)
SELECT doc_id, lang, logw_u, key_u
FROM gk ORDER BY key_u DESC, doc_id LIMIT {_DSIR_K}
"""


@query("text_dsir_selection", oracle=_DSIR_ORACLE)
def text_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): hashed unigram+bigram
    bag-of-features, add-1-smoothed target/raw bucket log-ratios, per-doc
    log importance weight, Gumbel-top-k selection without replacement.

    Exactness: the per-bucket log-ratio and the per-doc Gumbel key are
    rounded once to 1e-6 micro-unit BIGINTs (ln over identical IEEE
    doubles; the rounding absorbs last-ulp libm differences), so the
    per-doc reduction is an INTEGER sum — order-free under any
    partitioning — and the Gumbel noise is a deterministic md5-seeded
    uniform, making the whole sample reproducible and hash-exact vs the
    DuckDB oracle. LIMIT is totally ordered (key_u DESC, doc_id).

    100 TB design: the feature stream is two explodes of one token scan
    (never re-read); bucket counts are ONE map-side-combinable groupBy
    collapsing to exactly B={_DSIR_B} rows; the log-ratio model is
    PARAMETER-bounded (B rows regardless of corpus size — unlike the
    Heaps'-law bigram LM), so hint-broadcasting it onto the feature stream
    is safe at any scale and keeps the scoring join map-side; selection is
    orderBy+limit = TakeOrderedAndProject (per-partition top-k, no global
    sort). Reference parity: the reference serves SQL via linked DuckDB
    (db/db.go:67-117) and has no pipeline operators; this extends the
    LLM-curation surface.
    """
    t = load_tables(spark, sf_dir)
    return dsir_select(_docs_parallel(t).select("doc_id", "lang", "text"))


def dsir_feature_buckets(docs: DataFrame, n_buckets: int = _DSIR_B) -> DataFrame:
    """(doc_id, lang, bkt): one row per hashed unigram/bigram OCCURRENCE
    (multiplicity preserved — the paper's bag-of-hashed-ngrams). Stateless
    map-side projection, so it runs identically over a batch or streaming
    relation (the streaming scorer reuses it)."""
    d = docs.select("doc_id", "lang", tokens_expr(F.col("text")).alias("t"))
    uni = d.select("doc_id", "lang", F.explode("t").alias("f"))
    m = F.greatest(F.size("t") - 1, F.lit(0))
    big = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.zip_with(
                F.slice("t", 1, m),
                F.slice("t", 2, m),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("f"),
    )
    return uni.unionByName(big).select(
        "doc_id", "lang", (hash64(F.col("f")) % n_buckets).alias("bkt")
    )


def dsir_log_ratio_model(
    bk: DataFrame,
    target_lang: str = _DSIR_TARGET_LANG,
    n_buckets: int = _DSIR_B,
) -> DataFrame:
    """(bkt, lr_u): the add-1-smoothed target/raw log-ratio model over the
    feature-bucket stream — exactly B rows at any corpus size (the
    precomputable, broadcast-safe artifact the streaming scorer probes)."""
    counts = bk.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("cnt_raw"),
        F.count_if(F.col("lang") == target_lang).alias("cnt_t"),
    )
    tot = counts.agg(
        F.sum("cnt_raw").cast("bigint").alias("tot_raw"),
        F.sum("cnt_t").cast("bigint").alias("tot_t"),
    )
    smooth = F.lit(float(n_buckets))
    return counts.crossJoin(F.broadcast(tot)).select(
        "bkt",
        F.round(
            (
                F.log((F.col("cnt_t") + F.lit(1.0)) / (F.col("tot_t") + smooth))
                - F.log(
                    (F.col("cnt_raw") + F.lit(1.0)) / (F.col("tot_raw") + smooth)
                )
            )
            * 1000000,
            0,
        )
        .cast("bigint")
        .alias("lr_u"),
    )


def dsir_select(
    docs: DataFrame,
    target_lang: str = _DSIR_TARGET_LANG,
    n_buckets: int = _DSIR_B,
    k: int = _DSIR_K,
) -> DataFrame:
    """The DSIR plan proper, parameterized on (doc_id, lang, text) and the
    bucket/selection sizes so the 10x scale harness (tools/scale_dsir.py)
    drives the IDENTICAL plan the registry query runs."""
    bk = dsir_feature_buckets(docs, n_buckets)
    lr = dsir_log_ratio_model(bk, target_lang, n_buckets)
    w = (
        bk.join(F.broadcast(lr), "bkt")
        .groupBy("doc_id")
        .agg(
            F.max("lang").alias("lang"),
            F.sum("lr_u").cast("bigint").alias("logw_u"),
        )
    )
    u = (
        (
            hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":gumbel")))
            % 1000000
        )
        + 0.5
    ) / 1000000.0
    sel = w.select(
        "doc_id",
        "lang",
        "logw_u",
        (
            F.col("logw_u")
            + F.round(-F.log(-F.log(u)) * 1000000, 0).cast("bigint")
        ).alias("key_u"),
    )
    return sel.orderBy(F.desc("key_u"), "doc_id").limit(k)

# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting (round 8): Xie et al. 2023, "DoReMi:
# Optimizing Data Mixtures Speeds Up Language Model Pretraining"
# (arXiv:2305.10429) — upweight domains whose loss EXCEEDS the reference,
# via an exponentiated-gradient step on per-domain excess loss. Full DoReMi
# alternates proxy-model training with these EG updates; the data-pipeline
# half — per-domain loss aggregation, clipped excess, exp-reweighting,
# normalization — is exactly this query, with the corpus's own bigram-LM
# NLL (text_lm_perplexity) standing in for the proxy/reference loss gap.
# ---------------------------------------------------------------------------

_DRM_ETA = 5.0  # EG step size (paper: eta=1 per mini-batch step; one static
#                 pass over corpus-level losses uses a larger step so the
#                 output mix is visibly non-uniform)

_DOMAIN_REWEIGHT_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\\s+') AS tok
  FROM documents
),
pairs AS (
  SELECT doc_id, source, tok[CAST(i AS INT)] AS w1, tok[CAST(i AS INT) + 1] AS w2
  FROM toks, UNNEST(generate_series(1, len(tok) - 1)) AS g(i)
),
bi AS (SELECT w1, w2, count(*) AS cnt FROM pairs GROUP BY w1, w2),
pref AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS prefix_cnt FROM bi GROUP BY w1),
v AS (SELECT count(DISTINCT w2) AS vsz FROM pairs),
lp AS (
  SELECT b.w1, b.w2,
         CAST(round(ln((b.cnt + 1.0) / (p.prefix_cnt + v.vsz)) * 1000000)
              AS BIGINT) AS logp_u
  FROM bi b JOIN pref p ON b.w1 = p.w1 CROSS JOIN v
),
scored AS (
  SELECT pr.doc_id, MAX(pr.source) AS source, count(*) AS n_bigrams,
         CAST(SUM(lp.logp_u) AS BIGINT) AS lsum
  FROM pairs pr JOIN lp ON pr.w1 = lp.w1 AND pr.w2 = lp.w2
  GROUP BY pr.doc_id
),
dom AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_bigrams) AS BIGINT) AS nb,
         CAST(SUM(lsum) AS BIGINT) AS lsum
  FROM scored GROUP BY source
),
base AS (
  SELECT CAST(SUM(nb) AS BIGINT) AS nb_all,
         CAST(SUM(lsum) AS BIGINT) AS lsum_all
  FROM dom
),
ex AS (  -- clipped per-domain excess loss (nats/bigram), micro-rounded
  SELECT source, n_docs,
         CAST(round(greatest(0.0,
             (-(lsum / 1000000.0) / nb) - (-(lsum_all / 1000000.0) / nb_all))
             * 1000000) AS BIGINT) AS excess_u
  FROM dom CROSS JOIN base
),
eu AS (  -- EG update numerator, micro-units (integer sum => order-free)
  SELECT source, n_docs, excess_u,
         CAST(round(exp({_DRM_ETA} * (excess_u / 1000000.0)) * 1000000)
              AS BIGINT) AS e_u
  FROM ex
),
tot AS (SELECT CAST(SUM(e_u) AS BIGINT) AS te FROM eu)
SELECT source, n_docs, excess_u,
       round(CAST(e_u AS DOUBLE) / te, 6) AS doremi_weight
FROM eu CROSS JOIN tot
"""


@query("pipeline_domain_reweighting", oracle=_DOMAIN_REWEIGHT_ORACLE)
def pipeline_domain_reweighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023): per-source mean
    bigram-LM NLL -> clipped excess over the corpus-wide reference ->
    exponentiated-gradient upweighting -> normalized mixture weights.

    Exactness: per-domain losses are ratios of two order-free INTEGER sums
    (the micro-unit lsum and bigram counts from _lm_doc_nll), the excess
    and the EG numerator are micro-rounded once each (exp/ln over identical
    IEEE doubles), and the normalizer is an integer sum — so the weights
    are identical under any partitioning and hash-exact vs DuckDB.

    100 TB design: reuses the text_lm_perplexity topology (one bigram
    explode, map-side-combinable model groupBys, the Heaps'-law lp model
    UNHINTED so AQE decides); everything after the per-doc reduction lives
    in domain-cardinality relations (#sources rows) — the two crossJoin
    broadcasts are 1-row global aggregates. Reference parity: reference
    serves SQL via linked DuckDB (db/db.go:67-117) and has no pipeline
    operators; this extends the LLM-curation surface."""
    from pyspark import StorageLevel

    t = load_tables(spark, sf_dir)
    d = _docs_parallel(t).select(
        "doc_id", "source", tokens_expr(F.col("text")).alias("tok")
    )
    # persist the #sources-row aggregate: it feeds BOTH the reference-loss
    # global aggregate and the EG update — without the cache the whole
    # bigram-scoring pipeline (the expensive part) is recomputed under each
    # of the two downstream 1-row broadcasts.
    dom = (
        _lm_doc_nll(d, carry=("source",))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("nb"),
            F.sum("lsum").cast("bigint").alias("lsum"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    base = dom.agg(
        F.sum("nb").cast("bigint").alias("nb_all"),
        F.sum("lsum").cast("bigint").alias("lsum_all"),
    )
    ex = dom.crossJoin(F.broadcast(base)).select(
        "source",
        "n_docs",
        F.round(
            F.greatest(
                F.lit(0.0),
                (-(F.col("lsum") / F.lit(1000000.0)) / F.col("nb"))
                - (-(F.col("lsum_all") / F.lit(1000000.0)) / F.col("nb_all")),
            )
            * 1000000,
            0,
        )
        .cast("bigint")
        .alias("excess_u"),
    )
    eu = ex.select(
        "source",
        "n_docs",
        "excess_u",
        F.round(
            F.exp(F.lit(_DRM_ETA) * (F.col("excess_u") / F.lit(1000000.0)))
            * 1000000,
            0,
        )
        .cast("bigint")
        .alias("e_u"),
    )
    eu = eu.persist(StorageLevel.MEMORY_AND_DISK)
    tot = eu.agg(F.sum("e_u").cast("bigint").alias("te"))
    return eu.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "excess_u",
        F.round(F.col("e_u").cast("double") / F.col("te"), 6).alias(
            "doremi_weight"
        ),
    )

# ---------------------------------------------------------------------------
# Weighted sampling without replacement (round 8): Efraimidis & Spirakis
# 2006, "Weighted random sampling with a reservoir" (IPL 97(5)) — each item
# draws u ~ U(0,1) and the k largest u^(1/w) win; equivalent (and
# numerically safer) on the log scale: key = ln(u)/w, take top-k. The
# standard way to sample training docs proportional to a quality/length
# weight in ONE distributed pass.
# ---------------------------------------------------------------------------

_WS_K = 100

_WEIGHTED_SAMPLE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS wt FROM documents
  WHERE n_chars > 0
),
keyed AS (
  SELECT doc_id, lang, wt,
         CAST(round(ln(((CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)
                || ':es'), 1, 15) AS BIGINT) % 1000000) + 0.5) / 1000000.0)
              / wt * 1000000000) AS BIGINT) AS key_u
  FROM w
)
SELECT doc_id, lang, CAST(wt AS BIGINT) AS weight, key_u
FROM keyed ORDER BY key_u DESC, doc_id LIMIT {_WS_K}
"""


@query("text_weighted_sample", oracle=_WEIGHTED_SAMPLE_ORACLE)
def text_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis 2006):
    top-k by ln(u)/w with u a deterministic md5-seeded uniform and w the
    document's length weight — inclusion probability proportional to
    weight, the one-pass distributed form of weighted reservoir sampling.

    Exactness: keys are micro-rounded BIGINTs (1e-9 units — ln over
    identical IEEE doubles divided by an exact integer-valued weight), so
    the sample is reproducible under any partitioning and hash-exact vs
    DuckDB; ties break on doc_id.

    100 TB design: one scan, one map-side key projection, selection is
    TakeOrderedAndProject (per-partition top-k, no global sort, no
    collect) — the same shape as DSIR's Gumbel-top-k, which is the
    log-weight special case of this estimator."""
    t = load_tables(spark, sf_dir)
    w = (
        _docs_parallel(t)
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", F.col("n_chars").cast("double").alias("wt"))
    )
    u = (
        (
            hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":es")))
            % 1000000
        )
        + 0.5
    ) / 1000000.0
    keyed = w.select(
        "doc_id",
        "lang",
        F.col("wt").cast("bigint").alias("weight"),
        F.round(F.log(u) / F.col("wt") * 1000000000, 0)
        .cast("bigint")
        .alias("key_u"),
    )
    return keyed.orderBy(F.desc("key_u"), "doc_id").limit(_WS_K)


# ---------------------------------------------------------------------------
# Round 9: BM25 retrieval (Robertson & Zaragoza 2009; the Lucene idf form)
# — the ranked-retrieval operator a curation stack uses for targeted
# corpus search / decontamination lookups.
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_NQ = 3  # query count; terms ranked 1..9 by df round-robin into queries


def _bm25_oracle() -> str:
    return f"""
    WITH docs AS (SELECT doc_id, text FROM documents),
    toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM docs
    ),
    tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, w),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(dl AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
    qterms AS (
      SELECT w, df,
             CAST((row_number() OVER (ORDER BY df DESC, w) - 1)
                  % {_BM25_NQ} AS BIGINT) AS query_id
      FROM df ORDER BY df DESC, w LIMIT {_BM25_NQ * 3}
    ),
    contrib AS (
      SELECT q.query_id, tf.doc_id,
             round(
               ln(1.0 + (s.n_docs - q.df + 0.5) / (q.df + 0.5))
               * (tf.tf * ({_BM25_K1} + 1.0))
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * dl.dl / s.avgdl)),
               9) AS c
      FROM tf JOIN qterms q USING (w)
      JOIN dl USING (doc_id) CROSS JOIN stats s
    ),
    scored AS (
      SELECT query_id, doc_id,
             round(CAST(SUM(CAST(c AS DECIMAL(38,9))) AS DOUBLE), 4) AS score
      FROM contrib GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score, rnk FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
      FROM scored
    ) WHERE rnk <= 10
    """


@query("text_bm25_topk", oracle=_bm25_oracle())
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 per query (k1=1.2, b=0.75, Lucene idf
    ln(1+(N-df+0.5)/(df+0.5))) for three queries whose terms are derived
    from the corpus itself: the 9 highest-df tokens round-robined into 3
    three-term queries — fully deterministic in both engines (df DESC,
    token tie-break), no literal term list to drift from the fixture.

    Exactness: every BM25 input is an exact integer (tf, df, dl, N) or a
    decimal-exact average (avgdl); the per-term contribution is rounded at
    1e-9 and summed as DECIMAL so the per-doc score is order-independent
    and bit-identical; ranking uses the 1e-4-rounded score with doc_id
    tie-break (the proven tfidf/ln recipe).

    100 TB design: tf is ONE map-side-combinable groupBy on the exploded
    token stream; df and dl derive from tf/toks without re-shuffling raw
    text; the query-term table is parameter-bounded (LIMIT 9) so its join
    onto tf broadcasts; scoring shuffles integer-keyed (query, doc) cells
    only; the final cut is TakeOrdered-shaped per query."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "text")
    from pyspark import StorageLevel

    toks = docs.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("w"))
    # tf is the ONLY relation derived from raw text — everything else
    # (dl = sum of tf per doc, df, stats, contributions) derives from this
    # persisted integer table, so the corpus text is scanned/exploded once
    tf = (
        toks.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum(F.col("dl").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    df = tf.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    # TakeOrdered cut FIRST (distributed top-k over the Heaps-law vocab),
    # THEN rank within the bounded 9-row relation — a bare row_number over
    # the full df table would single-partition the vocabulary sort
    top = df.orderBy(F.col("df").desc(), "w").limit(_BM25_NQ * 3)
    wq = Window.orderBy(F.col("df").desc(), "w")
    qterms = top.select(
        "w",
        "df",
        ((F.row_number().over(wq) - 1) % _BM25_NQ).cast("bigint").alias("query_id"),
    )
    contrib = (
        tf.join(F.broadcast(qterms), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (_BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                ),
                9,
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(F.col("c").cast("decimal(38,9)")).cast("double"), 4).alias(
            "score"
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.select(
            "query_id", "doc_id", "score", F.row_number().over(wr).cast("bigint").alias("rnk")
        )
        .filter(F.col("rnk") <= 10)
    )
