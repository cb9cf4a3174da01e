"""Event-time window aggregations (batch semantics of the streaming ops —
SURVEY §2.2i extension). Each is the exact batch twin of the Structured
Streaming pipeline in streaming/pipeline.py; the streaming execution itself
is exercised in tests/test_streaming.py (availableNow drain)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.stable import dsum
from ..sources import load_tables
from ..streaming.pipeline import tumbling_counts
from .registry import query


@query(
    "stream_tumbling_hourly",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    bench=True,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time windows (streaming.pipeline.tumbling_counts on
    the batch frame — same code object as the stream)."""
    t = load_tables(spark, sf_dir)
    out = tumbling_counts(t["events"])
    return out.withColumn("window_start", F.col("window_start").cast("timestamp_ntz"))


@query(
    "stream_sliding_2h",
    oracle="""
    WITH starts AS (
      SELECT e.*, CAST(s AS TIMESTAMP) AS window_start
      FROM events e,
           UNNEST([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                   date_trunc('hour', ts)]) AS u(s)
    )
    SELECT window_start, COUNT(*) AS n
    FROM starts
    GROUP BY window_start
    """,
)
def stream_sliding_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h width, 1h slide): each event lands in two
    windows. F.window handles assignment; oracle enumerates the starts."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"), "n")
    )


@query(
    "stream_sessionization",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM marked
    )
    SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
           MIN(ts) AS sess_start, MAX(ts) AS sess_end, COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sess_id
    """,
)
def stream_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) via gaps-and-islands — the batch twin of
    session_window()/applyInPandasWithState. One shuffle by user_id; state
    per user is bounded by the gap in streaming mode."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = t["events"].select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            # NTZ has no direct long cast; go via LTZ (session tz pinned
            # UTC; "timestamp" is conf-sensitive since the r12 NTZ flip,
            # so the LTZ hop must be explicit)
            | (
                F.col("ts").cast("timestamp_ltz").cast("long")
                - F.lag("ts").over(w).cast("timestamp_ltz").cast("long")
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.select("user_id", "ts", F.sum("new_sess").over(w2).alias("sess_id"))
    return sess.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("sess_start"),
        F.max("ts").alias("sess_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "stream_dedup_exact",
    oracle="""
    WITH deliveries AS (
      SELECT event_id, ts, user_id, event_type, value FROM events
      UNION ALL
      SELECT event_id, ts + INTERVAL 90 SECOND, user_id, event_type, value
      FROM events WHERE event_id % 4 = 0
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rn,
             COUNT(*) OVER (PARTITION BY event_id) AS n_deliveries
      FROM deliveries
    )
    SELECT event_id, ts, user_id, event_type, value,
           CAST(n_deliveries AS BIGINT) AS n_deliveries
    FROM ranked WHERE rn = 1
    """,
)
def stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once projection of an at-least-once event feed: keep the
    first delivery (min ts) per event_id. Batch twin of
    ``dropDuplicatesWithinWatermark(["event_id"])`` (streaming.pipeline.
    dedup_events — same keys; the watermark bounds streaming state to the
    redelivery horizon, here simulated as +90 s redeliveries of every 4th
    event). One shuffle on event_id; at 100 TB the dedup state is one row
    per key per watermark window, the minimum any exactly-once sink pays."""
    t = load_tables(spark, sf_dir)
    e = t["events"].select("event_id", "ts", "user_id", "event_type", "value")
    redelivered = e.filter(F.col("event_id") % 4 == 0).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 90 SECONDS")
    )
    deliveries = e.unionByName(redelivered)
    w = Window.partitionBy("event_id").orderBy("ts")
    ranked = deliveries.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_id")).alias("n_deliveries"),
    )
    return ranked.filter(F.col("rn") == 1).drop("rn")


@query(
    "stream_user_activity_windows",
    oracle="""
    SELECT user_id,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n,
           COUNT(DISTINCT event_type) AS n_types,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS day_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_user_activity_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user rollup — the hypertable-style continuous-aggregate
    shape (time-bucketed groupBy that a streaming job maintains
    incrementally)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("n_types"),
            dsum("value").cast("double").alias("day_value"),
        )
    )


@query(
    "stream_static_enrich",
    oracle="""
    SELECT e.event_type,
           c.c_mktsegment                                   AS segment,
           COUNT(*)                                         AS n,
           CAST(SUM(CAST(ROUND(e.value * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (streaming.pipeline.enrich_events on
    the batch frame — same code object as the stream side, asserted
    equivalent in tests/test_streaming_stateful.py). Dimension broadcast,
    stateless, no stream-side shuffle; decimal-stable value sum."""
    t = load_tables(spark, sf_dir)
    from ..streaming.pipeline import enrich_events

    joined = enrich_events(t["events"], t["customer"], "user_id", "c_custkey")
    return joined.groupBy(
        "event_type", F.col("c_mktsegment").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("value") * 1e6).cast("bigint")).cast("double") / 1e6).alias(
            "total_value"
        ),
    )


@query(
    "stream_stream_join",
    oracle="""
    SELECT CAST(date_trunc('day', c.ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT c.user_id) AS n_users
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    GROUP BY day
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join batch twin (streaming.pipeline.join_event_streams
    on batch frames — same code object; the true two-stream watermarked run
    is asserted equivalent in tests/test_streaming_stateful.py):
    click→purchase conversion pairs per user within 30 minutes, daily
    accounting. The time-bound condition is what makes the streaming state
    finite; in batch it is a range-condition join Catalyst plans as an
    equi-join on user_id with the range as post-filter."""
    from ..streaming.pipeline import join_event_streams

    t = load_tables(spark, sf_dir)
    e = t["events"].select("user_id", "event_type", "ts")
    clicks = e.filter(F.col("event_type") == "click").drop("event_type")
    purchases = e.filter(F.col("event_type") == "purchase").drop("event_type")
    j = join_event_streams(clicks, purchases)
    return (
        j.groupBy(
            F.date_trunc("day", F.col("l.ts")).cast("timestamp_ntz").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct(F.col("l.user_id")).alias("n_users"),
        )
    )


@query(
    "stream_neardup_lsh",
    oracle="""
    WITH base AS (
      SELECT doc_id, text FROM documents
    ),
    batch AS (
      SELECT doc_id + 100000 AS doc_id,
             CASE WHEN doc_id % 2 = 0 THEN text || ' zq yq xq'
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
             CAST('0x' || SUBSTR(MD5(s), 1, 15) AS BIGINT) % 2147483647 AS h
      FROM shingles
    ),
    perms AS (SELECT unnest(generate_series(0, 63)) AS pi),
    mh AS (
      SELECT doc_id, pi,
             MIN(((1103515245 * (pi + 1) + 12345) % 2147483647 * h
                  + (69069 * (pi + 1) + 362437) % 2147483647) % 2147483647) AS v
      FROM hashed CROSS JOIN perms
      GROUP BY doc_id, pi
    ),
    bands AS (
      SELECT doc_id, pi // 4 AS band_id,
             md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY pi)) AS band_hash
      FROM mh GROUP BY doc_id, pi // 4
    )
    SELECT nb.doc_id AS doc_id, ob.doc_id AS corpus_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared_bands
    FROM bands nb JOIN bands ob
      ON nb.band_id = ob.band_id AND nb.band_hash = ob.band_hash
     AND nb.doc_id >= 100000 AND ob.doc_id < 100000
    GROUP BY 1, 2
    """,
)
def stream_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time near-dup detection — the BATCH TWIN of
    streaming.pipeline.neardup_band_matches (same code object; the
    streaming execution over a documents file-stream is exercised in
    tests/test_streaming_stateful.py with an availableNow drain and
    asserted row-identical to this batch result). Incoming docs are
    mutated twins of the corpus; each is matched against the STATIC
    corpus band artifact and reported with its shared-band count.

    100 TB design: corpus bands are a precomputed bucketed artifact; an
    arriving micro-batch pays shingle+signature cost proportional to its
    own size, probes the artifact with a stream-static join, and the only
    stateful step is the per-pair band count."""
    from ..operators.dedup import doc_shingle_arrays, lsh_bands_arr, minhash_sig_arr
    from ..streaming.pipeline import neardup_band_matches
    from .dedup import TWIN_OFFSET, TWIN_SUFFIX

    t = load_tables(spark, sf_dir)
    d = t["documents"]
    incoming = d.select(
        (F.col("doc_id") + TWIN_OFFSET).alias("doc_id"),
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(TWIN_SUFFIX))
        ).otherwise(F.reverse(F.col("text"))).alias("text"),
    )
    corpus_pd = doc_shingle_arrays(d.select("doc_id", "text"), "doc_id", "text")
    corpus_sig = corpus_pd.filter(F.col("n_sh") > 0).select(
        "doc_id", minhash_sig_arr("sh_arr", num_perms=64).alias("sig")
    )
    corpus_bands = lsh_bands_arr(corpus_sig, "doc_id", num_perms=64, bands=16)
    return neardup_band_matches(incoming, corpus_bands).select(
        "doc_id", "corpus_id", "n_shared_bands"
    )


@query(
    "stream_dsir_scoring",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents
    ),
    feats AS (
      SELECT doc_id, lang, f FROM toks, UNNEST(t) AS u(f)
      UNION ALL
      SELECT doc_id, lang, t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1]
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
    ),
    bk AS (
      SELECT doc_id, lang,
             CAST('0x' || SUBSTR(MD5(f), 1, 15) AS BIGINT) % 1024 AS bkt
      FROM feats
    ),
    counts AS (
      SELECT bkt, COUNT(*) AS cnt_raw,
             COUNT(*) FILTER (WHERE lang = 'en') AS cnt_t
      FROM bk GROUP BY bkt
    ),
    tot AS (
      SELECT CAST(SUM(cnt_raw) AS BIGINT) AS tot_raw,
             CAST(SUM(cnt_t) AS BIGINT) AS tot_t
      FROM counts
    ),
    lr AS (
      SELECT bkt,
             CAST(round((ln((cnt_t + 1.0) / (tot_t + 1024.0))
                       - ln((cnt_raw + 1.0) / (tot_raw + 1024.0)))
                        * 1000000) AS BIGINT) AS lr_u
      FROM counts CROSS JOIN tot
    ),
    inc AS (
      SELECT doc_id + 100000 AS doc_id,
             string_split_regex(trim(lower(
               CASE WHEN doc_id % 2 = 0 THEN text || ' zq yq xq'
                    ELSE reverse(text) END)), '\\s+') AS t
      FROM documents
    ),
    ifeats AS (
      SELECT doc_id, f FROM inc, UNNEST(t) AS u(f)
      UNION ALL
      SELECT doc_id, t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1]
      FROM inc, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
    ),
    ibk AS (
      SELECT doc_id,
             CAST('0x' || SUBSTR(MD5(f), 1, 15) AS BIGINT) % 1024 AS bkt
      FROM ifeats
    )
    SELECT ib.doc_id AS doc_id, CAST(SUM(lr.lr_u) AS BIGINT) AS logw_u
    FROM ibk ib JOIN lr USING (bkt)
    GROUP BY ib.doc_id
    """,
)
def stream_dsir_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time DSIR scoring — the BATCH TWIN of
    streaming.pipeline.dsir_score_stream (same code object; the streaming
    execution over a documents file-stream is exercised in
    tests/test_streaming_stateful.py with an availableNow drain and
    asserted row-identical to this batch result). Incoming docs are
    mutated twins of the corpus; each is scored against the STATIC
    precomputed bucket log-ratio model (Xie et al. 2023 DSIR — see
    text_dsir_selection for the batch selection pass).

    100 TB design: the model is a PARAMETER-bounded B-row artifact
    (broadcast-safe at any corpus size); an arriving micro-batch pays
    feature-hash cost proportional to its own size; the per-doc integer
    micro-unit sum is the only stateful step."""
    from ..streaming.pipeline import dsir_score_stream
    from .dedup import TWIN_OFFSET, TWIN_SUFFIX
    from .textops import dsir_feature_buckets, dsir_log_ratio_model

    t = load_tables(spark, sf_dir)
    d = t["documents"]
    lr = dsir_log_ratio_model(
        dsir_feature_buckets(d.select("doc_id", "lang", "text"))
    )
    incoming = d.select(
        (F.col("doc_id") + TWIN_OFFSET).alias("doc_id"),
        F.lit("incoming").alias("lang"),
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(TWIN_SUFFIX))
        ).otherwise(F.reverse(F.col("text"))).alias("text"),
    )
    return dsir_score_stream(incoming, lr)


_FUNNEL_STAGES = ["signup", "view", "click", "purchase"]

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s3 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id
),
counts AS (
  SELECT 1 AS stage_idx, 'signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
  UNION ALL
  SELECT 2, 'view', CAST(COUNT(*) AS BIGINT) FROM s2
  UNION ALL
  SELECT 3, 'click', CAST(COUNT(*) AS BIGINT) FROM s3
  UNION ALL
  SELECT 4, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s4
),
base AS (SELECT n_users AS n1 FROM counts WHERE stage_idx = 1)
SELECT stage_idx, stage, n_users,
       round(CAST(n_users AS DOUBLE) / n1, 4) AS conv_from_first
FROM counts CROSS JOIN base
"""


@query("events_funnel_conversion", oracle=_FUNNEL_ORACLE)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis — the classic product-analytics operator:
    per user, each stage counts only if it happens STRICTLY AFTER the
    user's earliest completion of the previous stage
    (signup -> view -> click -> purchase), reported as per-stage reached
    counts and conversion from stage 1.

    100 TB design: every stage is a groupBy(user_id) over the
    stage-filtered event stream joined to the previous stage's
    (user_id, ts) relation — all four shuffles hash on the SAME key, so
    the exchanges line up (co-partitioned joins, no replanning), and each
    stage's relation only SHRINKS (funnel monotonicity) so the later
    joins get cheaper, with AQE free to broadcast the tail stages from
    runtime sizes (never hinted — user cardinality is corpus-proportional).
    Exact integer counts; the only float is the final rounded ratio.
    Reference parity: reference serves SQL via linked DuckDB
    (db/db.go:67-117); this extends the event-analytics surface."""
    t = load_tables(spark, sf_dir)
    return funnel_conversion(t["events"].select("user_id", "ts", "event_type"))


def funnel_conversion(ev: DataFrame, stages: "list[str]" = _FUNNEL_STAGES) -> DataFrame:
    """The funnel plan proper, parameterized on (user_id, ts, event_type)
    so the 10x skew harness (tools/scale_events.py) drives the IDENTICAL
    plan the registry query runs."""
    from pyspark import StorageLevel

    _FUNNEL_STAGES = stages
    # persist each stage's (user_id, t) relation: every stage feeds BOTH
    # its own count and the next stage's join — without the cache the
    # shared subtrees recompute quadratically (measured: 11 parquet scans
    # in the uncached plan vs 4 with the per-stage persists; the cached
    # relations are user-cardinality, tiny next to the event stream)
    stage_dfs = [
        ev.filter(F.col("event_type") == _FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    ]
    for stage in _FUNNEL_STAGES[1:]:
        stage_dfs.append(
            ev.filter(F.col("event_type") == stage)
            .join(
                stage_dfs[-1].select("user_id", F.col("t").alias("__pt")),
                "user_id",
            )
            .filter(F.col("ts") > F.col("__pt"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    # one declarative plan (no driver-side counts)
    counts = None
    for i, (stage, df) in enumerate(zip(_FUNNEL_STAGES, stage_dfs)):
        c = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(i + 1).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            "n_users",
        )
        counts = c if counts is None else counts.unionByName(c)
    base = counts.filter(F.col("stage_idx") == 1).select(
        F.col("n_users").alias("__n1")
    )
    return counts.crossJoin(F.broadcast(base)).select(
        "stage_idx",
        "stage",
        "n_users",
        F.round(F.col("n_users") / F.col("__n1"), 4).alias("conv_from_first"),
    )


_GAPFILL_ORACLE = """
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n,
         round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*),
               4) AS avg_v
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM b),
grid AS (
  SELECT t.event_type, gs.g AS h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS g
              FROM bounds) gs
)
SELECT g.event_type, CAST(g.h AS VARCHAR) AS bucket,
       b.n IS NOT NULL AS observed,
       CAST(COALESCE(b.n, 0) AS BIGINT) AS n,
       COALESCE(b.avg_v, (
         SELECT b2.avg_v FROM b b2
         WHERE b2.event_type = g.event_type AND b2.h < g.h
         ORDER BY b2.h DESC LIMIT 1)) AS v_locf
FROM grid g LEFT JOIN b ON b.event_type = g.event_type AND b.h = g.h
"""


@query("events_gapfill_locf", oracle=_GAPFILL_ORACLE)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + last-observation-carried-forward — the
    hypertable rollup every monitoring/metrics pipeline runs (TimescaleDB's
    time_bucket_gapfill + locf): hourly buckets per event type over the
    corpus's full time range, missing buckets materialized with n=0 and
    the value carried forward from the latest observed bucket.

    Exactness: bucket averages are exact DECIMAL sums divided once (the
    davg recipe), rounded at 4; the LOCF is Spark's last(ignorenulls) over
    an unbounded-preceding frame — the oracle replicates it with a
    correlated latest-bucket subquery.

    100 TB design: the event stream collapses to (type x hour) buckets in
    ONE map-side-combinable groupBy; the grid is GENERATED (types x hours
    — dimension-bounded, no data shuffle) from a broadcast 1-row bounds
    aggregate; the gap join and the LOCF window run on bucket cardinality,
    never on raw events. Reference parity: reference serves SQL via linked
    DuckDB (db/db.go:67-117); this extends the time-series surface."""
    t = load_tables(spark, sf_dir)
    return gapfill_locf(t["events"].select("event_type", "ts", "value"))


def gapfill_locf(events: DataFrame) -> DataFrame:
    """The gap-fill plan proper, parameterized on (event_type, ts, value)
    so the 10x skew harness (tools/scale_events.py) drives the IDENTICAL
    plan the registry query runs."""
    from pyspark import StorageLevel

    from ..functions.stable import davg

    ev = events.select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h"), "value"
    )
    b = (
        ev.groupBy("event_type", "h")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(davg(F.col("value")), 4).alias("avg_v"),
        )
        # b feeds bounds, the distinct type list, and the gap join — persist
        # so the bucket aggregation runs once (bucket cardinality is tiny)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bounds = b.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    types = b.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = grid.join(b, ["event_type", "h"], "left")
    return out.select(
        "event_type",
        F.col("h").cast("string").alias("bucket"),
        F.col("n").isNotNull().alias("observed"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.coalesce(
            "avg_v", F.last("avg_v", ignorenulls=True).over(w)
        ).alias("v_locf"),
    )


# ---------------------------------------------------------------------------
# Round 9: event-analytics widening — retention cohorts, event-transition
# matrix, time-bounded funnel. Reference parity: reference serves SQL via
# linked DuckDB (db/db.go:67-117); these extend the event surface next to
# the r08 funnel/gapfill operators.
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
),
first_wk AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM act GROUP BY user_id
),
joined AS (
  SELECT f.cohort_wk,
         CAST(date_diff('day', f.cohort_wk, a.wk) / 7 AS BIGINT) AS week_offset,
         a.user_id
  FROM act a JOIN first_wk f USING (user_id)
),
cells AS (
  SELECT cohort_wk, week_offset,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
  FROM joined GROUP BY cohort_wk, week_offset
),
base AS (
  SELECT cohort_wk, n_active AS cohort_size FROM cells WHERE week_offset = 0
)
SELECT CAST(c.cohort_wk AS VARCHAR) AS cohort_week,
       c.week_offset, c.n_active, b.cohort_size,
       round(CAST(c.n_active AS DOUBLE) / b.cohort_size, 4) AS retention
FROM cells c JOIN base b USING (cohort_wk)
"""


@query("events_retention_cohorts", oracle=_RETENTION_ORACLE)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts — the standard product-analytics matrix:
    users grouped by their FIRST active week, each later week's active
    share reported relative to the cohort's size at week 0.

    100 TB design: activity collapses to DISTINCT (user, week) in one
    map-side-combinable aggregation before anything else touches it; the
    cohort assignment is a groupBy(user) min and the join back hashes on
    the SAME user key (co-partitioned, no replanning); the final matrix is
    cohort x offset — dimension-bounded. The week-0 base relation is
    cohort-cardinality and AQE broadcasts it from runtime size (never
    hinted)."""
    t = load_tables(spark, sf_dir)
    act = (
        t["events"]
        .select("user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
        .distinct()
    )
    first_wk = act.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    joined = act.join(first_wk, "user_id").select(
        "cohort_wk",
        (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7)
        .cast("bigint")
        .alias("week_offset"),
        "user_id",
    )
    cells = joined.groupBy("cohort_wk", "week_offset").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_active")
    )
    base = cells.filter(F.col("week_offset") == 0).select(
        "cohort_wk", F.col("n_active").alias("cohort_size")
    )
    return cells.join(base, "cohort_wk").select(
        # DuckDB date_trunc returns DATE for day-or-coarser parts
        F.col("cohort_wk").cast("date").cast("string").alias("cohort_week"),
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 4).alias("retention"),
    )


_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       round(CAST(n AS DOUBLE) /
             SUM(n) OVER (PARTITION BY prev_type), 4) AS p
FROM pairs
"""


@query("events_transition_matrix", oracle=_TRANSITION_ORACLE)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-transition (Markov) matrix — the path-analysis
    operator behind Sankey funnels: consecutive event pairs per user
    (deterministic order: ts with event_id tie-break), counted and
    normalized into transition probabilities per source type.

    100 TB design: ONE window shuffle keyed on user_id (the sequence
    lag), then a dimension-bounded groupBy (type x type cells) with
    map-side partials; the probability normalization runs on the CELLS
    (|types|^2 rows), not on events."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 4).alias("p"),
    )


_WINDOWED_FUNNEL_HOURS = 72

_WINDOWED_FUNNEL_ORACLE = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > s1.t
    AND e.ts <= s1.t + INTERVAL {_WINDOWED_FUNNEL_HOURS} HOUR
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s2.t
    AND e.ts <= s2.t + INTERVAL {_WINDOWED_FUNNEL_HOURS} HOUR
  GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s3 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s3.t
    AND e.ts <= s3.t + INTERVAL {_WINDOWED_FUNNEL_HOURS} HOUR
  GROUP BY e.user_id
),
counts AS (
  SELECT 1 AS stage_idx, 'signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
  UNION ALL SELECT 2, 'view', CAST(COUNT(*) AS BIGINT) FROM s2
  UNION ALL SELECT 3, 'click', CAST(COUNT(*) AS BIGINT) FROM s3
  UNION ALL SELECT 4, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s4
),
base AS (SELECT n_users AS n1 FROM counts WHERE stage_idx = 1)
SELECT stage_idx, stage, n_users,
       round(CAST(n_users AS DOUBLE) / n1, 4) AS conv_from_first
FROM counts CROSS JOIN base
"""


@query("events_windowed_funnel", oracle=_WINDOWED_FUNNEL_ORACLE)
def events_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel: each stage counts only when it happens within
    72 hours after the user's earliest completion of
    the previous stage — the conversion-window semantics every funnel
    product defaults to (unbounded funnels overcount returning users).
    Same per-stage persist/co-partitioned topology as
    events_funnel_conversion (see that docstring for the scan-bound and
    skew laws; tools/scale_events.py asserts them on the shared core)."""
    from pyspark import StorageLevel

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("user_id", "ts", "event_type")
    bound = F.expr(f"INTERVAL {_WINDOWED_FUNNEL_HOURS} HOURS")
    stage_dfs = [
        ev.filter(F.col("event_type") == _FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    ]
    for stage in _FUNNEL_STAGES[1:]:
        stage_dfs.append(
            ev.filter(F.col("event_type") == stage)
            .join(
                stage_dfs[-1].select("user_id", F.col("t").alias("__pt")),
                "user_id",
            )
            .filter(
                (F.col("ts") > F.col("__pt"))
                & (F.col("ts") <= F.col("__pt") + bound)
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    counts = None
    for i, (stage, df) in enumerate(zip(_FUNNEL_STAGES, stage_dfs)):
        c = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(i + 1).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            "n_users",
        )
        counts = c if counts is None else counts.unionByName(c)
    base = counts.filter(F.col("stage_idx") == 1).select(
        F.col("n_users").alias("__n1")
    )
    return counts.crossJoin(F.broadcast(base)).select(
        "stage_idx",
        "stage",
        "n_users",
        F.round(F.col("n_users") / F.col("__n1"), 4).alias("conv_from_first"),
    )
