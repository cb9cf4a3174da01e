"""Structured Streaming over the events table.

The reference is batch-only (SURVEY §2.2i: DuckDB has no streaming surface),
so this is a post-parity extension: the same windowed aggregations the batch
plans declare, run incrementally with watermarks. The batch/streaming parity
is the point — identical logical transformations, swapped source/sink.

Scale notes: watermark bounds state; tumbling/sliding aggs shuffle by
(window, key) like any groupBy; availableNow trigger gives reproducible
batch-backfill semantics for tests and backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table_path


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table. pathGlobFilter pins the
    stream to events.parquet inside the fixture dir; maxFilesPerTrigger
    simulates micro-batches."""
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )
    # watermarks require TIMESTAMP (LTZ); session tz is pinned UTC so values
    # align with the batch NTZ frames. Fixture drops have carried ts as
    # TIMESTAMP(NANOS) (reads as long under nanosAsLong → truncate like
    # DuckDB) or TIMESTAMP(MICROS) (already a timestamp) — adapt to either.
    if isinstance(batch_schema["ts"].dataType, LongType):
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        # explicit LTZ: "timestamp" is conf-sensitive since the r12 NTZ
        # flip and watermarks reject TIMESTAMP_NTZ event time
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return stream


def tumbling_counts(events: DataFrame, width: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Per-(window, event_type) counts+sums with late-data watermark."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 1e6).cast("bigint")).cast("double") / 1e6).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def dedup_events(events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once projection of an at-least-once feed: drop redeliveries
    of the same event key. Streaming: ``dropDuplicatesWithinWatermark`` —
    state holds one row per key only until the watermark passes its event
    time (bounded, unlike plain dropDuplicates whose state grows forever).
    Batch twin with identical keys: plans/streams_batch.stream_dedup_exact
    (keeps min-ts delivery; a batch frame here keeps the first-seen row,
    which is the same row set keyed by event_id)."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain the stream with the availableNow trigger into a memory sink and
    return the materialized result (test/backfill harness)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(query_name)


def enrich_events(events: DataFrame, dim: DataFrame, on_left: str, on_right: str) -> DataFrame:
    """Stream-static enrichment join: the canonical streaming-ETL shape
    (events stream × slowly-changing dimension). The static side is
    broadcast by Spark when small — no stream-side shuffle, no state store
    (stateless join), so throughput is scan-bound at any scale. Works
    identically on a batch frame (same code object = batch twin)."""
    from pyspark.sql import functions as F

    return events.join(
        F.broadcast(dim), events[on_left] == dim[on_right], "inner"
    ).drop(on_right)


def join_event_streams(
    left: DataFrame, right: DataFrame, max_lag: str = "30 minutes"
) -> DataFrame:
    """Stream-stream inner join: right-side events for the same user within
    (left.ts, left.ts + max_lag]. Both sides carry a 1-hour watermark and
    the join condition time-bounds the right side relative to the left, so
    the state store evicts rows once the watermark passes — bounded state,
    the requirement for an unbounded 100 TB/day stream join. On batch
    frames withWatermark is a no-op and this is a plain range-condition
    join (same code object = batch twin)."""
    l = left.withWatermark("ts", "1 hour").alias("l")
    r = right.withWatermark("ts", "1 hour").alias("r")
    return l.join(
        r,
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") > F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {max_lag}")),
        "inner",
    )


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the documents table (micro-batched)."""
    batch_schema = spark.read.parquet(table_path(sf_dir, "documents")).schema
    return (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )


def neardup_band_matches(docs: DataFrame, corpus_bands: DataFrame) -> DataFrame:
    """(doc_id, corpus_id, n_shared_bands): incoming documents matched
    against a STATIC corpus LSH-band artifact. Works identically on a
    streaming or batch `docs` relation (the batch/stream parity contract):
    shingle arrays and MinHash signatures are map-side projections, band
    explosion is stateless, the stream-static join probes the bucketed
    corpus artifact, and the per-pair band count is the only stateful step.

    This is the INGESTION-TIME near-dup detector: at 100 TB the corpus
    bands are a precomputed bucketed table and each arriving micro-batch
    pays cost proportional to ITS size — the same topology as the batch
    dedup_incremental_lsh, swapped source."""
    from ..operators.dedup import doc_shingle_arrays, lsh_bands_arr, minhash_sig_arr

    pd = doc_shingle_arrays(docs, "doc_id", "text")
    sig = pd.filter(F.col("n_sh") > 0).select(
        "doc_id", minhash_sig_arr("sh_arr", num_perms=64).alias("sig")
    )
    bands = lsh_bands_arr(sig, "doc_id", num_perms=64, bands=16)
    cb = corpus_bands.select(
        F.col("doc_id").alias("corpus_id"), "band_id", "band_hash"
    )
    return (
        bands.join(cb, ["band_id", "band_hash"])
        .groupBy("doc_id", "corpus_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_bands"))
    )


def dsir_score_stream(docs: DataFrame, lr_model: DataFrame) -> DataFrame:
    """(doc_id, logw_u): incoming documents scored against a STATIC DSIR
    bucket log-ratio artifact (plans.textops.dsir_log_ratio_model). Works
    identically on a streaming or batch ``docs`` relation (the
    batch/stream parity contract): feature hashing is a stateless
    map-side explode, the model probe is a stream-static broadcast join
    (the artifact is PARAMETER-bounded — exactly B rows at any corpus
    size, so the broadcast is safe where corpus-derived sides are not),
    and the per-doc integer sum is the only stateful step.

    This is the INGESTION-TIME data selector: at 100 TB the model is a
    precomputed B-row table and each arriving micro-batch pays cost
    proportional to ITS size — score at ingest, select by threshold or
    downstream Gumbel-top-k over the scored log."""
    from ..plans.textops import dsir_feature_buckets

    bk = dsir_feature_buckets(docs)
    return (
        bk.join(F.broadcast(lr_model), "bkt")
        .groupBy("doc_id")
        .agg(F.sum("lr_u").cast("bigint").alias("logw_u"))
    )
