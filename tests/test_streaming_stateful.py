"""applyInPandasWithState sessionization: closed sessions from the stream
must match the batch gaps-and-islands sessionization for every session the
watermark has passed."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stateful_sessionize_matches_batch(spark, sf_dir):
    from duckdb_service_spark.plans import QUERIES, load_all
    from duckdb_service_spark.streaming.pipeline import read_events_stream
    from duckdb_service_spark.streaming.stateful import sessionize_stream

    load_all()

    stream = sessionize_stream(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("t_sessions").collect()
    assert got, "no sessions emitted"

    batch = QUERIES["stream_sessionization"](spark, sf_dir).collect()
    batch_keys = {
        (r.user_id, r.sess_start.replace(tzinfo=None), r.n_events) for r in batch
    }
    matched = sum(
        1
        for r in got
        if (r.user_id, r.sess_start.replace(tzinfo=None), r.n_events) in batch_keys
    )
    # the final (unclosed) session per user stays in state at end-of-stream;
    # every EMITTED session must be a real batch session
    assert matched == len(got), f"{len(got)-matched}/{len(got)} emitted sessions not in batch"
    assert len(got) >= 0.5 * len(batch_keys)


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark over a simulated at-least-once feed
    (every 4th event redelivered +90s in a second file): output must carry
    each event_id exactly once and cover the full key set."""
    from duckdb_service_spark.sources import load_tables
    from duckdb_service_spark.streaming.pipeline import dedup_events

    e = (
        load_tables(spark, sf_dir)["events"]
        .select("event_id", "ts", "user_id", "event_type", "value")
        # explicit LTZ for the watermark ("timestamp" resolves NTZ since
        # the r12 timestampType flip); tz pinned UTC
        .withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    )
    feed = str(tmp_path / "deliveries")
    e.coalesce(1).write.mode("overwrite").parquet(feed)
    (
        e.filter(F.col("event_id") % 4 == 0)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 90 SECONDS"))
        .coalesce(1)
        .write.mode("append")
        .parquet(feed)
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(feed).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        dedup_events(stream)
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r.event_id for r in spark.table("t_dedup").collect()]
    assert len(got) == len(set(got)), "stream emitted duplicate event_ids"
    assert set(got) == {r.event_id for r in e.select("event_id").collect()}


def test_sequences_via_service(spark):
    import tempfile

    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="wh_seq_"))
    eng.execute("CREATE SEQUENCE s1 START 10")
    eng.execute("CREATE TABLE seq_t (id integer, tag text)")
    eng.execute("INSERT INTO seq_t VALUES (nextval('s1'), 'a'), (nextval('s1'), 'b')")
    rows = eng.query_df("SELECT id, tag FROM seq_t").collect()
    assert {(r.id, r.tag) for r in rows} == {(10, "a"), (11, "b")}
    val = eng.query_df("SELECT nextval('s1') AS v").collect()[0].v
    assert val == 12


def test_sequences_survive_restart(spark):
    import tempfile

    from duckdb_service_spark.service.executor import Engine

    wh = tempfile.mkdtemp(prefix="wh_seq2_")
    eng = Engine(spark, wh)
    eng.execute("CREATE SEQUENCE s2 START 5")
    assert eng.query_df("SELECT nextval('s2') AS v").collect()[0].v == 5
    # new Engine over the same warehouse = restart
    eng2 = Engine(spark, wh)
    assert eng2.query_df("SELECT nextval('s2') AS v").collect()[0].v == 6


def test_stream_static_enrich_matches_batch(spark, sf_dir):
    """Stream-static join: the same enrich_events code object over the
    file-source stream must produce exactly the batch join's rows
    (stateless join — append mode, no watermark needed)."""
    from duckdb_service_spark.sources import load_tables
    from duckdb_service_spark.streaming.pipeline import enrich_events, read_events_stream

    t = load_tables(spark, sf_dir)
    dim = t["customer"].select("c_custkey", "c_mktsegment")
    stream = enrich_events(
        read_events_stream(spark, sf_dir).select("event_id", "user_id"),
        dim,
        "user_id",
        "c_custkey",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_enrich")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.event_id, r.c_mktsegment) for r in spark.table("t_enrich").collect()}
    batch = enrich_events(
        t["events"].select("event_id", "user_id"), dim, "user_id", "c_custkey"
    )
    want = {(r.event_id, r.c_mktsegment) for r in batch.collect()}
    assert got == want and got


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Stream-stream inner join (watermarked, time-bounded): the same
    join_event_streams code object over TWO file-source streams must
    produce exactly the batch join's pairs. The time bound + watermark
    keep the state store finite — this asserts correctness of the
    bounded-state configuration, not just the batch semantics."""
    from duckdb_service_spark.sources import load_tables
    from duckdb_service_spark.streaming.pipeline import (
        join_event_streams,
        read_events_stream,
    )

    def split(df):
        c = df.filter(df.event_type == "click").select("user_id", "ts", "event_id")
        p = df.filter(df.event_type == "purchase").select(
            "user_id", "ts", "event_id"
        )
        return c, p

    sc, sp = split(read_events_stream(spark, sf_dir))
    joined = join_event_streams(sc, sp).select(
        F.col("l.event_id").alias("click_id"), F.col("r.event_id").alias("purchase_id")
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.click_id, r.purchase_id) for r in spark.table("t_ssj").collect()}

    # batch twin over LTZ frames under the same UTC session the stream set
    bc, bp = split(
        load_tables(spark, sf_dir)["events"].withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
    )
    want = {
        (r.click_id, r.purchase_id)
        for r in join_event_streams(bc, bp)
        .select(
            F.col("l.event_id").alias("click_id"),
            F.col("r.event_id").alias("purchase_id"),
        )
        .collect()
    }
    assert got == want and got


def test_stream_neardup_matches_batch(spark, sf_dir):
    """Ingestion-time near-dup detection: the STREAMING execution of
    neardup_band_matches (documents file-stream vs static corpus bands,
    availableNow drain, complete mode) must be row-identical to the batch
    twin — same code object, swapped source."""
    from pyspark.sql import functions as F  # noqa: F811

    from duckdb_service_spark.operators.dedup import (
        doc_shingle_arrays,
        lsh_bands,
        minhash_sig_cols,
    )
    from duckdb_service_spark.plans import QUERIES, load_all
    from duckdb_service_spark.plans.dedup import TWIN_OFFSET, TWIN_SUFFIX
    from duckdb_service_spark.sources import load_tables
    from duckdb_service_spark.streaming.pipeline import (
        neardup_band_matches,
        read_documents_stream,
    )

    load_all()
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    corpus_pd = doc_shingle_arrays(d.select("doc_id", "text"), "doc_id", "text")
    corpus_sig = corpus_pd.filter(F.col("n_sh") > 0).select(
        "doc_id", *minhash_sig_cols(F.col("sh_arr"), num_perms=64)
    )
    corpus_bands = lsh_bands(corpus_sig, "doc_id", num_perms=64, bands=16)
    # static side materialized once — the precomputed-artifact posture
    corpus_bands = corpus_bands.localCheckpoint(eager=True)

    incoming_stream = read_documents_stream(spark, sf_dir).select(
        (F.col("doc_id") + TWIN_OFFSET).alias("doc_id"),
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(TWIN_SUFFIX))
        ).otherwise(F.reverse(F.col("text"))).alias("text"),
    )
    out = neardup_band_matches(incoming_stream, corpus_bands)
    q = (
        out.writeStream.format("memory")
        .queryName("t_neardup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.doc_id, r.corpus_id, r.n_shared_bands)
        for r in spark.table("t_neardup").collect()
    }
    want = {
        (r.doc_id, r.corpus_id, r.n_shared_bands)
        for r in QUERIES["stream_neardup_lsh"](spark, sf_dir).collect()
    }
    assert got == want and got, f"stream/batch mismatch: {len(got)} vs {len(want)}"


def test_stream_dsir_scoring_matches_batch(spark, sf_dir):
    """Ingestion-time DSIR scoring: the STREAMING execution of
    dsir_score_stream (documents file-stream vs the static B-row log-ratio
    artifact, availableNow drain, complete mode) must be row-identical to
    the batch twin — same code object, swapped source."""
    from pyspark.sql import functions as F  # noqa: F811

    from duckdb_service_spark.plans import QUERIES, load_all
    from duckdb_service_spark.plans.dedup import TWIN_OFFSET, TWIN_SUFFIX
    from duckdb_service_spark.plans.textops import (
        dsir_feature_buckets,
        dsir_log_ratio_model,
    )
    from duckdb_service_spark.sources import load_tables
    from duckdb_service_spark.streaming.pipeline import (
        dsir_score_stream,
        read_documents_stream,
    )

    load_all()
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    lr = dsir_log_ratio_model(
        dsir_feature_buckets(d.select("doc_id", "lang", "text"))
    )
    # static side materialized once — the precomputed-artifact posture
    lr = lr.localCheckpoint(eager=True)

    incoming_stream = read_documents_stream(spark, sf_dir).select(
        (F.col("doc_id") + TWIN_OFFSET).alias("doc_id"),
        F.lit("incoming").alias("lang"),
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(TWIN_SUFFIX))
        ).otherwise(F.reverse(F.col("text"))).alias("text"),
    )
    out = dsir_score_stream(incoming_stream, lr)
    q = (
        out.writeStream.format("memory")
        .queryName("t_dsir")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {(r.doc_id, r.logw_u) for r in spark.table("t_dsir").collect()}
    want = {
        (r.doc_id, r.logw_u)
        for r in QUERIES["stream_dsir_scoring"](spark, sf_dir).collect()
    }
    assert got == want and got, f"stream/batch mismatch: {len(got)} vs {len(want)}"
