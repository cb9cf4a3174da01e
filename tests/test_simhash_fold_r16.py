"""r16: operators.dedup.simhash moved from the exploded 32-aggregate form
(one row per token through a hash aggregate, 32 sum columns + recompose) to
a per-row HOF fold (minhash_sig_arr recipe — zero explode/groupBy/Exchange).
Values must be bit-identical to the legacy form for every doc, including
repeated tokens (simhash weighs multiplicity), single-token docs, and the
NULL-text drop contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_service_spark.functions.portable import hash64
from duckdb_service_spark.operators.dedup import simhash, tokens_expr


def _legacy_simhash(df, id_col, text_col, bits=32):
    # the pre-r16 exploded aggregate form, verbatim (git d740099^)
    toks = df.select(
        F.col(id_col), F.explode(tokens_expr(F.col(text_col))).alias("tok")
    )
    h = hash64(F.col("tok"))
    toks = toks.select(id_col, h.alias("h"))
    bit_sums = [
        F.expr(
            f"sum(CASE WHEN (shiftright(h, {j}) & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    recompose = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    out = F.expr(f"CAST(0 AS BIGINT) + {recompose}")
    return agg.select(id_col, out.alias("simhash"))


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
            (4, "hi"),  # single token
            (5, "dup dup dup dup"),  # multiplicity matters
            (6, "  spaced   out\ttokens \n mixed  whitespace  "),
            (7, None),  # NULL text: no output row (explode contract)
            (8, ""),  # empty text: one '' token, still a row
        ],
        "doc_id int, text string",
    )


def test_simhash_fold_matches_legacy_values(spark):
    df = _corpus(spark)
    new = {r[0]: r[1] for r in simhash(df, "doc_id", "text").collect()}
    old = {r[0]: r[1] for r in _legacy_simhash(df, "doc_id", "text").collect()}
    assert new == old
    assert 7 not in new  # NULL text dropped, like the exploded form
    assert 8 in new


def test_simhash_fold_matches_legacy_fewer_bits(spark):
    df = _corpus(spark)
    new = {r[0]: r[1] for r in simhash(df, "doc_id", "text", bits=8).collect()}
    old = {
        r[0]: r[1]
        for r in _legacy_simhash(df, "doc_id", "text", bits=8).collect()
    }
    assert new == old


def test_simhash_fold_has_no_exchange_or_aggregate(spark):
    df = _corpus(spark)
    plan = simhash(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "HashAggregate" not in plan, plan
