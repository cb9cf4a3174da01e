"""r15 optimization: the SQL-text expression builders in operators/dedup.py
must be SEMANTICALLY IDENTICAL to the Column/lambda forms they replace (the
rewrite only removes py4j round trips from plan construction, never changes
the resolved expressions). Asserted with DataFrame.sameSemantics — Spark's
canonicalized-plan equality — plus a value spot-check."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_service_spark.functions.portable import hash64
from duckdb_service_spark.operators.dedup import (
    MINHASH_PRIME,
    doc_shingle_arrays,
    lsh_bands,
    minhash_sig_cols,
    perm_coeffs,
    shingles_expr,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
            (4, "hi"),  # <3 tokens -> zero shingles
        ],
        "doc_id int, text string",
    )


def _legacy_shingle_arrays(df, id_col, text_col, shingle_n=3):
    arr = F.transform(shingles_expr(F.col(text_col), shingle_n), lambda s: hash64(s))
    return df.select(F.col(id_col), arr.alias("sh_arr")).select(
        id_col, "sh_arr", F.size("sh_arr").alias("n_sh")
    )


def _legacy_sig_cols(arr, num_perms):
    def _perm(a, b):
        return lambda s: (F.lit(a) * (s % MINHASH_PRIME) + F.lit(b)) % MINHASH_PRIME

    cols = []
    for i in range(num_perms):
        a, b = perm_coeffs(i)
        cols.append(F.array_min(F.transform(arr, _perm(a, b))).alias(f"mh{i}"))
    return cols


def _legacy_bands(sig, id_col, num_perms=64, bands=16):
    rows_per_band = num_perms // bands
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + j}") for j in range(rows_per_band)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws(",", *cols)).alias("band_hash"),
            )
        )
    return sig.select(id_col, F.explode(F.array(*band_structs)).alias("band")).select(
        id_col,
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_hash").alias("band_hash"),
    )


def test_shingle_arrays_same_semantics(spark):
    df = _corpus(spark)
    new = doc_shingle_arrays(df, "doc_id", "text")
    old = _legacy_shingle_arrays(df, "doc_id", "text")
    assert new.sameSemantics(old)


def test_sig_cols_same_semantics_and_values(spark):
    per_doc = doc_shingle_arrays(_corpus(spark), "doc_id", "text")
    new = per_doc.select("doc_id", *minhash_sig_cols("sh_arr", num_perms=8))
    old = per_doc.select(
        "doc_id", *_legacy_sig_cols(F.col("sh_arr"), num_perms=8)
    )
    assert new.sameSemantics(old)
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))


def test_lsh_bands_same_semantics(spark):
    per_doc = doc_shingle_arrays(_corpus(spark), "doc_id", "text")
    sig = per_doc.filter(F.col("n_sh") > 0).select(
        "doc_id", *minhash_sig_cols("sh_arr", num_perms=64)
    )
    new = lsh_bands(sig, "doc_id", num_perms=64, bands=16)
    old = _legacy_bands(sig, "doc_id", num_perms=64, bands=16)
    assert new.sameSemantics(old)


def test_candidate_pairs_same_semantics(spark):
    from duckdb_service_spark.operators.dedup import lsh_candidate_pairs

    per_doc = doc_shingle_arrays(_corpus(spark), "doc_id", "text")
    sig = per_doc.filter(F.col("n_sh") > 0).select(
        "doc_id", *minhash_sig_cols("sh_arr", num_perms=64)
    )
    bands = lsh_bands(sig, "doc_id")
    new = lsh_candidate_pairs(bands, "doc_id")

    ids = F.array_sort(F.collect_set(F.col("doc_id")))
    buckets = (
        bands.groupBy("band_id", "band_hash")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    legacy_pair_arr = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size("ids") - i - F.lit(1)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    old = (
        buckets.select(F.explode(legacy_pair_arr).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )
    assert new.sameSemantics(old)
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))


def test_sig_arr_matches_sig_cols(spark):
    """The array-form signature (ONE ARRAY<BIGINT> column, r15) must carry
    exactly the 64 per-slot values of the column form, and the array-form
    bands must hash to the same band_hash values."""
    from duckdb_service_spark.operators.dedup import lsh_bands_arr, minhash_sig_arr

    per_doc = doc_shingle_arrays(_corpus(spark), "doc_id", "text").filter(
        F.col("n_sh") > 0
    )
    cols = per_doc.select("doc_id", *minhash_sig_cols("sh_arr", num_perms=64))
    arr = per_doc.select(
        "doc_id", minhash_sig_arr("sh_arr", num_perms=64).alias("sig")
    )
    got = {r["doc_id"]: list(r["sig"]) for r in arr.collect()}
    want = {r["doc_id"]: [r[f"mh{i}"] for i in range(64)] for r in cols.collect()}
    assert got == want

    old_bands = sorted(map(tuple, lsh_bands(cols, "doc_id").collect()))
    new_bands = sorted(map(tuple, lsh_bands_arr(arr, "doc_id").collect()))
    assert old_bands == new_bands


def test_sig_arr_no_lambda_reevaluation_blowup(spark):
    """Regression for the HOF re-evaluation pathology: WITHOUT a
    materialization barrier (no persist), the full shingle pipeline
    collapsed into the signature lambda was re-evaluated once per
    permutation (64x per row; stream_neardup_lsh went 7s -> 43s at
    sf0.001). The let-binding in minhash_sig_arr/lsh_bands_arr pins one
    evaluation per row — this test runs the unpersisted chain end-to-end
    and must complete quickly (values checked; the timing guard is the
    1000-row corpus finishing at all within the test budget)."""
    from duckdb_service_spark.operators.dedup import lsh_bands_arr, minhash_sig_arr

    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta eta theta iota kappa doc "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    per_doc = doc_shingle_arrays(docs, "doc_id", "text")  # NOT persisted
    sig = per_doc.filter(F.col("n_sh") > 0).select(
        "doc_id", minhash_sig_arr("sh_arr", num_perms=64).alias("sig")
    )
    bands = lsh_bands_arr(sig, "doc_id")
    assert bands.count() == 16000


def test_minhash_signatures_agg_expr_values(spark):
    # the aggregate form's F.expr slots: same values as the array form's
    # per-row slots for every doc with shingles
    from duckdb_service_spark.operators.dedup import minhash_signatures

    df = _corpus(spark)
    agg = minhash_signatures(df, "doc_id", "text", num_perms=8).orderBy("doc_id")
    per_doc = doc_shingle_arrays(df, "doc_id", "text").filter(F.col("n_sh") > 0)
    arr = per_doc.select("doc_id", *minhash_sig_cols("sh_arr", num_perms=8)).orderBy(
        "doc_id"
    )
    assert [tuple(r) for r in agg.collect()] == [tuple(r) for r in arr.collect()]
