"""ADVICE r15 #3: the F.expr SQL-text rewrites of lsh_bucket /
lsh_table_buckets (and the _dot_sql fold inside them) had no direct
equivalence tests — only the end-to-end diffcheck of the queries that use
them. Mirror of tests/test_sqltext_builders_r15.py: the SQL-text forms must
resolve SEMANTICALLY IDENTICAL to the legacy Column folds they replaced
(exact float literals, same CASE/sum shapes), asserted with
DataFrame.sameSemantics plus a value spot-check, so a future PLANES/typing
tweak can't silently diverge."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from duckdb_service_spark.operators.similarity import (
    DIM,
    N_PLANES,
    N_TABLES,
    PLANES,
    PLANES_PER_TABLE,
    dot,
    lsh_bucket,
    lsh_table_buckets,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(DIM)]) for i in range(8)
    ]
    return spark.createDataFrame(rows, "vec_id int, vec array<double>")


def _legacy_bucket(vec_col, n_planes=N_PLANES):
    # the pre-r15 Column fold, verbatim (git 913019b^)
    out = F.lit(0).cast("bigint")
    for j in range(n_planes):
        plane = F.array(*[F.lit(float(w)) for w in PLANES[j]])
        out = out + F.when(
            dot(plane, F.col(vec_col)) > 0, F.lit(1 << j).cast("bigint")
        ).otherwise(0)
    return out


def _legacy_table_buckets(vec_col):
    entries = []
    for t in range(N_TABLES):
        bucket = F.lit(0).cast("bigint")
        for j in range(PLANES_PER_TABLE):
            plane_idx = t * PLANES_PER_TABLE + j
            plane = F.array(*[F.lit(float(w)) for w in PLANES[plane_idx]])
            bucket = bucket + F.when(
                dot(plane, F.col(vec_col)) > 0, F.lit(1 << j).cast("bigint")
            ).otherwise(0)
        entries.append(
            F.struct(F.lit(t).alias("table_id"), bucket.alias("bucket"))
        )
    return F.array(*entries)


def test_lsh_bucket_same_semantics_and_values(vecs):
    new = vecs.select("vec_id", lsh_bucket("vec").alias("b"))
    old = vecs.select("vec_id", _legacy_bucket("vec").alias("b"))
    assert new.sameSemantics(old)
    assert new.orderBy("vec_id").collect() == old.orderBy("vec_id").collect()


def test_lsh_table_buckets_same_semantics_and_values(vecs):
    new = vecs.select("vec_id", lsh_table_buckets("vec").alias("tb"))
    old = vecs.select("vec_id", _legacy_table_buckets("vec").alias("tb"))
    assert new.sameSemantics(old)
    assert new.orderBy("vec_id").collect() == old.orderBy("vec_id").collect()


def test_lsh_bucket_fewer_planes_dial(vecs):
    # the n_planes recall/cost dial must keep the same per-plane bits
    new = vecs.select("vec_id", lsh_bucket("vec", n_planes=4).alias("b"))
    old = vecs.select("vec_id", _legacy_bucket("vec", n_planes=4).alias("b"))
    assert new.sameSemantics(old)
    assert new.orderBy("vec_id").collect() == old.orderBy("vec_id").collect()
