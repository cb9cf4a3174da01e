"""gamma/lgamma/nextafter UDFs vs DuckDB — bit-exact via glibc libm."""

from __future__ import annotations

import math
import random

import duckdb

from duckdb_service_spark.functions.libm_udfs import (
    _lgamma,
    _nextafter,
    _tgamma,
    ensure_libm_udfs,
)


def test_random_differential_bit_exact():
    q = duckdb.connect().execute
    rng = random.Random(99)
    checked = 0
    for i in range(300):
        x = rng.uniform(-50, 170) if i % 3 else rng.uniform(0.001, 5)
        if x <= 0 and x == int(x):
            continue
        try:
            g, lg = q("SELECT gamma(?), lgamma(?)", [x, x]).fetchone()
        except Exception:  # noqa: BLE001 — DuckDB pole error
            continue
        mg, mlg = _tgamma(x), _lgamma(x)
        assert g == mg or (math.isinf(g) and math.isinf(mg)), x
        assert lg == mlg or (math.isinf(lg) and math.isinf(mlg)), x
        checked += 1
    assert checked > 250
    for _ in range(200):
        a, b = rng.uniform(-10, 10), rng.uniform(-10, 10)
        (na,) = q("SELECT nextafter(?,?)", [a, b]).fetchone()
        assert na == _nextafter(a, b), (a, b)


def test_nextafter_ieee_edges():
    q = duckdb.connect().execute
    for a, b in [(1.0, 2.0), (0.0, -1.0), (1.0, 1.0), (-0.0, 1.0)]:
        (expect,) = q("SELECT nextafter(?,?)", [a, b]).fetchone()
        assert _nextafter(a, b) == expect


def test_spark_udf_path(spark):
    ensure_libm_udfs(spark)
    row = spark.sql(
        "SELECT gamma(5.0) AS g, lgamma(0.5) AS lg,"
        " nextafter(1.0, 2.0) AS na,"
        " gamma(CAST(NULL AS DOUBLE)) AS gn"
    ).collect()[0]
    assert row["g"] == 24.0
    assert row["lg"] == _lgamma(0.5)
    assert row["na"] == 1.0000000000000002
    assert row["gn"] is None


def test_dialect_passthrough():
    from duckdb_service_spark.service.dialect import translate

    out = translate("SELECT gamma(x), lgamma(x), nextafter(x, y) FROM t")
    for name in ("gamma", "lgamma", "nextafter"):
        assert name in out
