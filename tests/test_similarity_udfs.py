"""String-similarity UDFs (jaro*/damerau_levenshtein) vs DuckDB.

Pins the MEASURED DuckDB semantics (byte-level, empty-string zeros, Winkler
boost threshold, true unrestricted DL) and runs a seeded random differential
through the actual Spark UDF path the dialect emits.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from duckdb_service_spark.functions.similarity_udfs import (
    _damerau_levenshtein,
    _jaro,
    _jaro_winkler,
    ensure_similarity_udfs,
)

# (s1, s2) -> measured DuckDB 1.x outputs, probed live
PINNED = [
    # jaro: empty-string behavior is 0.0, NOT the textbook 1.0 for ("","")
    ("", "", 0.0, 0.0, 0),
    ("a", "", 0.0, 0.0, 1),
    ("", "abc", 0.0, 0.0, 3),
    ("abc", "abc", 1.0, 1.0, 0),
    # classic pairs
    ("martha", "marhta", 0.9444444444444445, 0.9611111111111111, 1),
    ("dixon", "dicksonx", 0.7666666666666666, 0.8133333333333332, 4),
    ("duane", "dwayne", 0.8222222222222223, 0.8400000000000001, 2),
    ("TRATE", "TRACE", 0.8666666666666667, 0.9066666666666667, 1),
    # window edge: len-2 strings have window 0 -> no cross matches
    ("ab", "ba", 0.0, 0.0, 1),
    # Winkler boost threshold: jaro 0.5 with a 2-byte prefix gets NO boost
    ("abqqqqqq", "abzzzzzz", 0.5, 0.5, 6),
    # prefix cap at 4 despite 5 common leading bytes
    ("aaaaaab", "aaaaaba", 0.9523809523809524, 0.9714285714285714, 1),
    # TRUE Damerau-Levenshtein, not OSA (OSA would give 3 here)
    ("CA", "ABC", None, None, 2),
    # byte-level: é is two UTF-8 bytes
    ("héllo", "hello", 0.8222222222222223, None, 2),
]


@pytest.mark.parametrize("s1,s2,j,jw,dl", PINNED)
def test_pinned_semantics(s1, s2, j, jw, dl):
    a, b = s1.encode(), s2.encode()
    if j is not None:
        assert abs(_jaro(a, b) - j) < 1e-12
    if jw is not None:
        assert abs(_jaro_winkler(a, b) - jw) < 1e-12
    assert _damerau_levenshtein(a, b) == dl


def test_random_differential_vs_duckdb():
    con = duckdb.connect()
    rng = random.Random(1234)
    alpha = "abcdeé中 XY"
    for _ in range(250):
        s1 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        s2 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        j, jw, dl = con.execute(
            "SELECT jaro_similarity(?,?), jaro_winkler_similarity(?,?),"
            " damerau_levenshtein(?,?)",
            [s1, s2, s1, s2, s1, s2],
        ).fetchone()
        a, b = s1.encode(), s2.encode()
        assert abs(_jaro(a, b) - j) < 1e-12, (s1, s2)
        assert abs(_jaro_winkler(a, b) - jw) < 1e-12, (s1, s2)
        assert _damerau_levenshtein(a, b) == dl, (s1, s2)


def test_spark_udf_path(spark):
    """The registered pandas UDFs (the path dialect-translated SQL takes),
    including NULL propagation and the Arrow batch transfer."""
    ensure_similarity_udfs(spark)
    row = spark.sql(
        "SELECT jaro_similarity('martha','marhta') AS j,"
        " jaro_winkler_similarity('dixon','dicksonx') AS jw,"
        " damerau_levenshtein('CA','ABC') AS dl,"
        " jaro_similarity(CAST(NULL AS STRING),'a') AS jn,"
        " damerau_levenshtein('a', CAST(NULL AS STRING)) AS dn"
    ).collect()[0]
    assert abs(row["j"] - 0.9444444444444445) < 1e-12
    assert abs(row["jw"] - 0.8133333333333332) < 1e-12
    assert row["dl"] == 2
    assert row["jn"] is None and row["dn"] is None


def test_dialect_translates_to_passthrough():
    from duckdb_service_spark.service.dialect import translate

    out = translate("SELECT jaro_winkler_similarity(a, b) FROM t")
    assert "jaro_winkler_similarity" in out
