"""Portable (cross-engine reproducible) expression helpers.

Engine-native hashes differ (Spark xxhash64/murmur vs DuckDB's hash), so any
operator whose OUTPUT depends on hashing (minhash signatures, hash-bucket
sampling, fingerprints) uses md5 — byte-identical everywhere — mapped to an
int64 via its leading 15 hex digits (60 bits, always positive).

Spark:  CAST(CONV(SUBSTR(MD5(s),1,15),16,10) AS BIGINT)
DuckDB: CAST('0x' || SUBSTR(MD5(s),1,15) AS BIGINT)

At scale this is pure JVM codegen (no UDF); md5 is ~2-3x slower than
xxhash64 but runs once per row/shingle and stays entirely map-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column | str) -> Column:
    """Deterministic 60-bit positive int64 of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str) -> str:
    """DuckDB twin of hash64 for oracle SQL strings."""
    return f"CAST('0x' || SUBSTR(MD5({expr}), 1, 15) AS BIGINT)"
