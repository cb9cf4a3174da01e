"""Skew-handling join strategies (SURVEY 'optimize for scale' list).

AQE's skew-join splitting (on in session.py) handles most runtime skew; the
operators here cover the cases AQE can't:

- salted_join: for a known-skewed key column, explode the hot side's key
  space by a salt factor so one reducer never owns a whole hot key. Use
  when a single key exceeds executor memory even after AQE splitting
  (AQE splits partitions, not individual hash groups on the build side of
  a shuffled-hash join).
- bucketed tables (see tests/test_bucketing.py): pre-shuffle both fact
  tables into the same bucket layout at write time, so repeated joins on
  the bucket key run with ZERO shuffle — the 100 TB pattern for fact-fact
  joins that recur (e.g., lineitem⋈orders every day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `skewed` has heavy key skew: salt the skewed side
    with a random-ish (but deterministic: hash of all columns) salt in
    [0, salt_factor), replicate the other side once per salt value, join on
    (key, salt). The hot key's rows spread over salt_factor reducers.

    Replication multiplies `other` by salt_factor — use only when `other`
    is much smaller than the skewed side (the usual case: dim or semi-big
    side) but too big to broadcast outright.
    """
    salted_l = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_factor))
    )
    salted_r = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = salted_l.join(salted_r, [key, "__salt"], how)
    return out.drop("__salt")
