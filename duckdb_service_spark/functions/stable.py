"""Cross-engine numerically-stable aggregation helpers.

Summing doubles is order-dependent, and Spark (partition-parallel) will not
accumulate in the same order as the DuckDB oracle — raw ``sum(double)`` can
differ in the low bits, which breaks exact value-hash comparison. The fix is
exact arithmetic: cast each double to ``DECIMAL(38,s)`` per row (deterministic
round-to-nearest, identical in both engines for non-boundary values) and sum
decimals, which is exact and order-independent. Derived ratios then do the
same IEEE double ops on identical inputs on both sides, hence identical bits.

This also matters at 100 TB for reasons beyond the oracle: decimal sums give
reproducible results run-to-run regardless of partitioning/AQE decisions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dec(c, scale: int = 6) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal(38,{scale})")


def dsum(c, scale: int = 6) -> Column:
    """Exact decimal sum of a double column (order-independent)."""
    return F.sum(dec(c, scale))


def davg(c, scale: int = 6) -> Column:
    """avg as exact-decimal-sum / count, emitted as DOUBLE.

    Oracle-side SQL twin: CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE)/COUNT(x)
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(dec(col, scale)).cast("double") / F.count(col)


def round_dbl(col: Column, digits: int = 4) -> Column:
    return F.round(col.cast("double"), digits)
