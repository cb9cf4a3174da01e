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


def fsum(c, scale: int = 6) -> Column:
    """Fast exact sum of a double column, emitted as DOUBLE.

    Rounds each value to `scale` decimals as an UNSCALED BIGINT
    (round(x*10^s) — primitive codegen, ~2.5x faster than the decimal
    path), sums longs exactly, divides back in double. Deterministic and
    engine-identical like dsum.

    Overflow bound: |sum| * 10^scale must stay < 2^63 (~9.2e18) — safe for
    |sum| < ~9e12 at scale 6. For unbounded-scale aggregations (full 100 TB
    fact tables) use dsum (decimal never overflows at (38,6)); fsum is the
    hot-path variant for bounded domains.

    Oracle twin: CAST(SUM(CAST(ROUND(x * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
    (DuckDB sums BIGINT into HUGEINT, so the oracle side cannot overflow.)
    """
    col = F.col(c) if isinstance(c, str) else c
    m = float(10**scale)
    return F.sum(F.round(col * m).cast("bigint")).cast("double") / m


def favg(c, scale: int = 6) -> Column:
    """avg via fsum/count, emitted as DOUBLE (same IEEE ops both engines).

    Oracle twin: CAST(SUM(CAST(ROUND(x*1e6) AS BIGINT)) AS DOUBLE)/1e6/COUNT(x)
    """
    col = F.col(c) if isinstance(c, str) else c
    return fsum(col, scale) / F.count(col)
