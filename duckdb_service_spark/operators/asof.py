"""As-of join — DuckDB dialect operator (SURVEY §2.2c) Spark lacks natively.

Semantics (DuckDB `ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts`): each
left row matches the single right row with the greatest right.ts <= left.ts
within its key group.

Implementation is the *union + last-value window* composition, NOT a range
join: tag both sides, sort each key group once by (ts, side), and carry the
most recent right payload forward with last(ignorenulls). Cost is one shuffle
by key + a sort — O(n log n) per key group with no pair blow-up, which is the
plan that survives 100 TB (a naive range join is O(L×R) per key before
filtering). Skewed keys are handled by AQE skew-split since this is a plain
window over a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    how: str = "inner",
) -> DataFrame:
    """Return left rows joined to the latest right row with
    right_ts <= left_ts per `on` group.

    Right payload columns come back under their own names; the matched right
    timestamp is exposed as ``asof_ts``. ``how='left'`` keeps unmatched left
    rows with NULL payload; ``'inner'`` drops them (DuckDB ASOF JOIN default).
    """
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    rpay = [right_ts] + [c for c in right_payload if c != right_ts]

    tagged_r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in rpay],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rpay],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )

    # Right rows with equal ts sort before left rows (side 0 < 1), giving the
    # inclusive `left_ts >= right_ts` match. A unique right ts per key keeps
    # ties deterministic (as in DuckDB).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).select(
        *on,
        "__ts",
        "__side",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}") for c in rpay],
        *[F.col(f"__l_{c}") for c in lcols],
    )

    out = carried.filter(F.col("__side") == 1).select(
        *on,
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        F.col(f"__m_{right_ts}").alias("asof_ts"),
        *[F.col(f"__m_{c}").alias(c) for c in rpay if c != right_ts],
    )
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out


def positional_join(
    left: DataFrame, right: DataFrame, left_order: list[Column], right_order: list[Column]
) -> DataFrame:
    """DuckDB POSITIONAL JOIN: align two relations row-by-row. Position is
    only well-defined under an explicit total order, so this takes one per
    side (SURVEY §2.2c documents the non-determinism caveat)."""
    lw = Window.orderBy(*left_order)
    rw = Window.orderBy(*right_order)
    ln = left.withColumn("__pos", F.row_number().over(lw))
    rn = right.withColumn("__pos", F.row_number().over(rw))
    return ln.join(rn, "__pos", "full").drop("__pos")
