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
    from pyspark.sql import types as T

    lcols = [c for c in left.columns if c not in on and c != left_ts]
    rpay = [right_ts] + [c for c in right_payload if c != right_ts]

    # The whole right payload rides in ONE struct carried by a single
    # last(ignorenulls): carrying columns independently would back-fill a
    # legitimately-NULL payload field from an OLDER right row, mixing two
    # right rows in one output row — DuckDB ASOF JOIN never does that.
    rpay_type = T.StructType([T.StructField(c, right.schema[c].dataType) for c in rpay])
    tagged_r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in rpay]).alias("__rpay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rpay_type).alias("__rpay"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )

    return _asof_carry(tagged_r.unionByName(tagged_l), on, lcols, left_ts, right_ts, rpay, how)


def _asof_carry(
    tagged: DataFrame,
    on: list[str],
    lcols: list[str],
    left_ts: str,
    right_ts: str,
    rpay: list[str],
    how: str,
) -> DataFrame:
    """Shared tail of both asof variants: sort each key group once by
    (ts, side) and carry the latest right payload struct forward.

    Right rows with equal ts sort before left rows (side 0 < 1), giving the
    inclusive `left_ts >= right_ts` match. A unique right ts per key keeps
    ties deterministic (as in DuckDB)."""
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        *on,
        "__ts",
        "__side",
        F.last("__rpay", ignorenulls=True).over(w).alias("__m"),
        *[F.col(f"__l_{c}") for c in lcols],
    )

    out = carried.filter(F.col("__side") == 1).select(
        *on,
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        F.col("__m").getField(right_ts).alias("asof_ts"),
        *[F.col("__m").getField(c).alias(c) for c in rpay if c != right_ts],
    )
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out


def asof_join_fused(
    source: DataFrame,
    left_pred: Column,
    right_pred: Column,
    on: list[str],
    left_ts: str,
    right_ts: str,
    left_payload: list[str],
    right_payload: list[str],
    how: str = "inner",
) -> DataFrame:
    """`asof_join` for the common case where BOTH sides are filters of ONE
    relation (e.g. clicks vs views of the same `events` table): one scan of
    the source with a conditional side tag, instead of two scans unioned.
    At 100 TB this halves the input I/O of the asof stage; at sf0.1 it
    shaves the cold-cache cost measurably (tools/perf_asof.py).

    Requires ``left_pred`` and ``right_pred`` to be mutually exclusive —
    a row satisfying both would need to appear on both sides, which a
    single-pass tag cannot express. Semantics are otherwise identical to
    ``asof_join(source.filter(left_pred), source.filter(right_pred), ...)``.
    """
    from pyspark.sql import types as T

    lcols = [c for c in left_payload if c not in on and c != left_ts]
    rpay = [right_ts] + [c for c in right_payload if c != right_ts]
    rpay_type = T.StructType([T.StructField(c, source.schema[c].dataType) for c in rpay])

    tagged = source.filter(left_pred | right_pred).select(
        *on,
        F.when(right_pred, F.col(right_ts)).otherwise(F.col(left_ts)).alias("__ts"),
        F.when(right_pred, F.lit(0)).otherwise(F.lit(1)).alias("__side"),
        F.when(right_pred, F.struct(*[F.col(c).alias(c) for c in rpay]))
        .otherwise(F.lit(None).cast(rpay_type))
        .alias("__rpay"),
        *[F.when(left_pred, F.col(c)).alias(f"__l_{c}") for c in lcols],
    )
    return _asof_carry(tagged, on, lcols, left_ts, right_ts, rpay, how)


def _with_global_pos(df: DataFrame, order: list[Column]) -> DataFrame:
    """Attach a 1-based global position under `order` WITHOUT a
    single-partition window: range-repartition by the order keys (global
    order across partitions), number rows within each partition, then add
    per-partition offsets — the zipWithIndex pattern, DataFrame-side. The
    only driver-side data is one (partition_id, count) row per partition."""
    part = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
        # pin the partitioning: the offset-count job and the final job must
        # see identical range boundaries (repartitionByRange samples)
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in part.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off = part.sparkSession.createDataFrame(offsets, "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy(*order)
    return (
        part.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(off), "__pid")
        .withColumn("__pos", F.col("__rn") + F.col("__off"))
        .drop("__pid", "__rn", "__off")
    )


def positional_join(
    left: DataFrame, right: DataFrame, left_order: list[Column], right_order: list[Column]
) -> DataFrame:
    """DuckDB POSITIONAL JOIN: align two relations row-by-row. Position is
    only well-defined under an explicit total order, so this takes one per
    side (SURVEY §2.2c documents the non-determinism caveat). Positions come
    from range-partitioned per-partition numbering (no global single-task
    sort), and the row-alignment join shuffles both sides by __pos."""
    ln = _with_global_pos(left, left_order)
    rn = _with_global_pos(right, right_order)
    return ln.join(rn, "__pos", "full").drop("__pos")
