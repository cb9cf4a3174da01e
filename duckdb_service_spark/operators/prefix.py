"""Distributed global prefix-sum (running total under a total order).

The naive form — ``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY — plans a
single-partition window: every row funnels through ONE task, the classic
100 TB scale-killer. This is the standard two-phase fix (same shape as the
zipWithIndex pattern in operators/asof.py::_with_global_pos):

1. range-repartition by the order keys (global order ACROSS partitions,
   Spark's RangePartitioner), sort within each partition;
2. per-partition running totals via a partition-local window (keyed by
   ``spark_partition_id()`` — never a global window);
3. one tiny job collects ONE (partition_id, partition_sum) row per
   partition; the driver folds them into per-partition offsets and
   broadcast-joins them back.

Driver-side data is O(#partitions), not O(rows). The localCheckpoint pins
the sampled range boundaries so the offset job and the final job see the
same partitioning (RangePartitioner re-samples otherwise).

Reference parity: no reference counterpart (the reference delegates window
functions to DuckDB, which runs single-node); this operator exists so the
engine's own pipelines (sequence packing, plans/textops.py) never plan a
single-partition window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def prefix_sum(
    df: DataFrame,
    order: list[Column],
    value: Column,
    out_col: str = "__cum",
) -> DataFrame:
    """Add ``out_col`` = inclusive running total of ``value`` under the
    global total order ``order``. ``order`` must be a total order (unique
    key) for the result to be deterministic."""
    part = (
        df.withColumn("__v", value)
        .repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = sorted(
        (r["__pid"], r["s"])
        for r in part.groupBy("__pid").agg(F.sum("__v").alias("s")).collect()
    )
    offsets, acc = [], 0
    for pid, s in sums:
        offsets.append((pid, acc))
        acc += s or 0
    off = part.sparkSession.createDataFrame(offsets, "__pid int, __off long")
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        part.withColumn("__local", F.sum("__v").over(w))
        .join(F.broadcast(off), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__off")).cast("long"))
        .drop("__pid", "__v", "__local", "__off")
    )
