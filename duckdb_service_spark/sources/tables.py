"""Fixture table registry.

The driver generates one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}`` (TESTDATA.md). At 100 TB these would be
partitioned parquet/iceberg directories; ``spark.read.parquet`` takes either a
single file or a directory of part files unchanged, so nothing here is
local-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from ..session import tune

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = {"region", "nation", "supplier", "customer", "part"}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql.types import LongType

    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # events.ts as parquet TIMESTAMP(NANOS) (earlier fixture drops; read
        # as long under nanosAsLong): truncate to micros exactly like
        # DuckDB's parquet reader does (integer division; all values are
        # post-1970). Later drops write TIMESTAMP(MICROS), which lands in
        # the generic TimestampType→NTZ cast below instead — the read path
        # adapts to whichever physical type the fixture carries.
        df = df.withColumn("ts", F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
    # All fixture timestamps are timezone-naive; TIMESTAMP_NTZ keeps
    # collected values independent of driver-host timezone (the LTZ
    # collect path converts through the local zone). Session tz is
    # pinned to UTC (tune) so the LTZ->NTZ cast is deterministic.
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp_ntz"))
    return df


class Tables:
    """Lazy table mapping: reads + registers a temp view on first access,
    memoized per (SparkSession, sf_dir). Keeps per-query setup cost at one
    parquet footer read per table actually used, not ten."""

    _cache: dict[tuple[int, str], dict[str, DataFrame]] = {}

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        key = (id(spark), os.path.abspath(sf_dir))
        self._tables = Tables._cache.setdefault(key, {})

    def __getitem__(self, name: str) -> DataFrame:
        if name not in self._tables:
            if name not in TABLES:
                raise KeyError(name)
            df = _read_table(self.spark, self.sf_dir, name)
            df.createOrReplaceTempView(name)
            self._tables[name] = df
        return self._tables[name]

    def view(self, *names: str) -> None:
        """Force-register views (for spark.sql-based plans). Always re-points
        the temp view at THIS sf_dir's DataFrame: views are session-global,
        so another sf_dir's Tables may have registered the name since we
        cached ours."""
        for n in names:
            self[n].createOrReplaceTempView(n)


def load_tables(spark: SparkSession, sf_dir: str) -> Tables:
    """Entry point used by every plan: applies oracle-critical runtime confs
    (UTC timezone, nanos-as-long parquet read) and returns the lazy mapping.
    The driver may hand us a session we didn't build, so these must be
    runtime confs, not builder confs."""
    tune(spark)  # memoized per session (incl. the nanosAsLong parquet conf)
    return Tables(spark, sf_dir)
