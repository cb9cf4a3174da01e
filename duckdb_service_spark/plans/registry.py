"""Query inventory registry.

Every operator from SURVEY.md §2.2 gets a named entry here: a PySpark plan
builder ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB
oracle SQL string over the same parquet views. The driver runs both sides at
sf0.01 and compares row count + schema + order-insensitive value hash
(CORRECTNESS_r{N}.json), so:

- every computed column is aliased identically on both sides;
- float-valued aggregates go through decimal-stable or rounded forms so the
  two engines produce bit-identical values (see functions.stable);
- any LIMIT is preceded by a total deterministic ORDER BY (unique tie-break).
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
BENCH: list[str] = []  # headline queries bench.py times at sf0.1

_LOADED = False


def query(name: str, oracle: Optional[str] = None, bench: bool = False):
    """Register a query plan; ``oracle=None`` means rows-only driver check
    (reserved for ops whose exact values are not SQL-reproducible, e.g.
    approx sketches)."""

    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query name {name}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        if bench:
            BENCH.append(name)
        return fn

    return deco


def load_all() -> None:
    """Import every plan module so registration side effects run."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        aggregates,
        dedup,
        functions_scalar,
        joins,
        pipeline_curation,
        relational,
        setops,
        similarity,
        sources_io,
        streams_batch,
        textops,
        tpch,
        windows,
    )

    _LOADED = True
