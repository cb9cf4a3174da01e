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


# The driver's correctness run covers queries in registration order and
# capped at the first 50 in round 1 — order the inventory so that (a) queries
# whose canonical form changed this round and (b) families with no driver
# evidence yet come first; long-green round-1 queries go last.
# The driver's correctness run covers the FIRST 50 queries in registration
# order. Round-3 ordering: (a) the 28 queries with no green CORRECTNESS row
# in r01 or r02 lead (so every registry entry has been driver-checked at
# least once across rounds), then (b) queries new in round 3. Everything
# else — driver-green in r01/r02 — follows in registration order.
PRIORITY: list[str] = [
    # never driver-checked through r02 (VERDICT r02 "Next round" item 1)
    "text_quality",
    "text_token_count",
    "text_fingerprint",
    "sim_topk_bruteforce",
    "sim_lsh_buckets",
    "sim_quantize_int8",
    "io_parquet_roundtrip",
    "stream_tumbling_hourly",
    "stream_sliding_2h",
    "proj_expressions",
    "select_exclude_replace",
    "filter_predicates",
    "filter_ilike",
    "cast_try_cast",
    "distinct_basic",
    "distinct_on_latest_order",
    "values_relation",
    "generate_series_step",
    "limit_offset",
    "order_nulls_last",
    "subquery_correlated_scalar",
    "setop_intersect_all",
    "setop_except_all",
    "sim_lsh_topk",
    "mm_binary_meta",
    "sample_native",
    "sim_ivf_search",
    "mm_decode_features",
    # new in round 3 (names appended as operators land)
    "sql_read_parquet_routing",
    "sql_read_csv_routing",
    "sql_read_json_routing",
    "sql_sample_routing",
    "fn_bit_type",
    "graph_connected_components",
    "dedup_cluster_components",
    "text_pii_scrub",
    "text_contamination",
    "stream_dedup_exact",
    "text_repetition_filter",
    "pipeline_sequence_packing",
    "pipeline_source_mix",
    "sql_summarize_routing",
]



def load_all() -> None:
    """Import every plan module so registration side effects run, then
    reorder the inventory per PRIORITY."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        aggregates,
        dedup,
        functions_scalar,
        graphs,
        joins,
        pipeline_curation,
        relational,
        setops,
        similarity,
        sources_io,
        sql_surface,
        streams_batch,
        textops,
        tpch,
        windows,
    )

    ordered = [n for n in PRIORITY if n in QUERIES] + [
        n for n in QUERIES if n not in PRIORITY
    ]
    for d in (QUERIES, ORACLES):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in ordered if n in snapshot})

    _LOADED = True
