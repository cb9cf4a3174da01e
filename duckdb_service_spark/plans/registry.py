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
PRIORITY: list[str] = [
    # round-2 canonical-form fixes (red or canon-crash in CORRECTNESS_r01)
    "agg_count_distinct",
    "agg_filter_clause",
    "agg_cube",
    "agg_collect_list_set",
    "fn_json_struct",
    "fn_array",
    "fn_struct_map",
    # canon-hardened this round, driver-unchecked in r01
    "pipeline_corpus_curation",
    "case_coalesce_nullif",
    "range_series",
    "sample_deterministic",
    "window_named_sql",
    "fn_type_fidelity",
    "cte_nested",
    "sim_centroid_per_label",
    "io_csv_roundtrip",
    "io_json_roundtrip",
    "stream_sessionization",
    "stream_user_activity_windows",
    "win_running_sum",
    "win_partition_agg",
    # new this round: SQL-surface routing of ASOF JOIN / WITH RECURSIVE and
    # the TIME type edge
    "sql_asof_routing",
    "sql_recursive_routing",
    "fn_time",
    "fn_variant",
    "fn_union_type",
    "text_stratified_sample",
    "pipeline_shard_assignment",
    # family representatives with no driver evidence yet
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_volume_customer",
    "win_ranks",
    "win_lag_lead",
    "win_range_frame",
    "win_first_last_nth",
    "win_qualify",
    "setop_union_all",
    "setop_union_distinct",
    "setop_union_by_name",
    "setop_intersect",
    "setop_except",
    "cte_recursive_series",
    "cte_recursive_graph",
    "pivot_status_by_priority",
    "unpivot_part_measures",
    "join_positional",
    "join_lateral_correlated",
    "join_asof_left",
    "text_langid",
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
    # rows-only checks (weakest signal) and r01 driver-green queries follow
    # in registration order
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
