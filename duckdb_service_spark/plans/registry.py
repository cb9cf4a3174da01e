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


# The driver's correctness run covers the FIRST 50 queries in registration
# order. Round-13 rotation (VERDICT r12 task 3 — the r12 window never
# rotated, so this list is rebuilt against CORRECTNESS_r01..r12 staleness):
# (a) all 31 rows whose latest driver check is r07-era — after this round
# nothing is staler than r08; (b) rows that are NEW or whose code path
# changed in round 13: fn_timestamptz (never driver-checked),
# agg_quantile_decimal_trunc (new — ordered-stat .5 boundaries),
# agg_median_percentile (quantile-over-DECIMAL columns),
# sql_branch_unification + case_coalesce_nullif (compositional branch
# fold), fn_union_type (UNION typeof/union_tag names), values_relation +
# cast_try_cast (VALUES rows keep plain casts), fn_interval (interval
# regex overlap); (c) 10 of the stalest r08-era rows, preferring
# statements that traverse the changed passes.
PRIORITY: list[str] = [
    # (a) r07-era rows — all 31
    "agg_approx_count_distinct",
    "agg_cube",
    "agg_filter_clause",
    "agg_stats_native",
    "cte_nested",
    "cte_recursive_graph",
    "cte_recursive_series",
    "fn_timestamp_ns",
    "mm_decode_features",
    "pipeline_quality_funnel",
    "pivot_status_by_priority",
    "q18_large_volume_customer",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "range_series",
    "sample_deterministic",
    "sample_native",
    "sim_ivf_search",
    "sim_kmeans",
    "sim_lsh_topk",
    "sim_pq_search",
    "sql_prepare_execute",
    "stream_neardup_lsh",
    "unpivot_part_measures",
    "win_first_last_nth",
    "win_partition_agg",
    "win_qualify",
    "win_range_frame",
    "win_running_sum",
    "window_named_sql",
    # (b) new or code-path-changed in round 13
    "fn_timestamptz",
    "agg_quantile_decimal_trunc",
    "agg_median_percentile",
    "sql_branch_unification",
    "case_coalesce_nullif",
    "fn_union_type",
    "values_relation",
    "cast_try_cast",
    "fn_interval",
    # (c) r08-era fill — changed-pass-adjacent statements first
    "fn_battery_r10",
    "fn_battery_r11",
    "fn_battery_r13",
    "agg_core",
    "agg_minmax_by",
    "sql_pattern_operators",
    "io_csv_roundtrip",
    "io_json_roundtrip",
    "join_asof_left",
    "sql_asof_routing",
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
