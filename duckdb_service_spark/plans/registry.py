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
# order. Round-7 rotation (VERDICT r06 task 2 — burn down rotation debt):
# (a) queries new or code-changed in round 7 (ANN recall conversion, window
# EXCLUDE extension, int-cast rounding path, MinHash band-join re-plan,
# TIMESTAMP_NS, PREPARE/EXECUTE), then (b) ALL 45 r02-era rows — the stalest
# driver evidence in the repo. 8 + 45 = 53; the driver checks the first 50,
# the tail rotates in r08 together with the r04-era rows.
PRIORITY: list[str] = [
    # (a) new or changed in round 7
    "pipeline_quality_funnel",
    "stream_neardup_lsh",
    "pipeline_semdedup",
    "fn_battery_r9",
    "text_lm_perplexity",
    "sim_kmeans",
    "mm_decode_features",
    "agg_approx_count_distinct",
    "agg_stats_native",
    "sample_native",
    "sql_prepare_execute",
    "fn_timestamp_ns",
    "win_exclude_frame",
    "sim_pq_search",
    "sim_ivf_search",
    "sim_lsh_topk",
    "cast_try_cast",
    "dedup_minhash_lsh",
    # (b) r02-era rotation debt, the stalest driver rows in the repo
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_volume_customer",
    "win_running_sum",
    "win_partition_agg",
    "win_range_frame",
    "win_first_last_nth",
    "win_qualify",
    "window_named_sql",
    "agg_filter_clause",
    "agg_cube",
    "fn_array",
    "fn_struct_map",
    "fn_json_struct",
    "fn_type_fidelity",
    "fn_time",
    "fn_variant",
    "fn_union_type",
    "case_coalesce_nullif",
    "range_series",
    "sample_deterministic",
    "cte_nested",
    "cte_recursive_series",
    "cte_recursive_graph",
    "setop_union_all",
    "setop_union_distinct",
    "setop_union_by_name",
    "setop_intersect",
    "setop_except",
    "pivot_status_by_priority",
    "unpivot_part_measures",
    "join_positional",
    "join_lateral_correlated",
    "join_asof_left",
    "sql_asof_routing",
    "sql_recursive_routing",
    "sim_centroid_per_label",
    "io_csv_roundtrip",
    "io_json_roundtrip",
    "stream_sessionization",
    "stream_user_activity_windows",
    "text_stratified_sample",
    "pipeline_shard_assignment",
    "text_langid",
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
