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
# order. Round-5 rotation (VERDICT r03 "Next round" item 9: no green row
# should be more than ~2 rounds stale): (a) every query new or changed in
# round 5 — the TPC-H suite expansion, SQL-surface routings, and the
# mm_decode_features fix — then (b) as many of the r01-era stale rows
# (joins, aggregates, scalar families, dedup: code rewritten since their
# only green row) as fit the 50-slot window. The remainder of the stale
# set is covered by the local exact harness (tools/diffcheck.py, all
# registered queries green on HEAD) and rotates in next round. 34 + 16 = 50.
PRIORITY: list[str] = [
    # (a) new/changed in round 5
    "mm_decode_features",  # r03/r04 red row: vector now serialized as JSON
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q21_suppliers_waiting",
    "q22_global_sales_opportunity",
    "sql_dml_returning",
    "sql_pivot_routing",
    "sql_unpivot_routing",
    "sql_from_first_routing",
    "sql_columns_expr",
    "sql_list_comprehension",
    "sql_unnest_select",
    "sql_lateral_unnest",
    "sql_pattern_operators",
    "sql_bare_path_from",
    "sql_order_by_all",
    "stream_static_enrich",
    "stream_stream_join",
    "mm_frame_sample",
    "fn_battery_r5",
    "fn_battery_r6",
    "win_exclude_frame",
    "fn_battery_r7",
    "win_ignore_nulls",
    "dedup_incremental_lsh",
    # (b) r01-era green rows, never rechecked since
    "join_inner_equi",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_semi_exists",
    "join_in_subquery",
    "join_asof",
    "agg_bool_bit",
    "agg_group_by_all",
    "agg_grouping_sets",
    "agg_having",
    "agg_median_percentile",
    "fn_string",
    "fn_regex",
    "dedup_exact",
    "dedup_minhash_lsh",
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
