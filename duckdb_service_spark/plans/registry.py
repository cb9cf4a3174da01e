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
# order. Round-10 rotation (VERDICT r09 task 2 — keep the cadence): (a) all
# 34 rows whose latest driver CORRECTNESS check is r05-era — after this
# round nothing is staler than r06; (b) the stalest r06-era rows fill the
# remaining slots, fn batteries first (the round-10 dialect fixes — OVER\b
# alias capture, _split_args angle anchoring, bare-NULL list ||,
# subquery-scoped subscripts — live on their translate paths).
PRIORITY: list[str] = [
    # (a) r05-era rows — all 34
    "fn_battery_r5",
    "fn_battery_r6",
    "fn_battery_r7",
    "join_asof",
    "join_full_outer",
    "join_in_subquery",
    "join_right_outer",
    "join_semi_exists",
    "mm_frame_sample",
    "q10_returned_items",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q21_suppliers_waiting",
    "q22_global_sales_opportunity",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "sql_bare_path_from",
    "sql_columns_expr",
    "sql_dml_returning",
    "sql_from_first_routing",
    "sql_lateral_unnest",
    "sql_list_comprehension",
    "sql_order_by_all",
    "sql_unnest_select",
    "sql_unpivot_routing",
    "stream_static_enrich",
    "stream_stream_join",
    "win_ignore_nulls",
    # (b) new or code-path-changed in round 10 (keep ABOVE the fill —
    # anything registered here displaces the fill tail automatically)
    "fn_battery_r12",  # + h_full: full md5_number composition (r09 task 8)
    "dedup_minhash_lsh",  # vestigial sig persist removed (r10 perf)
    "pipeline_corpus_curation",  # same
    "dedup_cross_source_matrix",  # composes dedup_minhash_lsh's plan
    "cast_try_cast",  # dialect int-cast \bCAST gate fix touches its path
    # (c) stalest r06-era fill, fn batteries + window/dialect-heavy first
    "fn_battery_r8",
    "fn_array_agg_lambda",
    "fn_bit",
    "fn_datetime",
    "fn_format",
    "fn_hash",
    "fn_interval",
    "fn_json",
    "fn_math",
    "fn_timestamp_parts",
    "fn_try_arithmetic",
    "win_lag_lead",
    "win_ranks",
    "agg_rollup",
    "join_cross",
    "join_theta_nonequi",
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
