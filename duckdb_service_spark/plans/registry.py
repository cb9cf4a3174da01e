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
# order. Round-9 rotation (VERDICT r08 task 1 — finish the rotation for
# good): (a) the 27 remaining r04-era rows — after this round no query's
# latest driver CORRECTNESS row is older than r05; (b) queries new or
# code-path-changed in round 9 (perf-reworked corpus-pipeline queries,
# the persisted k-means assignment in cluster-balanced sampling, the new
# JSON tail + sweep-driven fixes, skew-proofed triangles); (c) the
# next-stalest r05-era rows fill the remaining slots.
PRIORITY: list[str] = [
    # (a) r04-era rotation debt — the last of it (27 rows)
    "agg_string_agg",
    "agg_collect_list_set",
    "proj_expressions",
    "select_exclude_replace",
    "filter_predicates",
    "filter_ilike",
    "distinct_basic",
    "distinct_on_latest_order",
    "values_relation",
    "generate_series_step",
    "limit_offset",
    "order_nulls_last",
    "subquery_correlated_scalar",
    "setop_intersect_all",
    "setop_except_all",
    "sim_topk_bruteforce",
    "sim_lsh_buckets",
    "sim_quantize_int8",
    "io_parquet_roundtrip",
    "sql_read_parquet_routing",
    "sql_read_csv_routing",
    "sql_read_json_routing",
    "sql_sample_routing",
    "sql_summarize_routing",
    "stream_tumbling_hourly",
    "stream_sliding_2h",
    "stream_dedup_exact",
    # (b) new or code-path-changed in round 9 (perf rework of the three
    # >2x corpus-pipeline queries; persisted k-means assignment;
    # skew-proofed triangle pair generation; JSON tail additions)
    "text_line_dedup",
    "dedup_minhash_lsh",
    "pipeline_corpus_curation",
    "pipeline_cluster_balanced_sample",
    "graph_triangle_count",
    "fn_json_ops",
    "pipeline_semdedup",
    "events_retention_cohorts",
    "events_transition_matrix",
    "events_windowed_funnel",
    "orders_rfm_segmentation",
    "text_bm25_topk",
    "sim_embedding_covariance",
    # (c) next-stalest r05-era fill (driver checks first 50; new r09
    # queries registered above this comment displace the tail of this
    # fill automatically — keep the fill LAST)
    "agg_bool_bit",
    "agg_having",
    "agg_grouping_sets",
    "agg_group_by_all",
    "agg_median_percentile",
    "dedup_exact",
    "fn_string",
    "fn_regex",
    "join_inner_equi",
    "join_left_outer",
    "join_semi_exists",
    "join_asof",
    "mm_frame_sample",
    "sql_list_comprehension",
    "sql_order_by_all",
    "sql_dml_returning",
    "win_ignore_nulls",
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
