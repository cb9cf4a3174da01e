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
# order. Round-14 rotation (VERDICT r13 task 4 — recomputed from
# CORRECTNESS_r01..r13 staleness): (a) all 34 rows whose latest driver
# check is r08 — after this round nothing is staler than r09; (b) rows
# NEW or code-path-changed in round 14: sql_composite_cast (new —
# string->composite casts incl. the column-source runtime parse),
# sql_branch_unification (gains composite-TYPE lane columns),
# case_coalesce_nullif + cast_try_cast (the branch fold and cast
# grammar both grew composite lanes); (c) 12 of the stalest r09-era
# rows, preferring statements that traverse the changed passes
# (projection/filter/literal typing, scalar fn batteries, joins/setops
# whose SQL runs through the full rewrite chain).
PRIORITY: list[str] = [
    # (a) r08-era rows — all 34
    "agg_corr_exact",
    "agg_count_distinct",
    "agg_stats_exact",
    "events_funnel_conversion",
    "events_gapfill_locf",
    "fn_bit_type",
    "graph_connected_components",
    "join_lateral_correlated",
    "join_positional",
    "mm_binary_meta",
    "pipeline_domain_reweighting",
    "pipeline_sequence_packing",
    "pipeline_shard_assignment",
    "pipeline_source_mix",
    "sim_centroid_per_label",
    "sql_recursive_routing",
    "stream_dsir_scoring",
    "stream_sessionization",
    "stream_user_activity_windows",
    "text_contamination",
    "text_dsir_selection",
    "text_fingerprint",
    "text_langid",
    "text_lm_perplexity",
    "text_pii_scrub",
    "text_quality",
    "text_repetition_filter",
    "text_stratified_sample",
    "text_substring_dedup",
    "text_token_count",
    "text_weighted_sample",
    "win_distinct_agg",
    "win_exclude_frame",
    "win_exclude_named",
    # (b) new or code-path-changed in round 14
    "sql_composite_cast",
    "sql_branch_unification",
    "case_coalesce_nullif",
    "cast_try_cast",
    # (c) r09-era fill — changed-pass-adjacent statements first
    "proj_expressions",
    "filter_predicates",
    "fn_string",
    "fn_regex",
    "fn_json_ops",
    "agg_bool_bit",
    "agg_grouping_sets",
    "join_inner_equi",
    "join_left_outer",
    "setop_except_all",
    "setop_intersect_all",
    "distinct_basic",
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
