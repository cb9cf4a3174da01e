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
# order. Round-8 rotation (VERDICT r07 task 2 — finish the debt):
# (a) queries new or code-path-changed in round 8 (named-WINDOW EXCLUDE
# inlining, value-bounded RANGE ECR subset, pattern-operator anchoring,
# window FILTER reorder, corpus-broadcast-hint removal, the new
# text_substring_dedup span-dedup, text_dsir_selection and
# pipeline_domain_reweighting operators — the latter also re-proves
# text_lm_perplexity, whose scoring moved into the shared _lm_doc_nll),
# then (b) the 13 r02-era rows — the last of the stalest driver evidence,
# queued since r07, then (c) 16 of the 43 r04-era rows. 21 + 13 + 16 = 50;
# the remaining r04-era rows (values_relation, agg_string_agg, agg_collect_list_set, proj_expressions, select_exclude_replace, filter_predicates, filter_ilike, distinct_basic, distinct_on_latest_order,
# generate_series_step, setop_*_all, sim_*, io_parquet, sql_read_*,
# stream_*) rotate first in r09.
PRIORITY: list[str] = [
    # (a) new or changed in round 8
    "text_dsir_selection",
    "pipeline_domain_reweighting",
    "stream_dsir_scoring",
    "events_funnel_conversion",
    "pipeline_cluster_balanced_sample",
    "events_gapfill_locf",
    "graph_triangle_count",
    "text_weighted_sample",
    "text_lm_perplexity",
    "text_substring_dedup",
    "win_exclude_named",
    "fn_battery_r10",
    "fn_battery_r11",
    "fn_json_ops",
    "fn_battery_r12",
    "fn_battery_r13",
    "dedup_cross_source_matrix",
    "win_exclude_frame",
    "sql_pattern_operators",
    "win_distinct_agg",
    "text_line_dedup",
    # (b) r02-era rotation debt, final tail
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
    # (c) r04-era rows (16 of 43; the rest lead r09)
    "agg_core",
    "agg_count_distinct",
    "agg_stats_exact",
    "agg_corr_exact",
    "agg_minmax_by",
    "fn_bit_type",
    "graph_connected_components",
    "text_quality",
    "text_token_count",
    "text_fingerprint",
    "mm_binary_meta",
    "text_pii_scrub",
    "text_contamination",
    "text_repetition_filter",
    "pipeline_sequence_packing",
    "pipeline_source_mix",
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
