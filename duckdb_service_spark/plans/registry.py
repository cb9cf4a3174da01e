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
# order. Round-11 rotation (VERDICT r10 task 3 — keep the cadence): (a) all
# 32 rows whose latest driver CORRECTNESS check is r06-era (including the
# five r10-PRIORITY entries that fell past slot 50 last round) — after this
# round nothing is staler than r07; (b) queries whose code path changed
# this round: cast_try_cast (the r11 cast-contract closure — decimal
# tightening, subquery literals, nested-cast recursion, NULL float →
# VARCHAR — lives on its translate path) and the NEW sql_branch_unification
# (the multi-branch type-unification passes); (c) 16 of the stalest
# r07-era rows, preferring the ones whose statements traverse the new
# branch-type passes (setops, CASE/COALESCE, typed fn batteries).
PRIORITY: list[str] = [
    # (a) r06-era rows — all 32
    "agg_rollup",
    "dedup_cluster_components",
    "dedup_embedding_cosine",
    "dedup_exact_keep_longest",
    "dedup_incremental_exact",
    "dedup_incremental_lsh",
    "dedup_ngram_jaccard",
    "dedup_semantic_lsh",
    "dedup_simhash",
    "graph_pagerank",
    "join_anti_not_exists",
    "join_cross",
    "join_range_interval",
    "join_theta_nonequi",
    "join_using_natural",
    "mm_audio_energy",
    "mm_image_resize",
    "pipeline_multimodal_curation",
    "pipeline_training_mix",
    "q11_important_stock",
    "q16_parts_supplier_relation",
    "q20_potential_promotion",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "sql_pivot_multi",
    "sql_pivot_routing",
    "text_bigram_lm",
    "text_gopher_rules",
    "text_tfidf_top_terms",
    "text_unigram_fc_buckets",
    "win_lag_lead",
    "win_ranks",
    # (b) new or code-path-changed in round 11
    "cast_try_cast",
    "sql_branch_unification",
    # (c) r07-era fill — branch-type-pass-adjacent statements first
    "case_coalesce_nullif",
    "setop_except",
    "setop_intersect",
    "setop_union_all",
    "setop_union_by_name",
    "setop_union_distinct",
    "fn_type_fidelity",
    "fn_variant",
    "fn_union_type",
    "fn_json_struct",
    "fn_struct_map",
    "fn_array",
    "fn_time",
    "fn_battery_r9",
    # r10-era rows whose code paths changed this round (epoch emitter,
    # EXTRACT/date_part field routing) — re-rotated ahead of two fills
    "fn_datetime",
    "fn_timestamp_parts",
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
