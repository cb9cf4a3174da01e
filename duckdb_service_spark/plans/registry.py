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
# order. Round-6 rotation: (a) every query new or changed in round 6, then
# (b) the stalest r01-era rows, then (c) r02-era rows on the most-churned
# code paths. 17 + 10 + 21 + 20 = 68; the driver checks the first 50. The ~31
# remaining r02-era rows (relational
# misc, similarity, text/stream singles, the r05-checked TPC-H suite) are
# green on the local exact harness (tools/diffcheck.py, all registered
# queries on HEAD) and rotate in next round.
PRIORITY: list[str] = [
    # (a0) new or re-planned late in round 6: the two new curation
    # operators, and the queries whose execution topology changed (array
    # MinHash, index-only line dedup, prune-first partsupp) — their last
    # driver-green rows predate the rewrite
    "text_gopher_rules",
    "text_unigram_fc_buckets",
    "text_tfidf_top_terms",
    "win_distinct_agg",
    "pipeline_training_mix",
    "sim_pq_search",
    "dedup_incremental_exact",
    "mm_audio_energy",
    "mm_image_resize",
    "dedup_semantic_lsh",
    "text_bigram_lm",
    "graph_pagerank",
    "pipeline_multimodal_curation",
    "dedup_minhash_lsh",
    "dedup_incremental_lsh",
    "dedup_cluster_components",
    "pipeline_corpus_curation",
    # (a) new or changed in round 6: the five partsupp TPC-H queries, the
    # multi-aggregate/multi-column PIVOT compile (sql_pivot_routing shares
    # the changed code path), min/max frame EXCLUDE, gcd/lcm/hamming
    "text_line_dedup",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_parts_supplier_relation",
    "q20_potential_promotion",
    "sql_pivot_multi",
    "sql_pivot_routing",
    "win_exclude_frame",
    "fn_battery_r8",
    # (b) rotation debt, stalest first (VERDICT r05 next #2): r01-era rows
    # whose only driver-green check predates three rounds of code churn
    "agg_rollup",
    "agg_approx_count_distinct",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_exact_keep_longest",
    "fn_math",
    "fn_datetime",
    "fn_timestamp_parts",
    "fn_array_agg_lambda",
    "fn_json",
    "fn_hash",
    "fn_bit",
    "fn_format",
    "fn_interval",
    "fn_try_arithmetic",
    "join_anti_not_exists",
    "join_cross",
    "join_theta_nonequi",
    "join_range_interval",
    "join_using_natural",
    # (c) r02-era rows sitting on the most-churned code paths: the window
    # family (frame EXCLUDE/IGNORE NULLS rewrites landed nearby), the
    # plan-level pivot/unpivot (compile changed this round), setops, CTEs,
    # io round-trips
    "win_ranks",
    "win_lag_lead",
    "win_running_sum",
    "win_range_frame",
    "win_first_last_nth",
    "win_partition_agg",
    "win_qualify",
    "window_named_sql",
    "pivot_status_by_priority",
    "unpivot_part_measures",
    "setop_union_all",
    "setop_union_distinct",
    "setop_union_by_name",
    "setop_intersect",
    "setop_except",
    "cte_nested",
    "cte_recursive_series",
    "cte_recursive_graph",
    "io_csv_roundtrip",
    "io_json_roundtrip",
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
