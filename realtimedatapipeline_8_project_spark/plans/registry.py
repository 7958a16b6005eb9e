"""Central query registry: every implemented operator from SURVEY.md §2 as
a (spark, sf_dir) -> DataFrame callable, plus the DuckDB oracle SQL that
defines its semantics (None => rows-only check for non-SQL-expressible or
approximate operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators import (
    aggregates,
    asof,
    cdc,
    contamination,
    curation,
    dedup,
    enrich,
    fuzzy,
    graph,
    multimodal,
    pandas_ops,
    range_join,
    reference_pipeline,
    relational,
    reshape,
    sampling,
    scale,
    similarity,
    sketches,
    sql_surface,
    text_analysis,
    timeseries,
    udtf_ops,
    windows,
)

_MODULES = (
    enrich,
    reference_pipeline,
    contamination,
    curation,
    relational,
    aggregates,
    windows,
    dedup,
    text_analysis,
    similarity,
    multimodal,
    sql_surface,
    udtf_ops,
    scale,
    pandas_ops,
    asof,
    range_join,
    sampling,
    sketches,
    timeseries,
    fuzzy,
    graph,
    reshape,
    cdc,
)

# The driver's per-round CORRECTNESS check covers a prefix of the registry
# (50 entries). Order is therefore a verification budget: queries named
# here register FIRST. Round-8 budget (freshness rotation, VERDICT r7
# item 1, exactly as enumerated there): the flagship, the 5 queries NEW
# this round (OR/AND-NOT retrieval from the stored index, the
# incrementally maintained BM25 index, the TPC-H Q8 join-ordering
# stress, the NOT-IN null-semantics trap), then ALL 44 queries whose
# newest driver row is round 5 (at the two-round staleness limit) —
# 1 + 5 + 44 = 50, the full budget. No existing query's plan changed
# this round (the bm25-from-index refactor extracts the identical
# scoring/posting expressions into shared helpers; Q20's threshold
# literals became named constants interpolating to the same SQL text).
# After this round the freshness floor is r06: the 47 r06-latest rows
# are owed next round (ROUND-9 BUDGET: flagship + any r9 plan changes +
# new queries, then as many of the 47 as fit; the remainder leads r10).
# Names not listed keep module order.
_PRIORITY = (
    # flagship stays verified every round
    "enrich_broadcast_left_join",
    # --- new in round 8 ---
    "text_search_any_from_index",  # OR retrieval from the stored index
    "text_search_exclude_from_index",  # AND-NOT via posting anti join
    "text_bm25_incremental",  # BM25 from the incrementally built index
    "sql_market_share",  # TPC-H Q8 shape, 7-relation join-order stress
    "sql_notin_null_trap",  # NOT IN three-valued-logic trap, both legs
    # --- newest row is round 5: at the staleness limit, refresh all 44 ---
    "agg_cube",
    "agg_distinct_counts",
    "agg_large_volume_customers",
    "agg_mode_median",
    "agg_percentiles",
    "agg_pricing_summary",
    "agg_priority_shipments",
    "agg_returned_item_report",
    "agg_revenue_by_nation",
    "agg_rollup",
    "agg_shipping_priority",
    "agg_top1_per_group_sortfree",
    "agg_top_customers",
    "agg_volume_shipping",
    "array_event_history",
    "dedup_survivors_quality",
    "dq_audit",
    "dq_profile",
    "dq_referential",
    "explode_top_tokens",
    "graph_pagerank_bucketed",
    "hist_price_profile",
    "join_semi_anti",
    "json_as_map",
    "json_variant",
    "media_decode_stub",
    "media_dedup_exact",
    "media_metadata",
    "sample_epoch_shuffle",
    "scale_agg_then_join",
    "set_ops",
    "sql_in_subquery",
    "sql_lateral_topk",
    "sql_min_cost_supplier",
    "sql_scalar_subquery",
    "text_bigram_fluency",
    "text_repetition",
    "ts_m4_downsample",
    "udtf_chunk_windows",
    "unpivot_metrics",
    "win_rank_family",
    "win_rank_orders",
    "win_sessionize",
    "win_sliding_window",
)

# Redundant registry entries retired to keep the checked prefix dense:
# dedup_simhash is subsumed by dedup_simhash_neardup (same sketch, plus the
# banding + verify stages); sketch_count_min by sketch_count_min_estimate
# (same sketch build, plus the probe read-out).
_RETIRED = frozenset({"dedup_simhash", "sketch_count_min"})

_ALL: dict[str, tuple] = {}
for _m in _MODULES:
    for _name, _entry in _m.QUERIES.items():
        if _name in _ALL:
            raise ValueError(f"duplicate query name: {_name}")
        if _name in _RETIRED:
            continue
        _ALL[_name] = _entry

_missing = [n for n in _PRIORITY if n not in _ALL]
if _missing:
    raise ValueError(f"priority names not registered: {_missing}")

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _name in (*_PRIORITY, *(n for n in _ALL if n not in set(_PRIORITY))):
    _fn, _sql = _ALL[_name]
    QUERIES[_name] = _fn
    if _sql is not None:
        ORACLES[_name] = _sql
