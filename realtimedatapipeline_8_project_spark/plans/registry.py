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
# here register FIRST. Round-7 budget (freshness rotation, VERDICT r6
# item 1): the flagship, the two queries whose plans changed THIS round
# (text_encode_ids lost its forced vocab broadcast;
# dedup_simhash_portable spreads the corpus before its sketch pass), the 8 queries NEW
# this round (stored-index boolean retrieval, the TPC-H Q21 shape in
# both its EXISTS and single-scan spellings, the Q20 (both spellings) and Q22 shapes, BM25 top-k direct + from-index), then ALL 37
# queries whose newest driver row is round 4 (at the two-round staleness
# limit), then 2 of the 46 round-5-latest rows (the bench watch item
# graph_pagerank, plus pandas_user_trend). dedup_simhash_neardup also
# gained the corpus-spread repartition this round but keeps its r06 row:
# it is rows-only BY DESIGN (twin-pinned in tests/test_neardup_twins.py,
# which re-ran green on the new plan) and the prefix budget goes to
# oracle-backed rotation instead. ROUND-8 BUDGET (owed): the
# remaining 44 r05-latest rows hit the staleness limit next round and
# must lead the prefix, plus the flagship and any round-8 plan changes;
# 44 + flagship fits the 50 budget with ~6 slots for new/changed
# queries. The exact 44 owed (r05-latest after this round's prefix):
#   agg_cube, agg_distinct_counts, agg_large_volume_customers
#   agg_mode_median, agg_percentiles, agg_pricing_summary
#   agg_priority_shipments, agg_returned_item_report, agg_revenue_by_nation
#   agg_rollup, agg_shipping_priority, agg_top1_per_group_sortfree
#   agg_top_customers, agg_volume_shipping, array_event_history
#   dedup_survivors_quality, dq_audit, dq_profile
#   dq_referential, explode_top_tokens, graph_pagerank_bucketed
#   hist_price_profile, join_semi_anti, json_as_map
#   json_variant, media_decode_stub, media_dedup_exact
#   media_metadata, sample_epoch_shuffle, scale_agg_then_join
#   set_ops, sql_in_subquery, sql_lateral_topk
#   sql_min_cost_supplier, sql_scalar_subquery, text_bigram_fluency
#   text_repetition
#   ts_m4_downsample, udtf_chunk_windows, unpivot_metrics
#   win_rank_family, win_rank_orders, win_sessionize
#   win_sliding_window
# Names not listed keep module order.
_PRIORITY = (
    # flagship stays verified every round
    "enrich_broadcast_left_join",
    # --- plan changed in round 7: old rows no longer describe the code ---
    "text_encode_ids",  # vocab join is now hint-free (AQE decides)
    "dedup_simhash_portable",  # corpus spread before the sketch pass
    # --- new in round 7 ---
    "text_search_from_index",  # boolean retrieval from the stored index
    "sql_waiting_suppliers",  # TPC-H Q21 shape, EXISTS/NOT EXISTS form
    "agg_waiting_suppliers_1scan",  # Q21 single-fact-scan rewrite
    "sql_excess_shipments",  # TPC-H Q20 shape, nested IN + corr. scalar
    "agg_excess_shipments_1scan",  # Q20 single-fact-scan rewrite
    "sql_dormant_customers",  # TPC-H Q22 shape, anti join + scalar avg
    "text_bm25_topk",  # Okapi BM25 scored top-k, single corpus scan
    "text_bm25_from_index",  # same ranking served from the stored index
    # --- newest row is round 4: at the staleness limit, refresh all 37 ---
    "asof_last_purchase",
    "contamination_ngram_overlap",
    "curation_pii_redact",
    "curation_source_mix",
    "dedup_events_exact",
    "dedup_exact_fingerprint",
    "dedup_survivors",
    "dq_outliers",
    "hypertable_rollup",
    "pivot_event_types",
    "sample_pack_sequences",
    "sample_quality_gate",
    "sample_shard_plan",
    "sample_split_assign",
    "sample_split_leakage_safe",
    "sample_stratified",
    "scale_bloom_semijoin",
    "scale_salted_agg",
    "scale_salted_join",
    "scd2_user_state_history",
    "sim_embedding_neardup",
    "sim_embedding_quantize",
    "sim_embedding_stats",
    "sim_knn_bruteforce",
    "sim_knn_ivf",
    "sim_knn_lsh",
    "sketch_count_min_estimate",
    "sql_grouping_sets",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_score",
    "text_term_salience",
    "text_token_count",
    "text_winnow_fingerprint",
    "ts_gapfill_forward_fill",
    "win_running_spend",
    "win_tumbling_hour",
    # --- round-5-latest rotation, part 1 of 2: the bench watch item and
    # a cross-family spread; the other 44 lead round 8 ---
    "graph_pagerank",
    "pandas_user_trend",
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
