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
# here register FIRST. Round-10 budget: the flagship, the 3 queries NEW
# this round (the delete-serving IVF probe, suffix retrieval via the
# reversed-term dual, fuzzy edit-distance-1 retrieval via the
# deletion-neighborhood dual — each holding the slot of a retired
# r07-latest entry, see _RETIRED), then the rows-only no-oracle trio
# (agg_approx_distinct, dedup_minhash_neardup, dedup_simhash_neardup —
# their newest driver row is round 6, at the staleness limit; their
# driver row is a weak rows-only check by design while the real
# correctness pin, the machine-checked twin equivalence in
# tests/test_neardup_twins.py, runs in every fast-suite pass), then the
# 43 queries whose newest driver row is round 7 and that survive this
# round's retirements — 1 + 3 + 3 + 43 = 50, the full budget. The 48
# r08-latest rows rotate in round 11, the 50 r09-latest in round 12.
# MinHash fix note: dedup_minhash_neardup's plan changed this round
# (the r9 element_at(sig,1) guard moved to the input side) — it is
# fronted here anyway as part of the trio; dedup_intra_batch,
# dedup_minhash_portable and dedup_incremental share the fixed helpers
# and keep their r09-green rows (the sf0.01 parity suite re-proves all
# four every fast-suite pass). Names not listed keep module order.
_PRIORITY = (
    # flagship stays verified every round
    "enrich_broadcast_left_join",
    # --- new in round 10 ---
    "sim_knn_after_delete",  # IVF probe after vector deletes: purged
    # batches + tombstone-masked kept batch (slot from the retired
    # sql_waiting_suppliers — its SQL text stays live as
    # agg_waiting_suppliers_1scan's oracle)
    "text_search_suffix_from_index",  # leading-wildcard retrieval via
    # the reversed-term dual (slot from the retired
    # sql_excess_shipments — its SQL text stays live as
    # agg_excess_shipments_1scan's oracle)
    "text_search_fuzzy_from_index",  # edit-distance-1 retrieval via
    # the deletion-neighborhood dual (slot from the retired
    # graph_pagerank — oracle shared with graph_pagerank_bucketed,
    # the recommended scale plan, which stays registered)
    # --- rows-only trio: newest row round 6, at the staleness limit ---
    "agg_approx_distinct",
    "dedup_minhash_neardup",
    "dedup_simhash_neardup",
    # --- newest row is round 7: refresh all 43 surviving entries ---
    "agg_excess_shipments_1scan",
    "agg_waiting_suppliers_1scan",
    "asof_last_purchase",
    "contamination_ngram_overlap",
    "curation_pii_redact",
    "curation_source_mix",
    "dedup_exact_fingerprint",
    "dedup_simhash_portable",
    "dq_outliers",
    "hypertable_rollup",
    "pandas_user_trend",
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
    "sql_dormant_customers",
    "sql_grouping_sets",
    "text_bm25_from_index",
    "text_encode_ids",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_score",
    "text_search_from_index",
    "text_term_salience",
    "text_token_count",
    "text_winnow_fingerprint",
    "ts_gapfill_forward_fill",
    "win_running_spend",
    "win_tumbling_hour",
)

# (The round-9 prefix lives in git history: the registry file as of
# commit c654641; round 8's as of commit 1ac4330.)

# Redundant registry entries retired to keep the checked prefix dense:
# dedup_simhash is subsumed by dedup_simhash_neardup (same sketch, plus the
# banding + verify stages); sketch_count_min by sketch_count_min_estimate
# (same sketch build, plus the probe read-out). Round 9 retired three
# more to restore a sustainable rotation (the registry had outgrown the
# 50-slot budget: a 3-round refresh cycle supports 1 flagship + 49x3 =
# 148 queries, and 151 meant a permanent 2-row spill): win_rank_orders
# (row_number top-k on the SAME window spec win_rank_family exercises;
# top-k-per-group semantics also driver-checked via sql_lateral_topk
# and agg_top1_per_group_sortfree), dedup_events_exact (dropDuplicates
# over an already-unique key — exact dedup is properly stressed by
# dedup_exact_fingerprint's planted duplicates and media_dedup_exact),
# and dedup_survivors (the plain lowest-id survivor policy, embedded
# verbatim inside curation_end_to_end's oracle and superseded by the
# quality-aware dedup_survivors_quality). POLICY: a future round that
# adds K registry entries retires K (or accepts a longer refresh
# cycle) — the verification budget is fixed at 50 rows per round.
# Applying the policy, round 9 funded its four other additions the
# same way — each retiree's semantics remain driver-verified through a
# live entry sharing its oracle (the text_boolean_search precedent):
# - text_search_prefix_from_index took text_boolean_search's slot (the
#   corpus-scan AND spelling IS text_search_from_index's oracle);
# - text_bm25_after_delete took sim_knn_ivf_trained's slot
#   (sim_knn_ivf_grown shares its oracle and internally builds the
#   same trained codebook and probe path);
# - agg_important_parts_1scan took chunk_windows_native's slot
#   (udtf_chunk_windows shares its oracle; the native/UDTF twin is
#   machine-pinned in tests/test_udtf_and_epoch.py);
# - text_bm25_topk retired without a same-round replacement (its
#   corpus-scan ranking is the shared ORACLE of text_bm25_from_index,
#   text_bm25_incremental and — filtered — text_bm25_after_delete); as
#   an r07-latest row this brought round 10's owed set to exactly the
#   50-slot budget. Round 10 applied the policy again, funding its
#   three additions with three more r07-latest retirements, each by
#   the same precedent (retiree's semantics stay driver-verified
#   through a live entry sharing its oracle, plan properties stay
#   pinned in tests/test_plans.py):
# - sim_knn_after_delete took sql_waiting_suppliers' slot (the Q21 SQL
#   spelling is literally spark.sql(<oracle>); its oracle stays live
#   under agg_waiting_suppliers_1scan and the spellings-agree pin in
#   tests/test_plans.py keeps the SQL path machine-checked);
# - text_search_suffix_from_index took sql_excess_shipments' slot
#   (same structure: the Q20 SQL spelling's oracle stays live under
#   agg_excess_shipments_1scan, spellings-agree pinned);
# - text_search_fuzzy_from_index took graph_pagerank's slot (oracle
#   shared with graph_pagerank_bucketed — the recommended 100x plan,
#   still registered; VERDICT r9 explicitly recommended retiring the
#   plain spelling's driver slot).
_RETIRED = frozenset(
    {
        "dedup_simhash",
        "sketch_count_min",
        "win_rank_orders",
        "dedup_events_exact",
        "dedup_survivors",
        "text_boolean_search",
        "sim_knn_ivf_trained",
        "chunk_windows_native",
        "text_bm25_topk",
        "sql_waiting_suppliers",
        "sql_excess_shipments",
        "graph_pagerank",
    }
)

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
