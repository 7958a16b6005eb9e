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
# here register FIRST. Round-9 budget: the flagship, the 8 queries NEW
# this round (TPC-H Q9 profit in both spellings, phrase retrieval from
# the stored positional index in both spellings, the incrementally
# grown IVF index, prefix retrieval, index deletes served through
# BM25, and the TPC-H Q11 share-of-total shape — each of the last
# four holding the slot of a retired entry, see _RETIRED), then 41 of
# the 47 queries whose newest driver row is round 6 (at the staleness
# limit) — 1 + 8 + 41 = 50, the full budget. Of the 6 r06-latest rows
# NOT fronted, two retired this round (sim_knn_ivf_trained,
# chunk_windows_native — their slots fund the two new non-text
# queries, and their semantics stay pinned, see _RETIRED); one more
# r07-latest entry retired (text_bm25_topk). The remaining 3 are exactly the rows-only
# no-oracle trio (agg_approx_distinct, dedup_minhash_neardup,
# dedup_simhash_neardup): their driver row is a weak rows-only check by
# design, while their real correctness pin — the machine-checked twin
# equivalence in tests/test_neardup_twins.py — runs in every fast-suite
# pass; they lead the r10 rotation. No existing query's serving plan
# changed this round (the postings artifacts gained a positions column
# and AQE-sized batch files, but the bm25/boolean serving plans read
# the same pruned columns; both are re-proven every round by the
# sf0.01 parity suite). Names not listed keep module order.
_PRIORITY = (
    # flagship stays verified every round
    "enrich_broadcast_left_join",
    # --- new in round 9 ---
    "sql_profit_by_nation",  # TPC-H Q9 shape, CTE spelling
    "agg_profit_by_nation_1scan",  # Q9 single-fact-scan rewrite
    "text_phrase_from_index",  # phrase query from positional postings
    "text_phrase_incremental",  # same phrase from the incremental index
    "sim_knn_ivf_grown",  # ANN served from incrementally grown lists
    "text_bm25_after_delete",  # new r9: tombstone deletes in the
    # incremental index, served through BM25 (slot from the retired
    # sim_knn_ivf_trained — grown shares its oracle AND its trained
    # codebook + probe path, so trained-IVF serving stays verified)
    "agg_important_parts_1scan",  # new r9: TPC-H Q11 share-of-total
    # shape (slot from the retired chunk_windows_native, whose
    # semantics stay driver-verified via udtf_chunk_windows — same
    # oracle — and machine-twinned in tests/test_udtf_and_epoch.py)
    # --- newest row is round 6: at the staleness limit, refresh 44 ---
    "agg_disjunctive_revenue",
    "agg_order_count_distribution",
    "agg_small_quantity_revenue",
    "agg_top_supplier_revenue",
    "curation_end_to_end",
    "dedup_cluster_components",
    "dedup_incremental",
    "dedup_intra_batch",
    "dedup_jaccard_vs_probe",
    "dedup_minhash_portable",
    "dedup_semantic_pairs",
    "enum_validation_filter",
    "fuzzy_name_match",
    "interval_overlap_sessions",
    "join_full_outer",
    "json_decode",
    "kafka_producer_projection",
    "kv_projection",
    "layout_zorder",
    "media_frame_sample",
    "merge_apply_changes",
    "ordered_drain",
    "pit_state_join",
    "point_lookup_string_hash",
    "range_join_bucketed",
    "reference_engagement_metrics",
    "sample_source_rebalance",
    "sample_weighted_reservoir",
    "sim_kmeans_train",
    "sketch_hll_portable",
    "snapshot_diff_cdc",
    "sparse_doc_cosine",
    "sql_exists_correlated",
    "text_search_prefix_from_index",  # new r9 (slot from the retired
    # corpus-scan text_boolean_search, whose semantics remain verified
    # as text_search_from_index's oracle)
    "text_inverted_index",
    "topk_recent",
    "uuid_repair",
    "win_distribution_family",
    "win_event_gaps",
    "win_funnel_dropoff",
    "win_latest_per_user",
    "win_trailing_range_frame",
)

# (The round-8 prefix lives in git history: commit 1ac4330 and the
# registry file as of round 8.)

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
#   an r07-latest row this brings round 10's owed set to exactly the
#   50-slot budget (flagship + the rows-only trio + 46 r07-latest) —
#   without it r10 would be oversubscribed by one. A NEW r10 query
#   therefore needs one more r07-latest retirement; the clean
#   candidates, by this same precedent, are sql_waiting_suppliers and
#   sql_excess_shipments (each is literally spark.sql(<oracle>) with a
#   live 1-scan twin on the same oracle) and graph_pagerank (oracle
#   shared with graph_pagerank_bucketed, the recommended scale plan).
#   The r10 registrations these three slots are earmarked for — code,
#   oracles, and machine pins ALREADY LANDED in r9 —
#   are sim_knn_after_delete (operators/similarity.py),
#   text_search_suffix_from_index and text_search_fuzzy_from_index
#   (operators/text_analysis.py).
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
