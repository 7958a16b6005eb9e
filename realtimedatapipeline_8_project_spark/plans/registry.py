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
# here register FIRST. Round-6 budget (freshness rotation, part 2 of 2 —
# VERDICT r5 item 1): the flagship, every query whose plan changed THIS
# round (the incremental-dedup verify-leg fix, the parameterized-codebook
# family, the rebalance integer arithmetic, the guarded jaccard_of), the
# 8 queries NEW this round (native chunker twin, intra-batch dedup, TPC-H
# Q17/Q15/Q13/Q19 shapes, inverted index, boolean search, id-encoding),
# then ALL 30 queries whose newest row is round 3 (at the staleness
# limit), then the dedup/similarity r04 rows whose shared helpers this
# round touches. ROUND-7 BUDGET (owed): the 37 then-r04-latest rows
# (asof/contamination/curation/sampling/scale/sim_knn/text/ts families —
# they hit the two-round limit), the flagship, any round-7 plan changes,
# and as many of the 46 r05-latest as fit; with 133 queries on a
# 50/round budget, roughly 36 r05 rows structurally spill to round 8 at
# 3 rounds stale. Names not listed keep module order.
_PRIORITY = (
    # flagship stays verified every round
    "enrich_broadcast_left_join",
    # --- plan changed in round 6: old rows no longer describe the code ---
    "dedup_incremental",  # verify leg now shingles only candidate base docs
    "dedup_semantic_pairs",  # codebook size parameterized (default pinned)
    "sim_knn_ivf_trained",  # same codebook parameterization
    "sample_source_rebalance",  # keep-threshold now true integer division
    # --- new in round 6 ---
    "chunk_windows_native",  # sequence()+explode twin of the UDTF chunker
    "dedup_intra_batch",  # within-batch cluster collapse (recursive oracle)
    "agg_small_quantity_revenue",  # TPC-H Q17 shape, windowed-AVG single scan
    "agg_top_supplier_revenue",  # TPC-H Q15 shape, no-global-window argmax
    "agg_order_count_distribution",  # TPC-H Q13 shape, zero-count bucket
    "text_inverted_index",  # bounded posting-list build
    "text_boolean_search",  # conjunctive retrieval, count==k
    "agg_disjunctive_revenue",  # TPC-H Q19 shape, implied-bound pushdown
    "text_encode_ids",  # dense vocab ids without a global window
    # --- newest row is round 3: at the staleness limit, refresh all 30 ---
    "curation_end_to_end",
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
    "sample_weighted_reservoir",
    "sim_kmeans_train",
    "sketch_hll_portable",
    "snapshot_diff_cdc",
    "sparse_doc_cosine",
    "sql_exists_correlated",
    "topk_recent",
    "uuid_repair",
    "win_distribution_family",
    "win_event_gaps",
    "win_funnel_dropoff",
    "win_latest_per_user",
    "win_trailing_range_frame",
    "agg_approx_distinct",  # rows-only by design (approximate)
    # --- round-4-latest rotation, part 1 of 2: the dedup/similarity
    # families (shared helpers touched this round), rest rotate in r7 ---
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "dedup_minhash_neardup",  # rows-only by design (twin-pinned)
    "dedup_simhash_neardup",  # rows-only by design (twin-pinned)
    "dedup_cluster_components",
    "dedup_jaccard_vs_probe",  # r6 plan change: guarded jaccard_of
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
