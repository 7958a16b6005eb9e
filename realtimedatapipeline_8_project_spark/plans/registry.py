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
# here register FIRST. Round-3 budget: the six queries un-broken by the
# TIMESTAMP_NTZ load fix, the two operators changed this round
# (sparse_doc_cosine HUGEINT cast, fuzzy_name_match second block key),
# the six queries added late in round 2 that never earned a driver row,
# every operator NEW this round, then the oldest-green rows (r01-only —
# rotated out of round 2's prefix) to refresh their evidence. Names not
# listed keep module order.
_PRIORITY = (
    # NTZ-fix re-verification (err/regressed in r02)
    "win_sessionize",
    "win_event_gaps",
    "win_trailing_range_frame",
    "range_join_bucketed",
    "interval_overlap_sessions",
    "layout_zorder",
    # changed this round
    "sparse_doc_cosine",
    "fuzzy_name_match",
    # registered late in r02, never driver-checked
    "agg_mode_median",
    "agg_top1_per_group_sortfree",
    "win_distribution_family",
    "sql_exists_correlated",
    "snapshot_diff_cdc",
    "merge_apply_changes",
    # flagship stays verified every round
    "enrich_broadcast_left_join",
    # --- new in round 3 ---
    "pit_state_join",
    "sketch_hll_portable",
    "graph_pagerank",
    "scale_bloom_semijoin",
    "sample_weighted_reservoir",
    "curation_end_to_end",
    "ts_m4_downsample",
    "sim_kmeans_train",
    "media_frame_sample",
    "dq_outliers",
    "sim_knn_ivf_trained",
    "agg_shipping_priority",
    # --- oldest-green rotation (rows only from r01) ---
    "reference_engagement_metrics",
    "point_lookup_string_hash",
    "join_full_outer",
    "enum_validation_filter",
    "topk_recent",
    "ordered_drain",
    "json_decode",
    "kv_projection",
    "uuid_repair",
    "kafka_producer_projection",
    "agg_percentiles",
    "agg_pricing_summary",
    "agg_revenue_by_nation",
    "agg_rollup",
    "agg_cube",
    "agg_distinct_counts",
    "agg_approx_distinct",
    "agg_top_customers",
    "win_latest_per_user",
    "win_funnel_dropoff",
    "win_rank_family",
    "win_sliding_window",
    "win_rank_orders",
    "win_running_spend",
    "win_tumbling_hour",
    "dedup_exact_fingerprint",
    "dedup_simhash_neardup",
    "dedup_jaccard_vs_probe",
    "dedup_minhash_neardup",
    "dedup_events_exact",
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_winnow_fingerprint",
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
