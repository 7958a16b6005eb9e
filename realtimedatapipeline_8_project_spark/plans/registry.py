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
    reshape,
    cdc,
)

# The driver's per-round CORRECTNESS check covers a prefix of the registry
# (50 entries in round 1). Order is therefore a verification budget:
# queries named here register FIRST — the round-1-unchecked families
# (media/sql/scale/pandas/asof/range/sample/sketch) plus every operator
# changed this round — so each earns a hard driver row; long-green,
# unchanged queries fill the tail. Names not listed keep module order.
_PRIORITY = (
    # flagship + this round's fixes (re-verify) and new operators
    "enrich_broadcast_left_join",
    "ts_gapfill_forward_fill",
    "scd2_user_state_history",
    "win_trailing_range_frame",
    "fuzzy_name_match",
    "sparse_doc_cosine",
    "unpivot_metrics",
    "hist_price_profile",
    "text_repetition",
    "contamination_ngram_overlap",
    "sample_shard_plan",
    "dedup_cluster_components",
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "curation_pii_redact",
    "curation_source_mix",
    "dedup_survivors",
    "sample_quality_gate",
    "text_bigram_fluency",
    "layout_zorder",
    "dq_audit",
    "dq_profile",
    "dq_referential",
    "json_as_map",
    "json_variant",
    "set_ops",
    "join_semi_anti",
    "sim_knn_ivf",
    "sim_embedding_neardup",
    # round-1 driver-unchecked families
    "media_metadata",
    "media_decode_stub",
    "sql_grouping_sets",
    "sql_scalar_subquery",
    "sql_in_subquery",
    "pivot_event_types",
    "array_event_history",
    "explode_top_tokens",
    "scale_salted_agg",
    "scale_agg_then_join",
    "scale_salted_join",
    "pandas_user_trend",
    "asof_last_purchase",
    "range_join_bucketed",
    "interval_overlap_sessions",
    "sample_split_assign",
    "sample_split_leakage_safe",
    "sample_stratified",
    "sample_pack_sequences",
    "hypertable_rollup",
    "sketch_count_min_estimate",
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
