"""Physical-plan regression tests (SURVEY §4): the properties that make
these plans survive a 100x scale-up must stay true — filter pushdown to the
parquet scan, column pruning, broadcast dimension joins, no shuffle of the
fact side for broadcast enrichment."""

from __future__ import annotations

import contextlib
import io
import os

import pytest

from realtimedatapipeline_8_project_spark.plans.registry import QUERIES


def plan_of(spark, sf_dir, name: str) -> str:
    return plan_of_df(QUERIES[name](spark, sf_dir))


def plan_of_df(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_point_lookup_pushes_filter_to_scan(spark, sf_small):
    p = plan_of(spark, sf_small, "point_lookup_string_hash")
    assert "PushedFilters" in p
    assert "EqualTo(event_id,42)" in p


def test_pricing_summary_pushes_date_filter(spark, sf_small):
    p = plan_of(spark, sf_small, "agg_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in p


def test_enrich_is_broadcast_join_and_prunes_columns(spark, sf_small):
    p = plan_of(spark, sf_small, "enrich_broadcast_left_join")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # props is never read from the events scan
    scans = [l for l in p.splitlines() if "ReadSchema" in l]
    assert scans and all("props" not in l for l in scans)
    # the fact side is not exchanged for the join (only broadcast exchange)
    assert "Exchange hashpartitioning" not in p.split("BroadcastHashJoin")[0]


def test_enrich_reads_only_needed_dim_columns(spark, sf_small):
    p = plan_of(spark, sf_small, "enrich_broadcast_left_join")
    dim_scan = [l for l in p.splitlines() if "ReadSchema" in l and "c_custkey" in l]
    assert dim_scan, "customer scan missing"
    assert "c_name" not in dim_scan[0]  # unused dim column pruned


def test_revenue_query_broadcasts_small_dims(spark, sf_small):
    p = plan_of(spark, sf_small, "agg_revenue_by_nation")
    assert "BroadcastHashJoin" in p


def test_topk_uses_take_ordered(spark, sf_small):
    p = plan_of(spark, sf_small, "topk_recent")
    assert "TakeOrderedAndProject" in p


def test_semi_anti_joins_compile_to_existence_joins(spark, sf_small):
    p = plan_of(spark, sf_small, "join_semi_anti")
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    # the fact side is reduced to its distinct key set before the join
    # (never broadcast raw): the distinct shows up as partial+final
    # HashAggregate pairs feeding the existence joins
    assert p.count("HashAggregate") >= 2
    scans = [l for l in p.splitlines() if "ReadSchema" in l and "o_custkey" in l]
    assert scans and all("o_totalprice" not in l for l in scans)


def test_partial_aggregation_before_shuffle(spark, sf_small):
    """Hash aggregates must be partial (map-side combine) before the
    exchange — the difference between shuffling 600k rows and 6."""
    p = plan_of(spark, sf_small, "agg_pricing_summary")
    assert "HashAggregate" in p
    first_agg = p.index("HashAggregate")
    first_exchange = p.index("Exchange")
    # formatted explain lists operators bottom-up in the numbered tree; both
    # partial and final HashAggregate nodes must exist
    assert p.count("HashAggregate") >= 2
    assert first_agg is not None and first_exchange is not None


def test_split_assign_is_map_only(spark, sf_small):
    """Deterministic split must add no exchange: pure projection over the
    scan (coordination-free at any scale)."""
    p = plan_of(spark, sf_small, "sample_split_assign")
    assert "Exchange" not in p
    assert "Join" not in p


def test_term_salience_broadcasts_df_and_combines_map_side(spark, sf_small):
    p = plan_of(spark, sf_small, "text_term_salience")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert p.count("HashAggregate") >= 4  # partial+final for tf and df


def test_winnow_fingerprint_is_map_only(spark, sf_small):
    p = plan_of(spark, sf_small, "text_winnow_fingerprint")
    assert "Exchange" not in p
    assert "Join" not in p


def test_range_join_is_hash_join_not_nested_loop(spark, sf_small):
    """The bucketed rewrite must keep the containment join out of
    BroadcastNestedLoopJoin (the O(n*m) trap)."""
    p = plan_of(spark, sf_small, "range_join_bucketed")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_funnel_shares_one_user_shuffle(spark, sf_small):
    """All three funnel windows and the per-user aggregate must ride a
    single user_id exchange (+ the tiny final stage-count exchange)."""
    p = plan_of(spark, sf_small, "win_funnel_dropoff")
    assert p.count("hashpartitioning(user_id") == 1


def test_repetition_is_map_only(spark, sf_small):
    """Row-local repetition signals must add no exchange or join."""
    p = plan_of(spark, sf_small, "text_repetition")
    assert "Exchange" not in p
    assert "Join" not in p


def test_contamination_broadcasts_probe_not_corpus(spark, sf_small):
    """The benchmark gram set is broadcast and hash-joined against the
    exploded corpus grams; the only hash exchange is the tiny per-doc
    aggregate (partial-combined), never the gram strings."""
    p = plan_of(spark, sf_small, "contamination_ngram_overlap")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert p.count("hashpartitioning(doc_id") == 1
    assert p.count("HashAggregate") >= 2  # partial + final per-doc agg


def test_shard_plan_partial_aggregates(spark, sf_small):
    """Shard manifest: map-side combine down to N_SHARDS groups before
    the one tiny exchange."""
    p = plan_of(spark, sf_small, "sample_shard_plan")
    assert p.count("HashAggregate") >= 2
    assert "Join" not in p


def test_pii_redact_is_map_only(spark, sf_small):
    """Redaction of a 100 TB corpus must stay a pure scan-project stage."""
    p = plan_of(spark, sf_small, "curation_pii_redact")
    assert "Exchange" not in p
    assert "Join" not in p


def test_quality_gate_broadcasts_one_threshold_row(spark, sf_small):
    """The percentile pass reduces to ONE row that is broadcast back over
    the corpus scan — the fact side must not be shuffled or sorted."""
    p = plan_of(spark, sf_small, "sample_quality_gate")
    assert "BroadcastExchange" in p
    assert "SortMergeJoin" not in p
    # the only exchange is the threshold aggregation's single-row reduce
    # (SinglePartition) — the corpus is never hash-repartitioned
    assert "hashpartitioning" not in p


def test_interval_overlap_single_narrow_shuffle_after_sessions(spark, sf_small):
    """Bucket-cover overlap join: after sessionization (its own user_id
    shuffle), counting per window adds exactly one narrow shuffle of
    bucket keys — no grid join, no nested loop."""
    p = plan_of(spark, sf_small, "interval_overlap_sessions")
    assert "NestedLoop" not in p
    assert "Join" not in p


def test_bigram_fluency_joins_counts_not_nested(spark, sf_small):
    """LM-scoring shape: the model join must be a hash join (broadcast at
    test scale, AQE-planned SMJ at corpus scale), never a nested loop."""
    p = plan_of(spark, sf_small, "text_bigram_fluency")
    assert "NestedLoop" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_salted_join_shuffles_on_key_and_salt(spark, sf_small):
    """The salted join must hash-partition on (key, salt) — not broadcast
    (the demo's premise is broadcast isn't possible) and not a plain key
    shuffle (which would re-concentrate the hot key)."""
    p = plan_of(spark, sf_small, "scale_salted_join")
    assert "ShuffledHashJoin" in p or "SortMergeJoin" in p
    assert "hashpartitioning(user_id" in p and "_salt" in p


def test_gapfill_broadcasts_bounds_and_grid(spark, sf_small):
    """Densify grid: the single-row bounds aggregate and the grid side are
    broadcast; the daily aggregate rides one user_id-family shuffle. The
    event scan is never nested-looped against the calendar."""
    p = plan_of(spark, sf_small, "ts_gapfill_forward_fill")
    assert "BroadcastExchange" in p
    assert "NestedLoop" not in p or "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_scd2_single_user_shuffle(spark, sf_small):
    """Both window passes (change detect, interval close) must share ONE
    user_id exchange — the sort order carries through."""
    p = plan_of(spark, sf_small, "scd2_user_state_history")
    assert p.count("hashpartitioning(user_id") == 1
    assert "Join" not in p


def test_trailing_range_frame_single_shuffle(spark, sf_small):
    """RANGE-frame rolling sum: one user_id exchange, one sort, no join."""
    p = plan_of(spark, sf_small, "win_trailing_range_frame")
    assert p.count("hashpartitioning(user_id") == 1
    assert "Join" not in p


def test_fuzzy_match_blocks_before_distance(spark, sf_small):
    """Blocked fuzzy join: candidates come from an equi-join on the block
    key (hash join), never an all-pairs nested loop with the edit distance
    as the only predicate."""
    p = plan_of(spark, sf_small, "fuzzy_name_match")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_sparse_cosine_probe_postings_broadcast(spark, sf_small):
    """Sparse retrieval: the probe's posting list is broadcast and
    hash-joined against the corpus postings — never a pair-wise nested
    loop or cartesian. The only nested-loop allowed is the 1-row
    probe-norm scalar cross join."""
    p = plan_of(spark, sf_small, "sparse_doc_cosine")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    # every BNLJ in the plan is the 1-row scalar cross join, never an
    # unkeyed pair join: each must be Cross with a broadcast build side
    for line in p.splitlines():
        # tree lines carry the join type ("BroadcastNestedLoopJoin Cross
        # BuildRight (23)"); the details section repeats the bare name
        if "BroadcastNestedLoopJoin" in line and "Build" in line:
            assert "Cross" in line
    assert p.count("HashAggregate") >= 4  # tf, norms, dot partial+final


def test_unpivot_is_expand_no_extra_shuffle(spark, sf_small):
    """Melt must compile to Expand (map-side row multiplication) feeding a
    partial-combined aggregate — one exchange of 18 groups, no join."""
    p = plan_of(spark, sf_small, "unpivot_metrics")
    assert "Expand" in p
    assert "Join" not in p
    assert p.count("HashAggregate") >= 2


def test_histogram_bounds_broadcast_fact_not_shuffled(spark, sf_small):
    """The min/max pass reduces to ONE row broadcast over the fact scan;
    the only hash exchange carries 20 bin groups. (hist_price_profile
    retired its registry slot r14 for dist_quantile_hist — the equi-width
    plan property stays pinned here via the module registry, the
    retiree precedent.)"""
    from realtimedatapipeline_8_project_spark.operators.reshape import (
        QUERIES as _RS_QUERIES,
    )

    p = plan_of_df(_RS_QUERIES["hist_price_profile"][0](spark, sf_small))
    assert "BroadcastExchange" in p
    assert "SortMergeJoin" not in p
    assert "hashpartitioning(o_totalprice" not in p


def test_top1_per_group_is_hash_agg_no_sort(spark, sf_small):
    """max_by over the encoded order key must stay a HashAggregate with
    map-side partial combine — no SortAggregate, no Sort node (the whole
    point vs the row_number()=1 window form)."""
    p = plan_of(spark, sf_small, "agg_top1_per_group_sortfree")
    assert "SortAggregate" not in p
    assert p.count("HashAggregate") >= 2
    assert not any("Sort [" in l for l in p.splitlines())


def test_bloom_semijoin_broadcasts_filter_shuffles_only_join(spark, sf_small):
    """Bloom probes must be broadcast hash joins (map-side, no fact
    shuffle before them); the exact join is the shuffle-hash form (the
    scenario is a dim too big to broadcast), never a nested loop."""
    p = plan_of(spark, sf_small, "scale_bloom_semijoin")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "ShuffledHashJoin" in p


def test_pit_state_join_single_entity_shuffle(spark, sf_small):
    """The point-in-time lookup rides the as-of union-marker plan: every
    exchange is on the entity key (one logical user shuffle shared by the
    change-point window and the as-of fill) — no inequality join."""
    p = plan_of(spark, sf_small, "pit_state_join")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # formatted plans carry partitioning in the details section
    ex = [l for l in p.splitlines() if "hashpartitioning" in l]
    assert ex and all("user_id" in l or "_k" in l for l in ex)


def test_hll_sketch_partial_aggregates(spark, sf_small):
    """Register build must map-side combine: HashAggregate pairs around
    the (event_type, bucket) exchange; no Sort-based aggregation."""
    p = plan_of(spark, sf_small, "sketch_hll_portable")
    assert p.count("HashAggregate") >= 4
    assert "SortAggregate" not in p


def test_fuzzy_blocking_full_recall_and_bounded_blocks(spark):
    """The conjunctive (token, length-band) block key must (a) keep FULL
    recall — every Levenshtein<=2 pair of a varied-length synthetic
    catalog is found, identical to brute force — and (b) actually split
    per-token blocks when name lengths vary (the scale property; the
    part fixture's 7-12 char names can't exercise it)."""
    import itertools

    from pyspark.sql import functions as F

    from realtimedatapipeline_8_project_spark.operators.fuzzy import (
        BAND_W,
        LEV_MAX,
        blocked_name_pairs,
    )

    base = ["widget", "widgit", "gadget", "gadgets", "sprocket"]
    names = list(
        {
            f"{'x' * pad} {b} unit"
            for b in base
            for pad in (0, 1, 2, 3, 8, 9, 16, 17, 24)
        }
    )
    df = spark.createDataFrame([(n,) for n in names], ["p_name"])
    got = {
        (r["name_a"], r["name_b"])
        for r in blocked_name_pairs(df).collect()
    }
    # brute-force ground truth computed Spark-side (catalog is tiny)
    a = df.select(F.col("p_name").alias("name_a"))
    b = df.select(F.col("p_name").alias("name_b"))
    want = {
        (r["name_a"], r["name_b"])
        for r in a.crossJoin(b)
        .where(F.col("name_a") < F.col("name_b"))
        .where(F.levenshtein("name_a", "name_b") <= LEV_MAX)
        .collect()
    }
    assert got == want, "blocking lost or invented pairs"
    # block bound: (tok, band) splits the single shared token's block
    keyed = df.select(
        F.element_at(F.split("p_name", " "), -1).alias("tok"),
        F.expr(f"length(p_name) div {BAND_W}").alias("band"),
    )
    tok_max = keyed.groupBy("tok").count().agg(F.max("count")).first()[0]
    block_max = (
        keyed.groupBy("tok", "band").count().agg(F.max("count")).first()[0]
    )
    assert block_max <= max(2, tok_max // 2), (
        f"(tok, band) block {block_max} vs per-token {tok_max}"
    )


def test_m4_downsample_is_one_partial_combined_agg(spark, sf_small):
    """M4 must be a single map-side-combined hash aggregation — no join,
    no sort; output bounded by entities x buckets."""
    p = plan_of(spark, sf_small, "ts_m4_downsample")
    assert p.count("HashAggregate") >= 2
    assert "SortAggregate" not in p
    assert "Join" not in p


def test_kmeans_assignment_is_broadcast_fold_no_smj(spark, sf_small):
    """k-means assignment must stay a row-local fold over the broadcast
    centroid row (no sort-merge join anywhere); updates are partial-
    combined hash aggregates."""
    p = plan_of(spark, sf_small, "sim_kmeans_train")
    assert "SortMergeJoin" not in p
    assert "BroadcastExchange" in p
    assert p.count("HashAggregate") >= 2


@pytest.mark.parametrize(
    "name",
    [
        "agg_shipping_priority",
        "agg_returned_item_report",
        "agg_large_volume_customers",
        "scale_agg_then_join",
    ],
)
def test_customer_dim_joins_are_hint_free_but_broadcast_locally(
    spark, sf_small, name
):
    """The four reports that join the scale-growing customer dim carry NO
    forced broadcast hint (at 100x scale the classic Q3/Q10/Q18 plans
    shuffle customer — a forced broadcast would OOM the executors). This
    pins that at test SF the optimizer still chooses a broadcast join on
    its own via the size threshold, i.e. the removed hint was redundant
    locally and the strategy choice is now the optimizer's."""
    p = plan_of(spark, sf_small, name)
    assert "BroadcastHashJoin" in p, name
    # customer must not be forced: no hint survives into the optimized
    # logical plan (ResolvedHint would appear only with an explicit hint)
    df = QUERIES[name](spark, sf_small)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical, name


@pytest.mark.parametrize("name", sorted(__import__(
    "realtimedatapipeline_8_project_spark.plans.registry",
    fromlist=["ORACLES"]).ORACLES))
def test_no_query_plans_a_cartesian_or_unkeyed_nested_loop(spark, sf_small, name):
    """Blanket plan lint: NO oracle query may compile to (a) a
    CartesianProduct, (b) a non-Cross BroadcastNestedLoopJoin (an unkeyed
    join predicate — the O(n*m) trap), or (c) a PARTITION-LESS window (a
    windowspecdefinition whose first argument is already the order spec
    or the frame funnels every row through ONE task at 100 TB — global
    argmax/rank must use the broadcast-scalar or TakeOrdered shape
    instead, see agg_top_supplier_revenue). Intentional 1-row scalar
    cross joins (bounds, thresholds, probe vectors) plan as BNLJ Cross
    with a broadcast build side and are allowed."""
    import re

    p = plan_of(spark, sf_small, name)
    assert "CartesianProduct" not in p, name
    for line in p.splitlines():
        if "BroadcastNestedLoopJoin" in line and "Build" in line:
            assert "Cross" in line, f"{name}: {line.strip()[:100]}"
    for m in re.finditer(r"windowspecdefinition\(([^,)]*)[,)]", p):
        first = m.group(1).strip()
        assert first and not first.startswith("specifiedwindowframe"), (
            f"{name}: window with no partition AND no order"
        )
        assert not re.search(r"\b(ASC|DESC) NULLS", first), (
            f"{name}: order-only (partition-less) window: {first}"
        )


def test_m4_order_key_guard_raises_on_out_of_range_event_id(spark):
    """The M4 order key packs bucket-relative micros * 2^31 + event_id;
    an id >= 2^31 would silently break monotonicity (wrong first/last),
    so the key expression must raise instead — and must stay silent on
    in-range ids (the fixture path, same key bits as before the guard)."""
    from datetime import datetime

    import pytest as _pytest

    from realtimedatapipeline_8_project_spark.operators.timeseries import (
        m4_buckets,
    )

    ok = spark.createDataFrame(
        [(2**31 - 1, datetime(2024, 1, 1, 0, 30), 1, 2.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    row = m4_buckets(ok).collect()[0]
    assert row.ok == 30 * 60 * 1_000_000 * 2**31 + (2**31 - 1)

    bad = spark.createDataFrame(
        [(2**31, datetime(2024, 1, 1), 1, 2.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    with _pytest.raises(Exception, match="m4 order key"):
        m4_buckets(bad).collect()


def test_min_cost_supplier_scans_lineitem_once(spark, sf_small):
    """The Q2 shape must use the windowed-MIN rewrite, not the textbook
    correlated subquery: Spark does not materialize CTEs, so the
    correlated form plans a SECOND full lineitem scan+aggregate —
    double fact I/O at 100 TB. Pin exactly one lineitem scan node."""
    p = plan_of(spark, sf_small, "sql_min_cost_supplier")
    assert sum("lineitem.parquet" in l for l in p.splitlines()) == 1
    assert "CartesianProduct" not in p


def test_source_rebalance_decision_is_map_only(spark, sf_small):
    """The mixing-rate keep/drop decision must be a row-local integer
    compare: no join, and the only exchange is the tiny per-source
    report aggregate (partial+final)."""
    import re

    p = plan_of(spark, sf_small, "sample_source_rebalance")
    assert "Join" not in p
    # formatted explain lists each node in the tree AND a detail section;
    # count detail headers -> exactly one physical Exchange
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 1
    assert p.count("HashAggregate") >= 2


def _n_exchanges(p: str) -> int:
    import re

    return len(re.findall(r"^\(\d+\) Exchange", p, re.M))


def test_udtf_chunker_is_map_only(spark, sf_small):
    """The context-window UDTF must run as a map-side Python generator
    over the scan partitions: zero exchanges, zero joins."""
    p = plan_of(spark, sf_small, "udtf_chunk_windows")
    assert _n_exchanges(p) == 0
    assert "Join" not in p


def test_epoch_shuffle_single_shard_exchange(spark, sf_small):
    """The epoch permutation pays exactly ONE exchange (the shard-key
    window); the hash itself is row-local."""
    p = plan_of(spark, sf_small, "sample_epoch_shuffle")
    assert _n_exchanges(p) == 1
    assert "Join" not in p


def test_volume_shipping_broadcasts_dims_one_fact_exchange(spark, sf_small):
    """Q7 shape at test SF: every join is a broadcast hash join (nation
    roles by hint, supplier/customer by threshold), leaving a single
    real exchange for the final aggregate."""
    p = plan_of(spark, sf_small, "agg_volume_shipping")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert _n_exchanges(p) == 1


def test_media_dedup_single_agg_exchange_no_payload(spark, sf_small):
    """Content-hash dedup must shuffle only (hash, id, len): a single
    aggregate exchange, and the payload bytes never appear past the
    projection (no binary column in the exchange schema)."""
    p = plan_of(spark, sf_small, "media_dedup_exact")
    assert _n_exchanges(p) == 1
    assert "Join" not in p


def test_incremental_dedup_stored_bands_shingles_only_candidates(
    spark, sf_small, tmp_path
):
    """VERDICT r5 item 2 pin: with a stored band table, incremental
    dedup's verify leg must NOT scan-and-shingle the full base corpus.
    The executedPlan must show (a) the base text read exactly once,
    (b) that scan feeding a broadcast LEFT-SEMI join on the candidate
    id set with NO exchange of the base side below it, and (c) the one
    and only shingle projection (zip_with) sitting ABOVE the semi join
    — shingle-after-filter. The delta/cand legs are lineage-truncated
    localCheckpoints, so any second zip_with line is a regression."""
    from realtimedatapipeline_8_project_spark.operators.dedup import (
        _inc_delta,
        base_band_table,
        incremental_dedup,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    base = load_table(spark, sf_small, "documents").select("doc_id", "text")
    bands_path = str(tmp_path / "bands")
    base_band_table(base).write.parquet(bands_path)
    out = incremental_dedup(
        base, _inc_delta(base), base_bands=spark.read.parquet(bands_path)
    )
    lines = (
        out._jdf.queryExecution().executedPlan().toString().splitlines()
    )
    semi = [i for i, l in enumerate(lines) if "LeftSemi" in l]
    assert len(semi) == 1
    shingle = [i for i, l in enumerate(lines) if "zip_with" in l]
    assert len(shingle) == 1, "base shingles must be computed exactly once"
    assert shingle[0] < semi[0], "shingle projection must sit above the semi join"
    # the base text is scanned exactly once, and it is the semi join's
    # probe side: no Exchange between the join and that scan
    text_scans = [
        i
        for i, l in enumerate(lines)
        if "FileScan parquet" in l and "text#" in l
    ]
    assert len(text_scans) == 1
    assert text_scans[0] > semi[0]
    assert not any(
        "Exchange" in lines[i] for i in range(semi[0] + 1, text_scans[0])
    ), "full-base exchange below the semi join"


def test_small_quantity_revenue_scans_lineitem_once(spark, sf_small):
    """Q17 shape must use the windowed-AVG rewrite: the textbook
    correlated-AVG subquery plans a second full lineitem scan+aggregate
    (non-materialized CTE, same trap sql_min_cost_supplier pins). Also
    pin the integer small-quantity predicate: no double division in the
    filter."""
    p = plan_of(spark, sf_small, "agg_small_quantity_revenue")
    assert sum("lineitem.parquet" in l for l in p.splitlines()) == 1
    assert "Window" in p
    assert "CartesianProduct" not in p
    # part is scale-growing: the join must be hint-free (AQE broadcasts
    # locally, shuffles at 100x — the r5 customer-dim discipline)
    df = QUERIES["agg_small_quantity_revenue"](spark, sf_small)
    assert "ResolvedHint" not in df._jdf.queryExecution().optimizedPlan().toString()


def test_top_supplier_no_global_window_one_fact_scan(spark, sf_small):
    """Q15 shape: the global argmax-with-ties must NOT funnel the
    per-supplier table through a single-partition rank window; the 1-row
    MAX broadcasts back over the lineage-truncated aggregate, and the
    fact is scanned exactly once (inside the checkpoint job — the final
    plan reuses the checkpointed aggregate, so it contains NO lineitem
    scan at all)."""
    p = plan_of(spark, sf_small, "agg_top_supplier_revenue")
    assert "Window" not in p
    assert "lineitem.parquet" not in p  # aggregate reused, not recomputed
    assert "BroadcastHashJoin" in p
    # only the 1-row MAX may carry a hint; supplier stays hint-free
    df = QUERIES["agg_top_supplier_revenue"](spark, sf_small)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert logical.count("ResolvedHint") <= 1


def test_order_count_distribution_keeps_zero_bucket(spark, sf_small):
    """Q13 shape: customers with no qualifying orders must appear as the
    c_count = 0 bucket (an inner join silently drops them — the fixture
    plants 18 such customers at sf0.001), and the per-customer count
    aggregates BEFORE the customer join (map-side combine on orders)."""
    from pyspark.sql import functions as F

    df = QUERIES["agg_order_count_distribution"](spark, sf_small)
    zero = df.where(F.col("c_count") == 0).collect()
    assert zero and zero[0].n_customers == 18
    p = plan_of(spark, sf_small, "agg_order_count_distribution")
    assert "CartesianProduct" not in p


def test_global_window_lint_detects_a_planted_offender(spark):
    """Self-check for the lint above: a deliberately partition-less
    window must trip the same regex (guards against explain-format
    drift silently disabling the lint)."""
    import re

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(10).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    offenders = [
        m.group(1).strip()
        for m in re.finditer(r"windowspecdefinition\(([^,)]*)[,)]", p)
        if re.search(r"\b(ASC|DESC) NULLS", m.group(1))
        or m.group(1).strip().startswith("specifiedwindowframe")
    ]
    assert offenders, "lint regex no longer detects global windows"


def test_disjunctive_revenue_pushes_implied_bounds_to_both_scans(
    spark, sf_small
):
    """Q19 shape: Catalyst cannot push the cross-table OR below the join,
    so the hand-derived implied single-table bounds must reach BOTH
    parquet scans (quantity envelope on lineitem, brand IN + size
    envelope on part) — without them the fact scan reads everything."""
    p = plan_of(spark, sf_small, "agg_disjunctive_revenue")
    li_scans = [
        l for l in p.splitlines()
        if "PushedFilters" in l and "l_quantity" in l
    ]
    assert li_scans and "LessThanOrEqual(l_quantity,50.0)" in li_scans[0]
    part_scans = [
        l for l in p.splitlines() if "PushedFilters" in l and "p_brand" in l
    ]
    assert part_scans and "In(p_brand" in part_scans[0]
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p


def test_q21_exists_decorrelates_to_semi_anti_bounded_scans(spark, sf_small):
    """sql_waiting_suppliers (TPC-H Q21 shape, registry-retired r10 —
    its SQL text is agg_waiting_suppliers_1scan's live oracle): both
    correlated subqueries decorrelate into existence joins — never
    per-row subquery execution — and the fact appears a bounded number
    of times (base + one scan per subquery)."""
    from realtimedatapipeline_8_project_spark.operators.sql_surface import (
        QUERIES as _SQL_QUERIES,
    )

    p = plan_of_df(_SQL_QUERIES["sql_waiting_suppliers"][0](spark, sf_small))
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert p.count("lineitem.parquet") == 3
    assert "BroadcastNestedLoop" not in p
    assert "CartesianProduct" not in p


def test_q21_single_scan_rewrite_scans_fact_once(spark, sf_small):
    """agg_waiting_suppliers_1scan: the production rewrite answers both
    order-local existence questions from ONE fact scan via an
    orderkey-partitioned window — one scan, one orderkey exchange."""
    p = plan_of(spark, sf_small, "agg_waiting_suppliers_1scan")
    assert p.count("lineitem.parquet") == 1
    assert "Window" in p
    assert p.count("hashpartitioning(l_orderkey") >= 1


def test_q20_nested_in_decorrelates_to_semi_joins(spark, sf_small):
    """sql_excess_shipments (TPC-H Q20 shape, registry-retired r10 —
    its SQL text is agg_excess_shipments_1scan's live oracle): nested
    INs become semi joins, the correlated scalar threshold becomes a
    per-part aggregate + join (one extra fact scan, bounded), no
    per-row execution."""
    from realtimedatapipeline_8_project_spark.operators.sql_surface import (
        QUERIES as _SQL_QUERIES,
    )

    p = plan_of_df(_SQL_QUERIES["sql_excess_shipments"][0](spark, sf_small))
    assert "LeftSemi" in p
    assert p.count("lineitem.parquet") == 2
    assert "BroadcastNestedLoop" not in p
    assert "CartesianProduct" not in p
    # the ship-date window is pushed into both fact scans
    pushed = [
        l
        for l in p.splitlines()
        if "PushedFilters" in l and "l_shipdate" in l
    ]
    assert len(pushed) >= 2


def test_search_from_index_never_scans_corpus(spark, sf_small):
    """text_search_from_index: the conjunctive query is answered from the
    stored posting-list artifact — no documents scan anywhere in the
    plan, the term IN-filter pushed into the postings scan — and the
    artifact build is idempotent (second call reuses, no rewrite)."""
    import os

    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        build_posting_index,
    )

    path = build_posting_index(spark, sf_small)
    stamp = os.path.getmtime(os.path.join(path, "_SUCCESS"))
    p = plan_of(spark, sf_small, "text_search_from_index")
    assert "documents.parquet" not in p
    assert p.count("text_postings") >= 1
    pushed = [
        l for l in p.splitlines() if "PushedFilters" in l and "In(term" in l
    ]
    assert pushed, "term IN-filter must push into the postings scan"
    # reused, not rebuilt
    assert os.path.getmtime(os.path.join(path, "_SUCCESS")) == stamp


def test_q22_anti_join_with_pushed_date_filter(spark, sf_small):
    """sql_dormant_customers (TPC-H Q22 shape): the NOT EXISTS becomes a
    LeftAnti, the dormancy date predicate is pushed into the orders
    scan, the scalar thresholds are one-row subquery broadcasts — no
    per-row subquery execution, no nested-loop fallback on the fact."""
    p = plan_of(spark, sf_small, "sql_dormant_customers")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p
    pushed = [
        l
        for l in p.splitlines()
        if "PushedFilters" in l and "o_orderdate" in l
    ]
    assert pushed, "dormancy date filter must push into the orders scan"


def test_supplier_name_unique_per_suppkey():
    """agg_waiting_suppliers_1scan aggregates by l_suppkey and joins
    s_name, while the SQL spelling groups by s_name — equivalent only
    while s_name is unique (ADVICE r7). Pin that fixture invariant at
    every scale the driver runs, so the assumption can't rot silently
    if the fixtures are ever regenerated."""
    import os

    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/supplier.parquet"
        if not os.path.exists(path):
            continue
        n, d = duckdb.sql(
            f"SELECT COUNT(*), COUNT(DISTINCT s_name) FROM '{path}'"
        ).fetchone()
        assert n == d, f"duplicate s_name in {sf}: Q21 spellings diverge"


def test_q21_spellings_agree(spark, sf_small):
    """The EXISTS/NOT EXISTS spelling and the single-scan window rewrite
    of the Q21 shape are the same function — pinned directly Spark vs
    Spark (the driver additionally cross-validates both against one
    DuckDB oracle)."""
    from realtimedatapipeline_8_project_spark.operators.sql_surface import (
        QUERIES as _SQL_QUERIES,
    )

    a = _SQL_QUERIES["sql_waiting_suppliers"][0](spark, sf_small)
    b = QUERIES["agg_waiting_suppliers_1scan"](spark, sf_small)
    rows_a = sorted(map(str, a.collect()))
    rows_b = sorted(map(str, b.collect()))
    assert rows_a == rows_b


def test_bm25_single_corpus_pass_and_take_ordered(spark, sf_small):
    """text_bm25_topk (registry-retired r9 — its corpus-scan ranking is
    the shared ORACLE of the three index-served BM25 entries; this test
    is where its own plan stays pinned): the doc-grain aggregate is
    lineage-truncated, so the final plan reads the checkpointed frame —
    the corpus is scanned and exploded exactly once (inside the
    checkpoint), the 1-row stats frame broadcasts, and top-k is
    TakeOrderedAndProject, all JVM-side."""
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        QUERIES as _TA_QUERIES,
    )

    p = plan_of_df(_TA_QUERIES["text_bm25_topk"][0](spark, sf_small))
    assert "documents.parquet" not in p  # corpus pass happened once, inside the checkpoint
    assert "TakeOrderedAndProject" in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "Python" not in p


def test_bm25_from_index_never_scans_corpus(spark, sf_small):
    """text_bm25_from_index: ranking served entirely from the stored
    scored-postings artifact — no documents scan, the query terms pushed
    as an IN filter into the postings scan (both consumers of the
    pruned postings read ∝ the query terms' lists), integer-microunit
    scoring, TakeOrderedAndProject top-k."""
    import os

    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        build_scored_index,
    )

    root = build_scored_index(spark, sf_small)
    stamp = os.path.getmtime(
        os.path.join(root, "postings", "_SUCCESS")
    )
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        QUERIES as _TAQ,
    )

    # registry-retired r13 (slot funds hybrid_rrf_topk); the serving
    # plan stays machine-pinned here via the module registry
    p = plan_of_df(_TAQ["text_bm25_from_index"][0](spark, sf_small))
    assert "documents.parquet" not in p
    pushed = [
        l for l in p.splitlines() if "PushedFilters" in l and "In(term" in l
    ]
    assert pushed, "term IN-filter must push into the postings scan"
    assert "TakeOrderedAndProject" in p
    assert "Python" not in p
    # reused, not rebuilt
    assert (
        os.path.getmtime(os.path.join(root, "postings", "_SUCCESS")) == stamp
    )


def test_bm25_spellings_agree(spark, sf_small):
    """Direct corpus computation and the stored-index path are the same
    ranking function — pinned Spark vs Spark (the direct spelling is
    registry-retired; the driver cross-validates the index path against
    the corpus-scan DuckDB oracle every rotation)."""
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        QUERIES as _TA_QUERIES,
    )

    a = _TA_QUERIES["text_bm25_topk"][0](spark, sf_small)
    b = _TA_QUERIES["text_bm25_from_index"][0](spark, sf_small)
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_q20_single_scan_rewrite_scans_fact_once(spark, sf_small):
    """agg_excess_shipments_1scan: the per-part totals reaggregate the
    lineage-truncated per-(supplier, part) frame instead of re-scanning
    the fact — the final plan reads no lineitem at all (the one scan
    happened inside the checkpoint), and the supplier gate is a semi
    join."""
    p = plan_of(spark, sf_small, "agg_excess_shipments_1scan")
    assert "lineitem.parquet" not in p
    assert "LeftSemi" in p


def test_q20_spellings_agree(spark, sf_small):
    """The nested-IN SQL spelling and the single-scan rewrite of the
    Q20 shape are the same function — pinned Spark vs Spark."""
    from realtimedatapipeline_8_project_spark.operators.sql_surface import (
        QUERIES as _SQL_QUERIES,
    )

    a = _SQL_QUERIES["sql_excess_shipments"][0](spark, sf_small)
    b = QUERIES["agg_excess_shipments_1scan"](spark, sf_small)
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_search_any_and_exclude_from_index_corpus_free(spark, sf_small):
    """OR and AND-NOT retrieval (the r8 boolean-algebra completion) are
    answered entirely from the stored posting artifact: no documents
    scan in either plan, the positive terms pushed as IN(term) into the
    postings scan, and NOT served as an anti join on the excluded
    term's postings — never 'all docs minus matches'."""
    p_any = plan_of(spark, sf_small, "text_search_any_from_index")
    assert "documents.parquet" not in p_any
    assert any(
        "PushedFilters" in l and "In(term" in l for l in p_any.splitlines()
    )
    p_ex = plan_of(spark, sf_small, "text_search_exclude_from_index")
    assert "documents.parquet" not in p_ex
    assert "LeftAnti" in p_ex
    assert any(
        "PushedFilters" in l and "In(term" in l for l in p_ex.splitlines()
    )
    # the excluded term's postings scan pushes its equality filter too
    assert any(
        "PushedFilters" in l and "EqualTo(term," in l
        for l in p_ex.splitlines()
    )


def test_search_prefix_from_index_corpus_free(spark, sf_small):
    """Prefix retrieval (s*) is answered from the stored postings with
    the prefix predicate pushed as StringStartsWith into the scan (the
    term-sorted files make it a row-group range prune) — no documents
    scan, cost ∝ the prefix's vocabulary slice."""
    p = plan_of(spark, sf_small, "text_search_prefix_from_index")
    assert "documents.parquet" not in p
    assert "Python" not in p
    assert any(
        "PushedFilters" in l and "StringStartsWith(term" in l
        for l in p.splitlines()
    )


def test_q8_market_share_broadcast_chain_single_fact_scan(spark, sf_small):
    """sql_market_share (TPC-H Q8 shape): the 7-relation join tree must
    keep the fact as the probe side of a broadcast chain — every join a
    BroadcastHashJoin at local scale, lineitem scanned exactly once,
    and no fact-side hash exchange before the aggregate (join order is
    the 100x make-or-break for this shape)."""
    p = plan_of(spark, sf_small, "sql_market_share")
    assert p.count("lineitem.parquet") == 1
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    # the type filter reaches the part scan; the region name the region scan
    assert any(
        "PushedFilters" in l and "EqualTo(p_type," in l
        for l in p.splitlines()
    )
    assert any(
        "PushedFilters" in l and "EqualTo(r_name," in l
        for l in p.splitlines()
    )


def test_notin_null_trap_boundary(spark):
    """The empty-vs-nonempty NOT IN boundary on a planted 3-row fixture
    (fixture-independent): one NULL in the subquery flips the whole
    predicate from {1,3} to EMPTY — three-valued logic, not anti-join
    semantics. Pins Spark's behavior directly; the registry oracle
    proves DuckDB agrees on the fixture corpus."""
    spark.createDataFrame(
        [(1,), (2,), (3,)], "k bigint"
    ).createOrReplaceTempView("t_outer")
    spark.createDataFrame(
        [(2, False), (None, True)], "v bigint, poison boolean"
    ).createOrReplaceTempView("t_sub")
    nonempty = spark.sql(
        "SELECT k FROM t_outer WHERE k NOT IN "
        "(SELECT v FROM t_sub WHERE NOT poison)"
    ).collect()
    assert sorted(r.k for r in nonempty) == [1, 3]
    poisoned = spark.sql(
        "SELECT k FROM t_outer WHERE k NOT IN (SELECT v FROM t_sub)"
    ).collect()
    assert poisoned == []


def test_bm25_incremental_equals_one_pass_artifact(spark, sf_small):
    """Replay-equals-batch for the search index (VERDICT r7 item 2): the
    merged incremental postings partitions equal the one-pass scored
    artifact row-for-row, the summed per-batch stats equal the one-pass
    corpus stats, and the served ranking is identical (the driver
    additionally proves both against the corpus-scan DuckDB oracle)."""
    import os

    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        INDEX_POSTINGS,
        build_incremental_index,
        build_scored_index,
        read_index,
    )

    incr_root = build_incremental_index(spark, sf_small)
    one_root = build_scored_index(spark, sf_small)
    postings, stats = read_index(spark, incr_root)
    one_postings = spark.read.parquet(os.path.join(one_root, "postings"))
    one_stats = spark.read.parquet(os.path.join(one_root, "stats"))
    cols = ["term", "doc_id", "tf", "dl", "positions"]
    assert sorted(map(str, postings.select(*cols).collect())) == sorted(
        map(str, one_postings.select(*cols).collect())
    )
    assert stats.collect() == one_stats.collect()
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        QUERIES as _TAQ,
    )

    # both spellings registry-retired (r12/r13) — identity + plan stay
    # machine-pinned through the module registry
    a = _TAQ["text_bm25_incremental"][0](spark, sf_small)
    b = _TAQ["text_bm25_from_index"][0](spark, sf_small)
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))
    # the serving plan touches the batch partitions, never the corpus,
    # and the query terms push into the partitioned postings scan
    p = plan_of_df(_TAQ["text_bm25_incremental"][0](spark, sf_small))
    assert "documents.parquet" not in p
    assert INDEX_POSTINGS in p
    assert any(
        "PushedFilters" in l and "In(term" in l for l in p.splitlines()
    )
    assert "TakeOrderedAndProject" in p


def test_q9_profit_spellings_and_plans(spark, sf_small):
    """TPC-H Q9 shape. The CTE spelling pays TWO fact scans (Catalyst
    cannot reuse a subexpression across the cost CTE boundary — that
    contrast is the point of the stressor) with the LIKE pushed into
    the part scan; the 1-scan rewrite is a pure one-pass pipeline: ONE
    fact scan pre-filtered by the broadcast part semi-join (group
    pruning is exact — partkey is a grouping key), the per-(s, p) cost
    a window MIN over the grain frame (no reaggregate-and-join-back, no
    checkpoint), and never a cartesian product. Both spellings are the
    same function, pinned Spark vs Spark (the driver additionally
    cross-validates both against one DuckDB oracle)."""
    # the CTE spelling is registry-retired (r12: its slot funded
    # text_search_multi_suffix_from_index; the oracle lives on under
    # the 1-scan twin) — the spellings-agree + both-plans pin lives HERE
    from realtimedatapipeline_8_project_spark.operators.sql_surface import (
        QUERIES as _SQL_QUERIES,
    )

    p_sql = plan_of_df(_SQL_QUERIES["sql_profit_by_nation"][0](spark, sf_small))
    assert p_sql.count("lineitem.parquet") == 2
    assert "CartesianProduct" not in p_sql
    assert any(
        "PushedFilters" in l and "StringContains(p_name" in l
        for l in p_sql.splitlines()
    )
    p1 = plan_of(spark, sf_small, "agg_profit_by_nation_1scan")
    assert p1.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in p1
    assert "LeftSemi" in p1
    assert "Window" in p1
    # the LIKE filter reaches the part scan feeding the semi-join build
    assert any(
        "PushedFilters" in l and "StringContains(p_name" in l
        for l in p1.splitlines()
    )
    # exactly two grain-sized exchanges — the aggregate's full-key
    # shuffle (map-side combined) and the window's (s, p) shuffle — and
    # no join-back: the cost comes from a window, never a reaggregate
    # joined to its own source
    assert p1.count("hashpartitioning(l_suppkey") == 2
    assert "SortMergeJoin" not in p1
    a = _SQL_QUERIES["sql_profit_by_nation"][0](spark, sf_small)
    b = QUERIES["agg_profit_by_nation_1scan"](spark, sf_small)
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_phrase_from_index_corpus_free_and_incremental_agrees(
    spark, sf_small
):
    """text_phrase_from_index: the two-term phrase query is answered
    from the stored positional postings — no documents scan, each
    term's equality filter pushed into the postings scan, adjacency as
    JVM-side array ops (no Python). The incrementally maintained index
    serves the identical rows through the same helper (the driver
    additionally proves both against the corpus-scan DuckDB oracle)."""
    p = plan_of(spark, sf_small, "text_phrase_from_index")
    assert "documents.parquet" not in p
    assert "Python" not in p
    pushed = [
        l
        for l in p.splitlines()
        if "PushedFilters" in l and "EqualTo(term," in l
    ]
    assert len(pushed) >= 2
    # the incremental spelling is registry-retired (r12: its slot
    # funded text_search_multi_fuzzy_from_index) — the from-index ==
    # incremental row-identity stays pinned HERE
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        QUERIES as _TEXT_QUERIES,
    )

    a = QUERIES["text_phrase_from_index"](spark, sf_small)
    b = _TEXT_QUERIES["text_phrase_incremental"][0](spark, sf_small)
    rows = sorted(map(str, a.collect()))
    assert rows == sorted(map(str, b.collect()))
    assert rows  # the fixture phrase actually occurs


def test_proximity_slop_generalizes_phrase(spark):
    """phrase_hits_over_postings(slop=k): slop=1 is the adjacent phrase;
    slop=2 additionally admits one intervening token; a t2 position
    reachable from several t1 positions counts once. Pinned on a
    planted positional postings frame (fixture-independent)."""
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        PHRASE_T1,
        PHRASE_T2,
        phrase_hits_over_postings,
    )

    rows = [
        # doc 1: "window scan"            -> adjacent
        (PHRASE_T1, 1, 1, 10, [3]),
        (PHRASE_T2, 1, 1, 10, [4]),
        # doc 2: "window x scan"          -> gap of 1, slop=2 only
        (PHRASE_T1, 2, 1, 10, [3]),
        (PHRASE_T2, 2, 1, 10, [5]),
        # doc 3: "scan window"            -> wrong order, never
        (PHRASE_T1, 3, 1, 10, [4]),
        (PHRASE_T2, 3, 1, 10, [3]),
        # doc 4: "window window scan"     -> one site despite two t1s
        (PHRASE_T1, 4, 2, 10, [2, 3]),
        (PHRASE_T2, 4, 1, 10, [4]),
    ]
    postings = spark.createDataFrame(
        rows,
        "term string, doc_id bigint, tf bigint, dl bigint, "
        "positions array<int>",
    )
    exact = {
        r.doc_id: r.n_adjacent
        for r in phrase_hits_over_postings(postings, slop=1).collect()
    }
    assert exact == {1: 1, 4: 1}
    near = {
        r.doc_id: r.n_adjacent
        for r in phrase_hits_over_postings(postings, slop=2).collect()
    }
    assert near == {1: 1, 2: 1, 4: 1}


def test_incremental_index_serves_full_boolean_algebra(spark, sf_small):
    """Every retrieval connective — AND, OR, AND-NOT, prefix, phrase,
    BM25 — is servable from the incrementally maintained index through
    the same single-definition helpers as the one-pass artifacts, with
    identical results (the BM25 and phrase legs are separately
    oracle-checked; this pins the boolean connectives and prefix)."""
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        all_hits_over_postings,
        any_hits_over_postings,
        build_incremental_index,
        exclude_hits_over_postings,
        prefix_hits_over_postings,
        read_index,
    )

    root = build_incremental_index(spark, sf_small)
    postings, _stats = read_index(spark, root)
    for helper, name in [
        (all_hits_over_postings, "text_search_from_index"),
        (any_hits_over_postings, "text_search_any_from_index"),
        (exclude_hits_over_postings, "text_search_exclude_from_index"),
        (prefix_hits_over_postings, "text_search_prefix_from_index"),
    ]:
        a = sorted(map(str, helper(postings).collect()))
        b = sorted(map(str, QUERIES[name](spark, sf_small).collect()))
        assert a == b, name


def test_phrase_generalizes_to_n_terms(spark):
    """phrase_hits_over_postings(terms=(a,b,c)): the left-to-right fold
    chains adjacency — every consecutive pair within slop, count =
    distinct qualifying final-term positions. Pinned on a planted
    positional postings frame (fixture-independent), including a
    repeated-term phrase (the same posting row feeds two fold steps)."""
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        phrase_hits_over_postings,
    )

    rows = [
        # doc 1: "big order scan"      -> the trigram, once
        ("big", 1, 1, 10, [2]),
        ("order", 1, 1, 10, [3]),
        ("scan", 1, 1, 10, [4]),
        # doc 2: "big order ... scan"  -> pair ok, chain broken
        ("big", 2, 1, 10, [2]),
        ("order", 2, 1, 10, [3]),
        ("scan", 2, 1, 10, [7]),
        # doc 3: "order big scan"      -> first pair wrong order
        ("big", 3, 1, 10, [3]),
        ("order", 3, 1, 10, [2]),
        ("scan", 3, 1, 10, [4]),
        # doc 4: "big order scan big order scan" -> two sites
        ("big", 4, 2, 10, [0, 3]),
        ("order", 4, 2, 10, [1, 4]),
        ("scan", 4, 2, 10, [2, 5]),
        # doc 5: "go go go"            -> repeated-term phrase "go go"
        ("go", 5, 3, 10, [0, 1, 2]),
    ]
    postings = spark.createDataFrame(
        rows,
        "term string, doc_id bigint, tf bigint, dl bigint, "
        "positions array<int>",
    )
    tri = {
        r.doc_id: r.n_adjacent
        for r in phrase_hits_over_postings(
            postings, terms=("big", "order", "scan")
        ).collect()
    }
    assert tri == {1: 1, 4: 2}
    # slop=2 repairs doc 2? gap order->scan is 4 positions: still out
    tri2 = {
        r.doc_id: r.n_adjacent
        for r in phrase_hits_over_postings(
            postings, slop=2, terms=("big", "order", "scan")
        ).collect()
    }
    assert tri2 == {1: 1, 4: 2}
    # repeated term: "go go" ends at positions 1 and 2 -> 2 sites
    rep = {
        r.doc_id: r.n_adjacent
        for r in phrase_hits_over_postings(
            postings, terms=("go", "go")
        ).collect()
    }
    assert rep == {5: 2}


def test_trigram_phrase_matches_corpus_scan_oracle(spark, sf_small):
    """The n-term fold against ground truth: a trigram served from the
    stored positional postings equals the DuckDB corpus-scan spelling
    on the real fixture (nonempty by construction — 'big order scan'
    occurs in the sf0.001 documents)."""
    import duckdb

    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        INDEX_POSTINGS,
        build_scored_index,
        phrase_hits_over_postings,
    )

    root = build_scored_index(spark, sf_small)
    postings = spark.read.parquet(os.path.join(root, INDEX_POSTINGS))
    got = sorted(
        (r.doc_id, r.n_adjacent)
        for r in phrase_hits_over_postings(
            postings, terms=("big", "order", "scan")
        ).collect()
    )
    con = duckdb.connect()
    want = sorted(
        map(
            tuple,
            con.execute(
                r"""
        WITH toks AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '\s+',
                     ' ', 'g')), ' ') AS t
          FROM read_parquet(?)
        )
        SELECT doc_id,
               len(list_filter(range(1, len(t) - 1),
                   x -> t[x] = 'big' AND t[x+1] = 'order'
                        AND t[x+2] = 'scan')) AS n
        FROM toks
        WHERE len(list_filter(range(1, len(t) - 1),
              x -> t[x] = 'big' AND t[x+1] = 'order'
                   AND t[x+2] = 'scan')) > 0
        """,
                [os.path.join(sf_small, "documents.parquet")],
            ).fetchall(),
        )
    )
    assert got == want
    assert got  # the fixture trigram actually occurs


def test_phrase_slop_guard_refuses_nonpositive(spark):
    """slop=0 would admit shift 0 (same-position 'phrase') and slop=-1
    t2 BEFORE t1 — F.sequence auto-descends, so these were silent wrong
    results, not errors. The guard refuses them loudly."""
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        phrase_hits_over_postings,
    )

    postings = spark.createDataFrame(
        [],
        "term string, doc_id bigint, tf bigint, dl bigint, "
        "positions array<int>",
    )
    for bad in (0, -1):
        with pytest.raises(ValueError, match="slop"):
            phrase_hits_over_postings(postings, slop=bad)
    # and a 1-term "phrase" is a category error, not an empty chain
    with pytest.raises(ValueError, match="2 terms"):
        phrase_hits_over_postings(postings, terms=("solo",))


def test_q11_share_of_total_reuses_the_grouped_exchange(spark, sf_small):
    """agg_important_parts_1scan (TPC-H Q11 shape): the nation filter
    reaches the fact as a broadcast LeftSemi on the supplier-key set,
    and the grouped per-part frame feeds BOTH consumers (output rows +
    the 1-row scalar re-aggregate) through ONE exchange — the executed
    plan must show the reuse, i.e. the fact is scanned and shuffled
    exactly once, never twice for the scalar subquery side."""
    df = QUERIES["agg_important_parts_1scan"](spark, sf_small)
    p = plan_of_df(df)
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
    assert "SortMergeJoin" not in p
    assert "Python" not in p
    # the fact scan reads only the 4 needed columns
    li_scans = [
        l
        for l in p.splitlines()
        if "ReadSchema" in l and "l_extendedprice" in l
    ]
    assert li_scans and all(
        "l_shipdate" not in l and "l_orderkey" not in l for l in li_scans
    )
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed


def test_suffix_retrieval_from_reversed_dual(spark, sf_small):
    """Leading-wildcard (*g) retrieval from the reversed-term dual
    artifact (r10-bound registry entry; the corpus-scan equivalence is
    pinned HERE until then): results equal the corpus-scan spelling,
    the plan is corpus-free with the reversed-prefix predicate pushed
    as StringStartsWith into the rterm-sorted scan (a row-group range
    prune — exactly what the PRIMARY postings cannot give a leading
    wildcard), and the cached dual is reused, not rebuilt."""
    from pyspark.sql import functions as F

    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        SUFFIX_QUERY,
        build_reversed_index,
        normalized_text,
        q_search_suffix_from_index,
        words,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    df = q_search_suffix_from_index(spark, sf_small)
    docs = load_table(spark, sf_small, "documents")
    truth = (
        docs.select(
            "doc_id", F.explode(words(normalized_text("text"))).alias("term")
        )
        .where(F.col("term").endswith(SUFFIX_QUERY))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("term").cast("long").alias("n_terms_matched"),
            F.count(F.lit(1)).alias("total_tf"),
        )
    )
    assert sorted(map(str, df.collect())) == sorted(
        map(str, truth.collect())
    )
    import os

    root = build_reversed_index(spark, sf_small)
    stamp = os.path.getmtime(os.path.join(root, "postings_rev", "_SUCCESS"))
    p = plan_of_df(q_search_suffix_from_index(spark, sf_small))
    assert "documents.parquet" not in p
    assert "Python" not in p
    assert any(
        "PushedFilters" in l and "StringStartsWith(rterm" in l
        for l in p.splitlines()
    )
    assert (
        os.path.getmtime(os.path.join(root, "postings_rev", "_SUCCESS"))
        == stamp
    )


def test_fuzzy_retrieval_from_deletion_neighborhood_dual(spark, sf_small):
    """Edit-distance-1 (fuzzy) retrieval from the SymSpell-style dual
    (r10-bound registry entry; the corpus-scan levenshtein equivalence
    is pinned HERE until then): results equal the exact-levenshtein
    corpus-scan truth, the candidate probe pushes IN(variant) into the
    variant-sorted dual scan, the postings probe pushes the verified
    terms as IN(term), the plan is corpus-free, and the fuzzy query
    must actually be fuzzy (more than the exact-match term set)."""
    from pyspark.sql import functions as F

    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        FUZZY_QUERY,
        build_fuzzy_index,
        normalized_text,
        q_search_fuzzy_from_index,
        words,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    df = q_search_fuzzy_from_index(spark, sf_small)
    docs = load_table(spark, sf_small, "documents")
    terms = docs.select(
        "doc_id", F.explode(words(normalized_text("text"))).alias("term")
    )
    truth = (
        terms.where(F.levenshtein(F.col("term"), F.lit(FUZZY_QUERY)) <= 1)
        .groupBy("doc_id")
        .agg(
            F.countDistinct("term").cast("long").alias("n_terms_matched"),
            F.count(F.lit(1)).alias("total_tf"),
        )
    )
    got = sorted(map(str, df.collect()))
    assert got and got == sorted(map(str, truth.collect()))
    # genuinely fuzzy: the query itself is NOT a vocabulary term, and
    # at least one doc matches 2+ distinct fuzzy-matched terms
    vocab = {r.term for r in terms.select("term").distinct().collect()}
    assert FUZZY_QUERY not in vocab
    assert any(r.n_terms_matched >= 2 for r in df.collect())

    import os

    root = build_fuzzy_index(spark, sf_small)
    stamp = os.path.getmtime(os.path.join(root, "fuzzy", "_SUCCESS"))
    p = plan_of_df(q_search_fuzzy_from_index(spark, sf_small))
    assert "documents.parquet" not in p
    assert "Python" not in p
    assert any(
        "PushedFilters" in l and "In(term, [" in l for l in p.splitlines()
    )
    assert (
        os.path.getmtime(os.path.join(root, "fuzzy", "_SUCCESS")) == stamp
    )
