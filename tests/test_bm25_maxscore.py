"""Max-score-pruned BM25 from the stored scored index (VERDICT r10 #2):
bm25_maxscore_topk must return the EXACT same ranking as the unpruned
serving path while reading strictly fewer posting rows when a query term
is skewed (stop-word-ish df). The planted fixture makes the pruning
decision deterministic: two rare high-impact terms + one term present in
every document."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators.text_analysis import (
    BM25_TOPK,
    batch_postings,
    bm25_maxscore_incremental,
    bm25_maxscore_topk,
    bm25_topk_over_postings,
    build_scored_index,
    compact_index,
    delete_index_docs,
    read_index,
    read_term_stats,
    write_index_batch,
    write_scored_index,
)
from realtimedatapipeline_8_project_spark.plans.registry import QUERIES

from .test_plans import plan_of_df

TERMS = ("rarekind", "rareword", "common")


def _rows(df):
    return [(r.doc_id, r.score_micro) for r in df.collect()]


def _planted(spark, tmp_path, n_docs=400):
    """400 docs, every one containing 'common' (df = n_docs); doc_id
    0-14 contain 'rarekind' (df 15 >= k, so theta > 0), 15-29 contain
    'rareword'. tf and dl vary with doc_id so scores are distinct-ish
    and the (max_tf, min_dl) bound is exercised off the corner."""
    rows = []
    for i in range(n_docs):
        toks = ["common"] * (1 + i % 3) + ["filler"] * (i % 7)
        if i < 15:
            toks += ["rarekind"] * (1 + i % 2)
        elif i < 30:
            toks += ["rareword"] * (1 + i % 2)
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    root = str(tmp_path / "scored")
    write_scored_index(docs, root)
    return root


def test_maxscore_prunes_skewed_term_and_matches_full(spark, tmp_path):
    root = _planted(spark, tmp_path)
    postings = spark.read.parquet(os.path.join(root, "postings"))
    stats = spark.read.parquet(os.path.join(root, "stats"))
    diag = {}
    got = [
        (r.doc_id, r.score_micro)
        for r in bm25_maxscore_topk(spark, root, TERMS, diag).collect()
    ]
    want = [
        (r.doc_id, r.score_micro)
        for r in bm25_topk_over_postings(postings, stats, TERMS).collect()
    ]
    assert got == want and len(got) == BM25_TOPK
    # the skewed term was pruned; the rare terms stayed essential
    assert diag["pruned"] == ["common"], diag
    assert sorted(diag["essential"]) == ["rarekind", "rareword"]
    assert diag["theta"] > diag["ub"]["common"]
    # rows-read pin: essential postings read fully + the skewed term's
    # postings read only for the essential candidates — strictly fewer
    # than the full path's postings of all three terms
    cands = {
        r.doc_id
        for r in postings.where(
            F.col("term").isin(*diag["essential"])
        ).select("doc_id").collect()
    }
    rows_full = postings.where(F.col("term").isin(*TERMS)).count()
    rows_pruned = postings.where(
        F.col("term").isin(*diag["essential"])
    ).count() + postings.where(
        (F.col("term") == "common")
        & F.col("doc_id").isin([int(c) for c in cands])
    ).count()
    assert rows_pruned < rows_full, (rows_pruned, rows_full)
    # and the candidate restriction reaches the parquet scan: the
    # skewed term's postings scan carries a pushed In(doc_id, ...)
    p = plan_of_df(bm25_maxscore_topk(spark, root, TERMS))
    assert "In(doc_id" in p, p


def test_maxscore_theta_zero_degrades_to_full_scoring(spark, tmp_path):
    """Seed df < k => theta = 0 => nothing prunable; the answer still
    equals the unpruned path (the degenerate-input contract)."""
    rows = [
        (i, ("alpha " if i < 4 else "") + ("beta " if i % 2 else "") + "pad")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    root = str(tmp_path / "scored")
    write_scored_index(docs, root)
    terms = ("alpha", "beta")
    diag = {}
    got = [
        (r.doc_id, r.score_micro)
        for r in bm25_maxscore_topk(spark, root, terms, diag).collect()
    ]
    postings = spark.read.parquet(os.path.join(root, "postings"))
    stats = spark.read.parquet(os.path.join(root, "stats"))
    want = [
        (r.doc_id, r.score_micro)
        for r in bm25_topk_over_postings(postings, stats, terms).collect()
    ]
    assert got == want
    assert diag["pruned"] == [] and diag["theta"] == 0


def test_maxscore_absent_terms_and_empty_result(spark, tmp_path):
    root = _planted(spark, tmp_path, n_docs=50)
    # an absent term contributes nothing; all-absent returns empty
    got = bm25_maxscore_topk(
        spark, root, ("rarekind", "nosuchterm")
    ).collect()
    postings = spark.read.parquet(os.path.join(root, "postings"))
    stats = spark.read.parquet(os.path.join(root, "stats"))
    want = bm25_topk_over_postings(
        postings, stats, ("rarekind", "nosuchterm")
    ).collect()
    assert [(r.doc_id, r.score_micro) for r in got] == [
        (r.doc_id, r.score_micro) for r in want
    ]
    assert bm25_maxscore_topk(spark, root, ("nosuchterm",)).count() == 0


def test_registered_maxscore_equals_from_index(spark, sf_small):
    """text_bm25_maxscore (fixture terms, fixture corpus) must equal
    text_bm25_from_index row-for-row — they share the DuckDB oracle.
    from_index is registry-retired r13 (slot funded hybrid_rrf_topk)
    and maxscore itself r15 (slot funds text_bm25_batch), so this pin
    via the MODULE registry — which keeps retirees — is part of what
    keeps both retirements honest."""
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        QUERIES as _TAQ,
    )

    a = [
        (r.doc_id, r.score_micro)
        for r in _TAQ["text_bm25_maxscore"][0](spark, sf_small).collect()
    ]
    b = [
        (r.doc_id, r.score_micro)
        for r in _TAQ["text_bm25_from_index"][0](spark, sf_small).collect()
    ]
    assert a == b and len(a) == BM25_TOPK


def test_registered_maxscore_incremental_equals_unpruned(spark, sf_small):
    """The r13-registered text_bm25_maxscore_incremental must equal the
    (registry-retired) unpruned incremental serving row-for-row on the
    fixture artifacts — the equality battery that keeps
    text_bm25_incremental's retirement honest, at the registered-query
    level (the planted-fixture batteries above pin the pruning core)."""
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        QUERIES as _TAQ,
    )

    a = [
        (r.doc_id, r.score_micro)
        for r in QUERIES["text_bm25_maxscore_incremental"](
            spark, sf_small
        ).collect()
    ]
    b = [
        (r.doc_id, r.score_micro)
        for r in _TAQ["text_bm25_incremental"][0](spark, sf_small).collect()
    ]
    assert a == b and len(a) == BM25_TOPK


def _planted_docs(spark, n_docs=400):
    rows = []
    for i in range(n_docs):
        toks = ["common"] * (1 + i % 3) + ["filler"] * (i % 7)
        if i < 15:
            toks += ["rarekind"] * (1 + i % 2)
        elif i < 30:
            toks += ["rareword"] * (1 + i % 2)
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_maxscore_through_delete_and_compaction(
    spark, tmp_path
):
    """The 'at build/compaction' half of VERDICT r10 #2 on the
    incrementally maintained index: per-batch bounds merge exactly and
    prune while clean; live tombstones make the bounds untrusted
    (stored df over-counts -> idf under-estimates -> the UNSAFE
    direction) so serving silently falls back to unpruned; compaction
    physically purges, sweeps the tombstones, RECOMPUTES the compacted
    bounds, and pruning re-enables — exact at every stage."""
    docs = _planted_docs(spark)
    idx = str(tmp_path / "incr")
    for b in range(3):
        write_index_batch(
            batch_postings(docs.where(F.col("doc_id") % 3 == b)), b, idx
        )
    # clean index: bounds merge across batches, skewed term prunes
    diag = {}
    got = _rows(bm25_maxscore_incremental(spark, idx, TERMS, diag))
    postings, stats = read_index(spark, idx)
    want = _rows(bm25_topk_over_postings(postings, stats, TERMS))
    assert got == want and diag["pruned"] == ["common"]
    # merged bounds == exact recompute over the live postings
    merged = {
        r.term: (r.df, r.max_tf, r.min_dl)
        for r in read_term_stats(spark, idx)
        .where(F.col("term").isin(*TERMS))
        .collect()
    }
    exact = {
        r.term: (r.df, r.max_tf, r.min_dl)
        for r in postings.where(F.col("term").isin(*TERMS))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.max("tf").alias("max_tf"),
            F.min("dl").alias("min_dl"),
        )
        .collect()
    }
    assert merged == exact
    # delete two rarekind docs: tombstones live -> fallback, still exact
    delete_index_docs(
        spark,
        idx,
        spark.createDataFrame([(0,), (3,)], "doc_id long"),
        3,
    )
    assert read_term_stats(spark, idx) is None
    diag = {}
    got = _rows(bm25_maxscore_incremental(spark, idx, TERMS, diag))
    assert diag.get("fallback") == "bounds_unavailable"
    postings, stats = read_index(spark, idx)  # tombstone-aware
    assert got == _rows(bm25_topk_over_postings(postings, stats, TERMS))
    # compaction purges + sweeps + realigns: pruning re-enables, bounds
    # exact over the SURVIVING corpus
    compact_index(spark, idx, keep_last=0)
    assert read_term_stats(spark, idx) is not None
    diag = {}
    got = _rows(bm25_maxscore_incremental(spark, idx, TERMS, diag))
    assert "fallback" not in diag and diag["pruned"] == ["common"]
    postings, stats = read_index(spark, idx)
    assert got == _rows(bm25_topk_over_postings(postings, stats, TERMS))
    merged = {
        r.term: (r.df, r.max_tf, r.min_dl)
        for r in read_term_stats(spark, idx)
        .where(F.col("term").isin(*TERMS))
        .collect()
    }
    assert merged["rarekind"][0] == exact["rarekind"][0] - 2  # df shrank


def test_term_stats_partition_mismatch_falls_back_then_heals(
    spark, tmp_path
):
    """The crash window between a postings install and the term_stats
    re-alignment leaves the partition sets disagreeing: bounds must
    read as unavailable (serve unpruned, never prune on stale bounds)
    and the next compaction must heal the artifact."""
    import shutil

    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        INDEX_TERM_STATS,
    )

    docs = _planted_docs(spark, n_docs=90)
    idx = str(tmp_path / "incr")
    for b in range(3):
        write_index_batch(
            batch_postings(docs.where(F.col("doc_id") % 3 == b)), b, idx
        )
    # simulate the mismatch: one batch's bounds partition missing
    shutil.rmtree(os.path.join(idx, INDEX_TERM_STATS, "batch_id=1"))
    assert read_term_stats(spark, idx) is None
    diag = {}
    got = _rows(bm25_maxscore_incremental(spark, idx, TERMS, diag))
    assert diag.get("fallback") == "bounds_unavailable"
    postings, stats = read_index(spark, idx)
    assert got == _rows(bm25_topk_over_postings(postings, stats, TERMS))
    # compaction absorbs every postings batch and recomputes the
    # compacted bounds from them — consistent again
    compact_index(spark, idx, keep_last=0)
    ts = read_term_stats(spark, idx)
    assert ts is not None
    got = _rows(bm25_maxscore_incremental(spark, idx, TERMS))
    postings, stats = read_index(spark, idx)
    assert got == _rows(bm25_topk_over_postings(postings, stats, TERMS))


def test_maxscore_equals_full_scoring_on_random_corpora(
    spark, tmp_path
):
    """Property: on arbitrary small corpora and arbitrary query-term
    subsets (skewed, rare, absent, single-term, dl-varied), the pruned
    path's top-k equals the unpruned path's EXACTLY — the bound, theta
    seeding, strict-inequality prefix selection, and tie handling can
    never change a ranking. Hypothesis-shaped but deterministic
    exploration: a fixed battery of adversarial corpora (one shared
    Spark index build per corpus, many query sets each) to keep runtime
    sane — ties are planted deliberately (identical docs => identical
    scores => doc_id tie-breaks at the k boundary)."""
    corpora = {
        # skew + two rarities + planted exact ties (docs 50/51/52
        # identical => equal scores at the k boundary)
        "skew": [
            (
                i,
                " ".join(
                    ["the"] * (1 + i % 4)
                    + (["rare"] if i % 11 == 0 else [])
                    + (["mid"] if i % 3 == 0 else [])
                    + ["pad"] * (i % 5)
                ),
            )
            for i in range(50)
        ]
        + [(50, "the rare mid"), (51, "the rare mid"), (52, "the rare mid")],
        # every doc identical: all scores tie, theta == every score
        "allsame": [(i, "the rare pad") for i in range(15)],
        # tiny corpus below k: theta must stay 0, no pruning
        "tiny": [(i, "the rare") for i in range(4)],
    }
    queries = [
        ("the",),
        ("rare",),
        ("rare", "the"),
        ("mid", "the", "rare"),
        ("absentterm", "the"),
        ("absentterm",),
    ]
    for cname, rows in corpora.items():
        root = str(tmp_path / f"prop_{cname}")
        write_scored_index(
            spark.createDataFrame(rows, "doc_id long, text string"), root
        )
        postings = spark.read.parquet(os.path.join(root, "postings"))
        stats = spark.read.parquet(os.path.join(root, "stats"))
        for terms in queries:
            got = _rows(bm25_maxscore_topk(spark, root, terms))
            want = _rows(bm25_topk_over_postings(postings, stats, terms))
            assert got == want, (cname, terms, got, want)


def test_scored_index_cache_without_term_stats_rebuilds(
    spark, sf_small, tmp_path, monkeypatch
):
    """A pre-r11 cached scored index (no term_stats/) must rebuild, not
    serve a maxscore query a missing artifact."""
    import shutil

    import realtimedatapipeline_8_project_spark.operators.text_analysis as TA

    legacy = str(tmp_path / "legacy")
    monkeypatch.setattr(TA, "scored_index_path", lambda s, d: legacy)
    root = build_scored_index(spark, sf_small)
    assert root == legacy
    shutil.rmtree(os.path.join(legacy, "term_stats"))
    root = build_scored_index(spark, sf_small)
    assert os.path.isdir(os.path.join(root, "term_stats"))


def test_maxscore_essential_skew_fallback_is_not_force_broadcast(
    spark, tmp_path
):
    """VERDICT r11 #4 'done' clause: when the SKEWED term is itself
    essential (here: corpus-scale df but a high (max_tf, min_dl) bound)
    while a low-bound moderate-df decoy is the pruned term, the
    candidate set is corpus-scale (> MAXSCORE_IN_LIMIT), and the
    >4096-candidate semi-join leg must run WITHOUT a forced broadcast —
    the essential doc_id set is unbounded above, so the join side is
    AQE's call, never a hint (a forced broadcast here is a
    driver/executor OOM at 100 TB). The answer must still equal the
    unpruned path exactly."""
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        MAXSCORE_IN_LIMIT,
    )

    rows = []
    # 4500 docs with the skewed term at tf=1, dl=6 ...
    for i in range(4500):
        rows.append((i, "mega " + " ".join(["filler"] * 5)))
    # ... plus ONE doc with tf=40 (dl 41): bound combines max_tf=40
    # with min_dl=6 — loose but exact, and high enough to keep the
    # skewed term essential
    rows.append((4500, " ".join(["mega"] * 40 + ["filler"])))
    # 600 uniform seed docs: the highest-bound term; theta = its own
    # (k-th best = every) contribution
    for i in range(4501, 5101):
        rows.append((i, "rarekind " + " ".join(["filler"] * 15)))
    # 600 decoy docs, long (dl 40): low bound, moderate df — the
    # pruned term
    for i in range(5101, 5701):
        rows.append((i, "decoy " + " ".join(["filler"] * 39)))
    # 3000 pure-filler docs keep the skewed term's idf meaningful
    for i in range(5701, 8701):
        rows.append((i, " ".join(["filler"] * 6)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    root = str(tmp_path / "scored")
    write_scored_index(docs, root)

    terms = ("rarekind", "mega", "decoy")
    diag = {}
    df = bm25_maxscore_topk(spark, root, terms, diag)
    got = _rows(df)
    # the planted shape held: skewed term essential, decoy pruned
    assert diag["pruned"] == ["decoy"], diag
    assert sorted(diag["essential"]) == ["mega", "rarekind"], diag
    # and the candidate set genuinely overflows the In() push-down
    postings = spark.read.parquet(os.path.join(root, "postings"))
    n_cand = (
        postings.where(F.col("term").isin(*diag["essential"]))
        .select("doc_id")
        .distinct()
        .count()
    )
    assert n_cand > MAXSCORE_IN_LIMIT, n_cand
    # exactness: identical to the unpruned serving path
    stats = spark.read.parquet(os.path.join(root, "stats"))
    assert got == _rows(bm25_topk_over_postings(postings, stats, terms))
    # the fallback semi-join carries NO broadcast hint (AQE decides);
    # the only hints in the plan are the 1-row corpus-stats cross joins
    op = df._jdf.queryExecution().optimizedPlan().toString()
    semi = [l for l in op.splitlines() if "LeftSemi" in l]
    assert semi, op  # the fallback leg was actually taken
    assert all("strategy=broadcast" not in l for l in semi), op
