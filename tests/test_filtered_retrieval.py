"""Filtered (policy-scoped) retrieval: the BM25 twin of the filtered
vector probe and the hybrid composition applying one document policy to
both legs — r13+ registration earmarks, carried with the driver's oracle
gate plus the semantics pins the oracle alone can't isolate."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators.hybrid import (
    _oracle_hybrid_filtered,
    q_hybrid_filtered,
)
from realtimedatapipeline_8_project_spark.operators.text_analysis import (
    BM25_FILTER_LANG,
    _oracle_bm25_filtered,
    bm25_topk_over_postings,
    q_bm25_filtered_lang,
)
from realtimedatapipeline_8_project_spark.sources.tables import load_table

from .oracle_harness import compare, duck_connection


def _allowed_ids(spark, sf_dir):
    return {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("lang") == BM25_FILTER_LANG)
        .select("doc_id")
        .collect()
    }


def test_bm25_filtered_matches_duckdb_oracle(spark, sf_oracle):
    con = duck_connection(sf_oracle)
    try:
        df = q_bm25_filtered_lang(spark, sf_oracle)
        rows = df.collect()
        assert rows  # the policy slice answers, not an empty hash match
        allowed = _allowed_ids(spark, sf_oracle)
        assert all(r.doc_id in allowed for r in rows)
        assert not compare(df, con, _oracle_bm25_filtered(), "bm25_filtered")
    finally:
        con.close()


def test_bm25_filter_keeps_global_stats(spark):
    """The load-bearing semantics pin: filtering narrows CANDIDATES but
    never a doc's score — df/stats stay corpus-global. Planted corpus
    where a filter-before-df implementation would change idf (df 2 -> 1)
    and thus the score."""
    postings = spark.createDataFrame(
        [("dup", 1, 1, 10), ("dup", 2, 1, 10)],
        "term string, doc_id long, tf long, dl long",
    )
    stats = spark.createDataFrame([(2, 20)], "n_docs long, total_dl long")
    allowed = spark.createDataFrame([(1,)], "doc_id long")
    full = {
        r.doc_id: r.score_micro
        for r in bm25_topk_over_postings(
            postings, stats, terms=("dup",)
        ).collect()
    }
    filt = {
        r.doc_id: r.score_micro
        for r in bm25_topk_over_postings(
            postings, stats, terms=("dup",), allowed=allowed
        ).collect()
    }
    assert set(filt) == {1}  # candidates narrowed
    assert filt[1] == full[1]  # score unchanged: global df


def test_bm25_filtered_empty_policy(spark, sf_small):
    """An empty allowed frame serves an empty result, not a raise."""
    import os

    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        INDEX_POSTINGS,
        INDEX_STATS,
        build_scored_index,
    )

    root = build_scored_index(spark, sf_small)
    postings = spark.read.parquet(os.path.join(root, INDEX_POSTINGS))
    stats = spark.read.parquet(os.path.join(root, INDEX_STATS))
    empty = spark.createDataFrame([], "doc_id long")
    assert (
        bm25_topk_over_postings(postings, stats, allowed=empty).count() == 0
    )


def test_hybrid_filtered_matches_duckdb_oracle(spark, sf_oracle):
    con = duck_connection(sf_oracle)
    try:
        df = q_hybrid_filtered(spark, sf_oracle)
        rows = df.collect()
        assert rows
        allowed = _allowed_ids(spark, sf_oracle)
        # one policy frame scopes BOTH legs: every fused doc is allowed
        assert all(r.doc_id in allowed for r in rows)
        assert not compare(
            df, con, _oracle_hybrid_filtered(), "hybrid_rrf_filtered"
        )
    finally:
        con.close()


def test_fleet_filtered_equals_per_query_filtered(spark, sf_small):
    """One policy frame scoping a FLEET: batch BM25, batch ANN, and
    their fusion under `allowed` must equal the per-query filtered
    pipelines — the filtered x fleet cell of the serving matrix."""
    import os

    from realtimedatapipeline_8_project_spark.operators.hybrid import (
        HYBRID_FLEET,
        rrf_fuse,
        rrf_fuse_batch,
    )
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVF_CODEBOOK,
        _km_quantize,
        build_ivf_grown,
        ivf_probe,
        ivf_probe_batch,
        read_ivf_lists,
    )
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        INDEX_POSTINGS,
        INDEX_STATS,
        bm25_batch_over_postings,
        build_scored_index,
    )

    troot = build_scored_index(spark, sf_small)
    postings = spark.read.parquet(os.path.join(troot, INDEX_POSTINGS))
    stats = spark.read.parquet(os.path.join(troot, INDEX_STATS))
    vroot = build_ivf_grown(spark, sf_small)
    lists = read_ivf_lists(spark, vroot)
    cents = spark.read.parquet(os.path.join(vroot, IVF_CODEBOOK))

    docs = load_table(spark, sf_small, "documents")
    allowed = docs.where(F.col("lang") == BM25_FILTER_LANG).select("doc_id")
    allowed_vec = allowed.select(F.col("doc_id").alias("vec_id"))
    allowed_ids = {r.doc_id for r in allowed.collect()}

    qids = tuple(qid for qid, _ in HYBRID_FLEET)
    emb = _km_quantize(load_table(spark, sf_small, "embeddings"))
    qsrc = {
        r.vec_id: list(r.qv)
        for r in emb.where(F.col("vec_id").isin(*qids)).collect()
    }
    queries = spark.createDataFrame(
        [(q, qsrc[q]) for q in qids], "qid long, qv array<bigint>"
    )

    text_fleet = bm25_batch_over_postings(
        postings, stats, fleet=HYBRID_FLEET, allowed=allowed
    )
    vec_fleet = ivf_probe_batch(
        lists, cents, queries, exclude_self=True, allowed=allowed_vec
    )
    fused = rrf_fuse_batch(text_fleet, vec_fleet)
    got = {}
    for r in fused.collect():
        assert r.doc_id in allowed_ids, r
        got.setdefault(r.qid, set()).add(
            (r.doc_id, r.text_rank, r.vec_rank, r.rrf_micro)
        )
    for qid, terms in HYBRID_FLEET:
        single = rrf_fuse(
            bm25_topk_over_postings(
                postings, stats, terms=terms, allowed=allowed
            ),
            ivf_probe(
                lists, cents, qsrc[qid], exclude_id=qid, allowed=allowed_vec
            ),
        )
        want = {
            (r.doc_id, r.text_rank, r.vec_rank, r.rrf_micro)
            for r in single.collect()
        }
        assert got[qid] == want, qid
