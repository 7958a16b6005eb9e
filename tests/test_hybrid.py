"""Hybrid sparse+dense retrieval (operators/hybrid.py): reciprocal-rank
fusion of the stored-index BM25 leg and the stored-IVF ANN leg — the r13
registration candidate, carried here with the same oracle gate the
driver would run."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 (planted frames)

from realtimedatapipeline_8_project_spark.operators.hybrid import (
    RRF_K,
    RRF_TOP,
    _oracle_hybrid_rrf,
    q_hybrid_rrf,
    rrf_fuse,
)

from .test_plans import plan_of_df


def _c(rank: int) -> int:
    return round(1_000_000.0 / (RRF_K + rank))


def test_rrf_fuse_planted_frames(spark):
    """Fusion math on planted legs: a doc in BOTH legs sums both
    contributions; single-leg docs carry rank 0 on the other leg; ties
    on rrf_micro break by doc_id; top is bounded."""
    text = spark.createDataFrame(
        [(10, 900), (11, 800), (12, 700)], "doc_id long, score_micro long"
    )
    vec = spark.createDataFrame(
        [(11, 5), (13, 6), (14, 7)], "vec_id long, dist long"
    )
    rows = {
        r.doc_id: (r.text_rank, r.vec_rank, r.rrf_micro)
        for r in rrf_fuse(text, vec).collect()
    }
    assert rows[11] == (2, 1, _c(2) + _c(1))  # in both legs
    assert rows[10] == (1, 0, _c(1))
    assert rows[13] == (0, 2, _c(2))
    # equal-rank singletons tie on rrf_micro -> doc_id ascending order
    got = [r.doc_id for r in rrf_fuse(text, vec).collect()]
    assert got.index(12) < got.index(14)  # both rank-3 singletons
    assert rows[12][2] == rows[14][2] == _c(3)
    # top bound respected
    assert len(got) == min(5, RRF_TOP)


def test_hybrid_query_matches_duckdb_oracle(spark, sf_oracle):
    """q_hybrid_rrf against its composed DuckDB oracle at the driver's
    scale — both leg oracles are the exact strings the registered leg
    queries are driver-checked against."""
    from .oracle_harness import compare, duck_connection

    con = duck_connection(sf_oracle)
    try:
        df = q_hybrid_rrf(spark, sf_oracle)
        assert df.count() == RRF_TOP
        assert not compare(df, con, _oracle_hybrid_rrf(), "hybrid_rrf")
    finally:
        con.close()


def test_hybrid_plan_reads_only_stored_artifacts(spark, sf_small):
    """Serving-cost pin: the fused plan touches ONLY the two stored
    artifacts — no documents corpus scan (the BM25 leg reads postings)
    and no embeddings source scan (the ANN leg reads the lists; the
    probe vector is the memoized point lookup, not a plan node)."""
    p = plan_of_df(q_hybrid_rrf(spark, sf_small))
    assert "documents.parquet" not in p, p
    assert "embeddings.parquet" not in p, p
    # both legs present: pushed term IN-filter + the lists artifact
    assert "postings" in p and "lists" in p, p


def test_hybrid_empty_corpus_contract(spark, tmp_path):
    """The empty-input contract (ingest F3 discipline) extends to the
    fused query: an empty documents+embeddings fixture serves an empty
    (doc_id, text_rank, vec_rank, rrf_micro) frame, not a raise."""
    import os

    from realtimedatapipeline_8_project_spark.sources.tables import (
        load_table,
    )

    empty_sf = str(tmp_path / "empty")
    os.makedirs(empty_sf)
    for t in ("documents", "embeddings"):
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.parquet(
            os.path.join(empty_sf, f"{t}.parquet")
        )
    out = q_hybrid_rrf(spark, empty_sf)
    assert out.columns == ["doc_id", "text_rank", "vec_rank", "rrf_micro"]
    assert out.count() == 0


# --- batch (fleet) hybrid ----------------------------------------------------


def test_rrf_fuse_batch_planted_frames(spark):
    """Fleet fusion math on planted qid-keyed legs: contributions sum
    within a qid, never across qids (the same doc under two qids fuses
    independently), single-leg docs carry rank 0, per-qid top bound."""
    from realtimedatapipeline_8_project_spark.operators.hybrid import (
        rrf_fuse_batch,
    )

    text = spark.createDataFrame(
        [(1, 10, 900, 1), (1, 11, 800, 2), (2, 10, 700, 1)],
        "qid long, doc_id long, score_micro long, rank long",
    )
    vec = spark.createDataFrame(
        [(1, 11, 5, 1), (2, 13, 6, 1)],
        "qid long, vec_id long, dist long, rank long",
    )
    rows = {
        (r.qid, r.doc_id): (r.text_rank, r.vec_rank, r.rrf_micro)
        for r in rrf_fuse_batch(text, vec).collect()
    }
    assert rows[(1, 11)] == (2, 1, _c(2) + _c(1))  # both legs, qid 1
    assert rows[(1, 10)] == (1, 0, _c(1))  # text-only in qid 1
    assert rows[(2, 10)] == (1, 0, _c(1))  # same doc, independent qid
    assert rows[(2, 13)] == (0, 1, _c(1))  # vec-only in qid 2
    assert len(rows) == 4


def test_hybrid_batch_matches_duckdb_oracle(spark, sf_oracle):
    from realtimedatapipeline_8_project_spark.operators.hybrid import (
        HYBRID_FLEET,
        _oracle_hybrid_batch,
        q_hybrid_batch,
    )

    from .oracle_harness import compare, duck_connection

    con = duck_connection(sf_oracle)
    try:
        df = q_hybrid_batch(spark, sf_oracle)
        rows = df.collect()
        assert {r.qid for r in rows} == {qid for qid, _ in HYBRID_FLEET}
        assert not compare(df, con, _oracle_hybrid_batch(), "hybrid_rrf_batch")
    finally:
        con.close()


def test_hybrid_batch_equals_per_query_hybrid(spark, sf_small):
    """Cross-path identity: each fleet qid's fused answer equals the
    single-query hybrid pipeline run with that qid's terms and probe
    vector over the same stored artifacts."""
    import os

    from pyspark.sql import functions as F2

    from realtimedatapipeline_8_project_spark.operators.hybrid import (
        HYBRID_FLEET,
        q_hybrid_batch,
        rrf_fuse,
    )
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVF_CODEBOOK,
        _km_quantize,
        build_ivf_grown,
        ivf_probe,
        read_ivf_lists,
    )
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        INDEX_POSTINGS,
        INDEX_STATS,
        bm25_topk_over_postings,
        build_scored_index,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    got = {}
    for r in q_hybrid_batch(spark, sf_small).collect():
        got.setdefault(r.qid, set()).add(
            (r.doc_id, r.text_rank, r.vec_rank, r.rrf_micro)
        )

    troot = build_scored_index(spark, sf_small)
    postings = spark.read.parquet(os.path.join(troot, INDEX_POSTINGS))
    stats = spark.read.parquet(os.path.join(troot, INDEX_STATS))
    vroot = build_ivf_grown(spark, sf_small)
    lists = read_ivf_lists(spark, vroot)
    cents = spark.read.parquet(os.path.join(vroot, IVF_CODEBOOK))
    emb = _km_quantize(load_table(spark, sf_small, "embeddings"))
    for qid, terms in HYBRID_FLEET:
        qv = [
            r.qv for r in emb.where(F2.col("vec_id") == qid).collect()
        ][0]
        single = rrf_fuse(
            bm25_topk_over_postings(postings, stats, terms=terms),
            ivf_probe(lists, cents, qv, exclude_id=qid),
        )
        want = {
            (r.doc_id, r.text_rank, r.vec_rank, r.rrf_micro)
            for r in single.collect()
        }
        assert got[qid] == want, qid


def test_hybrid_batch_plan_artifacts_only(spark, sf_small):
    """The fleet plan reads the two stored artifacts plus a pushed
    In(vec_id) point read of the query vectors — never a documents
    scan, never an unfiltered embeddings scan."""
    from realtimedatapipeline_8_project_spark.operators.hybrid import (
        q_hybrid_batch,
    )

    p = plan_of_df(q_hybrid_batch(spark, sf_small))
    assert "documents.parquet" not in p, p
    assert "postings" in p and "lists" in p, p
    if "embeddings.parquet" in p:  # the fleet-probe point read
        assert "In(vec_id" in p, p


def test_hybrid_batch_empty_corpus_contract(spark, tmp_path):
    """Empty-input contract for the fleet paths: an empty
    documents+embeddings fixture serves empty qid-keyed frames (batch
    BM25, batch hybrid), not a raise."""
    import os

    from realtimedatapipeline_8_project_spark.operators.hybrid import (
        q_hybrid_batch,
    )
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        q_bm25_batch,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    empty_sf = str(tmp_path / "empty")
    os.makedirs(empty_sf)
    for t in ("documents", "embeddings"):
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.parquet(
            os.path.join(empty_sf, f"{t}.parquet")
        )
    bb = q_bm25_batch(spark, empty_sf)
    assert bb.columns == ["qid", "doc_id", "score_micro", "rank"]
    assert bb.count() == 0
    hb = q_hybrid_batch(spark, empty_sf)
    assert hb.columns == ["qid", "doc_id", "text_rank", "vec_rank", "rrf_micro"]
    assert hb.count() == 0


def test_hybrid_batch_over_maintained_artifacts(spark, sf_small, tmp_path):
    """The fleet hybrid serves from the STREAMING-MAINTAINED artifacts,
    not just the one-pass builds: text = incremental index batches + a
    GDPR tombstone delete + physical compaction; vectors = the ingest
    loop across an auto-compaction fold and a drift-retrain. Per-qid
    fusion must equal the single-query hybrid pipeline on the same
    artifacts, and tombstoned docs must never surface a text
    contribution."""
    import os

    from pyspark.sql import functions as F2

    from realtimedatapipeline_8_project_spark.operators.hybrid import (
        HYBRID_FLEET,
        rrf_fuse,
        rrf_fuse_batch,
    )
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVF_CODEBOOK,
        _km_quantize,
        ivf_probe,
        ivf_probe_batch,
        read_ivf_lists,
    )
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        batch_postings,
        bm25_batch_over_postings,
        bm25_topk_over_postings,
        compact_index,
        delete_index_docs,
        read_index,
        write_index_batch,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table
    from realtimedatapipeline_8_project_spark.streaming.vector_ingest import (
        vector_ingest_batch,
    )

    # --- text: incremental batches -> tombstone delete -> compaction
    troot = str(tmp_path / "text_idx")
    docs = load_table(spark, sf_small, "documents")
    for b in range(3):
        write_index_batch(
            batch_postings(docs.where(F2.col("doc_id") % 3 == b)), b, troot
        )
    victims = docs.where(F2.col("doc_id") % 11 == 5).select("doc_id")
    victim_ids = {r.doc_id for r in victims.collect()}
    assert victim_ids  # the delete is non-trivial
    delete_index_docs(spark, troot, victims, 3)
    assert compact_index(spark, troot) > 0  # physical purge happened
    postings, stats = read_index(spark, troot)

    # --- vectors: ingest loop with a fold and a drift retrain
    vroot = str(tmp_path / "ivf")
    emb = load_table(spark, sf_small, "embeddings")
    for b in range(3):
        vector_ingest_batch(
            emb.where(F2.col("vec_id") % 3 == b),
            b,
            vroot,
            compact_every=2,
            retrain_on_drift=True,
        )
    lists = read_ivf_lists(spark, vroot)
    cents = spark.read.parquet(os.path.join(vroot, IVF_CODEBOOK))

    # --- fleet fusion over the maintained artifacts
    qids = tuple(qid for qid, _ in HYBRID_FLEET)
    qsrc = {
        r.vec_id: list(r.qv)
        for r in _km_quantize(emb).where(F2.col("vec_id").isin(*qids)).collect()
    }
    queries = spark.createDataFrame(
        [(q, qsrc[q]) for q in qids], "qid long, qv array<bigint>"
    )
    fused = rrf_fuse_batch(
        bm25_batch_over_postings(postings, stats, fleet=HYBRID_FLEET),
        ivf_probe_batch(lists, cents, queries, exclude_self=True),
    )
    got = {}
    for r in fused.collect():
        assert not (r.text_rank > 0 and r.doc_id in victim_ids), r
        got.setdefault(r.qid, set()).add(
            (r.doc_id, r.text_rank, r.vec_rank, r.rrf_micro)
        )

    # --- per-qid single-query pipeline on the SAME artifacts
    for qid, terms in HYBRID_FLEET:
        single = rrf_fuse(
            bm25_topk_over_postings(postings, stats, terms=terms),
            ivf_probe(lists, cents, qsrc[qid], exclude_id=qid),
        )
        want = {
            (r.doc_id, r.text_rank, r.vec_rank, r.rrf_micro)
            for r in single.collect()
        }
        assert got[qid] == want, qid
