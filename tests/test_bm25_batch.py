"""Batch (fleet) BM25 serving (operators/text_analysis.py
bm25_batch_over_postings): Q queries, one plan over the stored
postings/stats artifacts — the text-side mirror of sim_knn_batch and an
r13+ registration earmark, carried with the driver's oracle gate plus
the cross-path identity and plan pins."""

from __future__ import annotations

from realtimedatapipeline_8_project_spark.operators.text_analysis import (
    BM25_FLEET,
    BM25_TOPK,
    _oracle_bm25_batch,
    bm25_batch_over_postings,
    bm25_topk_over_postings,
    build_scored_index,
    q_bm25_batch,
)

from .oracle_harness import compare, duck_connection
from .test_plans import plan_of_df


def test_bm25_batch_matches_duckdb_oracle(spark, sf_oracle):
    con = duck_connection(sf_oracle)
    try:
        df = q_bm25_batch(spark, sf_oracle)
        rows = df.collect()
        # every fleet query answers (terms exist at every sf)
        assert {r.qid for r in rows} == {qid for qid, _ in BM25_FLEET}
        assert not compare(df, con, _oracle_bm25_batch(), "text_bm25_batch")
    finally:
        con.close()


def test_bm25_batch_equals_per_query_serving(spark, sf_small):
    """Cross-path identity: the fleet answer for each qid is exactly the
    single-query serving path's answer for that query's terms — same
    artifacts, same contribution expression, same tie-break."""
    import os

    from pyspark.sql import functions as F

    root = build_scored_index(spark, sf_small)
    postings = spark.read.parquet(os.path.join(root, "postings"))
    stats = spark.read.parquet(os.path.join(root, "stats"))
    got = {}
    for r in bm25_batch_over_postings(postings, stats).collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score_micro))
    for qid, terms in BM25_FLEET:
        single = [
            (i + 1, r.doc_id, r.score_micro)
            for i, r in enumerate(
                bm25_topk_over_postings(postings, stats, terms=terms)
                .orderBy(F.desc("score_micro"), F.asc("doc_id"))
                .collect()
            )
        ]
        assert sorted(got[qid]) == sorted(single), qid


def test_bm25_batch_plan_shape(spark, sf_small):
    """Scale pins: the plan never scans the corpus (artifacts only), the
    postings scan carries ONE pushed In(term) filter holding the
    DEDUPLICATED union of fleet terms (a term shared by two queries is
    read once), and per-query top-k is a rank window bounded at
    BM25_TOPK."""
    p = plan_of_df(q_bm25_batch(spark, sf_small))
    assert "documents.parquet" not in p, p
    assert "In(term" in p, p
    all_terms = sorted({t for _, ts in BM25_FLEET for t in ts})
    i = p.index("In(term")
    seg = p[i : p.index("]", i) + 1]  # the first scan's pushed term set
    for t in all_terms:
        assert t in seg, (t, seg)
    # 'window' appears once in the pushed set though two queries use it
    assert seg.count("window") == 1, seg
    assert "Window" in p, p


def test_bm25_batch_unmatched_query_absent(spark, sf_small):
    """A fleet query whose terms miss the corpus entirely yields no rows
    for its qid (never a 0-score padding row); a query with one live
    term still answers."""
    import os

    root = build_scored_index(spark, sf_small)
    postings = spark.read.parquet(os.path.join(root, "postings"))
    stats = spark.read.parquet(os.path.join(root, "stats"))
    fleet = ((7, ("zzz_never", "qqq_never")), (8, ("dup", "zzz_never")))
    rows = bm25_batch_over_postings(postings, stats, fleet=fleet).collect()
    assert {r.qid for r in rows} == {8}
    assert all(r.rank <= BM25_TOPK for r in rows)


def test_fleet_bm25_parity_across_delete_and_compaction(
    spark, sf_small, tmp_path
):
    """VERDICT r12 #8 (stretch): the text twin of the vector side's
    fleet-probe-through-maintenance pin — fleet serving over the
    INCREMENTALLY maintained index must equal per-query serving on the
    SAME stored artifacts at every maintenance state: fresh multi-batch
    postings, after a GDPR tombstone delete (live tombstones + the
    negative stats row), and after compact_index physically purges the
    victims and folds the batch partitions. Both paths read through
    read_index, so tombstone masking and partition-layout changes must
    be invisible to the parity — the remaining untested fleet x
    maintenance interaction."""
    from pyspark.sql import functions as F

    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        batch_postings,
        compact_index,
        delete_index_docs,
        read_index,
        write_index_batch,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    root = str(tmp_path / "incr")
    for b in range(3):
        write_index_batch(
            batch_postings(docs.where(F.col("doc_id") % 3 == b)), b, root
        )

    def assert_parity():
        postings, stats = read_index(spark, root)
        got: dict[int, list] = {}
        for r in bm25_batch_over_postings(postings, stats).collect():
            got.setdefault(r.qid, []).append(
                (r.rank, r.doc_id, r.score_micro)
            )
        assert set(got) == {qid for qid, _ in BM25_FLEET}
        for qid, terms in BM25_FLEET:
            single = [
                (i + 1, r.doc_id, r.score_micro)
                for i, r in enumerate(
                    bm25_topk_over_postings(postings, stats, terms=terms)
                    .orderBy(F.desc("score_micro"), F.asc("doc_id"))
                    .collect()
                )
            ]
            assert sorted(got[qid]) == sorted(single), qid

    assert_parity()  # fresh multi-batch artifacts
    victims = docs.where(F.col("doc_id") % 7 == 3).select("doc_id")
    delete_index_docs(spark, root, victims, 3)
    postings, stats = read_index(spark, root)
    assert (
        postings.join(victims, "doc_id", "left_semi").count() == 0
    )  # tombstones mask in both serving paths
    assert_parity()  # live tombstones + negative stats row
    assert compact_index(spark, root) > 0  # physical purge + fold
    assert_parity()  # across the compaction boundary
