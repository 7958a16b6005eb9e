"""Every boolean connective serves from the incrementally maintained
index through the SAME frame-level helper as the one-pass artifact —
the single-definition discipline means read_index's merged,
tombstone-aware postings slot straight in. This pins the symmetry on a
planted index through appends and deletes: helper(read_index(...)) ==
helper(one-pass postings over the surviving docs) for AND / OR /
AND-NOT / prefix / suffix-agg / BM25."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators.text_analysis import (
    all_hits_over_postings,
    any_hits_over_postings,
    batch_postings,
    bm25_topk_over_postings,
    delete_index_docs,
    exclude_hits_over_postings,
    prefix_hits_over_postings,
    read_index,
    write_index_batch,
)


def _docs(spark, n=90):
    rows = []
    for i in range(n):
        toks = ["dup"] if i % 3 == 0 else ["walk"]
        toks += ["window"] if i % 2 == 0 else ["slow"]
        toks += ["scan"] if i % 5 == 0 else ["pad"]
        toks += [f"s{i % 7}", "tail"]
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _assert_connectives_match(spark, idx, kept_docs):
    merged, mstats = read_index(spark, idx)
    once = batch_postings(kept_docs)
    ostats = once.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("tf").alias("total_dl"),
    )
    for name, helper in (
        ("and", all_hits_over_postings),
        ("or", any_hits_over_postings),
        ("andnot", exclude_hits_over_postings),
        ("prefix", prefix_hits_over_postings),
    ):
        a = sorted(map(str, helper(merged).collect()))
        b = sorted(map(str, helper(once).collect()))
        assert a == b and a, name
    a = sorted(map(str, bm25_topk_over_postings(merged, mstats).collect()))
    b = sorted(map(str, bm25_topk_over_postings(once, ostats).collect()))
    assert a == b and a


def test_connectives_over_incremental_index_with_deletes(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    for b in range(3):
        write_index_batch(
            batch_postings(docs.where(F.col("doc_id") % 3 == b)), b, idx
        )
    _assert_connectives_match(spark, idx, docs)
    # delete docs that matched every connective (0 % 3 == 0 hits AND;
    # prefix/BM25 hit everything) — the tombstone-aware read must keep
    # every connective equal to a one-pass over the SURVIVORS
    victims = [0, 30, 7]
    delete_index_docs(
        spark,
        idx,
        spark.createDataFrame([(v,) for v in victims], "doc_id long"),
        3,
    )
    _assert_connectives_match(
        spark, idx, docs.where(~F.col("doc_id").isin(victims))
    )
