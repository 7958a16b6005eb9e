"""Quality checks for the approximate similarity operators: the ANN
variants must actually retrieve most of the exact top-k (recall), and the
latest-wins/minhash operators must honor their invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.plans.registry import QUERIES


def test_ivf_recall_vs_bruteforce(spark, sf_small):
    exact = {r.vec_id for r in QUERIES["sim_knn_bruteforce"](spark, sf_small).collect()}
    approx = {r.vec_id for r in QUERIES["sim_knn_ivf"](spark, sf_small).collect()}
    assert len(approx) > 0
    # probe-limited IVF over random vectors: require non-trivial overlap
    assert len(exact & approx) >= 3, (exact, approx)


def test_lsh_results_subset_of_corpus_and_sorted(spark, sf_small):
    rows = QUERIES["sim_knn_lsh"](spark, sf_small).collect()
    sims = [r.cosine for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_minhash_pairs_are_verified_neardups(spark, sf_small):
    rows = QUERIES["dedup_minhash_neardup"](spark, sf_small).collect()
    assert all(r.jaccard >= 0.5 for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)


def test_embedding_neardup_threshold(spark, sf_small):
    rows = QUERIES["sim_embedding_neardup"](spark, sf_small).collect()
    assert all(r.cosine >= 0.95 for r in rows)
