"""Hybrid (sparse + dense) retrieval: reciprocal-rank fusion of the two
serving surfaces the engine already maintains — BM25 top-k from the
stored scored text index and ANN top-k from the stored IVF lists — in
ONE plan (SURVEY §2.13 extension; the standard first-stage retrieval
shape of an LLM data pipeline: lexical recall + semantic recall, fused
without score calibration).

Why RRF (Cormack et al., public algorithm): BM25 micro-units and
quantized L2 distances live on incomparable scales, and any linear
score mix needs per-corpus calibration; rank fusion needs none —
``rrf = Σ_legs 1 / (K + rank_leg)`` — and is the production default in
hybrid search stacks. Scored in integer micro-units
(``round(1e6 / (K + rank))``) so the cross-engine compare stays exact
(the bm25_contrib_micro discipline; the two engines compute the same
double division on the same small integers before one round).

Scale shape: each leg is the ALREADY-PRUNED index read (BM25: pushed
IN(term) postings slices; ANN: n_probe inverted lists — never a corpus
scan), each leg's top-k is k rows, the rank windows and the full-outer
fusion join run on 2k rows total, and the final sort is k-bounded.
At 100 TB the cost is exactly the two index reads; fusion is free.
The id join assumes the pipeline's natural invariant that doc_id and
vec_id share an id space (embeddings are emitted per kept document —
the vector_ingest producer contract).

Registration earmarked for r13 (plans/registry.py): the registry is at
its 148-slot rotation capacity, so the query ships code-complete with
its oracle and waits for a funded slot; candidate retiree =
text_bm25_from_index, whose oracle (_oracle_bm25) stays live under the
registered text_bm25_maxscore per the shared-oracle precedent.

No Python UDFs; nothing leaves the JVM.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import (
    IVF_CODEBOOK,
    IVFT_PROBE_ID,
    _oracle_knn_ivf_trained,
    build_ivf_grown,
    ivf_probe,
    quantized_probe_vector,
    read_ivf_lists,
)
from .text_analysis import (
    BOOL_QUERY_TERMS,
    INDEX_POSTINGS,
    INDEX_STATS,
    _oracle_bm25,
    bm25_topk_over_postings,
    build_scored_index,
)

RRF_K = 60  # the standard reciprocal-rank-fusion constant
RRF_TOP = 10


def rrf_fuse(
    text_top: DataFrame,
    vec_top: DataFrame,
    k: int = RRF_K,
    top: int = RRF_TOP,
) -> DataFrame:
    """Fuse a BM25 leg (doc_id, score_micro) and an ANN leg
    (vec_id, dist) by reciprocal rank. Returns
    (doc_id, text_rank, vec_rank, rrf_micro) — ranks are 1-based within
    each leg, 0 when the doc appears in only one leg (a NULL would hash
    differently across engines for no semantic gain). Both legs are
    top-k frames BY CONSTRUCTION, so each leg's rank derivation is the
    broadcast-scalar shape the plan lint blesses (r13): one
    collect_list agg into a k-sized sorted array, posexplode back to
    (id, rank) — no partition-less row_number window, which the blanket
    lint forbids because it can't see the k-row bound (a corpus-scale
    input through that shape would funnel one task either way, but the
    agg spelling is explicit about the k-row materialization)."""
    t = (
        text_top.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("score_micro")).alias("neg_score"),
                        F.col("doc_id").alias("doc_id"),
                    )
                )
            ).alias("leg")
        )
        .select(F.posexplode("leg").alias("i", "s"))
        .select(
            F.col("s.doc_id").alias("doc_id"),
            (F.col("i") + 1).cast("long").alias("text_rank"),
        )
    )
    v = (
        vec_top.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("dist").alias("dist"),
                        F.col("vec_id").alias("vec_id"),
                    )
                )
            ).alias("leg")
        )
        .select(F.posexplode("leg").alias("i", "s"))
        .select(
            F.col("s.vec_id").alias("vdoc_id"),
            (F.col("i") + 1).cast("long").alias("vec_rank"),
        )
    )
    contrib = (
        lambda rank: F.when(  # noqa: E731
            rank > 0,
            F.round(F.lit(1_000_000.0) / (F.lit(k) + rank), 0).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    )
    fused = (
        t.join(v, t.doc_id == v.vdoc_id, "full_outer")
        .select(
            F.coalesce("doc_id", "vdoc_id").alias("doc_id"),
            F.coalesce("text_rank", F.lit(0)).alias("text_rank"),
            F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"),
        )
        .select(
            "doc_id",
            "text_rank",
            "vec_rank",
            (contrib(F.col("text_rank")) + contrib(F.col("vec_rank"))).alias(
                "rrf_micro"
            ),
        )
    )
    return fused.orderBy(F.desc("rrf_micro"), F.asc("doc_id")).limit(top)


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid top-10: the registered BM25 serving leg (scored index,
    BOOL_QUERY_TERMS) fused with the registered ANN serving leg (grown
    IVF lists, source-table probe vector, self-excluded) — both read
    from their STORED artifacts, fused in one plan."""
    troot = build_scored_index(spark, sf_dir)
    postings = spark.read.parquet(os.path.join(troot, INDEX_POSTINGS))
    stats = spark.read.parquet(os.path.join(troot, INDEX_STATS))
    text_top = bm25_topk_over_postings(postings, stats, BOOL_QUERY_TERMS)
    vroot = build_ivf_grown(spark, sf_dir)
    qv = quantized_probe_vector(spark, sf_dir)
    if qv is None:  # empty corpus: an empty fused answer, not a raise
        return rrf_fuse(text_top, _empty_vec_leg(spark))
    vec_top = ivf_probe(
        read_ivf_lists(spark, vroot),
        spark.read.parquet(os.path.join(vroot, IVF_CODEBOOK)),
        qv,
        exclude_id=IVFT_PROBE_ID,
    )
    return rrf_fuse(text_top, vec_top)


def _empty_vec_leg(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "vec_id bigint, dist bigint")


def _oracle_hybrid_rrf() -> str:
    """DuckDB re-derivation: the two leg oracles verbatim as subqueries
    (CTEs compose — each leg's oracle is the SAME string the registered
    leg queries are driver-checked against), ranked per leg, full-outer
    fused with the identical integer-micro RRF contribution."""
    c = f"CAST(ROUND(1000000.0 / ({RRF_K} + rnk), 0) AS BIGINT)"
    return f"""
WITH text_leg AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rnk
  FROM ({_oracle_bm25()}) bm
), text_rrf AS (
  SELECT doc_id, rnk AS text_rank, {c} AS c_text FROM text_leg
), vec_leg AS (
  SELECT vec_id,
         ROW_NUMBER() OVER (ORDER BY dist ASC, vec_id ASC) AS rnk
  FROM ({_oracle_knn_ivf_trained()}) knn
), vec_rrf AS (
  SELECT vec_id, rnk AS vec_rank, {c} AS c_vec FROM vec_leg
)
SELECT COALESCE(t.doc_id, v.vec_id) AS doc_id,
       COALESCE(t.text_rank, 0) AS text_rank,
       COALESCE(v.vec_rank, 0) AS vec_rank,
       COALESCE(t.c_text, 0) + COALESCE(v.c_vec, 0) AS rrf_micro
FROM text_rrf t FULL OUTER JOIN vec_rrf v ON t.doc_id = v.vec_id
ORDER BY rrf_micro DESC, doc_id ASC
LIMIT {RRF_TOP}
"""


# --- batch (fleet) hybrid retrieval -----------------------------------------
# Compose the two fleet serving paths: bm25_batch_over_postings (text)
# and ivf_probe_batch (vectors) fused per qid — Q hybrid queries in ONE
# plan. The natural consumer is retrieval-eval / hard-negative mining
# over a query log: per-query hybrid jobs would pay Q driver round
# trips; here every leg amortizes its index access across the fleet
# (deduplicated pushed term set; per-list fan-out only to the queries
# probing that list). Each fleet entry is (qid, terms) where qid is
# ALSO the in-corpus probe vec_id (the doc_id == vec_id id-space
# invariant; exclude_self drops the probe's own vector row).
# Registration: r13+ earmark beside hybrid_rrf_topk.

HYBRID_FLEET = (
    (0, ("dup", "window")),  # rare+common terms, corpus vector 0
    (7, ("scan", "filter", "spark")),
    (13, ("window", "hash")),
)


def rrf_fuse_batch(
    text_top: DataFrame,
    vec_top: DataFrame,
    k: int = RRF_K,
    top: int = RRF_TOP,
) -> DataFrame:
    """Fuse qid-keyed leg frames — text (qid, doc_id, score_micro,
    rank), vectors (qid, vec_id, dist, rank) — into per-query hybrid
    top-``top``. The legs' OWN 1-based per-qid ranks are reused (both
    rank with the single-fuse orderings: score desc / dist asc, id
    asc), so fusion adds no window over candidate sets — only the
    k-bounded final rank per qid."""
    t = text_top.select(
        "qid", "doc_id", F.col("rank").cast("long").alias("text_rank")
    )
    v = vec_top.select(
        F.col("qid").alias("vqid"),
        F.col("vec_id").alias("vdoc_id"),
        F.col("rank").cast("long").alias("vec_rank"),
    )
    contrib = (
        lambda rank: F.when(  # noqa: E731
            rank > 0,
            F.round(F.lit(1_000_000.0) / (F.lit(k) + rank), 0).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    )
    fused = (
        t.join(
            v,
            (t.qid == v.vqid) & (t.doc_id == v.vdoc_id),
            "full_outer",
        )
        .select(
            F.coalesce("qid", "vqid").alias("qid"),
            F.coalesce("doc_id", "vdoc_id").alias("doc_id"),
            F.coalesce("text_rank", F.lit(0)).alias("text_rank"),
            F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"),
        )
        .select(
            "qid",
            "doc_id",
            "text_rank",
            "vec_rank",
            (contrib(F.col("text_rank")) + contrib(F.col("vec_rank"))).alias(
                "rrf_micro"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    return (
        fused.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top)
        .drop("rn")
    )


def q_hybrid_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleet hybrid top-10 per query: the batch BM25 leg and the batch
    ANN leg, both from their STORED artifacts, fused in one plan."""
    from .similarity import fleet_query_frame, ivf_probe_batch
    from .text_analysis import bm25_batch_over_postings

    troot = build_scored_index(spark, sf_dir)
    postings = spark.read.parquet(os.path.join(troot, INDEX_POSTINGS))
    stats = spark.read.parquet(os.path.join(troot, INDEX_STATS))
    text = bm25_batch_over_postings(postings, stats, fleet=HYBRID_FLEET)

    vroot = build_ivf_grown(spark, sf_dir)
    qids = tuple(qid for qid, _ in HYBRID_FLEET)
    # memoized fleet vectors (VERDICT r12 #3): the per-call re-read +
    # re-quantize of the source table was the r11 breach pattern one
    # level up; the Q-row query frame is now a local relation
    queries = fleet_query_frame(spark, sf_dir, qids)
    vec = ivf_probe_batch(
        read_ivf_lists(spark, vroot),
        spark.read.parquet(os.path.join(vroot, IVF_CODEBOOK)),
        queries,
        exclude_self=True,
    )
    return rrf_fuse_batch(text, vec)


def _oracle_hybrid_batch() -> str:
    """Composed fleet oracle: per-qid text legs (the single-query BM25
    spelling, qid-tagged and ranked) full-outer fused with the batch-ANN
    oracle restricted to the hybrid fleet's qids — the same strings the
    leg paths are checked against."""
    from .similarity import _oracle_knn_batch
    from .text_analysis import _oracle_bm25

    c = f"CAST(ROUND(1000000.0 / ({RRF_K} + rnk), 0) AS BIGINT)"
    text_legs = "\nUNION ALL\n".join(
        f"""SELECT CAST({qid} AS BIGINT) AS qid, doc_id,
       ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rnk
FROM ({_oracle_bm25(terms=ts)}) tl_{qid}"""
        for qid, ts in HYBRID_FLEET
    )
    qids = tuple(qid for qid, _ in HYBRID_FLEET)
    return f"""
WITH text_leg AS (
{text_legs}
), text_rrf AS (
  SELECT qid, doc_id, rnk AS text_rank, {c} AS c_text FROM text_leg
), vec_leg AS (
  SELECT qid, vec_id, rank AS rnk FROM ({_oracle_knn_batch(qid_set=qids)}) kb
), vec_rrf AS (
  SELECT qid, vec_id, rnk AS vec_rank, {c} AS c_vec FROM vec_leg
), fused AS (
  SELECT COALESCE(t.qid, v.qid) AS qid,
         COALESCE(t.doc_id, v.vec_id) AS doc_id,
         COALESCE(t.text_rank, 0) AS text_rank,
         COALESCE(v.vec_rank, 0) AS vec_rank,
         COALESCE(t.c_text, 0) + COALESCE(v.c_vec, 0) AS rrf_micro
  FROM text_rrf t FULL OUTER JOIN vec_rrf v
    ON t.qid = v.qid AND t.doc_id = v.vec_id
)
SELECT qid, doc_id, text_rank, vec_rank, rrf_micro FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
           ORDER BY rrf_micro DESC, doc_id ASC) AS rn
  FROM fused
) WHERE rn <= {RRF_TOP}
"""


# --- filtered (policy-scoped) hybrid ----------------------------------------
# The SAME caller-supplied document policy applied to BOTH legs before
# their top-k (the doc_id == vec_id id-space invariant makes one allowed
# frame serve both): the multi-tenant / split-scoped retrieval shape.
# Filtering each leg BEFORE its top-k is load-bearing — filtering the
# fused result would silently under-return exactly like a post-top-k
# leg filter would. Ranking semantics inherit from the legs: global
# corpus stats / unchanged distances, only candidates narrow.
# r13+ earmark beside the other hybrid forms.


def q_hybrid_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid top-10 over documents with lang == BM25_FILTER_LANG: the
    filtered BM25 leg fused with the filtered ANN probe, one policy
    frame driving both."""
    from ..sources.tables import load_table
    from .text_analysis import BM25_FILTER_LANG

    troot = build_scored_index(spark, sf_dir)
    postings = spark.read.parquet(os.path.join(troot, INDEX_POSTINGS))
    stats = spark.read.parquet(os.path.join(troot, INDEX_STATS))
    allowed = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("lang") == BM25_FILTER_LANG)
        .select("doc_id")
    )
    text_top = bm25_topk_over_postings(
        postings, stats, BOOL_QUERY_TERMS, allowed=allowed
    )
    vroot = build_ivf_grown(spark, sf_dir)
    qv = quantized_probe_vector(spark, sf_dir)
    if qv is None:  # empty corpus: an empty fused answer, not a raise
        return rrf_fuse(text_top, _empty_vec_leg(spark))
    vec_top = ivf_probe(
        read_ivf_lists(spark, vroot),
        spark.read.parquet(os.path.join(vroot, IVF_CODEBOOK)),
        qv,
        exclude_id=IVFT_PROBE_ID,
        allowed=allowed.select(F.col("doc_id").alias("vec_id")),
    )
    return rrf_fuse(text_top, vec_top)


def _oracle_hybrid_filtered() -> str:
    """The unfiltered hybrid oracle with each leg's own filtered
    predicate spliced in — the same strings the filtered leg paths are
    checked against."""
    from .text_analysis import _oracle_bm25_filtered

    c = f"CAST(ROUND(1000000.0 / ({RRF_K} + rnk), 0) AS BIGINT)"
    from .similarity import _oracle_knn_ivf_trained as _knn
    from .text_analysis import BM25_FILTER_LANG

    knn_filtered = _knn(
        exclude=(
            " AND a.vec_id IN (SELECT doc_id FROM documents"
            f" WHERE lang = '{BM25_FILTER_LANG}')"
        )
    )
    return f"""
WITH text_leg AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rnk
  FROM ({_oracle_bm25_filtered()}) bm
), text_rrf AS (
  SELECT doc_id, rnk AS text_rank, {c} AS c_text FROM text_leg
), vec_leg AS (
  SELECT vec_id,
         ROW_NUMBER() OVER (ORDER BY dist ASC, vec_id ASC) AS rnk
  FROM ({knn_filtered}) knn
), vec_rrf AS (
  SELECT vec_id, rnk AS vec_rank, {c} AS c_vec FROM vec_leg
)
SELECT COALESCE(t.doc_id, v.vec_id) AS doc_id,
       COALESCE(t.text_rank, 0) AS text_rank,
       COALESCE(v.vec_rank, 0) AS vec_rank,
       COALESCE(t.c_text, 0) + COALESCE(v.c_vec, 0) AS rrf_micro
FROM text_rrf t FULL OUTER JOIN vec_rrf v ON t.doc_id = v.vec_id
ORDER BY rrf_micro DESC, doc_id ASC
LIMIT {RRF_TOP}
"""


# Registered r13: hybrid_rrf_topk (slot funded by retiring
# text_bm25_from_index). Registered r15 per the recorded drain: the
# fleet form hybrid_rrf_batch, funded by retiring hybrid_rrf_topk —
# the fleet form reads the SAME two leg artifacts with a strictly
# larger surface, and per-qid identity vs the single-query hybrid is
# machine-pinned in tests/test_hybrid.py (the retiree's entry stays
# here for that pin; plans/registry.py filters it via _RETIRED). The
# filtered form is permanent-tier (oracle-gated by
# tests/test_filtered_retrieval.py + the generic earmark parity gate).
QUERIES = {
    "hybrid_rrf_topk": (q_hybrid_rrf, _oracle_hybrid_rrf()),
    "hybrid_rrf_batch": (q_hybrid_batch, _oracle_hybrid_batch()),
}

EARMARKS = {
    "hybrid_rrf_filtered": (q_hybrid_filtered, _oracle_hybrid_filtered()),
}
