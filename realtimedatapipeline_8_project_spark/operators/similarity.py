"""Similarity search over ``embeddings`` (SURVEY §2.13; north-star ANN).

* Brute-force top-k cosine: broadcast the probe vector, score every row
  with JVM-side higher-order functions (zip_with/aggregate), then
  TakeOrderedAndProject for the top-k — fully distributed single pass,
  the correctness baseline.
* LSH-bucketed variant (scale path): deterministic sign-bit sketch over a
  subset of dimensions buckets the vectors; only the probe's bucket (and
  neighbors at Hamming distance 1) are scored — prunes ~(1 - (d+1)/2^b)
  of the corpus per query at the cost of recall; rows-only check.

No Python UDFs; nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, oracle_cosine
from ..sources.tables import load_table

PROBE_VEC_ID = 0
TOP_K = 10
N_SKETCH_BITS = 8


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.where(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("probe_emb")
    )
    scored = (
        emb.crossJoin(F.broadcast(probe))
        .where(F.col("vec_id") != PROBE_VEC_ID)
        .select(
            "vec_id",
            "label",
            F.round(cosine_similarity("embedding", "probe_emb"), 8).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(TOP_K)


ORACLE_KNN_BRUTEFORCE = f"""
WITH probe AS (
  SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = {PROBE_VEC_ID}
)
SELECT vec_id, label,
       ROUND({oracle_cosine('embedding', 'probe_emb')}, 8) AS cosine
FROM embeddings, probe
WHERE vec_id <> {PROBE_VEC_ID}
ORDER BY cosine DESC, vec_id ASC
LIMIT {TOP_K}
"""


def sign_sketch(emb: Column | str, n_bits: int = N_SKETCH_BITS) -> Column:
    """Deterministic LSH bucket: sign bits of the first n dimensions packed
    into an int. (A production variant uses random-hyperplane projections;
    deterministic dimension signs keep it seed-free and testable.)"""
    e = F.col(emb) if isinstance(emb, str) else emb
    bits = F.transform(
        F.sequence(F.lit(1), F.lit(n_bits)),
        lambda i: F.when(F.element_at(e, i.cast("int")) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    # fold: acc*2 + bit — avoids variable-distance shifts
    return F.aggregate(bits, F.lit(0), lambda acc, b: acc * 2 + b)


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: score only vectors whose sign-sketch bucket is within
    Hamming distance 1 of the probe's bucket. Rows-only check (approximate
    by construction; brute-force query is the exact baseline)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", sign_sketch("embedding")
    )
    probe = emb.where(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("probe_emb"), F.col("bucket").alias("probe_bucket")
    )
    hamming = F.bit_count(
        F.col("bucket").bitwiseXOR(F.col("probe_bucket")).cast("long")
    )
    return (
        emb.crossJoin(F.broadcast(probe))
        .where(F.col("vec_id") != PROBE_VEC_ID)
        .where(hamming <= 1)
        .select(
            "vec_id",
            "label",
            F.round(cosine_similarity("embedding", "probe_emb"), 8).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding norms — exercises higher-order array math with an
    exact oracle (norm computed with the same in-order fold)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    norm = F.sqrt(F.aggregate(sq, F.lit(0.0), lambda a, x: a + x))
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("norm").cast("decimal(27,6)")), 2)
            .cast("double")
            .alias("sum_norm"),
        )
    )


ORACLE_EMBEDDING_STATS = """
WITH t AS (
  SELECT label,
         sqrt(list_reduce(
             list_prepend(0.0, list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             (acc, x) -> acc + x)) AS norm
  FROM embeddings
)
SELECT label, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(norm AS DECIMAL(27,6))), 2) AS DOUBLE) AS sum_norm
FROM t
GROUP BY label
"""


QUERIES = {
    "sim_knn_bruteforce": (q_knn_bruteforce, ORACLE_KNN_BRUTEFORCE),
    "sim_knn_lsh": (q_knn_lsh, None),
    "sim_embedding_stats": (q_embedding_stats, ORACLE_EMBEDDING_STATS),
}
