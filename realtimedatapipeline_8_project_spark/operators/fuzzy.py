"""Fuzzy / sparse-vector matching operators (SURVEY §2.13 extension —
the string-similarity half of the dedup family: dedup.py covers
set-similarity (MinHash/SimHash/Jaccard), this module covers edit
distance and sparse TF cosine).

* ``fuzzy_name_match`` — catalog-entity resolution: candidate pairs via a
  blocking key (shared last token), verified with exact Levenshtein
  distance. The standard blocked fuzzy-join shape: the cross product is
  never materialized, only within-block pairs.
* ``sparse_doc_cosine`` — document-pair cosine over word-bigram TF
  vectors through an inverted-index (posting-list) self-join — the
  sparse-vector complement of the dense-embedding near-dup operator
  (similarity.py). Stop-gram pruning drops grams whose document frequency
  exceeds a fraction of the corpus, which both removes uninformative
  features and bounds posting-list length (the quadratic term at scale).

Scale notes: fuzzy matching shuffles only (block_key, name) for distinct
names — never the fact table; block-key cardinality controls skew (a
production variant adds a second char-gram block). The sparse cosine
shuffles (gram, doc_id, tf) postings; with df <= f*N pruning the per-gram
pair fan-out is bounded by (f*N)^2 — the knob that keeps the plan alive
at 100x corpus growth. Integer TF dot products are exact in any
reduction order; only the final norm division is floating point, done
identically in both engines (functions/exact.fround).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import fround, oracle_fround
from ..sources.tables import load_table

# --- blocked Levenshtein name matching ------------------------------------

LEV_MAX = 2


def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names: block on the last token (the product
    noun), verify with Levenshtein <= 2. Distinct-name catalog first, so
    the join is over entities, not rows."""
    names = (
        load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("block", F.element_at(F.split("p_name", " "), -1))
    )
    a = names.select(F.col("p_name").alias("name_a"), "block")
    b = names.select(F.col("p_name").alias("name_b"), "block")
    return (
        a.join(b, "block")
        .where(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .where(F.col("dist") <= LEV_MAX)
    )


ORACLE_FUZZY_NAME = f"""
WITH names AS (
  SELECT DISTINCT p_name,
         string_split(p_name, ' ')[-1] AS block
  FROM part
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS dist
FROM names a JOIN names b ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {LEV_MAX}
"""


# --- sparse TF-cosine via inverted index ----------------------------------

DF_MAX_FRACTION = 0.2  # stop-gram cutoff: drop grams present in >20% of docs
TOP_PAIRS = 20


def q_sparse_doc_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most similar document pairs by cosine over word-bigram term
    frequencies. Candidates come from an inverted-index self-join (pairs
    must share >= 1 surviving gram); dot products are exact integer sums,
    norms exact integer sums under a sqrt — bit-stable in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    n_tok = F.size(toks)
    grams = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tok - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tf = (
        docs.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_tbl = (
        tf.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("df") <= F.col("n_docs") * F.lit(DF_MAX_FRACTION))
        .select("gram")
    )
    pruned = tf.join(df_tbl, "gram")
    norms = pruned.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf")).cast("double")).alias("norm")
    )
    lhs = pruned.select(
        "gram", F.col("doc_id").alias("id_a"), F.col("tf").alias("tf_a")
    )
    rhs = pruned.select(
        "gram", F.col("doc_id").alias("id_b"), F.col("tf").alias("tf_b")
    )
    dots = (
        lhs.join(rhs, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("norm").alias("norm_b"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            fround(
                F.col("dot").cast("double") / (F.col("norm_a") * F.col("norm_b")),
                8,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id_a"), F.asc("id_b"))
        .limit(TOP_PAIRS)
    )


_COS = oracle_fround("CAST(d.dot AS DOUBLE) / (na.norm * nb.norm)", 8)

ORACLE_SPARSE_COSINE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)),
           i -> t[i] || ' ' || t[i + 1])) AS gram
  FROM toks WHERE len(t) >= 2
), tf AS (
  SELECT doc_id, gram, COUNT(*) AS tf FROM grams GROUP BY doc_id, gram
), keep AS (
  SELECT gram FROM tf GROUP BY gram
  HAVING COUNT(*) <= (SELECT COUNT(*) FROM documents) * {DF_MAX_FRACTION}
), pruned AS (
  SELECT tf.* FROM tf JOIN keep USING (gram)
), norms AS (
  SELECT doc_id, sqrt(CAST(SUM(tf * tf) AS DOUBLE)) AS norm
  FROM pruned GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.tf * b.tf) AS dot
  FROM pruned a JOIN pruned b
    ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d.id_a, d.id_b, {_COS} AS cosine
FROM dots d
JOIN norms na ON na.doc_id = d.id_a
JOIN norms nb ON nb.doc_id = d.id_b
ORDER BY cosine DESC, d.id_a ASC, d.id_b ASC
LIMIT {TOP_PAIRS}
"""


QUERIES = {
    "fuzzy_name_match": (q_fuzzy_name_match, ORACLE_FUZZY_NAME),
    "sparse_doc_cosine": (q_sparse_doc_cosine, ORACLE_SPARSE_COSINE),
}
