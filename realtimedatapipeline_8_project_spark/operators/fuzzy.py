"""Fuzzy / sparse-vector matching operators (SURVEY §2.13 extension —
the string-similarity half of the dedup family: dedup.py covers
set-similarity (MinHash/SimHash/Jaccard), this module covers edit
distance and sparse TF cosine).

* ``fuzzy_name_match`` — catalog-entity resolution: candidate pairs via a
  blocking key (shared last token), verified with exact Levenshtein
  distance. The standard blocked fuzzy-join shape: the cross product is
  never materialized, only within-block pairs.
* ``sparse_doc_cosine`` — top-k documents most similar to a probe
  document by cosine over word-bigram TF vectors, through an
  inverted-index (posting-list) join — sparse retrieval, the
  sparse-vector complement of the dense-embedding kNN operators
  (similarity.py).

Scale notes: fuzzy matching shuffles only (block_key, name) for distinct
names — never the fact table; block-key cardinality controls skew (a
production variant adds a second char-gram block). Sparse retrieval
touches only the postings of the probe's grams (broadcast), so work is
sum-of-df over probe grams — linear in corpus growth, independent of
corpus^2. Integer TF dot products are exact in any reduction order; only
the final norm division is floating point, done identically in both
engines (functions/exact.fround).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import fround, oracle_fround
from ..sources.tables import load_table

# --- blocked Levenshtein name matching ------------------------------------

LEV_MAX = 2
# Length-band width for the conjunctive second block key. Must be > 4 so
# the +/-LEV_MAX expansion below spans at most TWO distinct bands.
BAND_W = 6


def blocked_name_pairs(names: DataFrame, name_col: str = "p_name") -> DataFrame:
    """(name_a, name_b, dist) pairs with Levenshtein <= LEV_MAX from a
    distinct-name catalog, via conjunctive (last token, length band)
    blocking.

    The length band bounds block population WITHOUT losing recall:
    Levenshtein(a,b) <= 2 implies |len(a)-len(b)| <= 2, so the a-side
    emits the bands of len-2, len, len+2 (at most 2 distinct values
    since BAND_W > 4 — they cover every band intersecting
    [len-2, len+2]) while the b-side keeps only its own band; any true
    pair therefore meets in exactly one (token, band) block (recall
    pinned exactly vs brute force in tests/test_functions.py). Block
    population is divided by the catalog's length spread instead of
    being the whole per-token vocabulary — the O(B^2) verify step scales
    with (names per token per 6-char length band)^2, and the a-side
    expansion is a fixed <=2x row factor on the tiny distinct-name
    table, not on facts."""
    keyed = names.select(F.col(name_col).alias("_n")).withColumn(
        "tok", F.element_at(F.split("_n", " "), -1)
    ).withColumn("ln", F.length("_n"))
    bands = F.array_distinct(
        F.array(
            F.expr(f"(ln - {LEV_MAX}) div {BAND_W}"),
            F.expr(f"ln div {BAND_W}"),
            F.expr(f"(ln + {LEV_MAX}) div {BAND_W}"),
        )
    )
    a = keyed.select(
        F.col("_n").alias("name_a"), "tok", F.explode(bands).alias("band")
    )
    b = keyed.select(
        F.col("_n").alias("name_b"),
        "tok",
        F.expr(f"ln div {BAND_W}").alias("band"),
    )
    return (
        a.join(b, ["tok", "band"])
        .where(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .where(F.col("dist") <= LEV_MAX)
    )


def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names: block on (last token, length band),
    verify with Levenshtein <= 2. Distinct-name catalog first, so the
    join is over entities, not rows. See :func:`blocked_name_pairs`."""
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    return blocked_name_pairs(names)


ORACLE_FUZZY_NAME = f"""
WITH names AS (
  SELECT DISTINCT p_name,
         string_split(p_name, ' ')[-1] AS tok,
         length(p_name) AS ln
  FROM part
), a AS (
  SELECT p_name AS name_a, tok,
         unnest(list_distinct([(ln - {LEV_MAX}) // {BAND_W},
                               ln // {BAND_W},
                               (ln + {LEV_MAX}) // {BAND_W}])) AS band
  FROM names
), b AS (
  SELECT p_name AS name_b, tok, ln // {BAND_W} AS band FROM names
)
SELECT a.name_a, b.name_b, levenshtein(a.name_a, b.name_b) AS dist
FROM a JOIN b ON a.tok = b.tok AND a.band = b.band AND a.name_a < b.name_b
WHERE levenshtein(a.name_a, b.name_b) <= {LEV_MAX}
"""


# --- sparse TF-cosine retrieval via inverted index ------------------------

PROBE_DOC = 0
TOP_DOCS = 20


def _bigram_tf(docs: DataFrame) -> DataFrame:
    """(doc_id, gram, tf) over word bigrams — the sparse feature table.

    Shifted-slice ``zip_with`` keeps gram construction linear in document
    length (index-based ``transform`` + ``element_at`` re-evaluates the
    ``split`` per element — O(len^2) per doc, the dedup.shingles pitfall)."""
    toks = F.split(F.lower("text"), " ")
    glen = F.greatest(F.size(toks) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, glen),
        F.slice(toks, 2, glen),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def q_sparse_doc_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents most similar to a probe document by cosine over
    word-bigram term frequencies — sparse retrieval through an inverted
    index. Only postings for the probe's grams are touched (the candidate
    set is bounded by sum of those grams' document frequencies, never by
    corpus^2 — an ALL-pairs sparse join is quadratic on any corpus whose
    features aren't rare, so pairwise text near-dup stays with the
    MinHash/SimHash banding family in dedup.py). Dot products are exact
    integer sums; norms are integer sums under one sqrt; both engines
    divide the same bits."""
    docs = load_table(spark, sf_dir, "documents")
    # probe branch reads ONE document (doc_id filter reaches the scan)
    probe_tf = _bigram_tf(docs.where(F.col("doc_id") == PROBE_DOC)).select(
        "gram", F.col("tf").alias("ptf")
    )
    probe_norm = probe_tf.agg(
        F.sqrt(F.sum(F.col("ptf") * F.col("ptf")).cast("double")).alias(
            "probe_norm"
        )
    )
    # ONE corpus pass: dot against the broadcast probe vector and the
    # document's own norm^2 come out of the same per-doc aggregation
    # (left join keeps non-shared grams contributing to the norm)
    tf = _bigram_tf(docs.where(F.col("doc_id") != PROBE_DOC))
    scored = (
        tf.join(F.broadcast(probe_tf), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.coalesce("ptf", F.lit(0)))
            .cast("long")
            .alias("dot"),
            F.sum(F.col("tf") * F.col("tf")).cast("long").alias("norm_sq"),
        )
        .where(F.col("dot") > 0)  # candidates: >=1 shared gram
    )
    return (
        scored.crossJoin(F.broadcast(probe_norm))
        .select(
            "doc_id",
            "dot",
            fround(
                F.col("dot").cast("double")
                / (F.sqrt(F.col("norm_sq").cast("double")) * F.col("probe_norm")),
                8,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(TOP_DOCS)
    )


_COS = oracle_fround(
    "CAST(s.dot AS DOUBLE) / (sqrt(CAST(s.norm_sq AS DOUBLE)) * p.probe_norm)", 8
)

ORACLE_SPARSE_COSINE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)),
           i -> t[i] || ' ' || t[i + 1])) AS gram
  FROM toks WHERE len(t) >= 2
), tf AS (
  SELECT doc_id, gram, COUNT(*) AS tf FROM grams GROUP BY doc_id, gram
), probe_tf AS (
  SELECT gram, tf AS ptf FROM tf WHERE doc_id = {PROBE_DOC}
), probe_norm AS (
  SELECT sqrt(CAST(SUM(ptf * ptf) AS DOUBLE)) AS probe_norm FROM probe_tf
), scored AS (
  -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT (int128); the driver's
  -- value-hash canonicalizes HUGEINT differently from Spark's LongType,
  -- so pin both engines to 64-bit (see ORACLE_SHARD_PLAN precedent).
  SELECT t.doc_id,
         CAST(SUM(t.tf * COALESCE(p.ptf, 0)) AS BIGINT) AS dot,
         CAST(SUM(t.tf * t.tf) AS BIGINT) AS norm_sq
  FROM tf t LEFT JOIN probe_tf p USING (gram)
  WHERE t.doc_id <> {PROBE_DOC}
  GROUP BY t.doc_id
)
SELECT s.doc_id, s.dot, {_COS} AS cosine
FROM scored s CROSS JOIN probe_norm p
WHERE s.dot > 0
ORDER BY cosine DESC, doc_id ASC
LIMIT {TOP_DOCS}
"""


QUERIES = {
    "fuzzy_name_match": (q_fuzzy_name_match, ORACLE_FUZZY_NAME),
    "sparse_doc_cosine": (q_sparse_doc_cosine, ORACLE_SPARSE_COSINE),
}
