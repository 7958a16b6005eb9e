"""Benchmark-contamination scan over ``documents`` (north-star
LLM-data-pipeline surface; companion to the dedup family in
``dedup.py``).

Training corpora must be screened for evaluation-set leakage: any
document sharing a substantial n-gram overlap with a benchmark document
inflates downstream eval scores (the standard GPT-3/PaLM-style
"13-gram overlap" decontamination, here word 3-grams to suit the short
fixture docs). The benchmark set is *tiny* relative to the corpus —
megabytes against 100 TB — which dictates the scale shape:

1. build the distinct benchmark n-gram set once (a few million rows),
2. broadcast it and hash-join the *exploded* corpus grams against it —
   the broadcast hash table is built once per partition and probed per
   gram (the row-local ``array_intersect``-against-a-broadcast-array
   alternative rebuilds a hash set of the whole benchmark per corpus
   row: measured 8x slower at sf0.1 and quadratic-feeling at real
   benchmark sizes),
3. partial-aggregated groupBy(doc_id) — the shuffle carries one small
   row per document per map partition, never gram strings.

The probe set here is every 97th document (a stand-in benchmark). The
oracle replays the identical shingle + intersect logic in DuckDB. A
production variant would hash shingles (``xxhash64``) to cut the
broadcast to 8 bytes/gram — kept as strings here so the op stays
oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import fround, oracle_fround
from ..sources.tables import load_table
from .dedup import oracle_shingles, shingles

PROBE_MOD = 97  # doc_id % PROBE_MOD == 0 plays the benchmark set
CONTAM_FRAC = 0.5  # flag when half a doc's distinct grams appear in the probe


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", shingles("text").alias("sh"))
    probe_grams = (
        sh.where(F.col("doc_id") % PROBE_MOD == 0)
        .select(F.explode("sh").alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # shingles() is distinct per doc, so sum(hit) == |sh ∩ probe|
    grams = sh.where(F.col("doc_id") % PROBE_MOD != 0).select(
        "doc_id", F.size("sh").alias("n_grams"), F.explode_outer("sh").alias("g")
    )
    agg = (
        grams.join(F.broadcast(probe_grams), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_overlap"),
        )
    )
    frac = F.when(
        F.col("n_grams") > 0,
        fround(F.col("n_overlap") / F.col("n_grams").cast("double"), 6),
    )
    return agg.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_overlap").cast("long").alias("n_overlap"),
        frac.alias("contam_frac"),
        (frac >= CONTAM_FRAC).alias("is_contaminated"),
    )


_O_FRAC = oracle_fround(
    "len(list_intersect(s, pg)) / CAST(len(s) AS DOUBLE)", 6
)

ORACLE_CONTAMINATION = f"""
WITH sh AS (
  SELECT doc_id, {oracle_shingles('text')} AS s FROM documents
), probe AS (
  SELECT list_distinct(flatten(list(s))) AS pg
  FROM sh WHERE doc_id % {PROBE_MOD} = 0
)
SELECT doc_id,
       len(s) AS n_grams,
       len(list_intersect(s, pg)) AS n_overlap,
       CASE WHEN len(s) > 0 THEN {_O_FRAC} END AS contam_frac,
       CASE WHEN len(s) > 0 THEN ({_O_FRAC}) >= {CONTAM_FRAC} END
         AS is_contaminated
FROM sh, probe
WHERE doc_id % {PROBE_MOD} <> 0
"""


QUERIES = {
    "contamination_ngram_overlap": (q_contamination, ORACLE_CONTAMINATION),
}
