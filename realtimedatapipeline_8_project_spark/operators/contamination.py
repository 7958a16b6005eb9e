"""Benchmark-contamination scan over ``documents`` (north-star
LLM-data-pipeline surface; companion to the dedup family in
``dedup.py``).

Training corpora must be screened for evaluation-set leakage: any
document sharing a substantial n-gram overlap with a benchmark document
inflates downstream eval scores (the standard GPT-3/PaLM-style
"13-gram overlap" decontamination, here word 3-grams to suit the short
fixture docs). The benchmark set is *tiny* relative to the corpus —
megabytes against 100 TB — which dictates the scale shape:

1. build the distinct benchmark n-gram set once (a few million strings),
2. broadcast it as a single array cell to every executor,
3. one map-only pass over the corpus computing per-document overlap
   (``array_intersect`` against the broadcast set) — no shuffle of
   corpus rows at all, and the scan stays whole-stage-codegen.

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
    probe = (
        sh.where(F.col("doc_id") % PROBE_MOD == 0)
        .select(F.explode("sh").alias("g"))
        .agg(F.array_sort(F.collect_set("g")).alias("probe_grams"))
    )
    n_grams = F.size("sh")
    n_overlap = F.size(F.array_intersect("sh", "probe_grams"))
    frac = fround(n_overlap / n_grams.cast("double"), 6)
    return (
        sh.where(F.col("doc_id") % PROBE_MOD != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "doc_id",
            n_grams.cast("long").alias("n_grams"),
            n_overlap.cast("long").alias("n_overlap"),
            frac.alias("contam_frac"),
            (frac >= CONTAM_FRAC).alias("is_contaminated"),
        )
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
       {_O_FRAC} AS contam_frac,
       ({_O_FRAC}) >= {CONTAM_FRAC} AS is_contaminated
FROM sh, probe
WHERE doc_id % {PROBE_MOD} <> 0
"""


QUERIES = {
    "contamination_ngram_overlap": (q_contamination, ORACLE_CONTAMINATION),
}
