"""Training-data curation operators (SURVEY §2.13; north-star
LLM-data-pipeline surface): PII redaction, near-duplicate survivor
selection, and percentile-based quality gating.

These are the steps between "candidate pairs found" and "training shard
written": scrub personally-identifying strings, pick one canonical
document per duplicate cluster, and drop outlier documents outside the
quality envelope. Everything is JVM built-ins (regexp/percentile/joins) —
the corpus never crosses into Python — and each query has an exact DuckDB
oracle mirror.

Scale notes (100 TB): PII redaction is map-only (no shuffle); survivor
selection reuses the connected-components labels (edge-list sized, tiny
vs the corpus) and joins them back to the corpus on its key — one shuffle
of (id, cluster) pairs, never document bodies; the quality gate is a
two-pass scan where pass one reduces to a single broadcast row of
thresholds, so the fact table is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

# Redaction patterns — ASCII-only constructs (char classes, \d, \b, bounded
# repeats) that parse and match identically under Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def with_injected_pii(docs: DataFrame) -> DataFrame:
    """The synthetic corpus carries no PII, so the operator would be
    vacuous on raw fixtures. Deterministically prepend a contact line
    derived from (doc_id, n_chars) — email, US-style phone, IPv4 — so the
    redactor has real work; the oracle replays the same construction."""
    d = F.col("doc_id")
    n = F.col("n_chars")
    return docs.withColumn(
        "raw",
        F.concat(
            F.lit("contact user"),
            d.cast("string"),
            F.lit("@mail"),
            (d % 10).cast("string"),
            F.lit(".com or call 555-"),
            F.lpad((d % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((n % 10000).cast("string"), 4, "0"),
            F.lit(" from 10.0."),
            (d % 256).cast("string"),
            F.lit("."),
            (n % 256).cast("string"),
            F.lit(" "),
            F.col("text"),
        ),
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count and mask emails / phones / IPv4s. Counts come from the raw
    string; masking applies email -> phone -> IP in a fixed order (the
    patterns are disjoint on this corpus, but a fixed order keeps the
    output well-defined if they ever overlap). Map-only: redaction of a
    100 TB corpus is a single scan-project stage with zero shuffles."""
    docs = with_injected_pii(load_table(spark, sf_dir, "documents"))
    raw = F.col("raw")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_IPV4,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(raw, F.lit(PII_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(raw, F.lit(PII_PHONE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(raw, F.lit(PII_IPV4), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        redacted.alias("redacted"),
    )


_ORACLE_RAW = """
SELECT doc_id, n_chars, text,
       'contact user' || CAST(doc_id AS VARCHAR)
       || '@mail' || CAST(doc_id % 10 AS VARCHAR)
       || '.com or call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
       || '-' || lpad(CAST(n_chars % 10000 AS VARCHAR), 4, '0')
       || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
       || '.' || CAST(n_chars % 256 AS VARCHAR)
       || ' ' || text AS raw
FROM documents
"""

# DuckDB regexp_replace is first-match unless the 'g' flag is passed;
# Spark's is always global — the flag keeps the two aligned.
ORACLE_PII_REDACT = rf"""
WITH raw AS ({_ORACLE_RAW})
SELECT doc_id,
       len(regexp_extract_all(raw, '{PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(raw, '{PII_PHONE}')) AS n_phones,
       len(regexp_extract_all(raw, '{PII_IPV4}')) AS n_ips,
       regexp_replace(regexp_replace(regexp_replace(raw,
           '{PII_EMAIL}', '<EMAIL>', 'g'),
           '{PII_PHONE}', '<PHONE>', 'g'),
           '{PII_IPV4}', '<IP>', 'g') AS redacted
FROM raw
"""


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One canonical vector per near-dup cluster: every corpus id tagged
    with its cluster (component min-id; singletons are their own cluster)
    and whether it is the kept representative. Because the component label
    IS the minimum member id, `kept = (vec_id == cluster_id)` — no second
    window/aggregation pass is needed."""
    from .dedup import connected_components
    from .similarity import (
        NEARDUP_COPY_EVERY,
        NEARDUP_ID_OFFSET,
        q_embedding_neardup,
    )

    base = load_table(spark, sf_dir, "embeddings").select("vec_id")
    corpus_ids = base.unionByName(
        base.where(F.col("vec_id") % NEARDUP_COPY_EVERY == 0).select(
            (F.col("vec_id") + NEARDUP_ID_OFFSET).alias("vec_id")
        )
    )
    pairs = q_embedding_neardup(spark, sf_dir).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components(pairs).select(
        F.col("id").alias("vec_id"), F.col("comp").alias("component_id")
    )
    cluster = F.coalesce(F.col("component_id"), F.col("vec_id"))
    return corpus_ids.join(comp, "vec_id", "left").select(
        "vec_id",
        cluster.alias("cluster_id"),
        (F.col("vec_id") == cluster).alias("kept"),
    )


def _oracle_dedup_survivors() -> str:
    from .similarity import (
        NEARDUP_COPY_EVERY,
        NEARDUP_ID_OFFSET,
        ORACLE_EMBEDDING_NEARDUP,
    )

    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({ORACLE_EMBEDDING_NEARDUP}) t
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
), reach AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
), comp AS (
  SELECT id, MIN(r) AS component_id FROM reach GROUP BY id
), corpus_ids AS (
  SELECT vec_id FROM embeddings
  UNION ALL
  SELECT vec_id + {NEARDUP_ID_OFFSET} FROM embeddings
  WHERE vec_id % {NEARDUP_COPY_EVERY} = 0
)
SELECT c.vec_id,
       COALESCE(k.component_id, c.vec_id) AS cluster_id,
       c.vec_id = COALESCE(k.component_id, c.vec_id) AS kept
FROM corpus_ids c LEFT JOIN comp k ON k.id = c.vec_id
"""


# Quality gate: keep documents inside the [p05, p95] length envelope.
# Exact interpolated percentiles (Spark `percentile` == DuckDB
# `quantile_cont`, both linear interpolation — the agg_percentiles
# precedent). Two scans of the corpus, but pass one reduces to ONE row
# that is broadcast; the fact table is never shuffled or collected.
GATE_LO, GATE_HI = 0.05, 0.95


def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    thresholds = docs.agg(
        F.expr(f"percentile(n_chars, {GATE_LO})").alias("lo_chars"),
        F.expr(f"percentile(n_chars, {GATE_HI})").alias("hi_chars"),
    )
    return (
        docs.crossJoin(F.broadcast(thresholds))
        .where(
            (F.col("n_chars") >= F.col("lo_chars"))
            & (F.col("n_chars") <= F.col("hi_chars"))
        )
        .select("doc_id", "n_chars", "lo_chars", "hi_chars")
    )


ORACLE_QUALITY_GATE = f"""
WITH thresholds AS (
  SELECT quantile_cont(n_chars, {GATE_LO}) AS lo_chars,
         quantile_cont(n_chars, {GATE_HI}) AS hi_chars
  FROM documents
)
SELECT d.doc_id, d.n_chars, t.lo_chars, t.hi_chars
FROM documents d CROSS JOIN thresholds t
WHERE d.n_chars >= t.lo_chars AND d.n_chars <= t.hi_chars
"""


# Source-mix report: the per-source composition summary read before
# weighting/sampling a training mix — doc counts, size, length envelope,
# and per-language doc counts within each source. One partial-aggregated
# shuffle on (source, lang) then a tiny rollup to source.
def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )
    return per_lang.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sum_chars").cast("long").alias("total_chars"),
        F.min("min_chars").alias("min_chars"),
        F.max("max_chars").alias("max_chars"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )


ORACLE_SOURCE_MIX = """
WITH per_lang AS (
  SELECT source, lang, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars,
         MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
  FROM documents GROUP BY source, lang
)
SELECT source,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(sum_chars) AS BIGINT) AS total_chars,
       MIN(min_chars) AS min_chars,
       MAX(max_chars) AS max_chars,
       COUNT(*) AS n_langs
FROM per_lang GROUP BY source
"""


# End-to-end curation pipeline: the composition a training-data run
# actually executes — exact dedup (normalized-text fingerprint, min-id
# survivor) -> quality gate (percentile envelope computed over the
# SURVIVORS, not the raw corpus) -> deterministic split assignment. One
# query, fully oracle-checked, proving the stages compose without
# re-materialization: fingerprint+survivor is one fp-key window,
# thresholds reduce to a broadcast row, split is a map-side hash — the
# corpus shuffles ONCE (on the fingerprint).
def q_curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .sampling import assign_split, split_hash
    from .text_analysis import normalized_text

    docs = load_table(spark, sf_dir, "documents")
    fp = F.sha2(normalized_text("text"), 256)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    survivors = (
        docs.select("doc_id", "n_chars", fp.alias("fingerprint"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    thresholds = survivors.agg(
        F.expr(f"percentile(n_chars, {GATE_LO})").alias("lo_chars"),
        F.expr(f"percentile(n_chars, {GATE_HI})").alias("hi_chars"),
    )
    gated = (
        survivors.crossJoin(F.broadcast(thresholds))
        .where(
            (F.col("n_chars") >= F.col("lo_chars"))
            & (F.col("n_chars") <= F.col("hi_chars"))
        )
        .select("doc_id", "n_chars", "fingerprint")
    )
    bucket = F.floor(split_hash("doc_id"))
    return gated.select(
        "doc_id", "n_chars", assign_split(bucket).alias("split")
    )


def _oracle_curation_end_to_end() -> str:
    from .sampling import _O_BUCKET, _O_FP, TRAIN_CUT, VAL_CUT

    return f"""
WITH survivors AS (
  SELECT doc_id, n_chars, {_O_FP} AS fingerprint
  FROM documents
  QUALIFY ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
), thresholds AS (
  SELECT quantile_cont(n_chars, {GATE_LO}) AS lo_chars,
         quantile_cont(n_chars, {GATE_HI}) AS hi_chars
  FROM survivors
)
SELECT doc_id, n_chars,
       CASE WHEN {_O_BUCKET} < {TRAIN_CUT} THEN 'train'
            WHEN {_O_BUCKET} < {VAL_CUT} THEN 'val'
            ELSE 'test' END AS split
FROM survivors s CROSS JOIN thresholds t
WHERE s.n_chars >= t.lo_chars AND s.n_chars <= t.hi_chars
"""


QUERIES = {
    "curation_pii_redact": (q_pii_redact, ORACLE_PII_REDACT),
    "curation_source_mix": (q_source_mix, ORACLE_SOURCE_MIX),
    "curation_end_to_end": (q_curation_end_to_end, _oracle_curation_end_to_end()),
    "dedup_survivors": (q_dedup_survivors, _oracle_dedup_survivors()),
    "sample_quality_gate": (q_quality_gate, ORACLE_QUALITY_GATE),
}


# --- quality-aware survivor selection --------------------------------------
# dedup_survivors keeps the minimum-id cluster member — fine when ids
# carry no meaning, WRONG when a cluster mixes a full document with a
# degraded near-copy that happens to hold the lower id (crawl re-visits,
# truncated mirrors). This operator makes the survivor policy explicit:
# keep the member with the RICHEST text (most distinct tokens, then most
# tokens, then lowest id), computed as ONE hash aggregate via an encoded
# order key (the agg_top1_per_group_sortfree discipline — no window, no
# sort). The planted corpus puts the truncated copy AT THE ORIGINAL'S ID
# and moves the full text to id + offset, so min-id policy would keep
# the degraded copy — the test pins that this operator keeps the
# original instead. Bounds: n_uniq, n_tokens <= ~1e3 and doc_id < 1e10
# keep the key inside a long.

SURVQ_EVERY = 20
SURVQ_OFFSET = 2_000_000
SURVQ_TRIM = 5


def _survq_corpus(docs: DataFrame) -> DataFrame:
    sel = F.col("doc_id") % SURVQ_EVERY == 0
    toks = F.split(F.col("text"), " ")
    keep = F.greatest(F.size(toks) - SURVQ_TRIM, F.lit(1))
    degraded = docs.where(sel).select(
        "doc_id", F.array_join(F.slice(toks, 1, keep), " ").alias("text")
    )
    moved = docs.where(sel).select(
        (F.col("doc_id") + SURVQ_OFFSET).alias("doc_id"), "text"
    )
    return (
        docs.where(~sel)
        .select("doc_id", "text")
        .unionByName(degraded)
        .unionByName(moved)
    )


def q_dedup_survivors_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import connected_components, portable_neardup_pairs

    corpus = _survq_corpus(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    pairs = portable_neardup_pairs(corpus).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component_id")
    )
    toks = F.split(F.lower(F.col("text")), " ")
    scored = corpus.select(
        "doc_id",
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    okey = (
        F.col("n_uniq") * F.lit(1_000_000_000_000_000)
        + F.col("n_tokens") * F.lit(10_000_000_000)
        - F.col("doc_id")
    )
    cluster = F.coalesce(F.col("component_id"), F.col("doc_id"))
    return (
        scored.join(comp, "doc_id", "left")
        .select(cluster.alias("cluster_id"), "doc_id", okey.alias("okey"))
        .groupBy("cluster_id")
        .agg(
            F.max_by("doc_id", F.col("okey")).alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


def _oracle_dedup_survivors_quality() -> str:
    from .dedup import (
        PMH_BANDS,
        PMH_K,
        PMH_THRESHOLD,
        _o_hex7,
        oracle_shingles,
    )

    rows_per_band = PMH_K // PMH_BANDS
    bucket = " || ',' || ".join(
        f"CAST(sig[b.band * {rows_per_band} + {r + 1}] AS VARCHAR)"
        for r in range(rows_per_band)
    )
    return f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {SURVQ_EVERY} <> 0
  UNION ALL
  SELECT doc_id,
         array_to_string(
           (string_split(text, ' '))[1:greatest(len(string_split(text, ' ')) - {SURVQ_TRIM}, 1)],
           ' ')
  FROM documents WHERE doc_id % {SURVQ_EVERY} = 0
  UNION ALL
  SELECT doc_id + {SURVQ_OFFSET}, text
  FROM documents WHERE doc_id % {SURVQ_EVERY} = 0
), sh AS (
  SELECT doc_id, {oracle_shingles('text')} AS s FROM corpus
), halves AS (
  SELECT doc_id, s,
         list_transform(hx, h -> {_o_hex7('h', 1)}) AS h1s,
         list_transform(hx, h -> {_o_hex7('h', 8)}) AS h2s
  FROM (SELECT doc_id, s, list_transform(s, g -> sha256(g)) AS hx FROM sh)
), sig AS (
  SELECT doc_id, s,
         list_transform(range(0, {PMH_K}),
           i -> list_min(list_transform(range(1, len(h1s) + 1),
                j -> h1s[j] + i * h2s[j]))) AS sig
  FROM halves
), bands AS (
  SELECT doc_id, b.band, {bucket} AS bucket
  FROM sig, (SELECT UNNEST(range(0, {PMH_BANDS})) AS band) b
), cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
), pairs AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b
  WHERE ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / len(list_distinct(list_concat(a.s, b.s))), 6)
        >= {PMH_THRESHOLD}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), reach AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
), comp AS (
  SELECT id, MIN(r) AS component_id FROM reach GROUP BY id
), scored AS (
  SELECT c.doc_id,
         COALESCE(k.component_id, c.doc_id) AS cluster_id,
         CAST(len(list_distinct(string_split(lower(c.text), ' '))) AS BIGINT)
           * 1000000000000000
         + CAST(len(string_split(lower(c.text), ' ')) AS BIGINT)
           * 10000000000
         - c.doc_id AS okey
  FROM corpus c LEFT JOIN comp k ON k.id = c.doc_id
)
SELECT cluster_id,
       max_by(doc_id, okey) AS survivor_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM scored GROUP BY cluster_id
"""


QUERIES["dedup_survivors_quality"] = (
    q_dedup_survivors_quality,
    _oracle_dedup_survivors_quality(),
)
