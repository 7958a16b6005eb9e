"""Deterministic sampling / dataset-split operators over ``documents``
(north-star: large-scale training-data pipelines).

A training corpus needs reproducible, coordination-free splits:
* ``split_assign`` — train/val/test by a multiplicative integer hash of
  the document id: any worker computes the same assignment with no
  shared state, no shuffle, and no RNG seed plumbing (Fibonacci hashing;
  Knuth TAOCP vol. 3 §6.4).
* ``split_leakage_safe`` — near-duplicate documents must not straddle
  train/test (classic eval-set contamination): the split key is the
  *content fingerprint*, not the id, so every member of an exact-dup
  cluster lands in the same split. Exercised on a corpus with synthetic
  whitespace-mangled duplicates, like dedup_exact_fingerprint.
* ``stratified_sample`` — fixed-size per-stratum sample (N docs per
  language), ordered by the deterministic hash: one shuffle on the
  stratum key, rank, filter.

Everything is exact integer arithmetic — the DuckDB oracle replays each
operator verbatim. At 100 TB: split_assign and split_leakage_safe are
map-only (no shuffle; the fingerprint variant shares the dedup
fingerprint pass); stratified_sample shuffles once on the stratum key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import fround, oracle_fround
from ..sources.tables import load_table
from .text_analysis import normalized_text

# Knuth's multiplicative constant: floor(2^32 / golden_ratio), coprime to 2^32.
KNUTH_32 = 2_654_435_761
MOD_32 = 2**32
TRAIN_CUT = 90  # percent
VAL_CUT = 95


def split_hash(key: Column | str) -> Column:
    """Deterministic uniform bucket in [0, 100) from an integer key.

    Keys must stay below ~2^31 so key * KNUTH_32 fits a long under ANSI
    arithmetic (callers pass ids or a 28-bit fingerprint prefix)."""
    k = F.col(key) if isinstance(key, str) else key
    return (k * F.lit(KNUTH_32)) % F.lit(MOD_32) * 100 / F.lit(MOD_32)


def assign_split(bucket: Column) -> Column:
    return (
        F.when(bucket < TRAIN_CUT, "train")
        .when(bucket < VAL_CUT, "val")
        .otherwise("test")
    )


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.floor(split_hash("doc_id"))
    return docs.select(
        "doc_id",
        assign_split(bucket).alias("split"),
        bucket.cast("long").alias("bucket"),
    )


_O_BUCKET = f"floor(doc_id * {KNUTH_32} % {MOD_32} * 100 / {MOD_32})"
ORACLE_SPLIT_ASSIGN = f"""
SELECT doc_id,
       CASE WHEN {_O_BUCKET} < {TRAIN_CUT} THEN 'train'
            WHEN {_O_BUCKET} < {VAL_CUT} THEN 'val'
            ELSE 'test' END AS split,
       CAST({_O_BUCKET} AS BIGINT) AS bucket
FROM documents
"""


def q_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split keyed on the content fingerprint: whitespace-mangled copies
    of every 10th document (same synthesis as dedup_exact_fingerprint)
    provably land in their original's split. The key is the first 7 hex
    digits (28 bits) of the sha256 fingerprint as an integer — portable
    to SQL and small enough for overflow-free ANSI multiplication."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mangled = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("  "), F.regexp_replace("text", " ", "   ")).alias("text"),
    )
    corpus = docs.unionByName(mangled)
    fp_key = F.conv(
        F.substring(F.sha2(normalized_text("text"), 256), 1, 7), 16, 10
    ).cast("long")
    bucket = F.floor(split_hash(fp_key))
    return corpus.select(
        "doc_id",
        assign_split(bucket).alias("split"),
        F.sha2(normalized_text("text"), 256).alias("fingerprint"),
    )


_O_FP = r"sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))"
_O_HEX7 = "".join(
    f" + CAST((strpos('0123456789abcdef', substr({_O_FP}, {i + 1}, 1)) - 1) "
    f"AS BIGINT) * {16 ** (6 - i)}"
    for i in range(7)
)
_O_FP_BUCKET = f"floor((0{_O_HEX7}) * {KNUTH_32} % {MOD_32} * 100 / {MOD_32})"
ORACLE_SPLIT_LEAKAGE_SAFE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         concat('  ', regexp_replace(text, ' ', '   ', 'g'))
  FROM documents WHERE doc_id % 10 = 0
)
SELECT doc_id,
       CASE WHEN {_O_FP_BUCKET} < {TRAIN_CUT} THEN 'train'
            WHEN {_O_FP_BUCKET} < {VAL_CUT} THEN 'val'
            ELSE 'test' END AS split,
       {_O_FP} AS fingerprint
FROM corpus
"""

STRATUM_N = 20


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-language sample: deterministic hash order, top-N
    per stratum (one shuffle on lang; rank + filter)."""
    docs = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(KNUTH_32)) % F.lit(MOD_32)
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= STRATUM_N)
        .select("doc_id", "lang", F.col("rn").cast("long").alias("sample_rank"))
    )


ORACLE_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, CAST(rn AS BIGINT) AS sample_rank FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY doc_id * {KNUTH_32} % {MOD_32} ASC, doc_id ASC
         ) AS rn
  FROM documents
) WHERE rn <= {STRATUM_N}
"""


# --- token-budget sequence packing ----------------------------------------
# Assign documents to fixed-budget training packs: within each language
# shard, documents are taken in deterministic id order and a running
# token total assigns pack_id = floor(exclusive_cumsum / budget) —
# contiguous-fill packing (a doc may straddle two budget boundaries; the
# trainer's sample-splitter handles the overflow, as in fixed-length LM
# batching). One window per shard — the scalable form: packing is
# per-shard (lang here; split/date shards in production), never a single
# global sort.

PACK_BUDGET = 2_048


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    w = Window.partitionBy("lang").orderBy("doc_id")
    cum_excl = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        docs.select("doc_id", "lang", toks.alias("n_tokens"))
        .withColumn("pack_id", F.floor(cum_excl / PACK_BUDGET))
        .select("doc_id", "lang", "n_tokens", "pack_id")
    )


ORACLE_PACK_SEQUENCES = f"""
SELECT doc_id, lang, n_tokens,
       CAST(floor(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) / {PACK_BUDGET}) AS BIGINT) AS pack_id
FROM (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
  FROM documents
)
"""


# --- deterministic training-shard export ----------------------------------
# The last step of a training-data pipeline: scatter the corpus into a
# fixed number of shards, deterministically (re-runs and backfills write
# byte-identical shards), with documents in a stable pseudo-random order
# inside each shard (global order-by-hash would be a single total sort;
# per-shard sortWithinPartitions is embarrassingly parallel). Shard
# assignment reuses the Knuth multiplicative hash so any engine can
# recompute membership without reading the output.

N_SHARDS = 8


def shard_of(key: Column | str) -> Column:
    k = F.col(key) if isinstance(key, str) else key
    return ((k * F.lit(KNUTH_32)) % F.lit(MOD_32)) % F.lit(N_SHARDS)


def write_training_shards(docs: DataFrame, out_dir: str) -> None:
    """Materialize shards: one shuffle on shard id, per-shard hash order,
    parquet `shard=N/` directories. Deterministic end to end."""
    h = (F.col("doc_id") * F.lit(KNUTH_32)) % F.lit(MOD_32)
    (
        docs.withColumn("shard", shard_of("doc_id"))
        .repartition(N_SHARDS, "shard")
        .sortWithinPartitions(h.asc(), F.col("doc_id").asc())
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def q_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest: per-shard document count, token budget, id range —
    the summary a trainer reads before consuming shards. One partial-
    aggregated shuffle of N_SHARDS groups."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    return (
        docs.select(shard_of("doc_id").alias("shard"), F.col("doc_id"), toks.alias("n_tokens"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


ORACLE_SHARD_PLAN = f"""
SELECT doc_id * {KNUTH_32} % {MOD_32} % {N_SHARDS} AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents
GROUP BY 1
"""


# --- z-order layout: multi-dimensional file clustering --------------------
# Lakehouse data-layout op: interleave the bits of two scan keys so that
# sorting by the z-value co-locates rows that are close in EITHER key —
# files then carry tight min/max ranges on both columns and a reader
# filtering on either key skips most files. Here: events clustered on
# (user_id, hour). The z-value is pure JVM bit arithmetic (map-only);
# file assignment uses fixed-width z-ranges (z >> 24), the deterministic
# stand-in for the quantile sampling a production writer
# (repartitionByRange on z) would do. Writing is then
# df.repartitionByRange(N, z).sortWithinPartitions(z).write.parquet(...).
Z_BITS = 16


def _z_interleave(k1: str, k2: str) -> Column:
    # acc + shifted bits == OR since bit positions are disjoint; addition
    # is used because DuckDB's list_sum mirrors it exactly.
    return F.expr(
        f"aggregate(sequence(0, {Z_BITS - 1}), CAST(0 AS BIGINT),"
        f" (acc, i) -> acc + shiftleft(shiftright({k1}, i) & 1, 2*i + 1)"
        f" + shiftleft(shiftright({k2}, i) & 1, 2*i))"
    )


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        "event_id",
        F.expr("user_id & 65535").alias("k1"),
        F.expr("(unix_micros(ts) div 3600000000) & 65535").alias("k2"),
    )
    return keyed.select(
        "event_id",
        _z_interleave("k1", "k2").alias("z_value"),
    ).withColumn("file_id", F.expr("shiftright(z_value, 24)"))


ORACLE_ZORDER_LAYOUT = f"""
WITH keyed AS (
  SELECT event_id,
         user_id & 65535 AS k1,
         (epoch_us(ts) // 3600000000) & 65535 AS k2
  FROM events
), z AS (
  SELECT event_id,
         CAST(list_sum(list_transform(range(0, {Z_BITS}),
             i -> (((k1 >> i) & 1) << (2*i + 1))
                  + (((k2 >> i) & 1) << (2*i)))) AS BIGINT) AS z_value
  FROM keyed
)
SELECT event_id, z_value, z_value >> 24 AS file_id FROM z
"""


# --- deterministic weighted reservoir (Efraimidis-Spirakis) ---------------
# Weighted sampling without replacement as a top-k: priority =
# -ln(u)/w with u a deterministic hash-uniform in (0,1) — the item set
# with the k SMALLEST priorities is an exact ES weighted sample, and
# "top-k by a computed key" is TakeOrderedAndProject in Spark: a per-
# partition heap + driver merge of k rows, NO global sort, no shuffle of
# the corpus. Deterministic u makes the sample reproducible and
# oracle-checkable; ln() is the only float op and both engines evaluate
# the identical expression per-row (no reductions, so no ordering drift).

RES_K = 50


def q_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """50-document weighted sample, weight = n_chars: longer documents
    proportionally more likely, selection exactly reproducible."""
    docs = load_table(spark, sf_dir, "documents")
    u = ((F.col("doc_id") * F.lit(KNUTH_32)) % F.lit(MOD_32) + 1) / F.lit(
        MOD_32 + 1
    )
    pri = -F.ln(u) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            "n_chars",
            fround(pri, 10).alias("priority"),
        )
        .orderBy(F.asc("priority"), F.asc("doc_id"))
        .limit(RES_K)
    )


_O_PRI = oracle_fround(
    f"-ln((doc_id * {KNUTH_32} % {MOD_32} + 1)"
    f" / CAST({MOD_32 + 1} AS DOUBLE)) / n_chars",
    10,
)

ORACLE_WEIGHTED_RESERVOIR = f"""
SELECT doc_id, n_chars, {_O_PRI} AS priority
FROM documents
ORDER BY priority ASC, doc_id ASC
LIMIT {RES_K}
"""


QUERIES = {
    "sample_split_assign": (q_split_assign, ORACLE_SPLIT_ASSIGN),
    "sample_weighted_reservoir": (q_weighted_reservoir, ORACLE_WEIGHTED_RESERVOIR),
    "layout_zorder": (q_zorder_layout, ORACLE_ZORDER_LAYOUT),
    "sample_shard_plan": (q_shard_plan, ORACLE_SHARD_PLAN),
    "sample_split_leakage_safe": (q_split_leakage_safe, ORACLE_SPLIT_LEAKAGE_SAFE),
    "sample_stratified": (q_stratified_sample, ORACLE_STRATIFIED_SAMPLE),
    "sample_pack_sequences": (q_pack_sequences, ORACLE_PACK_SEQUENCES),
}


# --- deterministic per-epoch global shuffle (training data loading) -------
# Every training epoch re-reads the corpus in a fresh pseudo-random order;
# at 100 TB that order must be computable WITHOUT a driver-side RNG or a
# single global sort. Same Fibonacci-hash trick as split_assign, salted
# by the epoch: ekey = (doc_id * K + epoch * P) mod 2^32 is a
# deterministic scramble any worker computes row-locally; shard = ekey
# mod n_shards spreads documents over reader shards, and the within-
# shard position is a row_number over ONE shard-key shuffle — shards
# sort in parallel, no global single-partition window. Changing EPOCH
# re-permutes everything; the oracle replays the identical arithmetic.

EPOCH = 3
EPOCH_SALT = 2_246_822_519  # xxhash PRIME32_2, coprime to 2^32
N_READER_SHARDS = 8


def epoch_shuffle(
    docs: DataFrame, epoch: int = EPOCH, n_shards: int = N_READER_SHARDS
) -> DataFrame:
    """(doc_id, ...) -> (shard, position, doc_id): the read plan for one
    training epoch — per-shard sequential positions in a per-epoch
    pseudo-random order."""
    ekey = (
        F.col("doc_id") * F.lit(KNUTH_32) + F.lit(epoch) * F.lit(EPOCH_SALT)
    ) % F.lit(MOD_32)
    w = Window.partitionBy("shard").orderBy("ekey", "doc_id")
    return (
        docs.select("doc_id", ekey.alias("ekey"))
        .withColumn("shard", (F.col("ekey") % n_shards).cast("int"))
        .select("shard", F.row_number().over(w).alias("position"), "doc_id")
    )


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return epoch_shuffle(load_table(spark, sf_dir, "documents"))


ORACLE_EPOCH_SHUFFLE = f"""
WITH e AS (
  SELECT doc_id,
         (doc_id * {KNUTH_32} + {EPOCH} * {EPOCH_SALT}) % {MOD_32} AS ekey
  FROM documents
)
SELECT CAST(ekey % {N_READER_SHARDS} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY ekey % {N_READER_SHARDS}
                               ORDER BY ekey, doc_id) AS BIGINT) AS position,
       doc_id
FROM e
"""

QUERIES["sample_epoch_shuffle"] = (q_epoch_shuffle, ORACLE_EPOCH_SHUFFLE)


# --- rate-based source rebalancing (data mixing, the map-only path) -------
# Training mixes reweight sources (curriculum: upweight curated data).
# sample_stratified takes EXACTLY N per stratum but pays a per-stratum
# rank (shuffle + sort per stratum). This is its scale twin: each source
# gets a deterministic acceptance RATE = w_s / max_w, and a document is
# kept iff its Fibonacci hash falls under rate * 2^32 — a pure row-local
# integer compare, ZERO shuffle for the decision (the only exchange is
# the tiny per-source report aggregate). Kept-set membership is
# deterministic and engine-portable BY CONSTRUCTION: the comparison is
# the cross-multiplied form hash * max_w < w * 2^32 — pure bigint
# arithmetic, no division of any kind, so parity cannot hinge on two
# engines rounding a double the same way (the earlier floor(w*2^32/3)
# spelling only matched because Spark and DuckDB happened to produce
# the identical IEEE-754 double). Weights here derive from the source
# id (1 + num mod 3 in {1,2,3}) — the stand-in for a configured mixing
# table, which at scale is a broadcast map exactly like this constant
# expression.

MIX_MAX_W = 3


def q_source_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    num = F.substring("source", 4, 10).cast("int")
    w = (num % MIX_MAX_W) + 1
    hashed = (F.col("doc_id") * F.lit(KNUTH_32)) % F.lit(MOD_32)
    kept = hashed * F.lit(MIX_MAX_W) < w.cast("long") * F.lit(MOD_32)
    return (
        docs.select("source", w.alias("w"), kept.alias("kept"))
        .groupBy("source", "w")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
    )


ORACLE_SOURCE_REBALANCE = f"""
WITH t AS (
  SELECT source,
         (CAST(substr(source, 4, 10) AS INT) % {MIX_MAX_W}) + 1 AS w,
         ((doc_id * {KNUTH_32}) % {MOD_32}) * {MIX_MAX_W}
           < CAST((CAST(substr(source, 4, 10) AS INT)
               % {MIX_MAX_W} + 1) AS BIGINT) * {MOD_32} AS kept
  FROM documents
)
SELECT source, w,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM t GROUP BY source, w
"""

QUERIES["sample_source_rebalance"] = (
    q_source_rebalance,
    ORACLE_SOURCE_REBALANCE,
)
