"""Deduplication operator family over ``documents`` (SURVEY §2.13;
north-star: exact, MinHash+LSH, SimHash, n-gram Jaccard).

Scale design:
* exact dedup = hash-groupBy on a fingerprint — one shuffle of (hash, id),
  never the document bodies;
* near-dup candidate generation = MinHash banding: signatures are fixed
  size (k longs/doc) regardless of document length, LSH band buckets turn
  the O(n^2) pair space into a self-join on band keys;
* candidate verification = exact shingle Jaccard on the (tiny) candidate
  set only.

Only the oracle-checkable pieces use portable hashing (sha256-derived);
the high-throughput variant uses xxhash64 (Spark-side only, rows-only
check) — at 100 TB you want the cheap hash, the expensive one exists to
prove semantics against DuckDB.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .text_analysis import normalized_text

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct), as array<string>.

    Shifted-slice ``zip_with`` composition — linear in document length.
    (The index-based ``transform`` + ``element_at(toks, i)`` form
    re-evaluates the ``split`` per element, i.e. O(len^2) per document:
    measured 10x slower on the sf0.1 corpus — same pitfall as
    ``shingle_hashes`` below.)"""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, " ")
    glen = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, glen)
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, glen),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.array_distinct(grams)


def jaccard_of(a: Column | str, b: Column | str) -> Column:
    """Exact shingle-set Jaccard rounded to 6dp, NULL when BOTH sets are
    empty. Documents shorter than the shingle width carry no n-gram
    content; two of them co-band (empty sets hash to identical
    signatures), and an unguarded intersect/union is then 0/0 — a
    DIVIDE_BY_ZERO crash under ANSI mode (found by hypothesis on
    sub-3-token batches). 'No evidence' must read as NULL — which fails
    every >= threshold verify — never as a crash or a match."""
    union = F.size(F.array_union(a, b))
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return F.when(union > 0, F.round(inter / union, 6))


def oracle_shingles(col_sql: str, n: int = 3) -> str:
    toks = f"string_split({col_sql}, ' ')"
    parts = ", ".join(f"{toks}[i+{j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(range(1, len({toks}) - {n - 1} + 1), "
        f"i -> concat_ws(' ', {parts})))"
    )


# --- exact dedup: fingerprint groupBy, deterministic survivor -------------
# The fixture corpus is duplicate-free, so the input unions in a
# whitespace-mangled copy of every 10th document — real duplicate groups
# (n_copies=2) that only normalized fingerprinting collapses.
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mangled = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("  "), F.regexp_replace("text", " ", "   ")).alias("text"),
    )
    corpus = docs.unionByName(mangled)
    fp = F.sha2(normalized_text("text"), 256)
    return (
        corpus.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


ORACLE_DEDUP_EXACT = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         concat('  ', regexp_replace(text, ' ', '   ', 'g'))
  FROM documents WHERE doc_id % 10 = 0
)
SELECT sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
       MIN(doc_id) AS survivor_doc_id,
       COUNT(*) AS n_copies
FROM corpus
GROUP BY 1
"""


# --- n-gram Jaccard similarity vs a probe document ------------------------
# Exact set similarity of every document against doc_id=0 (broadcast probe,
# no O(n^2) blow-up; the all-pairs path goes through MinHash banding below).
def q_jaccard_vs_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", shingles("text").alias("sh"))
    probe = sh.where(F.col("doc_id") == 0).select(F.col("sh").alias("probe_sh"))
    return (
        sh.crossJoin(F.broadcast(probe))
        .select("doc_id", jaccard_of("sh", "probe_sh").alias("jaccard"))
        .where(F.col("doc_id") != 0)
    )


ORACLE_JACCARD_VS_PROBE = f"""
WITH sh AS (
  SELECT doc_id, {oracle_shingles('text')} AS s FROM documents
), probe AS (
  SELECT s AS ps FROM sh WHERE doc_id = 0
)
SELECT doc_id,
       ROUND(CAST(len(list_intersect(s, ps)) AS DOUBLE)
             / len(list_distinct(list_concat(s, ps))), 6) AS jaccard
FROM sh, probe
WHERE doc_id <> 0
"""


# --- MinHash signatures + LSH banding (scale path, rows-only check) -------
def shingle_hashes(col: Column | str, n: int = 3) -> Column:
    """Distinct word-n-gram shingles as 64-bit hashes, WITHOUT materializing
    shingle strings: hash each token once, then hash consecutive token-hash
    triples. At 100 TB this avoids building len(doc) short-lived strings per
    document — the single biggest constant-factor cost of text dedup."""
    c = F.col(col) if isinstance(col, str) else col
    th = F.transform(F.split(c, " "), lambda t: F.xxhash64(t))
    # combine consecutive token hashes via shifted-slice zip_with — linear
    # in document length (element_at-by-index inside a lambda re-evaluates
    # the source array per element, i.e. O(len^2): measured 10x slower)
    length = F.greatest(F.size(th) - (n - 1), F.lit(0))
    grams = F.slice(th, 1, length)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(th, j + 1, length), lambda a, b: F.xxhash64(a, b)
        )
    return F.array_distinct(grams)


def minhash_signature(sh_hash: Column, n_hashes: int = N_MINHASH) -> Column:
    """array<bigint> of n minhashes over pre-hashed shingles.

    Kirsch-Mitzenmacher double hashing: the two 31-bit halves of each
    shingle's 64-bit hash generate all n hash families as ``h1 + i*h2`` —
    zero extra hash computations per family. Masked to 31 bits so the mix
    never overflows a long under ANSI arithmetic.

    The halves are split INSIDE each min-fold (optimization r16 — two
    integer ops per element) instead of materializing an intermediate
    array of (h1, h2) structs first: same arithmetic, same values, one
    fewer array-of-structs allocation pass per row (the _pmh_sig_of
    hash-once discipline; interleaved A/B at-or-better)."""
    mask = F.lit(0x7FFFFFFF)
    return F.array(
        *[
            F.array_min(
                F.transform(
                    sh_hash,
                    lambda x: x.bitwiseAND(mask)
                    + F.lit(i) * F.shiftright(x, 31).bitwiseAND(mask),
                )
            )
            for i in range(n_hashes)
        ]
    )


def minhash_neardup(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> near-duplicate pairs via MinHash LSH banding,
    verified with exact (hashed-shingle) Jaccard >= 0.5. Self-join
    happens only on band-bucket keys.

    Relationship to the sha256 portable twin (q_minhash_portable), pinned
    on the planted fixture in tests/test_neardup_twins.py: verified
    scores on pairs both pipelines surface are IDENTICAL (the hash family
    changes candidate generation, never verification), and any pair only
    one pipeline surfaces is still a true >= 0.5 pair the other's banding
    happened to miss — the cheap path trades a little banding recall for
    xxhash64 speed, never precision."""
    spark = docs.sparkSession
    # Repartition before the compute-heavy shingle pass: a small input can
    # arrive as one file => one partition, serializing the whole pipeline on
    # a single core (at real scale the scan has many splits and this is a
    # cheap rebalance of the same shape).
    n_part = spark.sparkContext.defaultParallelism
    docs = docs.repartition(n_part, "doc_id")
    # The shingle table feeds both signature generation and verification —
    # persist it so the expensive tokenize+hash pass runs exactly once.
    # MEMORY_AND_DISK: at 100 TB the shingle arrays exceed executor RAM and
    # must spill rather than silently recompute the tokenize+hash pass
    # (MEMORY_ONLY evicts; a staged parquet temp is the next step up).
    sh = docs.select("doc_id", shingle_hashes("text").alias("sh")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # same guard as _pmh_sig_of: sub-shingle-width docs carry all-NULL
    # signatures that co-band into one bucket — quadratic candidates the
    # verify leg never confirms. Filter empty shingle sets on the INPUT
    # (the only source of NULL signatures) so the K-element signature
    # expression is evaluated once; a downstream element_at(sig,1) filter
    # made the Filter node re-evaluate the whole signature (no CSE across
    # the Filter/Project boundary — the r9 2x regression).
    sig = sh.where(F.size("sh") > 0).select(
        "doc_id", minhash_signature(F.col("sh")).alias("sig")
    )
    rows_per_band = N_MINHASH // N_BANDS
    # bands carry only (doc_id, band, bucket) — the shingle arrays are
    # re-joined AFTER candidate generation so the band self-join shuffles
    # 24 bytes/row, not whole documents.
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # exact (hashed-shingle) Jaccard verification on the candidate pairs,
    # reading the cached shingle table
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = cand.join(sh_a, "doc_a").join(sh_b, "doc_b")
    return verified.select(
        "doc_a", "doc_b", jaccard_of("sh_a", "sh_b").alias("jaccard")
    ).where(F.col("jaccard") >= 0.5)


def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_neardup(load_table(spark, sf_dir, "documents"))


# --- SimHash (64-bit, sign-aggregated token hashes; rows-only check) ------
def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash: hash each distinct token once (explode), map-side
    partial-sum the +/-1 contribution of every bit per document, reassemble
    the sign bits into a long. The explode+groupBy shape is the scale path:
    one shuffle keyed by doc_id carrying 64 small ints per document."""
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(normalized_text("text"), " "))).alias("tok"),
    )
    hashed = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    sums = hashed.groupBy("doc_id").agg(*bit_sums)
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig.bitwiseOR(
            F.when(
                F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        )
    return sums.select("doc_id", sig.alias("simhash"))


# --- keyed latest-wins dedup on events (exact, oracle-checked in windows) -
def q_dedup_events_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact row dedup on the full event tuple — dropDuplicates semantics
    (events are already unique; op proves the shuffle-on-hash plan)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )


ORACLE_DEDUP_EVENTS = """
SELECT event_type, COUNT(*) AS n_unique
FROM (SELECT DISTINCT ON (event_id) * FROM events ORDER BY event_id)
GROUP BY event_type
"""


def simhash_neardup(docs: DataFrame) -> DataFrame:
    """SimHash near-duplicate pairs: candidates share at least one of four
    16-bit signature bands (any pair within Hamming distance 3 must agree
    on >=1 band by pigeonhole), verified by exact Hamming <= 3. Same
    LSH-banding shape as MinHash but over one 64-bit signature — the
    cheapest text near-dup detector at scale. Rows-only check.

    Precision contract (pinned on the planted fixture in
    tests/test_neardup_twins.py): Hamming <= 3 over a 64-bit SimHash
    is a similarity DETECTOR, not a Jaccard threshold — near-identical
    planted copies land at Hamming 0-1 and are always recovered, while
    emitted pairs' token-set overlap is bounded below (far above the
    corpus background rate)."""
    # spread the corpus across cores before the per-token sketch pass
    # (the q_simhash_portable / portable_neardup_pairs discipline): one
    # parquet row group otherwise serializes the CPU-dominant hashing
    # (measured 3.3 s -> ~1.2 s at sf0.1); a no-op rebalance at scale
    spark = docs.sparkSession
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    sims = simhash(docs)  # (doc_id, simhash)
    bands = sims.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bits"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bits")
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bits") == F.col("r.bits"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).where(
        F.col("hamming") <= 3
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load_table(spark, sf_dir, "documents"))


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_neardup(load_table(spark, sf_dir, "documents"))


# --- portable MinHash: the full banding pipeline, hash-matched ------------
# Same shape as q_minhash_neardup (signatures -> bands -> bucket self-join
# -> exact-Jaccard verify) but with sha256-derived 28-bit hashes instead
# of xxhash64, so EVERY stage replays bit-identically in DuckDB — the
# oracle checks the whole near-dup pipeline, not just its exact pieces.
# xxhash64 stays the 100 TB path (cheaper per shingle); this variant is
# the semantic proof. The fixture corpus has no near-dups, so the input
# unions in a 5-words-truncated copy of every 20th document — real
# high-Jaccard pairs the banding must recover.
PMH_K = 8
PMH_BANDS = 4  # 2 signature rows per band
PMH_COPY_EVERY = 20
PMH_ID_OFFSET = 2_000_000
PMH_TRIM = 5
PMH_THRESHOLD = 0.5


def _pmh_corpus(docs: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    keep = F.greatest(F.size(toks) - PMH_TRIM, F.lit(1))
    truncated = docs.where(F.col("doc_id") % PMH_COPY_EVERY == 0).select(
        (F.col("doc_id") + PMH_ID_OFFSET).alias("doc_id"),
        F.array_join(F.slice(toks, 1, keep), " ").alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(truncated)


def portable_neardup_pairs(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> verified near-dup pairs (doc_a, doc_b, jaccard)
    through the portable sha256 MinHash pipeline (sig/bands shared with
    incremental dedup via _pmh_sig_of/_pmh_bands_of). The 28-bit sha256
    halves keep h1 + i*h2 inside a long under ANSI arithmetic."""
    spark = docs.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    docs = docs.repartition(n_part, "doc_id")
    sh = docs.select("doc_id", shingles("text").alias("s")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bands = _pmh_bands_of(_pmh_sig_of(sh))
    left, right = bands.alias("l"), bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"))
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select("doc_a", "doc_b", jaccard_of("s_a", "s_b").alias("jaccard"))
        .where(F.col("jaccard") >= PMH_THRESHOLD)
    )


def q_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return portable_neardup_pairs(
        _pmh_corpus(load_table(spark, sf_dir, "documents"))
    )


def _o_hex7(hx: str, start: int) -> str:
    """28-bit integer from 7 hex digits of an expression (DuckDB side)."""
    return (
        "(0"
        + "".join(
            f" + CAST((strpos('0123456789abcdef', substr({hx}, {start + i}, 1)) - 1)"
            f" AS BIGINT) * {16 ** (6 - i)}"
            for i in range(7)
        )
        + ")"
    )


def _oracle_minhash_portable() -> str:
    rows_per_band = PMH_K // PMH_BANDS
    bucket = " || ',' || ".join(
        f"CAST(sig[b.band * {rows_per_band} + {r + 1}] AS VARCHAR)"
        for r in range(rows_per_band)
    )
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {PMH_ID_OFFSET},
         array_to_string(
           (string_split(text, ' '))[1:greatest(len(string_split(text, ' ')) - {PMH_TRIM}, 1)],
           ' ')
  FROM documents WHERE doc_id % {PMH_COPY_EVERY} = 0
), sh AS (
  SELECT doc_id, {oracle_shingles('text')} AS s FROM corpus
), hashed AS (
  SELECT doc_id, s,
         list_transform(s, g -> sha256(g)) AS hx
  FROM sh
), halves AS (
  SELECT doc_id, s,
         list_transform(hx, h -> {_o_hex7('h', 1)}) AS h1s,
         list_transform(hx, h -> {_o_hex7('h', 8)}) AS h2s
  FROM hashed
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
)
SELECT c.doc_a, c.doc_b,
       ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
FROM cand c
JOIN sh a ON a.doc_id = c.doc_a
JOIN sh b ON b.doc_id = c.doc_b
WHERE ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))), 6) >= {PMH_THRESHOLD}
"""


# --- portable SimHash: full sketch + banding, hash-matched ----------------
# 56-bit SimHash over distinct tokens with sha256-derived token hashes,
# so sketch, pigeonhole banding (4 bands x 14 bits — hamming<=3 implies
# at least one equal band), and hamming verification all replay
# bit-identically in DuckDB. 56 bits (not 28) because a small-vocab
# corpus correlates bit balances: at 28 bits, sf0.01 produced ~20k
# hamming<=3 pairs (no discrimination); at 56, only true near-dups
# survive. Tie rule: a zero bit-balance yields bit 0 in both engines.
# xxhash64 q_simhash_neardup remains the cheap path.
SIMH_BITS = 56
SIMH_BANDS = 4
SIMH_HAMMING = 3


def _simhash_portable_sketch(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, simhash): the portable 56-bit sketch,
    one map-side higher-order fold per document.

    REJECTED r16 experiment (kept out of the tree, recorded in
    OPTIMIZATION_r16.md): respelling this as explode + 56 codegen'd
    per-bit ``sum(((h >> j) & 1) * 2 - 1)`` balances — the shape the
    xxhash64 :func:`simhash` uses at 64 bits — measured 0.88 -> 1.55 s
    on the interleaved sf0.1 A/B (1.76x SLOWER): a 57-column
    aggregation state over tokens-per-doc exploded rows costs more
    than the fold's interpreted lambdas save, the exact inverse of the
    r15 minhash-Arrow lesson (too little work per moved byte). The
    fold stays."""
    toks = F.array_distinct(F.split(F.lower(F.col("text")), " "))
    th = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.sha2(t, 256), 1, 14), 16, 10).cast(
            "long"
        ),
    )
    zeros = F.array_repeat(F.lit(0).cast("long"), SIMH_BITS)
    bit_contrib = lambda h: F.array(  # noqa: E731
        *[
            F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1
            for j in range(SIMH_BITS)
        ]
    )
    cnt = F.aggregate(
        th, zeros, lambda acc, h: F.zip_with(acc, bit_contrib(h), lambda a, b: a + b)
    )
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(SIMH_BITS)])
    sim = F.aggregate(
        F.zip_with(cnt, powers, lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select("doc_id", sim.alias("simhash"))


def q_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _pmh_corpus(load_table(spark, sf_dir, "documents"))
    # spread the corpus across cores BEFORE the sha256-per-token sketch
    # (the portable_neardup_pairs discipline): a small corpus arrives in
    # 1-2 scan partitions (one parquet row group), which serializes the
    # CPU-dominant signature pass — measured 4.7 s -> ~1 s at sf0.1 on
    # local[32]. The one-time text shuffle is strictly cheaper than the
    # per-token hashing it parallelizes, and at full scale the scan
    # already yields >= cores splits so the exchange is a no-op
    # rebalance, never the bottleneck.
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    sh = _simhash_portable_sketch(docs)
    band_width = SIMH_BITS // SIMH_BANDS
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * band_width)
                        .bitwiseAND(F.lit((1 << band_width) - 1))
                        .alias("bval"),
                    )
                    for b in range(SIMH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bval")
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "doc_a", "doc_b", hamming.cast("long").alias("hamming")
    ).where(F.col("hamming") <= SIMH_HAMMING)


def _oracle_simhash_portable() -> str:
    band_width = SIMH_BITS // SIMH_BANDS
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {PMH_ID_OFFSET},
         array_to_string(
           (string_split(text, ' '))[1:greatest(len(string_split(text, ' ')) - {PMH_TRIM}, 1)],
           ' ')
  FROM documents WHERE doc_id % {PMH_COPY_EVERY} = 0
), th AS (
  SELECT doc_id,
         list_transform(list_distinct(string_split(lower(text), ' ')),
             t -> {_o_hex7('sha256(t)', 1)} * {16 ** 7}
                  + {_o_hex7('sha256(t)', 8)}) AS hs
  FROM corpus
), cnt AS (
  SELECT doc_id,
         list_transform(range(0, {SIMH_BITS}),
           j -> list_sum(list_transform(hs, h -> ((h >> j) & 1) * 2 - 1))) AS c
  FROM th
), sk AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, {SIMH_BITS}),
           j -> CASE WHEN c[j + 1] > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END))
         AS BIGINT) AS simhash
  FROM cnt
), bands AS (
  SELECT doc_id, simhash, b.band,
         (simhash >> (b.band * {band_width})) & {(1 << band_width) - 1} AS bval
  FROM sk, (SELECT UNNEST(range(0, {SIMH_BANDS})) AS band) b
), cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         l.simhash AS sh_a, r.simhash AS sh_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.bval = r.bval AND l.doc_id < r.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= {SIMH_HAMMING}
"""


# --- near-dup cluster collapse: connected components ----------------------
# Pair output (MinHash bands, SimHash, embedding cosine) is only half of
# dedup: survivors come from collapsing pairs into CLUSTERS and keeping
# one member per cluster. Components via iterative min-label propagation
# plus pointer jumping (comp := comp[comp]) — each round halves path
# lengths, so diameter-D clusters converge in O(log D) rounds. Rounds run
# until a fixpoint: the per-round convergence check is one count() on the
# label table (edge-list sized, tiny vs the corpus) — the same pattern
# GraphX/Pregel uses — so arbitrarily deep chains terminate correctly,
# with CC_MAX_ROUNDS as a runaway backstop. The label table is
# lineage-truncated every round (localCheckpoint): it is referenced three
# times per round, so an un-truncated plan grows ~3^rounds — exponential
# analysis AND re-execution cost. On a real cluster use reliable
# checkpoint() to a DFS dir instead (fault-tolerant); switch to
# large-star/small-star (Kiveris et al., "Connected Components in
# MapReduce") if cluster diameters grow adversarial.

CC_MAX_ROUNDS = 20  # backstop: propagate+jump covers diameter ~2^20


def connected_components(
    edges: DataFrame,
    max_rounds: int = CC_MAX_ROUNDS,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(src, dst) undirected edge list -> (id, comp) with comp = min
    reachable node id. Deterministic; iterates to fixpoint.

    ``checkpoint_dir``: when given, per-round lineage truncation uses
    reliable ``checkpoint()`` to that directory (DFS path on a real
    cluster — survives executor loss, so a 100 TB run doesn't restart
    the whole iteration when one node dies). Default ``localCheckpoint``
    keeps single-process runs zero-config; executor-local blocks are NOT
    fault-tolerant, so clusters should always pass a dir."""
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # The edge list is consumed once per round: checkpoint it, or every
    # round re-executes the (expensive) pair-generation lineage —
    # measured 10x slower on the embedding near-dup source without this.
    # Edges are the small output of candidate generation, never the corpus.
    sym = _truncate(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
    )
    # Initialize with round 1's propagate already applied:
    # comp_0 = min(id, min(neighbor)) — one aggregation instead of a full
    # join round, saving 2 joins + a checkpoint per run.
    labels = _truncate(
        sym.groupBy("a")
        .agg(F.min("b").alias("_mb"))
        .select(
            F.col("a").alias("id"),
            F.least(F.col("a"), F.col("_mb")).alias("comp"),
        )
    )
    for _ in range(max_rounds):
        # propagate: min over neighbors' labels. The round-start label is
        # carried through as ``pc`` so the fixpoint test below is a
        # narrow scan of the just-checkpointed table — the per-round
        # labels-vs-prev join it replaces was a second (broadcast) job
        # every round (optimization r15; label arithmetic unchanged).
        nbr = (
            sym.join(
                labels.select(
                    F.col("id").alias("b"), F.col("comp").alias("bcomp")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("bcomp").alias("nbr_comp"))
            .select(F.col("a").alias("id"), "nbr_comp")
        )
        lp = labels.join(nbr, "id", "left").select(
            "id",
            F.col("comp").alias("pc"),
            F.least(
                F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
            ).alias("comp"),
        )
        # jump: comp := label(comp) — pointer doubling
        lk = lp.select(
            F.col("id").alias("comp"), F.col("comp").alias("jcomp")
        )
        stepped = _truncate(
            lp.join(lk, "comp", "left").select(
                "id",
                "pc",
                F.least(
                    F.col("comp"), F.coalesce("jcomp", F.col("comp"))
                ).alias("comp"),
            )
        )
        # Truncation doubles as the round's action; labels is referenced
        # 3x next round, so an un-truncated plan is ~3^rounds nodes.
        labels = stepped.select("id", "comp")
        # Fixpoint test on the checkpointed table: any label still moving?
        if stepped.where(F.col("comp") != F.col("pc")).limit(1).isEmpty():
            break
    return labels


def components_report(
    pairs: DataFrame,
    id_alias: str,
    cluster_alias: str,
    keep: bool = False,
) -> DataFrame:
    """(src, dst) pair frame -> the cluster report every dedup family
    serves: (id, cluster = min member, n_members[, keep]) — ONE
    spelling shared by the embedding and perceptual-media cluster
    queries (review r15: the comp+sizes+join block was copied
    verbatim into multimodal.py; a one-sided edit would silently
    diverge the two reports). ``keep`` appends the survivor flag
    (1 exactly for the lowest-id member)."""
    comp = connected_components(pairs)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("n_members"))
    cols = [
        F.col("id").alias(id_alias),
        F.col("comp").alias(cluster_alias),
        F.col("n_members").cast("long").alias("n_members"),
    ]
    if keep:
        cols.append(
            F.when(F.col("id") == F.col("comp"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("keep")
        )
    return comp.join(sizes, "comp").select(*cols)


def oracle_components_report(
    pairs_sql: str,
    a_col: str,
    b_col: str,
    id_alias: str,
    cluster_alias: str,
    keep: bool = False,
) -> str:
    """The DuckDB twin of :func:`components_report`: recursive-CTE
    reachability over the given pair subquery — ONE SQL spelling for
    every cluster oracle (same review-r15 drift argument)."""
    keep_sel = (
        f",\n       CAST(CASE WHEN c.id = c.{cluster_alias} THEN 1 "
        "ELSE 0 END AS BIGINT) AS keep"
        if keep
        else ""
    )
    return f"""
WITH RECURSIVE pairs AS (
  SELECT {a_col}, {b_col} FROM ({pairs_sql}) t
), edges AS (
  SELECT {a_col} AS a, {b_col} AS b FROM pairs
  UNION ALL
  SELECT {b_col}, {a_col} FROM pairs
), reach AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
), comp AS (
  SELECT id, MIN(r) AS {cluster_alias} FROM reach GROUP BY id
)
SELECT c.id AS {id_alias}, c.{cluster_alias}, s.n_members{keep_sel}
FROM comp c
JOIN (
  SELECT {cluster_alias}, CAST(COUNT(*) AS BIGINT) AS n_members
  FROM comp GROUP BY {cluster_alias}
) s USING ({cluster_alias})
"""


def q_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse embedding near-dup pairs (the oracle-checkable pair
    source) into clusters: (vec_id, component_id = min member,
    n_members). The oracle recomputes components with a recursive CTE."""
    from .similarity import q_embedding_neardup

    pairs = q_embedding_neardup(spark, sf_dir).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    return components_report(pairs, "vec_id", "component_id")


def _oracle_cluster_components() -> str:
    from .similarity import ORACLE_EMBEDDING_NEARDUP

    return oracle_components_report(
        ORACLE_EMBEDDING_NEARDUP, "id_a", "id_b", "vec_id", "component_id"
    )


QUERIES = {
    "dedup_exact_fingerprint": (q_dedup_exact, ORACLE_DEDUP_EXACT),
    "dedup_minhash_portable": (q_minhash_portable, _oracle_minhash_portable()),
    "dedup_simhash_portable": (q_simhash_portable, _oracle_simhash_portable()),
    "dedup_cluster_components": (q_cluster_components, _oracle_cluster_components()),
    "dedup_simhash_neardup": (q_simhash_neardup, None),
    "dedup_jaccard_vs_probe": (q_jaccard_vs_probe, ORACLE_JACCARD_VS_PROBE),
    "dedup_minhash_neardup": (q_minhash_neardup, None),
    "dedup_simhash": (q_simhash, None),
    "dedup_events_exact": (q_dedup_events_exact, ORACLE_DEDUP_EVENTS),
}


# --- incremental (ingestion-time) dedup vs an existing corpus -------------
# The operation a 100 TB pipeline actually runs day to day: dedup the
# ARRIVING delta against the already-ingested base without re-pairing
# the base with itself. Uses the portable (sha256) MinHash pieces so the
# whole decision — banding, verification, best-match selection — is
# hash-checkable in DuckDB. Scale shape: in production the base's band
# table is an ingest-time artifact (computed once, stored keyed by
# (band, bucket), exactly like the bucketed PageRank edge table); the
# delta computes its own bands on arrival, the candidate join shuffles
# band keys only (never text), and shingle verification touches only
# candidate doc ids — cost is proportional to the delta and its
# collisions, never the base corpus. Here the base bands are derived
# inline because the driver contract is a pure (spark, sf_dir) query.
#
# Fixture delta: truncated copies of every 20th base doc (true near-dups
# the banding must flag) + token-REVERSED copies of every 31st doc
# (reversal destroys word 3-gram shingles -> genuinely new content that
# must be kept; even an accidental band collision is rejected by exact
# verification, so kept/flagged is deterministic, not probabilistic).

INC_REV_OFFSET = 3_000_000
INC_REV_EVERY = 31


def _inc_delta(docs: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    keep = F.greatest(F.size(toks) - PMH_TRIM, F.lit(1))
    truncated = docs.where(F.col("doc_id") % PMH_COPY_EVERY == 0).select(
        (F.col("doc_id") + PMH_ID_OFFSET).alias("doc_id"),
        F.array_join(F.slice(toks, 1, keep), " ").alias("text"),
    )
    reversed_ = docs.where(F.col("doc_id") % INC_REV_EVERY == 0).select(
        (F.col("doc_id") + INC_REV_OFFSET).alias("doc_id"),
        F.array_join(F.reverse(toks), " ").alias("text"),
    )
    return truncated.unionByName(reversed_)


def _pmh_sig_of(sh: DataFrame) -> DataFrame:
    """(doc_id, s) -> (doc_id, sig): the portable sha256-derived MinHash
    signature (same arithmetic as q_minhash_portable).

    Sub-shingle-width docs (empty ``s``) are dropped HERE, on the input:
    an empty shingle array is the only way the signature comes out
    all-NULL, and filtering the cheap ``size(s) > 0`` predicate before
    hashing means the K-element signature expression is evaluated once.
    (The previous spelling filtered ``element_at(sig, 1) IS NOT NULL``
    downstream in _pmh_bands_of; Spark does no common-subexpression
    elimination across the Filter/Project boundary, so the Filter and
    the banding Project EACH evaluated the full signature — the 2x
    regression the r9 bench flagged.)

    Hash-once spelling (optimization r16, guide §4.1 / VERDICT r15 #3):
    sha256 runs ONCE per shingle — one transform converts the first 14
    hex digits to the 56-bit value h1*16^7 + h2, and each of the K
    min-folds splits it with pure integer ops (h1 = v >> 28,
    h2 = v & (2^28-1) — 7 hex digits = 28 bits, so the split is exact
    and bit-identical to the two-conv spelling). The r10 rejection of
    hash-once applied to a DIFFERENT shape (a nested second transform
    re-parsing hex strings per element); this one adds no extra
    higher-order pass — it also DROPS the struct-array materialization
    the old spelling paid — and was re-measured faster on Spark 4.1
    (interleaved A/B, OPTIMIZATION_r16.md). The old two-sha2 spelling
    stays machine-pinned as :func:`_pmh_sig_of_twosha_r15`."""
    hashed = sh.where(F.size("s") > 0).select(
        "doc_id",
        F.transform(
            "s",
            lambda g: F.conv(F.substring(F.sha2(g, 256), 1, 14), 16, 10)
            .cast("long"),
        ).alias("hv"),
    )
    mask = F.lit((1 << 28) - 1)
    return hashed.select(
        "doc_id",
        F.array(
            *[
                F.array_min(
                    F.transform(
                        "hv",
                        lambda v: F.shiftright(v, 28)
                        + F.lit(i) * v.bitwiseAND(mask),
                    )
                )
                for i in range(PMH_K)
            ]
        ).alias("sig"),
    )


def _pmh_sig_of_twosha_r15(sh: DataFrame) -> DataFrame:
    """The pre-r16 spelling of :func:`_pmh_sig_of` (sha256 evaluated
    twice per shingle, struct-array intermediate) — kept as the
    machine-checked twin pinning the hash-once rewrite's semantics
    (tests/test_neardup_twins.py::test_pmh_sig_hash_once_twin)."""
    hashed = sh.where(F.size("s") > 0).select(
        "doc_id",
        F.transform(
            "s",
            lambda g: F.struct(
                F.conv(F.substring(F.sha2(g, 256), 1, 7), 16, 10)
                .cast("long")
                .alias("h1"),
                F.conv(F.substring(F.sha2(g, 256), 8, 7), 16, 10)
                .cast("long")
                .alias("h2"),
            ),
        ).alias("hp"),
    )
    return hashed.select(
        "doc_id",
        F.array(
            *[
                F.array_min(
                    F.transform("hp", lambda p: p["h1"] + F.lit(i) * p["h2"])
                )
                for i in range(PMH_K)
            ]
        ).alias("sig"),
    )


def _pmh_bands_of(sig: DataFrame) -> DataFrame:
    rows_per_band = PMH_K // PMH_BANDS
    # Sub-shingle-width docs never reach here: _pmh_sig_of drops empty
    # shingle sets on the input (the only source of all-NULL signatures,
    # which would co-band every short doc into ONE bucket per band — a
    # quadratic candidate blow-up the exact-jaccard verify never
    # confirms). Dedup outcomes are identical (those docs were never
    # dedupable); the ingest loop separately rebuckets them by exact
    # text hash.
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at(
                                    "sig", b * rows_per_band + r + 1
                                ).cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(PMH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def base_band_table(base: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, band, bucket): the ingest-time artifact
    of incremental dedup. On a cluster this is written ONCE when the base
    corpus lands (parquet partitioned/bucketed by (band, bucket) — the
    same one-time-write discipline as the bucketed PageRank edge table)
    and every future delta joins against the stored table instead of
    re-deriving the base's signatures; ``incremental_dedup`` accepts it
    via ``base_bands`` (round-trip equality pinned in
    tests/test_neardup_twins.py)."""
    sh = base.select("doc_id", shingles("text").alias("s"))
    return _pmh_bands_of(_pmh_sig_of(sh))


def incremental_dedup(
    base: DataFrame,
    delta: DataFrame,
    base_bands: DataFrame | None = None,
    delta_sh: DataFrame | None = None,
    delta_bands: DataFrame | None = None,
) -> DataFrame:
    """(base, delta) -> one row per delta doc: (doc_id, is_kept, dup_of,
    jaccard). A delta doc is a duplicate iff some BASE doc verifies at
    string-shingle Jaccard >= PMH_THRESHOLD among its band candidates;
    dup_of is the best verified match (highest Jaccard, ties to the
    lowest base id — deterministic via an encoded order key).

    ``base_bands``: optionally the precomputed/stored band table
    (:func:`base_band_table`) — the production path, where bands are an
    ingest-time artifact and only candidate verification touches base
    text. ``delta_sh`` / ``delta_bands``: optionally the delta's
    precomputed shingle/band tables (see :func:`intra_batch_dedup` —
    lets the ingest loop pay the shingle+sha256 pass once per batch).

    Scale shape of the verify leg (VERDICT r5 item 2): with stored
    bands — the production/ingest path — the base corpus is NEVER
    scanned or shingled wholesale. The band join yields the candidate
    (delta_id, base_id) pairs; the distinct candidate base-id set —
    bounded by |delta| x bands, tiny next to the base — is broadcast
    into a LEFT-SEMI join against ``base`` BEFORE the shingle
    projection, so the only base rows that reach the scan and the
    (expensive) shingle transform are verified candidates, and a
    bucketed/sorted kept-corpus layout prunes the scan itself. The
    whole call then touches: the delta, the band table, and the
    candidate base rows — cost proportional to the delta and its
    collisions, never the base corpus (plan-pinned in
    tests/test_plans.py). Without stored bands the band derivation is
    itself an unavoidable full-base shingle pass, so THAT path instead
    caches the full shingles (lazy persist, reused by the verify join
    inside the same job — measured 2x faster than eager-checkpoint
    staging, and a second scan would only re-pay the pass the band
    build already made; the cache is GC-released with the frame, and
    the streaming loop never takes this path). The stored-bands path
    localCheckpoint-s its two reused small frames (delta shingles,
    candidate pairs) so a long-lived streaming caller cannot
    accumulate pinned cache blocks across micro-batches."""
    inline = base_bands is None
    if inline:
        # one full shingle pass feeds bands AND verify
        base_cand_sh = base.select(
            "doc_id", shingles("text").alias("s")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        base_bands = _pmh_bands_of(_pmh_sig_of(base_cand_sh))
        # delta shingles / candidate pairs are each cheap map work over
        # the (small) delta: recomputing inside the one final job beats
        # an eager materialization barrier
        if delta_sh is None:
            delta_sh = delta.select("doc_id", shingles("text").alias("s"))
    else:
        base_cand_sh = None
        if delta_sh is None:
            delta_sh = delta.select(
                "doc_id", shingles("text").alias("s")
            ).localCheckpoint()
    if delta_bands is None:
        delta_bands = _pmh_bands_of(_pmh_sig_of(delta_sh))
    cand = (
        delta_bands.alias("d")
        .join(
            base_bands.alias("b"),
            (F.col("d.band") == F.col("b.band"))
            & (F.col("d.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("d.doc_id").alias("delta_id"),
            F.col("b.doc_id").alias("base_id"),
        )
        .dropDuplicates(["delta_id", "base_id"])
    )
    if not inline:
        # consumed twice (candidate-id broadcast + verify join): cut the
        # band-join lineage so it runs once
        cand = cand.localCheckpoint()
        # shingle ONLY candidate base docs — broadcast the candidate id
        # set and semi-join BEFORE the shingle projection (scan prunes
        # to candidates; the transform never sees a non-candidate row)
        cand_ids = cand.select(F.col("base_id").alias("doc_id")).distinct()
        base_cand_sh = base.join(
            F.broadcast(cand_ids), "doc_id", "left_semi"
        ).select("doc_id", shingles("text").alias("s"))
    verified = (
        cand.join(
            delta_sh.select(F.col("doc_id").alias("delta_id"), F.col("s").alias("ds")),
            "delta_id",
        )
        .join(
            base_cand_sh.select(
                F.col("doc_id").alias("base_id"), F.col("s").alias("bs")
            ),
            "base_id",
        )
        .select("delta_id", "base_id", jaccard_of("ds", "bs").alias("jaccard"))
        .where(F.col("jaccard") >= PMH_THRESHOLD)
    )
    # best match per delta doc: jaccard desc, base_id asc, as ONE hash agg
    # via an encoded order key (6dp jaccard is exact in micro-units;
    # base ids < 1e10 — the agg_top1_per_group_sortfree discipline)
    okey = (
        F.round(F.col("jaccard") * 1_000_000, 0).cast("long")
        * F.lit(10_000_000_000)
        - F.col("base_id")
    )
    best = verified.groupBy("delta_id").agg(
        F.max_by("base_id", okey).alias("dup_of"),
        F.max("jaccard").alias("jaccard"),
    )
    return (
        delta.select("doc_id")
        .join(best.withColumnRenamed("delta_id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.col("dup_of").isNull().alias("is_kept"),
            "dup_of",
            "jaccard",
        )
    )


def intra_batch_dedup(
    delta: DataFrame,
    delta_sh: DataFrame | None = None,
    delta_bands: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, text) -> (doc_id, is_kept, dup_of): near-dup verdict for
    duplicates WITHIN one delta/micro-batch (the bursty-producer case a
    delta-vs-base pass cannot see: a crawler re-visit landing twice in
    the same batch). Same banding + shingle-Jaccard threshold as
    :func:`incremental_dedup`; verified pairs form an undirected graph
    and each connected component keeps its lowest doc_id (deterministic
    survivor), every other member mapping to it (``dup_of`` = component
    min). Docs with no verified partner are kept.

    ``delta_sh`` / ``delta_bands``: optionally the precomputed shingle
    ((doc_id, s)) and band ((doc_id, band, bucket)) tables for ``delta``
    — the streaming ingest loop computes the compute-bound
    shingle+sha256 pass ONCE per micro-batch and shares it between this
    pass, the base comparison, and the stored-band write (it would
    otherwise run three times per batch). Callers must pass
    materialized (checkpointed) frames derived with the same
    shingles/_pmh_* arithmetic.

    Scale: the band self-join is over ONE micro-batch, not the corpus —
    bounded by the trigger interval; the component step runs on the
    verified-pair edge list only (near-dup clusters, tiny)."""
    if delta_sh is None:
        delta_sh = delta.select(
            "doc_id", shingles("text").alias("s")
        ).localCheckpoint()
    bands = (
        delta_bands
        if delta_bands is not None
        else _pmh_bands_of(_pmh_sig_of(delta_sh))
    )
    pairs = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    edges = (
        pairs.join(
            delta_sh.select(F.col("doc_id").alias("a"), F.col("s").alias("sa")),
            "a",
        )
        .join(
            delta_sh.select(F.col("doc_id").alias("b"), F.col("s").alias("sb")),
            "b",
        )
        .where(jaccard_of("sa", "sb") >= PMH_THRESHOLD)
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    comp = connected_components(edges).withColumnRenamed("id", "doc_id")
    return delta.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id",
        (F.col("comp").isNull() | (F.col("comp") == F.col("doc_id"))).alias(
            "is_kept"
        ),
        F.when(F.col("comp") != F.col("doc_id"), F.col("comp")).alias("dup_of"),
    )


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return incremental_dedup(base, _inc_delta(base))


def _oracle_dedup_incremental() -> str:
    rows_per_band = PMH_K // PMH_BANDS
    bucket = " || ',' || ".join(
        f"CAST(sig[b.band * {rows_per_band} + {r + 1}] AS VARCHAR)"
        for r in range(rows_per_band)
    )
    sig_cte = f"""
  SELECT doc_id, s,
         list_transform(range(0, {PMH_K}),
           i -> list_min(list_transform(range(1, len(h1s) + 1),
                j -> h1s[j] + i * h2s[j]))) AS sig
  FROM (
    SELECT doc_id, s,
           list_transform(hx, h -> {_o_hex7('h', 1)}) AS h1s,
           list_transform(hx, h -> {_o_hex7('h', 8)}) AS h2s
    FROM (SELECT doc_id, s, list_transform(s, g -> sha256(g)) AS hx FROM {{src}})
  )"""
    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents
), delta AS (
  SELECT doc_id + {PMH_ID_OFFSET} AS doc_id,
         array_to_string(
           (string_split(text, ' '))[1:greatest(len(string_split(text, ' ')) - {PMH_TRIM}, 1)],
           ' ') AS text
  FROM documents WHERE doc_id % {PMH_COPY_EVERY} = 0
  UNION ALL
  SELECT doc_id + {INC_REV_OFFSET},
         array_to_string(list_reverse(string_split(text, ' ')), ' ')
  FROM documents WHERE doc_id % {INC_REV_EVERY} = 0
), base_sh AS (
  SELECT doc_id, {oracle_shingles('text')} AS s FROM base
), delta_sh AS (
  SELECT doc_id, {oracle_shingles('text')} AS s FROM delta
), base_sig AS ({sig_cte.format(src='base_sh')}
), delta_sig AS ({sig_cte.format(src='delta_sh')}
), base_bands AS (
  SELECT doc_id, b.band, {bucket} AS bucket
  FROM base_sig, (SELECT UNNEST(range(0, {PMH_BANDS})) AS band) b
), delta_bands AS (
  SELECT doc_id, b.band, {bucket} AS bucket
  FROM delta_sig, (SELECT UNNEST(range(0, {PMH_BANDS})) AS band) b
), cand AS (
  SELECT DISTINCT d.doc_id AS delta_id, bb.doc_id AS base_id
  FROM delta_bands d JOIN base_bands bb
    ON d.band = bb.band AND d.bucket = bb.bucket
), verified AS (
  SELECT c.delta_id, c.base_id,
         ROUND(CAST(len(list_intersect(ds.s, bs.s)) AS DOUBLE)
               / len(list_distinct(list_concat(ds.s, bs.s))), 6) AS jaccard
  FROM cand c
  JOIN delta_sh ds ON ds.doc_id = c.delta_id
  JOIN base_sh bs ON bs.doc_id = c.base_id
  WHERE ROUND(CAST(len(list_intersect(ds.s, bs.s)) AS DOUBLE)
              / len(list_distinct(list_concat(ds.s, bs.s))), 6) >= {PMH_THRESHOLD}
), best AS (
  SELECT delta_id,
         max_by(base_id,
                CAST(ROUND(jaccard * 1000000, 0) AS BIGINT) * 10000000000
                  - base_id) AS dup_of,
         MAX(jaccard) AS jaccard
  FROM verified GROUP BY delta_id
)
SELECT d.doc_id,
       b.dup_of IS NULL AS is_kept,
       b.dup_of,
       b.jaccard
FROM delta d LEFT JOIN best b ON b.delta_id = d.doc_id
"""


QUERIES["dedup_incremental"] = (
    q_dedup_incremental,
    _oracle_dedup_incremental(),
)


INTRA_BATCH_MOD = 3  # fixture batch = every 3rd doc (a micro-batch is a
# SLICE of the corpus by contract; the whole corpus as one batch would
# bench the fixture, not the operator)


def q_dedup_intra_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One bursty micro-batch: a corpus slice PLUS its truncated/reversed
    copies arriving together. intra_batch_dedup must collapse every
    verified near-dup cluster to its lowest doc_id; the oracle recomputes
    the banding, the Jaccard verification, and the connected components
    (recursive CTE) in pure SQL."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") % INTRA_BATCH_MOD == 0)
    )
    # the fixture batch arrives as ONE file partition: spread it before
    # the signature hashing (sha256 per shingle — the compute-bound step)
    # or the whole pass runs single-threaded. A real stream's micro-batch
    # arrives pre-partitioned from the source, so the operator itself
    # does not force an exchange.
    batch = docs.unionByName(_inc_delta(docs)).repartition("doc_id")
    return intra_batch_dedup(batch)


def _oracle_dedup_intra_batch() -> str:
    rows_per_band = PMH_K // PMH_BANDS
    bucket = " || ',' || ".join(
        f"CAST(sig[b.band * {rows_per_band} + {r + 1}] AS VARCHAR)"
        for r in range(rows_per_band)
    )
    sig_cte = f"""
  SELECT doc_id, s,
         list_transform(range(0, {PMH_K}),
           i -> list_min(list_transform(range(1, len(h1s) + 1),
                j -> h1s[j] + i * h2s[j]))) AS sig
  FROM (
    SELECT doc_id, s,
           list_transform(hx, h -> {_o_hex7('h', 1)}) AS h1s,
           list_transform(hx, h -> {_o_hex7('h', 8)}) AS h2s
    FROM (SELECT doc_id, s, list_transform(s, g -> sha256(g)) AS hx FROM sh)
  )"""
    return f"""
WITH RECURSIVE slice AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {INTRA_BATCH_MOD} = 0
), batch AS (
  SELECT doc_id, text FROM slice
  UNION ALL
  SELECT doc_id + {PMH_ID_OFFSET} AS doc_id,
         array_to_string(
           (string_split(text, ' '))[1:greatest(len(string_split(text, ' ')) - {PMH_TRIM}, 1)],
           ' ') AS text
  FROM slice WHERE doc_id % {PMH_COPY_EVERY} = 0
  UNION ALL
  SELECT doc_id + {INC_REV_OFFSET},
         array_to_string(list_reverse(string_split(text, ' ')), ' ')
  FROM slice WHERE doc_id % {INC_REV_EVERY} = 0
), sh AS (
  SELECT doc_id, {oracle_shingles('text')} AS s FROM batch
), sg AS ({sig_cte}
), bands AS (
  SELECT doc_id, b.band, {bucket} AS bucket
  FROM sg, (SELECT UNNEST(range(0, {PMH_BANDS})) AS band) b
), pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
), verified AS (
  SELECT p.a, p.b
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.a
  JOIN sh sb ON sb.doc_id = p.b
  WHERE ROUND(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
              / len(list_distinct(list_concat(sa.s, sb.s))), 6)
        >= {PMH_THRESHOLD}
), edges AS (
  SELECT a, b FROM verified
  UNION ALL
  SELECT b, a FROM verified
), reach AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
), comp AS (
  SELECT id, MIN(r) AS comp FROM reach GROUP BY id
)
SELECT d.doc_id,
       (c.comp IS NULL OR c.comp = d.doc_id) AS is_kept,
       CASE WHEN c.comp <> d.doc_id THEN c.comp END AS dup_of
FROM batch d LEFT JOIN comp c ON c.id = d.doc_id
"""


QUERIES["dedup_intra_batch"] = (
    q_dedup_intra_batch,
    _oracle_dedup_intra_batch(),
)
