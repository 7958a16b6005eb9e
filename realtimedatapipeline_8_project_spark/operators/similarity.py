"""Similarity search over ``embeddings`` (SURVEY §2.13; north-star ANN).

* Brute-force top-k cosine: broadcast the probe vector, score every row
  with JVM-side higher-order functions (zip_with/aggregate), then
  TakeOrderedAndProject for the top-k — fully distributed single pass,
  the correctness baseline.
* LSH-bucketed variant (scale path): deterministic sign-bit sketch over a
  subset of dimensions buckets the vectors; only the probe's bucket (and
  neighbors at Hamming distance 1) are scored — prunes ~(1 - (d+1)/2^b)
  of the corpus per query at the cost of recall.

Unlike the text near-dup family (whose scale path rides on Spark's
xxhash64, which DuckDB cannot reproduce), every pruning structure here is
deterministic arithmetic — so even the *approximate* variants carry full
DuckDB oracles that re-execute the same sketch/quantizer in SQL. The
oracle checks algorithm fidelity; recall vs. ground truth is checked
separately in tests/test_similarity_quality.py against the brute-force
baseline.

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


def oracle_sign_sketch(emb_sql: str, n_bits: int = N_SKETCH_BITS) -> str:
    """DuckDB mirror of :func:`sign_sketch` (same fold, 1-based slice)."""
    bits = (
        f"list_transform({emb_sql}[1:{n_bits}], "
        "x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END)"
    )
    return f"list_reduce(list_prepend(0, {bits}), (acc, b) -> acc * 2 + b)"


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: score only vectors whose sign-sketch bucket is within
    Hamming distance 1 of the probe's bucket. Approximate vs. ground truth,
    but fully deterministic — the oracle replays the identical sketch and
    pruning in SQL; recall is measured in test_similarity_quality.py."""
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


ORACLE_KNN_LSH = f"""
WITH b AS (
  SELECT vec_id, label, embedding,
         {oracle_sign_sketch('embedding')} AS bucket
  FROM embeddings
), probe AS (
  SELECT embedding AS probe_emb, bucket AS probe_bucket
  FROM b WHERE vec_id = {PROBE_VEC_ID}
)
SELECT vec_id, label,
       ROUND({oracle_cosine('embedding', 'probe_emb')}, 8) AS cosine
FROM b, probe
WHERE vec_id <> {PROBE_VEC_ID}
  AND bit_count(xor(CAST(bucket AS BIGINT), CAST(probe_bucket AS BIGINT))) <= 1
ORDER BY cosine DESC, vec_id ASC
LIMIT {TOP_K}
"""


N_CENTROIDS = 8
N_PROBE = 2


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: deterministic coarse quantizer + probe-limited scan.

    Centroids are a deterministic sample of the corpus (every k-th vector
    by vec_id) — a stand-in for k-means that keeps the operator seed-free;
    swapping in trained centroids changes no plan shape. Assignment is a
    ROW-LOCAL argmax: the centroid set is collapsed to a single-row array
    (tiny aggregate), broadcast, and each vector folds over it picking the
    best cosine — zero shuffle of the corpus, no per-vector window. (Round
    1 cross-scored N x C rows and ranked with a row_number window — an
    avoidable full exchange on vec_id that dies at 1B vectors.) Corpus
    size for the stride is an in-plan scalar aggregate, not a driver-side
    ``.count()`` action. The probe scans only the N_PROBE nearest inverted
    lists — at 1B vectors with 4k centroids this prunes ~99.95% of the
    corpus per query. Approximate vs. ground truth (q_knn_bruteforce is
    the exact baseline, recall measured in test_similarity_quality.py) but
    deterministic: the oracle replays the identical quantizer, fold-argmax
    (same tie-break: strict improvement keeps the lowest centroid_id), and
    probe in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    n_row = emb.agg(F.count(F.lit(1)).alias("_n"))
    stride = F.greatest(F.floor(F.col("_n") / N_CENTROIDS), F.lit(1)).cast("long")
    centroids = (
        emb.crossJoin(F.broadcast(n_row))
        .withColumn("_stride", stride)
        .where(
            (F.col("vec_id") % F.col("_stride") == 0)
            & (F.col("vec_id") < F.col("_stride") * N_CENTROIDS)
        )
        .select(
            (F.col("vec_id") / F.col("_stride")).cast("int").alias("centroid_id"),
            F.col("embedding").alias("c_emb"),
        )
    )
    # single-row, id-ascending centroid array — the broadcast "codebook"
    cent_arr = centroids.agg(
        F.sort_array(F.collect_list(F.struct("centroid_id", "c_emb"))).alias("cents")
    )
    sims = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            cosine_similarity(F.col("embedding"), c["c_emb"]).alias("sim"),
            c["centroid_id"].alias("cid"),
        ),
    )
    best = F.aggregate(
        sims,
        F.struct(
            F.lit(-2.0).cast("double").alias("sim"), F.lit(-1).alias("cid")
        ),
        lambda acc, s: F.when(s["sim"] > acc["sim"], s).otherwise(acc),
    )
    assigned = emb.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id", "label", "embedding", best["cid"].alias("centroid_id")
    )
    # probe: centroids nearest to the query vector
    probe_vec = emb.where(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("probe_emb")
    )
    probe_lists = (
        centroids.crossJoin(F.broadcast(probe_vec))
        .select("centroid_id", cosine_similarity("c_emb", "probe_emb").alias("s"))
        .orderBy(F.desc("s"), F.asc("centroid_id"))
        .limit(N_PROBE)
        .select("centroid_id")
    )
    return (
        assigned.join(F.broadcast(probe_lists), "centroid_id")
        .crossJoin(F.broadcast(probe_vec))
        .where(F.col("vec_id") != PROBE_VEC_ID)
        .select(
            "vec_id",
            "label",
            F.round(cosine_similarity("embedding", "probe_emb"), 8).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


ORACLE_KNN_IVF = f"""
WITH params AS (
  SELECT GREATEST(CAST(floor(COUNT(*) / {N_CENTROIDS}) AS BIGINT), 1) AS stride
  FROM embeddings
), centroids AS (
  SELECT CAST(floor(e.vec_id / p.stride) AS INT) AS centroid_id,
         e.embedding AS c_emb
  FROM embeddings e, params p
  WHERE e.vec_id % p.stride = 0 AND e.vec_id < p.stride * {N_CENTROIDS}
), cent_arr AS (
  SELECT list(struct_pack(centroid_id := centroid_id, c_emb := c_emb)
              ORDER BY centroid_id) AS cents
  FROM centroids
), assigned AS (
  SELECT e.vec_id, e.label, e.embedding,
         (list_reduce(
            list_prepend(
              struct_pack(sim := -2.0, cid := -1),
              list_transform(ca.cents, c -> struct_pack(
                sim := {oracle_cosine('e.embedding', 'c.c_emb')},
                cid := c.centroid_id))),
            (acc, s) -> CASE WHEN s.sim > acc.sim THEN s ELSE acc END)).cid
           AS centroid_id
  FROM embeddings e CROSS JOIN cent_arr ca
), probe AS (
  SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = {PROBE_VEC_ID}
), probe_lists AS (
  SELECT centroid_id
  FROM centroids, probe
  ORDER BY {oracle_cosine('c_emb', 'probe_emb')} DESC, centroid_id ASC
  LIMIT {N_PROBE}
)
SELECT a.vec_id, a.label,
       ROUND({oracle_cosine('a.embedding', 'probe_emb')}, 8) AS cosine
FROM assigned a
JOIN probe_lists USING (centroid_id)
CROSS JOIN probe
WHERE a.vec_id <> {PROBE_VEC_ID}
ORDER BY cosine DESC, a.vec_id ASC
LIMIT {TOP_K}
"""


COSINE_DUP_THRESHOLD = 0.95
NEARDUP_COPY_EVERY = 10
NEARDUP_ID_OFFSET = 1_000_000
# All-pairs bucketing needs far more buckets than the probe-pruning sketch:
# within-bucket pairing is quadratic, so bucket population must stay O(1k).
# 16 sign bits = 65 536 buckets (vs 256 at 8 bits); at 1 B vectors that is
# ~15 k rows/bucket — and the production knob is simply more bits (dims
# permitting) or multi-band sketches, same plan shape.
NEARDUP_SKETCH_BITS = 16


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-sketch buckets prune the
    pair space (same-bucket candidates only), exact cosine verifies at
    >= 0.95. The all-pairs analog of MinHash banding for the dense-vector
    modality.

    The fixture corpus has no true near-dups, so the input unions in a
    slightly perturbed copy of every 10th vector (each element scaled by
    0.998..1.002 cyclically) — real near-dup pairs at cosine ~0.999 that
    the operator must recover. Scaling by a positive factor never flips a
    sign bit, so each copy provably lands in its original's bucket. The
    oracle replays the same synthesis, sketch, and verification in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    perturbed = base.where(F.col("vec_id") % NEARDUP_COPY_EVERY == 0).select(
        (F.col("vec_id") + NEARDUP_ID_OFFSET).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * ((F.lit(998) + (i % 5)).cast("double") / F.lit(1000.0)),
        ).alias("embedding"),
    )
    corpus = base.unionByName(perturbed).withColumn(
        "bucket", sign_sketch("embedding", NEARDUP_SKETCH_BITS)
    )
    a = corpus.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"), "bucket"
    )
    b = corpus.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"), "bucket"
    )
    cand = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    return (
        cand.select(
            "id_a",
            "id_b",
            F.round(cosine_similarity("emb_a", "emb_b"), 8).alias("cosine"),
        )
        .where(F.col("cosine") >= COSINE_DUP_THRESHOLD)
    )


ORACLE_EMBEDDING_NEARDUP = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
), corpus AS (
  SELECT vec_id, embedding FROM base
  UNION ALL
  SELECT vec_id + {NEARDUP_ID_OFFSET},
         list_transform(embedding,
             (x, i) -> x * (CAST(998 + ((i - 1) % 5) AS DOUBLE) / 1000.0))
  FROM base WHERE vec_id % {NEARDUP_COPY_EVERY} = 0
), b AS (
  SELECT vec_id, embedding,
         {oracle_sign_sketch('embedding', NEARDUP_SKETCH_BITS)} AS bucket
  FROM corpus
)
SELECT a.vec_id AS id_a, c.vec_id AS id_b,
       ROUND({oracle_cosine('a.embedding', 'c.embedding')}, 8) AS cosine
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE ROUND({oracle_cosine('a.embedding', 'c.embedding')}, 8)
      >= {COSINE_DUP_THRESHOLD}
"""


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


# --- int8 symmetric quantization (storage path for vector corpora) -------
# At 100 TB of float32 embeddings, int8 quantization cuts storage and
# shuffle bytes 4x. Per-vector symmetric scale (max |x| / 127), quantize
# JVM-side, and report reconstruction error stats per label — all exact
# arithmetic, replayed verbatim by the oracle.


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    xs = F.transform("embedding", lambda x: x.cast("double"))
    scale = F.array_max(F.transform(xs, lambda x: F.abs(x))) / F.lit(127.0)
    quant = F.transform(xs, lambda x: F.round(x / scale).cast("int"))
    dequant_err = F.zip_with(
        xs, quant, lambda x, q: F.abs(x - q.cast("double") * scale)
    )
    return (
        emb.select(
            "label",
            scale.alias("scale"),
            F.array_max(dequant_err).alias("max_err"),
            F.array_max(F.transform(quant, lambda q: F.abs(q))).alias("max_q"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("max_err") * 1e6, 4).alias("max_err_ppm"),
            F.max("max_q").alias("max_abs_q"),
        )
    )


_O_XS = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_O_SCALE = f"list_aggregate(list_transform({_O_XS}, x -> abs(x)), 'max') / 127.0"
ORACLE_EMBEDDING_QUANTIZE = f"""
WITH q AS (
  SELECT label,
         {_O_SCALE} AS scale,
         list_transform({_O_XS},
             x -> CAST(round(x / ({_O_SCALE})) AS INTEGER)) AS quant,
         {_O_XS} AS xs
  FROM embeddings
), e AS (
  SELECT label,
         list_aggregate(
             list_transform(range(1, len(xs) + 1),
                 i -> abs(xs[i] - CAST(quant[i] AS DOUBLE) * scale)),
             'max') AS max_err,
         list_aggregate(list_transform(quant, v -> abs(v)), 'max') AS max_q
  FROM q
)
SELECT label, COUNT(*) AS n,
       ROUND(MAX(max_err) * 1e6, 4) AS max_err_ppm,
       MAX(max_q) AS max_abs_q
FROM e GROUP BY label
"""


# --- integer-exact k-means training ----------------------------------------
# The trained-codebook half of the IVF story (q_knn_ivf uses a
# deterministic sample as its coarse quantizer; this operator trains a
# real one). Float Lloyd iterations can never hash-match across engines
# (distance sums and mean updates are reduction-order-dependent), so the
# entire algorithm runs in integer space: vectors quantized once by
# floor(x * 1e6) (exact double op), distances are exact int64 sums of
# squared differences, and centroid updates are floor(sum / count) with
# the division done in (exact-range) double then floored — every
# iteration bit-identical in Spark and DuckDB, at any partition count.
#
# Scale shape: assignment is a ROW-LOCAL fold over the broadcast K-row
# centroid array (zero corpus shuffle — same plan as IVF assignment);
# the update is posexplode to (cluster, dim) cells with map-side combine
# — the shuffle carries K x D partial sums per partition, never vectors.
# The plan grows linearly in iterations (each references the assignment
# once), so no per-round checkpoint is needed at these depths.

KM_K = 4
KM_ITERS = 3
KM_QSCALE = 10**6
KM_INIT_IDS = (0, 100, 200, 300)
KM_DIM = 64


def _km_quantize(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {KM_QSCALE}) AS BIGINT))"
        ).alias("qv"),
    )


_KM_DIST = (
    "aggregate(zip_with(qv, cent.c, (a, b) -> (a - b) * (a - b)), "
    "CAST(0 AS BIGINT), (s, x) -> s + x)"
)


def _km_assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, qv, k, d): nearest centroid per vector — row-local fold
    over the broadcast centroid array; ties break to the lowest k via
    struct ordering (d first, k second)."""
    row = cents.agg(
        F.array_sort(F.collect_list(F.struct("k", "c"))).alias("cents")
    )
    best = F.expr(
        f"array_min(transform(cents, cent -> "
        f"named_struct('d', {_KM_DIST}, 'k', cent.k)))"
    )
    return (
        q.crossJoin(F.broadcast(row))
        .withColumn("_b", best)
        .select("vec_id", "qv", F.col("_b.k").alias("k"), F.col("_b.d").alias("d"))
    )


def _km_update(assigned: DataFrame) -> DataFrame:
    """New centroids: element-wise floor-mean of member vectors."""
    cells = assigned.select("k", F.posexplode("qv").alias("pos", "val"))
    sums = cells.groupBy("k", "pos").agg(
        F.sum("val").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        sums.select(
            "k",
            "pos",
            F.expr("CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)").alias("m"),
        )
        .groupBy("k")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("k", F.expr("transform(pm, x -> x.m)").alias("c"))
    )


def q_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM_ITERS Lloyd iterations from a fixed spread of seed vectors;
    output = final assignment (vec_id, cluster, dist) — integer-exact."""
    q = _km_quantize(load_table(spark, sf_dir, "embeddings"))
    k_of = F.expr(
        "CASE vec_id " + " ".join(
            f"WHEN {v} THEN {i}" for i, v in enumerate(KM_INIT_IDS)
        ) + " END"
    ).cast("int")
    cents = q.where(F.col("vec_id").isin(*KM_INIT_IDS)).select(
        k_of.alias("k"), F.col("qv").alias("c")
    )
    assigned = None
    for _ in range(KM_ITERS):
        assigned = _km_assign(q, cents)
        cents = _km_update(assigned)
    return assigned.select(
        "vec_id", F.col("k").alias("cluster"), F.col("d").alias("dist")
    )


def _oracle_kmeans_train() -> str:
    k_case = "CASE vec_id " + " ".join(
        f"WHEN {v} THEN {i}" for i, v in enumerate(KM_INIT_IDS)
    ) + " END"
    dist = (
        f"CAST(list_sum(list_transform(range(1, {KM_DIM + 1}), "
        f"i -> (v.qv[i] - c.c[i]) * (v.qv[i] - c.c[i]))) AS BIGINT)"
    )
    its = []
    prev_c = "c0"
    for t in range(1, KM_ITERS + 1):
        its.append(f"""a{t} AS (
  SELECT v.vec_id, v.qv, c.k, {dist} AS d
  FROM q v CROSS JOIN {prev_c} c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY d, c.k) = 1
)""")
        if t < KM_ITERS:
            its.append(f"""e{t} AS (
  SELECT k, i, CAST(SUM(qv[i]) AS BIGINT) AS s, COUNT(*) AS n
  FROM a{t} CROSS JOIN range(1, {KM_DIM + 1}) t{t}(i)
  GROUP BY k, i
), c{t} AS (
  SELECT k, array_agg(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)
                      ORDER BY i) AS c
  FROM e{t} GROUP BY k
)""")
            prev_c = f"c{t}"
    chain = ",\n".join(its)
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * {KM_QSCALE}) AS BIGINT)) AS qv
  FROM embeddings
), c0 AS (
  SELECT {k_case} AS k, qv AS c FROM q
  WHERE vec_id IN {KM_INIT_IDS}
),
{chain}
SELECT vec_id, k AS cluster, d AS dist FROM a{KM_ITERS}
"""


# --- IVF with a TRAINED codebook -------------------------------------------
# q_knn_ivf's deterministic-sample quantizer, upgraded with the k-means
# trainer above: one Lloyd iteration from spread seeds, then the same
# probe-limited scan — entirely in quantized integer space so the whole
# train -> assign -> probe -> rank pipeline is hash-checkable. Same scale
# shape as q_knn_ivf: assignment is a row-local fold over the broadcast
# codebook, and the probe touches only IVFT_PROBE inverted lists.

IVFT_K = 8
IVFT_SEEDS = tuple(range(0, 400, 50))  # vec_ids present at every sf
IVFT_PROBE = 2
IVFT_TOP = 10
IVFT_PROBE_ID = 0


def codebook_seeds(emb: DataFrame, k: int) -> tuple[int, ...]:
    """Deterministic K-seed selection: rank vec_ids by their Fibonacci-
    lattice hash (the split_assign/epoch_shuffle multiplicative scramble
    — a low-discrepancy permutation of the id space, so seeds spread
    uniformly over the corpus no matter how ids cluster) and take the
    first ``k`` (ties by vec_id). K is the scale knob the fixture
    constant ``IVFT_SEEDS`` pins for the stored oracles: on a real
    corpus K grows ~N / target-cluster-size, and every codebook consumer
    here (:func:`q_knn_ivf_trained`, :func:`semantic_blocks`,
    :func:`semantic_pairs`) accepts the resulting seed tuple. The
    collect is k ids — the codebook is driver-broadcast anyway."""
    from .sampling import KNUTH_32, MOD_32

    ranked = (
        emb.select(
            "vec_id",
            ((F.col("vec_id") * F.lit(KNUTH_32)) % F.lit(MOD_32)).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(k)
    )
    return tuple(sorted(r.vec_id for r in ranked.collect()))


def _seed_centroids(q: DataFrame, seeds: tuple[int, ...]) -> DataFrame:
    """(vec_id, qv) -> the K initial centroids (k, c) from seed vec_ids."""
    k_of = F.expr(
        "CASE vec_id " + " ".join(
            f"WHEN {v} THEN {i}" for i, v in enumerate(seeds)
        ) + " END"
    ).cast("int")
    return q.where(F.col("vec_id").isin(*seeds)).select(
        k_of.alias("k"), F.col("qv").alias("c")
    )

_IVFT_PDIST = (
    "aggregate(zip_with(qv, pqv, (a, b) -> (a - b) * (a - b)), "
    "CAST(0 AS BIGINT), (s, x) -> s + x)"
)


def q_knn_ivf_trained(
    spark: SparkSession,
    sf_dir: str,
    n_probe: int = IVFT_PROBE,
    seeds: tuple[int, ...] = IVFT_SEEDS,
) -> DataFrame:
    """Top-10 nearest vectors to the probe by exact quantized L2, scanning
    only ``n_probe`` (default IVFT_PROBE) clusters of a 1-iteration-
    trained codebook. ``n_probe`` is the recall/cost knob a user turns:
    more probed lists -> monotonically higher recall, linearly more rows
    scanned (tests/test_similarity_quality.py pins the curve); ``seeds``
    sizes the codebook (K = len(seeds); pick with
    :func:`codebook_seeds` at scale — the fixture default keeps the
    stored oracle byte-identical)."""
    q = _km_quantize(load_table(spark, sf_dir, "embeddings"))
    cents = _seed_centroids(q, seeds)
    cents = _km_update(_km_assign(q, cents))  # one Lloyd iteration
    assigned = _km_assign(q, cents)
    # probe vector = source-table point lookup (pushed 1-row read),
    # served through the parameterized ivf_probe — the train-then-serve
    # spelling of the same serving surface the stored-index queries use
    qv = quantized_probe_vector(spark, sf_dir)
    if qv is None:  # empty corpus: an empty answer, not a raise
        return _empty_probe_result(assigned)
    return ivf_probe(
        assigned, cents, qv, n_probe=n_probe, exclude_id=IVFT_PROBE_ID
    )


def _oracle_knn_ivf_trained(exclude: str = "") -> str:
    """DuckDB re-derivation of the trained-IVF probe. ``exclude`` is an
    extra candidate predicate (e.g. the r10 delete query's surviving-
    vectors filter — the codebook and assignments still derive from the
    FULL corpus, exactly like the frozen-codebook index after
    delete_ivf_vectors; only the candidate set shrinks)."""
    k_case = "CASE vec_id " + " ".join(
        f"WHEN {v} THEN {i}" for i, v in enumerate(IVFT_SEEDS)
    ) + " END"
    dist = (
        f"CAST(list_sum(list_transform(range(1, {KM_DIM + 1}), "
        f"i -> (v.qv[i] - c.c[i]) * (v.qv[i] - c.c[i]))) AS BIGINT)"
    )
    pdist = (
        f"CAST(list_sum(list_transform(range(1, {KM_DIM + 1}), "
        f"i -> (a.qv[i] - p.pqv[i]) * (a.qv[i] - p.pqv[i]))) AS BIGINT)"
    )
    cdist = (
        f"CAST(list_sum(list_transform(range(1, {KM_DIM + 1}), "
        f"i -> (c.c[i] - p.pqv[i]) * (c.c[i] - p.pqv[i]))) AS BIGINT)"
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * {KM_QSCALE}) AS BIGINT)) AS qv
  FROM embeddings
), c0 AS (
  SELECT {k_case} AS k, qv AS c FROM q WHERE vec_id IN {IVFT_SEEDS}
), a1 AS (
  SELECT v.vec_id, v.qv, c.k, {dist} AS d
  FROM q v CROSS JOIN c0 c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY d, c.k) = 1
), e1 AS (
  SELECT k, i, CAST(SUM(qv[i]) AS BIGINT) AS s, COUNT(*) AS n
  FROM a1 CROSS JOIN range(1, {KM_DIM + 1}) t1(i)
  GROUP BY k, i
), c1 AS (
  SELECT k, array_agg(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)
                      ORDER BY i) AS c
  FROM e1 GROUP BY k
), a2 AS (
  SELECT v.vec_id, v.qv, c.k, {dist} AS d
  FROM q v CROSS JOIN c1 c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY d, c.k) = 1
), probe AS (
  SELECT qv AS pqv FROM q WHERE vec_id = {IVFT_PROBE_ID}
), plists AS (
  SELECT c.k FROM c1 c CROSS JOIN probe p
  ORDER BY {cdist} ASC, c.k ASC
  LIMIT {IVFT_PROBE}
)
SELECT a.vec_id, {pdist} AS dist
FROM a2 a JOIN plists USING (k) CROSS JOIN probe p
WHERE a.vec_id <> {IVFT_PROBE_ID}{exclude}
ORDER BY dist ASC, a.vec_id ASC
LIMIT {IVFT_TOP}
"""


# --- semantic dedup (SemDeDup-style) ---------------------------------------
# Embedding-space near-duplicate pruning for training corpora: cluster
# with the trained codebook (1 Lloyd iteration from the IVFT seeds — the
# same quantized-integer pipeline as q_knn_ivf_trained), then emit exact
# quantized-L2 candidate pairs WITHIN each cluster below a distance
# threshold. Scale shape: the all-pairs work is confined to within-
# cluster blocks — on a real corpus K grows with N (K ~ N / target
# cluster size) so blocks stay bounded — and clusters that still exceed
# ``max_block`` are subdivided by a centroid-relative sign-sketch band
# (the second blocking level SCALE.md promises), so no block's pair
# count is quadratic in a skewed cluster's population. Everything stays
# in integer space, so the cluster assignment AND the pair distances are
# hash-checkable.

SEM_T = 1_250_000_000_000  # ~0.1% quantile of pairwise quantized L2
# Clusters above this population get sign-banded before the self-join.
# Far above every fixture cluster (embeddings fixtures are <= 2000 rows
# total), so the oracle-checked result is band-free; the banded path is
# pinned separately in tests/test_similarity_quality.py with a tiny cap.
SEM_MAX_BLOCK = 20_000
SEM_BAND_BITS = 16

# Pair distance via the exact integer identity
# sum((a-b)^2) == |a|^2 + |b|^2 - 2*a.b: the squared norms are computed
# ONCE per block row (N folds) so each of the O(pairs) evaluations pays
# only the dot-product fold — measured 30% faster than the direct
# diff-square fold at sf0.1 (2.01s -> 1.40s pair phase; higher-order
# folds are interpreted per element, so per-pair lambda work is the
# cost that matters). Bit-identical results, oracle untouched.
_SEM_NORM = "aggregate(qv, CAST(0 AS BIGINT), (s, x) -> s + x * x)"
_SEM_PAIR_DOT = (
    "aggregate(zip_with(qa, qb, (x, y) -> x * y), "
    "CAST(0 AS BIGINT), (s, x) -> s + x)"
)


def semantic_blocks(
    emb: DataFrame,
    max_block: int = SEM_MAX_BLOCK,
    band_bits: int = SEM_BAND_BITS,
    seeds: tuple[int, ...] = IVFT_SEEDS,
) -> DataFrame:
    """(vec_id, embedding) -> (k, band, vec_id, qv): the blocked
    assignment the pair self-join runs over. ``band`` is -1 (whole
    cluster = one block) while the cluster population is <= ``max_block``;
    above it, the cluster is subdivided by the sign pattern of the first
    ``band_bits`` coordinates RELATIVE TO ITS CENTROID (signs of raw
    coordinates would collapse for non-centered corpora; centroid-
    relative signs split each dimension roughly in half), bounding the
    expected block population at n_k / 2^band_bits.

    Recall contract: identical vectors quantize, assign, and band
    identically, so exact duplicates are NEVER separated at any cap;
    near-duplicates straddling a centroid hyperplane can split across
    bands — the standard LSH recall trade, paid only inside clusters the
    cap flags as quadratic risks.

    ``seeds`` sizes the codebook (K = len(seeds)): at scale K grows
    ~N / target-cluster-size — pick with :func:`codebook_seeds`; the
    fixture default keeps the stored oracle byte-identical."""
    q = _km_quantize(emb)
    cents = _seed_centroids(q, seeds)
    # one Lloyd iteration; tiny (K rows) — truncated so the three
    # downstream uses (assign, band join) never re-run the training
    cents = _km_update(_km_assign(q, cents)).localCheckpoint(eager=True)
    # both self-join sides reference the assignment: localCheckpoint (not
    # persist) materializes the quantize -> train -> assign lineage once
    # WITHOUT pinning storage for the session — blocks are released with
    # the DataFrame by the context cleaner, so a long-lived bench/test
    # session doesn't accumulate cached partitions across calls
    assigned = (
        _km_assign(q, cents)
        .select("k", "vec_id", "qv")
        .localCheckpoint(eager=True)
    )
    sizes = assigned.groupBy("k").agg(F.count(F.lit(1)).alias("n_k"))
    band = F.aggregate(
        F.zip_with(
            F.slice(F.col("qv"), 1, band_bits),
            F.slice(F.col("c"), 1, band_bits),
            lambda a, b: F.when(a >= b, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, bit: acc * 2 + bit,
    )
    return (
        assigned.join(F.broadcast(sizes), "k")
        .join(F.broadcast(cents), "k")
        .withColumn(
            "band",
            F.when(F.col("n_k") > max_block, band).otherwise(F.lit(-1)),
        )
        .select("k", "band", "vec_id", "qv")
    )


def semantic_pairs(
    emb: DataFrame,
    threshold: int = SEM_T,
    max_block: int = SEM_MAX_BLOCK,
    band_bits: int = SEM_BAND_BITS,
    seeds: tuple[int, ...] = IVFT_SEEDS,
) -> DataFrame:
    """(vec_id, embedding) -> within-block candidate pairs under the
    quantized-L2 ``threshold`` (blocks per :func:`semantic_blocks`).
    Exact duplicates (distance 0) can never be missed by the blocking:
    identical vectors assign and band identically, so they always share
    a block — pinned in tests/test_similarity_quality.py.

    The O(pairs x dim) distance kernel runs as ONE Arrow group-map per
    block (optimization r15, guide §4.2: hand whole batches to a
    vectorized native library instead of per-pair interpreted
    expression folds). The block self-join this replaces shuffled every
    block twice and evaluated an interpreted zip_with/aggregate fold
    per candidate pair (measured ~1.5 s of the query's 2.6 s at sf0.1);
    here each block crosses the boundary once and the whole pair matrix
    is one int64 BLAS product — bit-exact (NumPy int64 ops are exact,
    and the |qv| <= ~1e8, dim=64 envelope keeps every dot far below
    2^63, the same bound the previous BIGINT fold relied on). Memory is
    bounded: a block is <= ``max_block`` rows by construction and the
    Gram product is row-chunked to ~64 MB slabs. The previous JVM
    spelling remains as :func:`semantic_pairs_jvm`, machine-pinned
    row-identical in tests/test_similarity_quality.py."""
    import pandas as pd

    blocks = semantic_blocks(
        emb, max_block=max_block, band_bits=band_bits, seeds=seeds
    ).select("k", "band", "vec_id", "qv")
    thr = int(threshold)

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        n = len(pdf)
        empty = pd.DataFrame(
            {
                "cluster": pd.Series([], dtype="int32"),
                "vec_id_a": pd.Series([], dtype="int64"),
                "vec_id_b": pd.Series([], dtype="int64"),
                "dist": pd.Series([], dtype="int64"),
            }
        )
        if n < 2:
            return empty
        ids = pdf["vec_id"].to_numpy(dtype="int64")
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        q = np.stack(pdf["qv"].to_numpy()[order]).astype("int64", copy=False)
        nrm = np.einsum("ij,ij->i", q, q)
        cluster = int(pdf["k"].iloc[0])
        outs = []
        # row-chunk the Gram product so a max_block-sized block never
        # materializes an n x n matrix (~64 MB per slab)
        chunk = max(1, (64 << 20) // (8 * n))
        for i0 in range(0, n - 1, chunk):
            i1 = min(i0 + chunk, n)
            g = q[i0:i1] @ q.T  # exact int64 dots
            d = nrm[i0:i1, None] + nrm[None, :] - 2 * g
            # strict upper triangle (vec_id_a < vec_id_b after the sort)
            ii, jj = np.nonzero(d <= thr)
            keep = jj > (ii + i0)
            ii, jj = ii[keep], jj[keep]
            if len(ii):
                outs.append(
                    pd.DataFrame(
                        {
                            "cluster": np.full(len(ii), cluster, "int32"),
                            "vec_id_a": ids[ii + i0],
                            "vec_id_b": ids[jj],
                            "dist": d[ii, jj],
                        }
                    )
                )
        return pd.concat(outs) if outs else empty

    return blocks.groupBy("k", "band").applyInPandas(
        _pairs, schema="cluster int, vec_id_a long, vec_id_b long, dist long"
    )


def semantic_pairs_jvm(
    emb: DataFrame,
    threshold: int = SEM_T,
    max_block: int = SEM_MAX_BLOCK,
    band_bits: int = SEM_BAND_BITS,
    seeds: tuple[int, ...] = IVFT_SEEDS,
) -> DataFrame:
    """The pre-r15 JVM spelling of :func:`semantic_pairs` (block
    self-join + interpreted integer fold per pair) — kept as the
    machine-checked twin that pins the Arrow kernel's semantics."""
    blocks = semantic_blocks(
        emb, max_block=max_block, band_bits=band_bits, seeds=seeds
    ).withColumn("nrm", F.expr(_SEM_NORM))
    a = blocks.select(
        F.col("k").alias("cluster"),
        "band",
        F.col("vec_id").alias("vec_id_a"),
        F.col("qv").alias("qa"),
        F.col("nrm").alias("na"),
    )
    b = blocks.select(
        F.col("k").alias("cluster"),
        "band",
        F.col("vec_id").alias("vec_id_b"),
        F.col("qv").alias("qb"),
        F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, ["cluster", "band"])
        .where(F.col("vec_id_a") < F.col("vec_id_b"))
        .withColumn(
            "dist",
            F.col("na") + F.col("nb") - 2 * F.expr(_SEM_PAIR_DOT),
        )
        .where(F.col("dist") <= F.lit(threshold))
        .select("cluster", "vec_id_a", "vec_id_b", "dist")
    )


def q_semantic_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semantic_pairs(load_table(spark, sf_dir, "embeddings"))


def _oracle_semantic_dedup_pairs() -> str:
    k_case = "CASE vec_id " + " ".join(
        f"WHEN {v} THEN {i}" for i, v in enumerate(IVFT_SEEDS)
    ) + " END"
    dist = (
        f"CAST(list_sum(list_transform(range(1, {KM_DIM + 1}), "
        f"i -> (v.qv[i] - c.c[i]) * (v.qv[i] - c.c[i]))) AS BIGINT)"
    )
    pair = (
        f"CAST(list_sum(list_transform(range(1, {KM_DIM + 1}), "
        f"i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i]))) AS BIGINT)"
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * {KM_QSCALE}) AS BIGINT)) AS qv
  FROM embeddings
), c0 AS (
  SELECT {k_case} AS k, qv AS c FROM q WHERE vec_id IN {IVFT_SEEDS}
), a1 AS (
  SELECT v.vec_id, v.qv, c.k, {dist} AS d
  FROM q v CROSS JOIN c0 c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY d, c.k) = 1
), e1 AS (
  SELECT k, i, CAST(SUM(qv[i]) AS BIGINT) AS s, COUNT(*) AS n
  FROM a1 CROSS JOIN range(1, {KM_DIM + 1}) t1(i)
  GROUP BY k, i
), c1 AS (
  SELECT k, array_agg(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)
                      ORDER BY i) AS c
  FROM e1 GROUP BY k
), a2 AS (
  SELECT v.vec_id, v.qv, c.k, {dist} AS d
  FROM q v CROSS JOIN c1 c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY d, c.k) = 1
)
SELECT a.k AS cluster, a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       {pair} AS dist
FROM a2 a JOIN a2 b ON a.k = b.k AND a.vec_id < b.vec_id
WHERE {pair} <= {SEM_T}
"""


# --- incrementally grown IVF index (ANN maintenance parity) ----------------
# VERDICT r8 item 7: the text index grows per micro-batch, but the IVF
# embedding index re-assigned the full corpus on every build — at 100 TB
# the vector corpus can't be re-scanned either. Under a FROZEN codebook
# (trained once — the 1-Lloyd-iteration centroids q_knn_ivf_trained
# uses), assignment is a row-local fold over the broadcast codebook, so
# the inverted lists grow append-only: each batch writes its own
# vectors' (k, vec_id, qv, d) rows under ``lists/batch_id=N`` (dynamic
# partition overwrite — replay-idempotent, the write_index_batch
# discipline) plus a 1-row drift-stats partition (n, sum_d). Merging the
# batch partitions equals a full rebuild under the same codebook
# (pinned by test), and the query path is byte-identical to
# q_knn_ivf_trained's — same oracle.
#
# The frozen codebook ages as the distribution shifts; retraining is
# signalled, not guessed: each batch's mean assigned distance is
# compared to the build-time baseline (the stats partitions make this a
# num-batches-sized read) — a batch whose vectors land far from every
# centroid pushes the ratio up, and past IVF_DRIFT_RATIO the index asks
# for a retrain (which is a rebuild: new codebook => new assignment for
# everything; incremental growth only makes sense under a frozen one).

# v2: drift stats sum_d is DOUBLE (long overflowed)
# v3: optional vec_tombstones/ dir (vector deletes) — a v2 reader would
# silently SERVE deleted vectors (its read path has no anti-join)
IVF_FORMAT_VERSION = 3
IVF_LISTS = "lists"
IVF_CODEBOOK = "codebook"
IVF_STATS = "stats"
IVF_LISTS_SCHEMA = "k int, vec_id bigint, qv array<bigint>, d bigint"
IVF_GROW_BATCHES = 4
IVF_DRIFT_RATIO = 1.5


def ivf_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Artifact fingerprinting keyed on embeddings.parquet identity +
    format version (shared artifact_path discipline: a regenerated
    fixture or changed layout can never serve a stale index)."""
    from .text_analysis import artifact_path

    return artifact_path(
        spark, sf_dir, "embeddings.parquet", "ivf_lists", IVF_FORMAT_VERSION
    )


def write_ivf_batch(
    assigned: DataFrame, batch_id: int, index_dir: str
) -> None:
    """Append batch ``batch_id``'s assigned vectors to the inverted
    lists (idempotent: a replay overwrites only its own partitions) and
    its 1-row drift stats. ``assigned`` is _km_assign output
    (vec_id, qv, k, d) for exactly this batch's vectors.

    Refuses a batch_id at or below the lists' compaction horizon (the
    write_index_batch discipline): absorbed vectors re-appended would
    double-serve from the probe scan."""
    import os

    from .text_analysis import _check_version_marker, _read_horizon

    _check_version_marker(index_dir, IVF_LISTS, IVF_FORMAT_VERSION, create=True)
    # finish any crash-pending retrain/compaction install BEFORE
    # writing: a fully-staged retrain installed LATER would wholesale-
    # replace lists/ and stats/, silently destroying every batch that
    # landed in between (recovery-then-write keeps the order straight:
    # the staged generation installs first, this batch appends to it)
    recover_ivf_retrain(assigned.sparkSession, index_dir)
    recover_ivf_compaction(assigned.sparkSession, index_dir)
    lpath = os.path.join(index_dir, IVF_LISTS)
    horizon = _read_horizon(lpath)
    if horizon is not None and batch_id <= horizon:
        raise ValueError(
            f"IVF batch {batch_id} is at or below the compaction "
            f"horizon ({horizon}): its vectors were already absorbed "
            "into the compacted partition, and re-appending would "
            "double-serve them — a replayed batch must stay behind the "
            "horizon (compact_ivf_lists(keep_last=...) covers the "
            "replayable tail)"
        )
    (
        # no explicit partition count: AQE coalesces a tiny batch to
        # O(1) files; k-sorted rows let the probe's IN(k) prune row
        # groups within every batch partition
        assigned.select("k", "vec_id", "qv", "d")
        .repartition("k")
        .sortWithinPartitions("k", "vec_id")
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(os.path.join(index_dir, IVF_LISTS))
    )
    (
        # sum_d as DOUBLE: a long sum of squared quantized distances
        # overflows at real batch sizes (n x dim x (shift x QSCALE)^2
        # clears 2^63 with ~100k far-from-codebook vectors); the drift
        # RATIO needs a mean, not exact integer arithmetic
        assigned.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("d").cast("double")).alias("sum_d"),
        )
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(os.path.join(index_dir, IVF_STATS))
    )


IVF_TOMBSTONES = "vec_tombstones"
IVF_TOMBSTONES_SCHEMA = "vec_id bigint"


def delete_ivf_vectors(
    spark: SparkSession, index_dir: str, vec_ids: DataFrame, batch_id: int
) -> None:
    """Delete vectors from the grown IVF lists — the vector twin of the
    text index's delete_index_docs (GDPR for embeddings: an embedding
    of personal content is personal data). A delete batch writes ONE
    artifact: its ``vec_tombstones/batch_id=M`` partition of vec_ids;
    read_ivf_lists anti-joins every read against the tombstone set, so
    the probe query (and a retrain's re-assignment, which reads through
    the same path) excludes the victims immediately. Physical purge
    happens at compact_ivf_lists (or wholesale at a retrain, which
    rewrites the lists from the tombstone-filtered read).

    SIMPLER than the text side, by design: there are no corpus stats to
    correct (BM25-style n/avgdl do not exist here, and the per-batch
    drift history deliberately measures assignment quality AT ingestion
    time — deletes must not rewrite history), so there is no negative
    stats row, no double-subtract hazard, and therefore NO tombstone
    horizon: a replayed delete batch just overwrites its own partition
    with the same ids, and a tombstone for an unknown or already-purged
    vec_id is a no-op swept by the next compaction. Re-adding a deleted
    vec_id is unsupported (the same at-most-once identity invariant as
    the text index)."""
    import os

    from .text_analysis import _check_version_marker

    _check_version_marker(
        index_dir, IVF_LISTS, IVF_FORMAT_VERSION, create=False
    )
    # same recovery-at-entry as write_ivf_batch: a stale staged retrain
    # installed AFTER this delete would rmtree the tombstone set while
    # its staged lists (re-assigned before the delete existed) still
    # hold the victim — resurrecting a completed GDPR delete
    recover_ivf_retrain(spark, index_dir)
    recover_ivf_compaction(spark, index_dir)
    if batch_id < 0:
        raise ValueError(
            f"delete batch_id must be >= 0 (got {batch_id}): -1 is the "
            "COMPACTED tombstone partition — a negative delete batch "
            "would silently overwrite it and resurrect purged vectors"
        )
    (
        vec_ids.select("vec_id")
        .where(F.col("vec_id").isNotNull())
        .distinct()
        .repartition("vec_id")  # AQE coalesces a tiny delete to O(1) files
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(os.path.join(index_dir, IVF_TOMBSTONES))
    )


def read_ivf_lists(
    spark: SparkSession, index_dir: str, max_batch: int | None = None
) -> DataFrame:
    """Merge-on-read view of the grown inverted lists (explicit schema:
    a legitimately empty index has no files to infer from), minus the
    tombstoned vectors (the anti side is tiny next to the lists — AQE
    broadcasts it; a delete-free index skips the node entirely).

    ``max_batch``: when set, exclude batch partitions ABOVE it (the
    compacted partition always reads — it only ever holds committed
    batches). Used by a bounded :func:`retrain_ivf` so an uncommitted
    (replayable) batch's vectors are never absorbed; partition pruning
    makes the bound free at scan time."""
    import os

    from .text_analysis import COMPACTED_BATCH_ID as _CB
    from .text_analysis import _check_version_marker

    _check_version_marker(
        index_dir, IVF_LISTS, IVF_FORMAT_VERSION, create=False
    )
    lists = spark.read.schema(IVF_LISTS_SCHEMA + ", batch_id int").parquet(
        os.path.join(index_dir, IVF_LISTS)
    )
    if max_batch is not None:
        lists = lists.where(
            (F.col("batch_id") == _CB) | (F.col("batch_id") <= max_batch)
        )
    lists = lists.drop("batch_id")
    tpath = os.path.join(index_dir, IVF_TOMBSTONES)
    if os.path.isdir(tpath) and any(
        d.startswith("batch_id=") for d in os.listdir(tpath)
    ):
        tombs = (
            spark.read.schema(IVF_TOMBSTONES_SCHEMA + ", batch_id int")
            .parquet(tpath)
            .select("vec_id")
        )
        lists = lists.join(tombs, "vec_id", "left_anti")
    return lists


def compact_ivf_lists(
    spark: SparkSession, index_dir: str, keep_last: int = 0
) -> int:
    """Fold IVF list batch partitions (plus a previous compacted one)
    into the single ``batch_id=COMPACTED_BATCH_ID`` partition — the
    same probe-overhead amortization, replay-margin (``keep_last``),
    horizon recording, and manifest/_STAGED crash contract as the text
    index's compact_index (the install machinery is shared; a crashed
    install is finished by text_analysis.recover_index_compaction
    pointed at this index dir via :func:`recover_ivf_compaction`).
    DRIFT STATS ARE NEVER FOLDED: unlike the text index's additive
    corpus stats, the per-batch (n, sum_d) rows are the retrain
    signal's history — ivf_drift reads them per batch."""
    import os

    from .text_analysis import (
        _plan_fold,
        _read_horizon,
        _stage_and_install,
    )
    from .text_analysis import COMPACTED_BATCH_ID as _CB

    recover_ivf_compaction(spark, index_dir)
    lpath = os.path.join(index_dir, IVF_LISTS)
    absorb, src_ids = _plan_fold(lpath, keep_last)
    if not absorb:
        # nothing new on the lists side; still sweep spent tombstones
        _compact_ivf_tombstones(spark, index_dir, keep_last)
        return 0
    prev = _read_horizon(lpath)
    horizon = max(absorb) if prev is None else max(prev, max(absorb))
    raw = spark.read.schema(IVF_LISTS_SCHEMA + ", batch_id int").parquet(lpath)
    merged = raw.where(
        F.col("batch_id").isin([int(i) for i in src_ids])
    ).drop("batch_id")
    tpath = os.path.join(index_dir, IVF_TOMBSTONES)
    if os.path.isdir(tpath):
        # the PHYSICAL purge of deleted vectors — readers already
        # excluded them (read_ivf_lists anti-joins), so dropping their
        # rows changes nothing a probe computes at any crash point
        tombs = (
            spark.read.schema(IVF_TOMBSTONES_SCHEMA + ", batch_id int")
            .parquet(tpath)
            .select("vec_id")
        )
        merged = merged.join(tombs, "vec_id", "left_anti")
    merged = (
        merged.repartition("k")
        .sortWithinPartitions("k", "vec_id")
        .withColumn("batch_id", F.lit(_CB))
    )
    _stage_and_install(
        merged, lpath, os.path.join(index_dir, "_lists_compact_tmp"),
        absorb, horizon,
    )
    _compact_ivf_tombstones(spark, index_dir, keep_last)
    return len(src_ids)


def _compact_ivf_tombstones(
    spark: SparkSession, index_dir: str, keep_last: int = 0
) -> int:
    """Fold vec-tombstone batch partitions, PURGING every tombstone
    whose vector has no stored list rows left (the lists fold already
    dropped them — a purged tombstone was a no-op in the read-time
    anti-join, so removing it is crash-independent); one that still
    suppresses stored rows (its vector's home batch was kept by the
    lists fold's replay margin) survives into the compacted tombstone
    partition and purges on a later pass. No horizon is recorded: IVF
    deletes have no stats side-effect, so a replayed absorbed delete
    batch re-appends only harmless no-op rows (swept here next time) —
    the asymmetry with the text index's tombstones is deliberate."""
    import os

    from .text_analysis import _plan_fold, _stage_and_install
    from .text_analysis import COMPACTED_BATCH_ID as _CB

    tpath = os.path.join(index_dir, IVF_TOMBSTONES)
    absorb, src_ids = _plan_fold(tpath, keep_last)
    if not absorb:
        # re-sweep the compacted partition: tombstones in it may have
        # become spent since the last fold (a later lists fold purged
        # their vectors) — "purges on a later pass" must not require a
        # later DELETE to trigger the pass (the text-index twin's rule)
        cdir = os.path.join(tpath, f"batch_id={_CB}")
        if not os.path.isdir(cdir):
            return 0
        src_ids = [_CB]
    raw = (
        spark.read.schema(IVF_TOMBSTONES_SCHEMA + ", batch_id int")
        .parquet(tpath)
        .where(F.col("batch_id").isin([int(i) for i in src_ids]))
        .drop("batch_id")
        .distinct()  # cross-batch duplicate tombstones collapse here
    )
    stored = (
        spark.read.schema(IVF_LISTS_SCHEMA + ", batch_id int")
        .parquet(os.path.join(index_dir, IVF_LISTS))
        .select("vec_id")
    )
    survivors = raw.join(stored, "vec_id", "semi")
    if not absorb:
        survivors = survivors.localCheckpoint()
        if survivors.count() == raw.count():
            return 0  # nothing newly spent: leave the partition alone
    merged = (
        survivors.repartition("vec_id")
        .withColumn("batch_id", F.lit(_CB))
    )
    _stage_and_install(
        merged,
        tpath,
        os.path.join(index_dir, "_vec_tombstones_compact_tmp"),
        absorb,
        None,
    )
    return len(src_ids) if absorb else 1


def recover_ivf_compaction(spark: SparkSession, index_dir: str) -> bool:
    """Finish a :func:`compact_ivf_lists` install that crashed after
    staging completed; discard an incomplete staging. Returns True if a
    pending install was completed."""
    import os
    import shutil

    from .text_analysis import _STAGED_MARKER, _install_compaction

    recovered = False
    for live_sub, tmp_sub in (
        (IVF_LISTS, "_lists_compact_tmp"),
        (IVF_TOMBSTONES, "_vec_tombstones_compact_tmp"),
    ):
        tmp = os.path.join(index_dir, tmp_sub)
        if not os.path.isdir(tmp):
            continue
        if not os.path.exists(os.path.join(tmp, _STAGED_MARKER)):
            shutil.rmtree(tmp, ignore_errors=True)
            continue
        _install_compaction(os.path.join(index_dir, live_sub), tmp)
        recovered = True
    return recovered


_RETRAIN_TMP = "_retrain_tmp"


def _install_retrain(index_dir: str) -> None:
    """Install a COMPLETE retrain staging (``_STAGED`` present): swap
    each of codebook/lists/stats for its staged replacement, record the
    pre-retrain horizon in the new lists dir, drop the staging. Every
    step is idempotent (a moved-out subdir is skipped on re-run), so a
    crash anywhere inside is finished by :func:`recover_ivf_retrain`."""
    import json
    import os
    import shutil

    from .text_analysis import _MANIFEST, _write_horizon

    tmp = os.path.join(index_dir, _RETRAIN_TMP)
    with open(os.path.join(tmp, _MANIFEST)) as fh:
        m = json.load(fh)
    for name in (IVF_CODEBOOK, IVF_LISTS, IVF_STATS):
        src = os.path.join(tmp, name)
        if os.path.isdir(src):
            shutil.rmtree(os.path.join(index_dir, name), ignore_errors=True)
            shutil.move(src, os.path.join(index_dir, name))
    _write_horizon(os.path.join(index_dir, IVF_LISTS), int(m["horizon"]))
    # the re-assignment read through the tombstone anti-join, so the
    # staged lists already exclude every deleted vector — the tombstones
    # are spent. Removing them is idempotent and crash-independent: a
    # tombstone left behind (crash here) only no-ops against lists that
    # no longer hold its vector, and the next compaction sweeps it.
    # EXCEPTION (manifest keep_tombstones): a max_batch-bounded retrain
    # left an uncommitted batch OUT of the staged lists; its replay
    # re-appends those vectors, and a tombstone masking one of them
    # must survive to keep the delete served — kept tombstones are
    # harmless no-ops elsewhere, swept by the next compaction.
    if not m.get("keep_tombstones", False):
        shutil.rmtree(
            os.path.join(index_dir, IVF_TOMBSTONES), ignore_errors=True
        )
    shutil.rmtree(tmp)


def recover_ivf_retrain(spark: SparkSession, index_dir: str) -> bool:
    """Finish a :func:`retrain_ivf` install that crashed after staging
    completed; discard an incomplete staging (live tree untouched —
    the old codebook keeps serving until a staged retrain is whole).
    Returns True if a pending install was completed."""
    import os
    import shutil

    from .text_analysis import _STAGED_MARKER

    tmp = os.path.join(index_dir, _RETRAIN_TMP)
    if not os.path.isdir(tmp):
        return False
    if not os.path.exists(os.path.join(tmp, _STAGED_MARKER)):
        shutil.rmtree(tmp, ignore_errors=True)
        return False
    _install_retrain(index_dir)
    return True


def retrain_ivf(
    spark: SparkSession,
    index_dir: str,
    force: bool = False,
    max_batch: int | None = None,
) -> bool:
    """ACT on the drift signal (closing the loop :func:`ivf_drift`
    opens): when the NEWEST stats batch flags ``needs_retrain`` (or
    ``force``), rebuild the index under a FRESH codebook trained on
    the CURRENT vector population and install it atomically. Returns
    True iff a retrain ran.

    ``max_batch`` bounds the retrain to batches it may safely absorb:
    the drift DECISION reads only stats with batch_id <= max_batch, the
    re-assignment population and the recorded horizon exclude any live
    partition above it, and tombstones survive the install whenever a
    partition was excluded (its replay re-appends vectors a tombstone
    may mask). The streaming ingest loop passes ``batch_id - 1`` — the
    exact committed frontier — because a retrain that absorbed the
    in-flight batch's own half-landed write would set horizon to that
    batch_id and wedge its replay forever (write_ivf_batch refuses at
    or below the horizon). An excluded half-landed partition IS dropped
    by the install (its offsets never committed, so Structured
    Streaming replays it into the new generation immediately — the
    same body that ran this check re-writes it next statement).

    Scale shape: the lists store the full quantized vectors, so
    retrain never re-reads the corpus — one pass over the lists to
    train (seed pick + one Lloyd iteration, the frozen_ivf_codebook
    discipline, seeds re-picked over the current ids so drifted
    arrivals get representation) and one to re-assign. Re-assigning
    everything is the POINT here — new centroids move every list
    boundary — which is exactly why it runs only when the drift signal
    fires; appends stay assignment-only otherwise.

    The new generation: ``codebook/`` fresh centroids; ``lists/`` one
    compacted partition (every vector re-assigned); ``stats/`` the
    re-assignment's own 1-row baseline (pre-retrain drift history dies
    with the codebook it measured — it already served its purpose by
    triggering this retrain); horizon = max pre-retrain batch_id, so a
    replayed pre-retrain ingest batch refuses loudly instead of
    double-adding vectors the baseline already holds. Crash contract:
    staged under ``_retrain_tmp`` with manifest + ``_STAGED`` marker;
    an incomplete staging is discarded, a staged-but-uninstalled one
    is finished by :func:`recover_ivf_retrain` (also run at entry
    here, with any pending list compaction)."""
    import json
    import os
    import shutil

    from .text_analysis import (
        _MANIFEST,
        _STAGED_MARKER,
        _read_horizon,
    )
    from .text_analysis import COMPACTED_BATCH_ID as _CB

    recover_ivf_retrain(spark, index_dir)
    recover_ivf_compaction(spark, index_dir)
    if not force:
        if not os.path.isdir(os.path.join(index_dir, IVF_STATS)):
            return False  # cold index: nothing has signalled yet
        drift = ivf_drift(spark, index_dir)
        if max_batch is not None:
            # a stats row above the bound may belong to the batch being
            # replayed RIGHT NOW (written, offsets uncommitted) — it
            # must not trigger a retrain that would absorb its own
            # half-landed lists partition
            drift = drift.where(F.col("batch_id") <= max_batch)
        newest = drift.orderBy(F.desc("batch_id")).limit(1).collect()
        if not newest or not newest[0].needs_retrain:
            return False
    lpath = os.path.join(index_dir, IVF_LISTS)
    ids = [
        int(d.split("=", 1)[1])
        for d in os.listdir(lpath)
        if d.startswith("batch_id=")
    ]
    absorbed = [
        i
        for i in ids
        if i != _CB and (max_batch is None or i <= max_batch)
    ]
    excluded = [
        i for i in ids if i != _CB and max_batch is not None and i > max_batch
    ]
    prev = _read_horizon(lpath)
    candidates = absorbed + ([prev] if prev is not None else [])
    if not candidates:
        return False  # nothing committed to absorb: retrain is moot
    horizon = max(candidates)
    pop = read_ivf_lists(spark, index_dir, max_batch=max_batch).select(
        "vec_id", "qv"
    )
    k = spark.read.parquet(os.path.join(index_dir, IVF_CODEBOOK)).count()
    cents = _km_update(_km_assign(pop, _seed_centroids(pop, codebook_seeds(pop, k))))
    tmp = os.path.join(index_dir, _RETRAIN_TMP)
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        cents.write.mode("overwrite").parquet(os.path.join(tmp, IVF_CODEBOOK))
        stored = spark.read.parquet(os.path.join(tmp, IVF_CODEBOOK))
        (
            _km_assign(pop, stored)
            .select("k", "vec_id", "qv", "d")
            .repartition("k")
            .sortWithinPartitions("k", "vec_id")
            .withColumn("batch_id", F.lit(_CB))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(os.path.join(tmp, IVF_LISTS))
        )
        (
            # baseline stats from the STAGED lists (no re-assignment pass)
            spark.read.schema(IVF_LISTS_SCHEMA + ", batch_id int")
            .parquet(os.path.join(tmp, IVF_LISTS))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("d").cast("double")).alias("sum_d"),
            )
            .withColumn("batch_id", F.lit(_CB))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(os.path.join(tmp, IVF_STATS))
        )
        with open(os.path.join(tmp, _MANIFEST), "w") as fh:
            json.dump(
                {"horizon": horizon, "keep_tombstones": bool(excluded)}, fh
            )
        with open(os.path.join(tmp, _STAGED_MARKER), "w") as fh:
            fh.write("")
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)  # incomplete staging
        raise
    _install_retrain(index_dir)
    return True


def ivf_drift(
    spark: SparkSession, index_dir: str, baseline_batches: int = 1
) -> DataFrame:
    """Per-batch drift: mean assigned distance vs the mean over the
    ``baseline_batches`` OLDEST stats batches (lowest batch_ids — the
    build-time batches on a fresh index, the re-assignment baseline row
    after a :func:`retrain_ivf`). A num-batches-sized stats read —
    never the lists. ``needs_retrain`` is the signal the maintenance
    loop (:func:`retrain_ivf`) acts on; appends stay cheap until
    then."""
    import os

    from pyspark.sql import Window

    stats = spark.read.parquet(os.path.join(index_dir, IVF_STATS))
    rk = F.row_number().over(Window.orderBy("batch_id"))
    base = (
        stats.withColumn("_rk", rk)
        .where(F.col("_rk") <= baseline_batches)
        .agg((F.sum("sum_d") / F.sum("n")).alias("base_mean"))
    )
    return (
        stats.crossJoin(F.broadcast(base))
        .select(
            "batch_id",
            (F.col("sum_d") / F.col("n")).alias("mean_d"),
            ((F.col("sum_d") / F.col("n")) / F.col("base_mean")).alias(
                "drift_ratio"
            ),
            (
                (F.col("sum_d") / F.col("n")) / F.col("base_mean")
                > F.lit(IVF_DRIFT_RATIO)
            ).alias("needs_retrain"),
        )
        .orderBy("batch_id")
    )


def frozen_ivf_codebook(
    q: DataFrame, seeds: tuple[int, ...] = IVFT_SEEDS
) -> DataFrame:
    """The SAME centroids q_knn_ivf_trained uses (one Lloyd iteration
    from the seed vectors) — training pays its corpus pass once; every
    later batch is assignment-only."""
    return _km_update(_km_assign(q, _seed_centroids(q, seeds)))


# Roots whose completeness validation already passed IN THIS PROCESS:
# the two readability probe jobs below exist to reject a PRIOR crashed
# process's partial build, so re-running them on every serving call is
# pure driver overhead (2 Spark jobs, ~0.4 s — the other half of the
# VERDICT r11 #1 budget breach). The _COMPLETE marker is still
# re-checked per call (an os.stat, catches external deletion); roots
# are fixture-fingerprinted, so a regenerated fixture re-validates.
_VERIFIED_IVF_ROOTS: set[str] = set()


def build_ivf_grown(spark: SparkSession, sf_dir: str) -> str:
    """Simulated incremental growth for the registry query: train the
    codebook once, store it, then the corpus arrives as
    IVF_GROW_BATCHES deterministic batches (vec_id mod — each vector in
    exactly one batch), each assigned against the STORED codebook and
    appended via :func:`write_ivf_batch`. Idempotent per fixture
    identity."""
    import os
    import shutil

    root = ivf_index_path(spark, sf_dir)
    done = os.path.join(root, "_COMPLETE")
    if root in _VERIFIED_IVF_ROOTS and os.path.exists(done):
        return root
    if os.path.isdir(root):
        try:
            # completeness marker first: readability alone would accept
            # a build interrupted mid-batch (the probe query would then
            # silently search a fraction of the corpus). A raise, not an
            # assert: python -O strips asserts, which would silently
            # accept the partial build this marker exists to reject.
            if not os.path.exists(done):
                raise ValueError("incomplete build: no _COMPLETE marker")
            read_ivf_lists(spark, root).limit(1).count()
            spark.read.parquet(os.path.join(root, IVF_CODEBOOK)).limit(
                1
            ).count()
            _VERIFIED_IVF_ROOTS.add(root)
            return root
        except Exception:
            shutil.rmtree(root, ignore_errors=True)
    q = _km_quantize(load_table(spark, sf_dir, "embeddings"))
    frozen_ivf_codebook(q).write.mode("overwrite").parquet(
        os.path.join(root, IVF_CODEBOOK)
    )
    cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    for b in range(IVF_GROW_BATCHES):
        batch = q.where(F.col("vec_id") % IVF_GROW_BATCHES == b)
        write_ivf_batch(_km_assign(batch, cents), b, root)
    with open(done, "w") as fh:  # written LAST: marks the build whole
        fh.write("")
    _VERIFIED_IVF_ROOTS.add(root)
    return root


# quantized_probe_vector memo, keyed on the SAME fixture identity the
# index artifacts use (path + size + mtime_ns of embeddings.parquet,
# the artifact_path discipline) plus the vec_id. Quantization is a pure
# function of the source row, so a memo hit is exact — and a
# regenerated fixture changes the identity, so a stale vector can never
# be served (the invalidation test pins this). Why memoize at all: the
# lookup is a separate 1-row Spark job, and re-running it on EVERY
# serving call is what cost sim_knn_ivf_grown its bench budget in r11
# (0.47 -> 0.71 s idle; VERDICT r11 #1) — the per-fixture cost belongs
# with the (already memoized) index build, not the probe.
def _fixture_identity(sf_dir: str) -> tuple:
    """The memo-key prefix every serving-side memo shares (probe vector,
    fleet vectors): path + size + mtime_ns of the source
    embeddings.parquet, so a regenerated fixture is a NEW identity and a
    stale value can never be served. One helper, not per-memo copies —
    if the identity discipline ever changes (directory-shaped parquet,
    content hash), every memo changes with it (review r13)."""
    import os

    base = os.path.abspath(sf_dir.rstrip("/"))
    try:
        st = os.stat(os.path.join(base, "embeddings.parquet"))
        return (base, st.st_size, st.st_mtime_ns)
    except OSError:
        return (base, "absent", 0)


_PROBE_VEC_MEMO: dict[tuple, tuple[int, ...] | None] = {}


def quantized_probe_vector(
    spark: SparkSession, sf_dir: str, vec_id: int = IVFT_PROBE_ID
) -> list[int] | None:
    """Point-lookup of ONE vector from the source ``embeddings`` table,
    quantized — how the registered fixture queries obtain their probe
    vector for :func:`ivf_probe`. The ``vec_id =`` predicate reaches the
    parquet scan (PushedFilters), so this is a 1-row bounded driver read
    of the SOURCE table — the serving path never scans the index lists
    to locate its own probe (VERDICT r10 #1). Returns None when the id
    is absent (the empty-corpus fixture contract: a probe of nothing is
    an empty answer, not a raise — callers return an empty frame).

    Memoized per (fixture identity, vec_id) — see _PROBE_VEC_MEMO."""
    key = (*_fixture_identity(sf_dir), int(vec_id))
    if key in _PROBE_VEC_MEMO:
        hit = _PROBE_VEC_MEMO[key]
        return None if hit is None else list(hit)
    rows = (
        _km_quantize(load_table(spark, sf_dir, "embeddings"))
        .where(F.col("vec_id") == vec_id)
        .select("qv")
        .collect()
    )
    # tuple, not list: the memo hands out copies, never its own state
    val = tuple(int(x) for x in rows[0].qv) if rows else None
    _PROBE_VEC_MEMO[key] = val
    return None if val is None else list(val)


# Fleet twin of _PROBE_VEC_MEMO (VERDICT r12 #3): the batch serving
# queries (q_knn_batch, hybrid's q_hybrid_batch) used to re-read and
# re-quantize the SOURCE embeddings table on every serving call just to
# materialize their Q-row query frame — the r11 sim_knn_ivf_grown breach
# pattern one level up (one job amortized over the fleet, but still a
# per-call corpus scan that belongs with the memoized build, not the
# probe). Same key discipline: fixture identity (path + size + mtime_ns
# of embeddings.parquet) + the qid tuple, so a regenerated fixture can
# never serve stale vectors; values are tuples (copies handed out).
_FLEET_VEC_MEMO: dict[tuple, tuple] = {}


def quantized_fleet_vectors(
    spark: SparkSession, sf_dir: str, qids
) -> list[tuple[int, list[int]]]:
    """One bounded Q-row driver read of the source ``embeddings`` table
    (``vec_id IN (...)`` reaches the parquet scan), quantized — the
    fleet spelling of :func:`quantized_probe_vector`. Absent ids are
    simply missing from the result (the empty-corpus contract) — an
    empty qid set short-circuits to [] before any filter is built, so
    the contract holds at the degenerate boundary too. Memoized
    per (fixture identity, qid-set); see _FLEET_VEC_MEMO."""
    qt = tuple(sorted(int(q) for q in qids))
    if not qt:
        return []
    key = (*_fixture_identity(sf_dir), qt)
    if key in _FLEET_VEC_MEMO:
        return [(qid, list(qv)) for qid, qv in _FLEET_VEC_MEMO[key]]
    rows = (
        _km_quantize(load_table(spark, sf_dir, "embeddings"))
        .where(F.col("vec_id").isin(*qt))
        .select("vec_id", "qv")
        .collect()
    )
    val = tuple(
        sorted((int(r.vec_id), tuple(int(x) for x in r.qv)) for r in rows)
    )
    _FLEET_VEC_MEMO[key] = val
    return [(qid, list(qv)) for qid, qv in val]


def fleet_query_frame(
    spark: SparkSession, sf_dir: str, qids
) -> DataFrame:
    """The (qid, qv) query frame the batch probes consume, built from
    the memoized fleet vectors as a driver-local one-slice RDD scan —
    zero table scans in the serving call, which is what
    :func:`ivf_probe_batch` wants on the Q side (the codebook broadcasts
    INTO it; Q itself is never force-broadcast). Note this plans as
    Scan ExistingRDD, not LocalRelation — the optimizer sees no exact
    pre-AQE size statistics for Q, which is fine because every join
    against it is either unhinted (AQE measures at runtime) or
    broadcasts the OTHER side.

    ONE slice, not defaultParallelism: ``createDataFrame`` on a Python
    list parallelizes into 32 near-empty slices on local[32], and every
    stage above the frame then schedules 32 near-empty tasks — the
    measured ~2x fixture-scale regression VERDICT r13 #1 root-caused.
    The one slice comes from ``parallelize(vecs, 1)``, NOT
    ``.coalesce(1)``: coalesce propagates its partition count UP
    through every narrow op fused into the same stage, so the probed
    CANDIDATE scan above the join would also collapse to one task —
    A/B-measured 7 s vs 0.09 s warm on the sf0.1 fixture. The fleet is
    Q-bounded, so one slice is the right shape on a real cluster too
    (the probe join redistributes by its own keys downstream)."""
    vecs = quantized_fleet_vectors(spark, sf_dir, qids)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(vecs, 1), "qid long, qv array<bigint>"
    )


def _empty_probe_result(lists: DataFrame) -> DataFrame:
    """The (vec_id, dist) zero-row frame a probe of an empty corpus
    serves — same schema as every ivf_probe result."""
    return (
        lists.select("vec_id")
        .limit(0)
        .withColumn("dist", F.lit(0).cast("bigint"))
    )


def ivf_probe(
    lists: DataFrame,
    cents: DataFrame,
    query_vec,
    n_probe: int = IVFT_PROBE,
    top: int = IVFT_TOP,
    exclude_id: int | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Parameterized ANN serving probe: top-``top`` nearest vectors to a
    CALLER-SUPPLIED quantized query vector (any int sequence — an
    external vector needs no corpus row), scanning only the ``n_probe``
    nearest inverted lists. The vector becomes a literal array in the
    plan, so locating the probe costs zero scans and zero joins: the
    K-row codebook ranks against the literal, the chosen list ids
    broadcast into the candidate join, and candidate distances fold
    row-locally against the literal — the only corpus-side work is the
    pruned lists scan, exactly as at 1000-executor scale.

    ``exclude_id`` optionally drops one vec_id from the candidates: the
    fixture queries probe with a corpus vector's own embedding and must
    not return the vector itself (their stored oracles exclude it); an
    external query vector passes None.

    ``allowed`` (r12) optionally restricts candidates to a caller-
    supplied (vec_id) frame — FILTERED vector search (a label slice, a
    tenant's documents, a training split): a semi-join with NO forced
    side after the list pruning, so a small filter broadcasts (AQE)
    and a corpus-scale one degrades to a shuffle join — never a
    post-top-k filter, which would silently return fewer than ``top``
    valid neighbors."""
    # The whole distance expression is ONE F.expr string with the
    # literal array inlined (integers only — injection-free), the
    # _IVFT_PDIST spelling: the per-element lit/cast and per-lambda
    # higher-order constructions cost ~0.3 s of DRIVER py4j time per
    # serving call at dim=64 — pure plan-construction overhead bench
    # measures but 1000 executors can't parallelize (r12, part of the
    # VERDICT r11 #1 budget fix). Same expression tree JVM-side.
    arr = "array(" + ",".join(f"{int(x)}L" for x in query_vec) + ")"

    def sqdist(col: str) -> str:
        return (
            f"aggregate(zip_with({col}, {arr}, "
            "(a, b) -> (a - b) * (a - b)), "
            "CAST(0 AS BIGINT), (s, x) -> s + x)"
        )

    plists = (
        cents.selectExpr("k", sqdist("c") + " AS pd")
        .orderBy(F.asc("pd"), F.asc("k"))
        .limit(n_probe)
        .select("k")
    )
    out = lists.join(F.broadcast(plists), "k")
    if exclude_id is not None:
        out = out.where(F.col("vec_id") != exclude_id)
    if allowed is not None:
        out = out.join(allowed.select("vec_id"), "vec_id", "left_semi")
    return (
        out.selectExpr("vec_id", sqdist("qv") + " AS dist")
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(top)
    )


def ivf_probe_batch(
    lists: DataFrame,
    cents: DataFrame,
    queries: DataFrame,
    n_probe: int = IVFT_PROBE,
    top: int = IVFT_TOP,
    exclude_self: bool = False,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Batch ANN serving: top-``top`` neighbors for EVERY query vector
    in ``queries`` (qid bigint, qv array<bigint> — quantized) in ONE
    plan, returning (qid, vec_id, dist, rank). The fleet-serving form
    of :func:`ivf_probe`: a nightly hard-negative-mining or
    retrieval-eval job probes millions of vectors, and per-vector
    driver round-trips would make the driver the bottleneck.

    Shape (r12 — VERDICT r11 #2 hardened the broadcasts): the K-row
    CODEBOOK broadcasts into the query frame (Q is the scale-growing
    side — a fleet job probes millions of vectors, and broadcasting Q
    would blow the driver/broadcast limits the r11 spelling had
    backwards); a per-qid window takes the n_probe nearest lists. The
    chosen (qid, list) pairs then join the lists on ``k`` with NO
    forced side: at interactive Q the pairs frame is
    statistics-broadcast (AQE), at fleet Q it degrades to a shuffle
    join on ``k`` — each list row still fans out ONLY to the queries
    that probe its list — and the final top-k is one qid-keyed
    exchange of candidate rows (∝ Q x probed-list sizes, never
    corpus x Q all-pairs). ``exclude_self`` drops the row where
    vec_id == qid (in-corpus queries must not return themselves).
    ``rank`` (1-based per qid, ties by vec_id) makes the output
    deterministic and order-insensitively comparable."""
    from pyspark.sql import Window

    q = queries.select(
        F.col("qid").cast("long").alias("qid"), F.col("qv").alias("pqv")
    )

    # one F.expr per distance (the ivf_probe/_IVFT_PDIST spelling):
    # identical JVM expression tree, ~30x cheaper to CONSTRUCT than the
    # per-lambda higher-order py4j calls
    def sq(col: str) -> str:
        return (
            f"aggregate(zip_with({col}, pqv, "
            "(a, b) -> (a - b) * (a - b)), "
            "CAST(0 AS BIGINT), (s, x) -> s + x)"
        )

    wl = Window.partitionBy("qid").orderBy(F.asc("pd"), F.asc("k"))
    plists = (
        q.crossJoin(F.broadcast(cents))
        .selectExpr("qid", "k", "pqv", sq("c") + " AS pd")
        .withColumn("_rn", F.row_number().over(wl))
        .where(F.col("_rn") <= n_probe)
        .select("qid", "k", "pqv")
    )
    cand = lists.join(plists, "k")
    if exclude_self:
        cand = cand.where(F.col("vec_id") != F.col("qid"))
    if allowed is not None:
        # the fleet form of the filtered probe: ONE policy frame scopes
        # every query's candidates BEFORE the per-qid top-k (after would
        # under-return); unhinted like the single-probe spelling
        cand = cand.join(allowed.select("vec_id"), "vec_id", "left_semi")
    wt = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("vec_id"))
    return (
        cand.selectExpr("qid", "vec_id", sq("qv") + " AS dist")
        .withColumn("rank", F.row_number().over(wt))
        .where(F.col("rank") <= top)
        .select("qid", "vec_id", "dist", "rank")
    )


def _probe_grown_lists(
    spark: SparkSession, root: str, query_vec, exclude_id: int | None = None
) -> DataFrame:
    """:func:`ivf_probe` over a grown-lists index dir — the SINGLE
    serving path shared by the grown and delete-aware queries (reads
    through read_ivf_lists, so tombstoned vectors are excluded from the
    candidate lists and the result)."""
    import os

    return ivf_probe(
        read_ivf_lists(spark, root),
        spark.read.parquet(os.path.join(root, IVF_CODEBOOK)),
        query_vec,
        exclude_id=exclude_id,
    )


def probe_over_lists(lists: DataFrame, cents: DataFrame) -> DataFrame:
    """Fixture-test spelling of the probe: look the probe vector up IN
    the supplied lists frame (1-row bounded read), then run the same
    parameterized :func:`ivf_probe`. Kept for the delete tests, which
    pin the served-after-delete equivalence against a hand-filtered
    lists frame — the lookup must honor that frame's own masking. The
    registered serving queries do NOT go through this: they fetch the
    probe from the source table (:func:`quantized_probe_vector`)."""
    rows = (
        lists.where(F.col("vec_id") == IVFT_PROBE_ID).select("qv").collect()
    )
    if not rows:
        raise ValueError(f"probe vec_id={IVFT_PROBE_ID} not in lists")
    return ivf_probe(
        lists, cents, [int(x) for x in rows[0].qv], exclude_id=IVFT_PROBE_ID
    )


def q_knn_ivf_grown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 probe query served from the incrementally grown lists +
    stored codebook — must equal q_knn_ivf_trained exactly (same
    oracle): the frozen codebook IS the trained one, and row-local
    assignment is batch-independent. Probe vector = a source-table
    point lookup, served through the parameterized :func:`ivf_probe`."""
    root = build_ivf_grown(spark, sf_dir)
    qv = quantized_probe_vector(spark, sf_dir)
    if qv is None:  # empty corpus: an empty answer, not a raise
        return _empty_probe_result(read_ivf_lists(spark, root))
    return _probe_grown_lists(spark, root, qv, exclude_id=IVFT_PROBE_ID)


# Batch serving fixture (r11; registration candidate for r12 — see
# plans/registry.py's earmark comment): three in-corpus query vectors
# probed against the grown index in ONE plan, self-hits excluded.
BATCH_QIDS = (0, 7, 13)  # present at every sf


def q_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 per query vector over the incrementally grown lists +
    stored codebook via :func:`ivf_probe_batch` — the fleet spelling of
    q_knn_ivf_grown (same pipeline, Q queries in one plan)."""
    import os

    root = build_ivf_grown(spark, sf_dir)
    queries = fleet_query_frame(spark, sf_dir, BATCH_QIDS)
    return ivf_probe_batch(
        read_ivf_lists(spark, root),
        spark.read.parquet(os.path.join(root, IVF_CODEBOOK)),
        queries,
        exclude_self=True,
    )


def _oracle_knn_batch(qid_set=None) -> str:
    """DuckDB re-derivation of the batch probe: the trained-IVF oracle
    pipeline (the frozen grown codebook IS the trained one) with the
    probe/plists/top-k stages parameterized over the query set via
    per-qid window ranks. ``qid_set`` overrides the probed vec_ids
    (default = the registered fixture fleet) — the batch-hybrid oracle
    composes this with its own fleet."""
    k_case = "CASE vec_id " + " ".join(
        f"WHEN {v} THEN {i}" for i, v in enumerate(IVFT_SEEDS)
    ) + " END"
    dist = (
        f"CAST(list_sum(list_transform(range(1, {KM_DIM + 1}), "
        f"i -> (v.qv[i] - c.c[i]) * (v.qv[i] - c.c[i]))) AS BIGINT)"
    )
    pdist = (
        f"CAST(list_sum(list_transform(range(1, {KM_DIM + 1}), "
        f"i -> (a.qv[i] - p.pqv[i]) * (a.qv[i] - p.pqv[i]))) AS BIGINT)"
    )
    cdist = (
        f"CAST(list_sum(list_transform(range(1, {KM_DIM + 1}), "
        f"i -> (c.c[i] - p.pqv[i]) * (c.c[i] - p.pqv[i]))) AS BIGINT)"
    )
    qids = ", ".join(str(q) for q in (BATCH_QIDS if qid_set is None else qid_set))
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * {KM_QSCALE}) AS BIGINT)) AS qv
  FROM embeddings
), c0 AS (
  SELECT {k_case} AS k, qv AS c FROM q WHERE vec_id IN {IVFT_SEEDS}
), a1 AS (
  SELECT v.vec_id, v.qv, c.k, {dist} AS d
  FROM q v CROSS JOIN c0 c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY d, c.k) = 1
), e1 AS (
  SELECT k, i, CAST(SUM(qv[i]) AS BIGINT) AS s, COUNT(*) AS n
  FROM a1 CROSS JOIN range(1, {KM_DIM + 1}) t1(i)
  GROUP BY k, i
), c1 AS (
  SELECT k, array_agg(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)
                      ORDER BY i) AS c
  FROM e1 GROUP BY k
), a2 AS (
  SELECT v.vec_id, v.qv, c.k, {dist} AS d
  FROM q v CROSS JOIN c1 c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY d, c.k) = 1
), probes AS (
  SELECT vec_id AS qid, qv AS pqv FROM q WHERE vec_id IN ({qids})
), plists AS (
  SELECT p.qid, p.pqv, c.k FROM c1 c CROSS JOIN probes p
  QUALIFY ROW_NUMBER() OVER (PARTITION BY p.qid ORDER BY {cdist} ASC, c.k ASC)
          <= {IVFT_PROBE}
)
SELECT qid, vec_id, dist, rank FROM (
  SELECT p.qid, a.vec_id, {pdist} AS dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY p.qid
              ORDER BY {pdist} ASC, a.vec_id ASC) AS INT) AS rank
  FROM a2 a JOIN plists p USING (k)
  WHERE a.vec_id <> p.qid
)
WHERE rank <= {IVFT_TOP}
"""


# --- vector deletes, served (registered r10 as sim_knn_after_delete,
# slot funded by retiring sql_waiting_suppliers per plans/registry.py's
# retirement policy; the equivalence is also machine-pinned in
# tests/test_ivf_deletes.py) ---------------------------------------------

IVF_DELETE_MOD = 9
IVF_DELETE_REM = 4  # never the probe id (0 % 9 == 0)


def build_ivf_grown_with_deletes(spark: SparkSession, sf_dir: str) -> str:
    """Grown-lists build, then ONE delete batch tombstoning every
    vec_id % IVF_DELETE_MOD == IVF_DELETE_REM, then a compaction with
    keep_last=1 — earlier batches fold (their deleted vectors purge
    physically), the last batch's victims stay tombstone-masked: the
    served probe exercises both paths at once. The codebook stays the
    one trained on the full corpus (deletes do not retrain; the drift
    signal owns that decision). Idempotent per fixture identity."""
    import os
    import shutil

    root = ivf_index_path(spark, sf_dir) + "_del"
    done = os.path.join(root, "_COMPLETE")
    if root in _VERIFIED_IVF_ROOTS and os.path.exists(done):
        return root
    if os.path.isdir(root):
        try:
            if not os.path.exists(done):  # not assert: -O strips those
                raise ValueError("incomplete build: no _COMPLETE marker")
            read_ivf_lists(spark, root).limit(1).count()
            spark.read.parquet(os.path.join(root, IVF_CODEBOOK)).limit(
                1
            ).count()
            _VERIFIED_IVF_ROOTS.add(root)
            return root
        except Exception:
            shutil.rmtree(root, ignore_errors=True)
    q = _km_quantize(load_table(spark, sf_dir, "embeddings"))
    frozen_ivf_codebook(q).write.mode("overwrite").parquet(
        os.path.join(root, IVF_CODEBOOK)
    )
    cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    for b in range(IVF_GROW_BATCHES):
        batch = q.where(F.col("vec_id") % IVF_GROW_BATCHES == b)
        write_ivf_batch(_km_assign(batch, cents), b, root)
    delete_ivf_vectors(
        spark,
        root,
        q.where(
            F.col("vec_id") % IVF_DELETE_MOD == IVF_DELETE_REM
        ).select("vec_id"),
        IVF_GROW_BATCHES,
    )
    compact_ivf_lists(spark, root, keep_last=1)
    with open(done, "w") as fh:  # written LAST: marks the build whole
        fh.write("")
    _VERIFIED_IVF_ROOTS.add(root)
    return root


def q_knn_after_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 probe over the grown index AFTER vector deletes — victims
    must never appear among the neighbors, whether physically purged
    (compacted batches) or tombstone-masked (the kept batch). Oracle
    (r10): the trained-IVF oracle with the victims excluded from the
    candidate set. Probe vector = a source-table point lookup, served
    through the parameterized :func:`ivf_probe`."""
    root = build_ivf_grown_with_deletes(spark, sf_dir)
    qv = quantized_probe_vector(spark, sf_dir)
    if qv is None:  # empty corpus: an empty answer, not a raise
        return _empty_probe_result(read_ivf_lists(spark, root))
    return _probe_grown_lists(spark, root, qv, exclude_id=IVFT_PROBE_ID)


# --- product quantization (PQ) / asymmetric-distance serving ---------------
# The memory-bounded ANN serving path (Jégou et al., public algorithm):
# the 64-dim quantized vector is split into PQ_M contiguous subspaces,
# each subspace gets its own PQ_K-centroid codebook (the same
# deterministic seed-pick + 1-Lloyd-iteration integer pipeline as the
# IVF codebook, per subspace), and every vector is stored as PQ_M small
# codes — 8 ints instead of 64 bigints, the representation that keeps a
# 100 TB corpus's ANN index in cluster memory (~12 GB of codes per
# billion vectors at M=8 x 4-byte ints — vs ~0.5 TB of raw quantized
# vectors). Serving is ADC (asymmetric distance computation): the
# QUERY stays exact; its distance to every centroid of every subspace
# is a PQ_M x PQ_K table computed once per query (128 integer
# subdistances — driver-built from the memoized codebook and inlined
# as a literal), and each stored vector's approximate distance is the
# row-local sum of PQ_M table lookups — no vector arithmetic per
# candidate at all, one scan of the codes artifact.
#
# Everything stays deterministic integer math (quantize -> slice ->
# argmin ties-by-index -> floor-mean), so the codes AND the served ADC
# ranking carry a full DuckDB oracle, exactly like the IVF family.
# Approximation error vs exact quantized L2 is pinned separately
# (recall floor in tests/test_pq.py) — the oracle checks fidelity of
# the algorithm, not closeness to brute force.
#
# Registration earmarked for r13 (plans/registry.py — the registry is
# at rotation capacity); code + oracle + tests ship now.

PQ_M = 8  # subspaces
PQ_SUBDIM = KM_DIM // PQ_M  # dims per subspace
PQ_K = 16  # centroids per subspace codebook
PQ_SEEDS = tuple(range(0, 400, 25))  # 16 vec_ids present at every sf
PQ_CODES = "codes"
PQ_CODEBOOK = "pq_codebook"


def pq_slices(q: DataFrame) -> DataFrame:
    """(vec_id, m, sq): the m-th PQ_SUBDIM-wide slice of each quantized
    vector, m 1-based. One generator expression — no join, no Python."""
    return q.select(
        "vec_id",
        F.expr(
            f"explode(transform(sequence(1, {PQ_M}), m -> named_struct("
            f"'m', m, 'sq', transform(sequence(1, {PQ_SUBDIM}), "
            f"i -> element_at(qv, {PQ_SUBDIM} * (m - 1) + i)))))"
        ).alias("e"),
    ).select("vec_id", F.col("e.m").alias("m"), F.col("e.sq").alias("sq"))


_PQ_DIST = (
    "aggregate(zip_with(sq, cent.c, (a, b) -> (a - b) * (a - b)), "
    "CAST(0 AS BIGINT), (s, x) -> s + x)"
)


def _pq_assign(slices: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, m, sq, j, d): nearest subspace centroid per slice —
    the _km_assign discipline per subspace (row-local fold over the
    broadcast per-m centroid arrays, ties to the lowest j)."""
    per_m = cb.groupBy("m").agg(
        F.array_sort(F.collect_list(F.struct("j", "c"))).alias("cents")
    )
    best = F.expr(
        f"array_min(transform(cents, cent -> "
        f"named_struct('d', {_PQ_DIST}, 'j', cent.j)))"
    )
    return (
        slices.join(F.broadcast(per_m), "m")
        .withColumn("_b", best)
        .select(
            "vec_id", "m", "sq",
            F.col("_b.j").alias("j"), F.col("_b.d").alias("d"),
        )
    )


def train_pq_codebook(
    q: DataFrame, seeds: tuple[int, ...] = PQ_SEEDS
) -> DataFrame:
    """(m, j, c): per-subspace codebooks — seed slices (j = seed index)
    refined by ONE Lloyd iteration of element-wise floor-means, the
    exact _seed_centroids/_km_update arithmetic per subspace. A
    subspace cluster that attracts no slice vanishes (same contract as
    the IVF trained codebook — codes never reference it)."""
    s = pq_slices(q)
    j_of = F.expr(
        "CASE vec_id " + " ".join(
            f"WHEN {v} THEN {i}" for i, v in enumerate(seeds)
        ) + " END"
    ).cast("int")
    c0 = s.where(F.col("vec_id").isin(*seeds)).select(
        "m", j_of.alias("j"), F.col("sq").alias("c")
    )
    cells = _pq_assign(s, c0).select(
        "m", "j", F.posexplode("sq").alias("pos", "val")
    )
    sums = cells.groupBy("m", "j", "pos").agg(
        F.sum("val").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        sums.select(
            "m", "j", "pos",
            F.expr("CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)").alias("v"),
        )
        .groupBy("m", "j")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select("m", "j", F.expr("transform(pv, x -> x.v)").alias("c"))
    )


def pq_encode(q: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, codes): each vector's PQ_M nearest-centroid indices,
    codes[m-1] = the m-th subspace's code (0-based j)."""
    a = _pq_assign(pq_slices(q), cb)
    return (
        a.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("m", "j"))).alias("mj"))
        .select("vec_id", F.expr("transform(mj, x -> x.j)").alias("codes"))
    )


def pq_index_path(spark: SparkSession, sf_dir: str) -> str:
    from .text_analysis import artifact_path

    return artifact_path(
        spark, sf_dir, "embeddings.parquet", "pq_index", IVF_FORMAT_VERSION
    )


def build_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """One-time (per fixture identity) PQ artifact: pq_codebook/ (m, j,
    c) + codes/ (vec_id, codes), _COMPLETE-marked, completeness
    validation memoized like the IVF roots."""
    import os
    import shutil

    root = pq_index_path(spark, sf_dir)
    done = os.path.join(root, "_COMPLETE")
    if root in _VERIFIED_IVF_ROOTS and os.path.exists(done):
        return root
    if os.path.isdir(root):
        try:
            if not os.path.exists(done):  # not assert: -O strips those
                raise ValueError("incomplete build: no _COMPLETE marker")
            spark.read.parquet(os.path.join(root, PQ_CODES)).limit(1).count()
            spark.read.parquet(
                os.path.join(root, PQ_CODEBOOK)
            ).limit(1).count()
            _VERIFIED_IVF_ROOTS.add(root)
            return root
        except Exception:
            shutil.rmtree(root, ignore_errors=True)
    q = _km_quantize(load_table(spark, sf_dir, "embeddings"))
    train_pq_codebook(q).write.mode("overwrite").parquet(
        os.path.join(root, PQ_CODEBOOK)
    )
    cb = spark.read.parquet(os.path.join(root, PQ_CODEBOOK))
    (
        # vec_id-range-partitioned, vec_id-sorted files: a filtered
        # serve (or an IVF+PQ composition's candidate semi-join) prunes
        # whole files then row groups; AQE coalesces the tiny fixture
        pq_encode(q, cb)
        .repartitionByRange("vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .parquet(os.path.join(root, PQ_CODES))
    )
    with open(done, "w") as fh:  # written LAST: marks the build whole
        fh.write("")
    _VERIFIED_IVF_ROOTS.add(root)
    return root


# collected (m, j, c) codebook rows per root — the 128-row bounded
# driver read happens once per (process, artifact), the
# quantized_probe_vector memo discipline
_PQ_CB_MEMO: dict[str, tuple] = {}


def _pq_codebook_rows(spark: SparkSession, root: str) -> tuple:
    import os

    if root not in _PQ_CB_MEMO:
        _PQ_CB_MEMO[root] = tuple(
            (int(r.m), int(r.j), [int(x) for x in r.c])
            for r in spark.read.parquet(
                os.path.join(root, PQ_CODEBOOK)
            ).collect()
        )
    return _PQ_CB_MEMO[root]


def pq_adc_topk(
    spark: SparkSession,
    root: str,
    query_qv,
    top: int = IVFT_TOP,
    exclude_id: int | None = None,
) -> DataFrame:
    """ADC top-``top`` (vec_id, adc_dist) for a caller-supplied
    quantized query vector over the stored codes. The PQ_M x PQ_K
    query-to-centroid table is computed driver-side in exact Python
    ints from the memoized codebook (bounded: ≤128 rows) and inlined
    as ONE literal expression — per stored vector the plan does PQ_M
    array lookups and a sum, nothing else; the only scan is codes/."""
    import os

    tbl = [[0] * PQ_K for _ in range(PQ_M)]
    for m, j, c in _pq_codebook_rows(spark, root):
        lo = PQ_SUBDIM * (m - 1)
        sub = query_qv[lo:lo + PQ_SUBDIM]
        tbl[m - 1][j] = sum(
            (int(a) - int(b)) * (int(a) - int(b)) for a, b in zip(sub, c)
        )
    lit = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{v}L" for v in row) + ")" for row in tbl
        )
        + ")"
    )
    dist = (
        f"aggregate(sequence(1, {PQ_M}), CAST(0 AS BIGINT), (s, m) -> "
        f"s + element_at(element_at({lit}, m), "
        f"element_at(codes, m) + 1))"
    )
    codes = spark.read.parquet(os.path.join(root, PQ_CODES))
    if exclude_id is not None:
        codes = codes.where(F.col("vec_id") != exclude_id)
    return (
        codes.selectExpr("vec_id", dist + " AS adc_dist")
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(top)
    )


def q_knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 ADC neighbors of the standard probe vector served from
    the stored PQ codes — the memory-bounded twin of the IVF probes
    (same source-table probe lookup, same exclusion contract)."""
    root = build_pq_index(spark, sf_dir)
    qv = quantized_probe_vector(spark, sf_dir)
    if qv is None:  # empty corpus: an empty answer, not a raise
        return spark.createDataFrame([], "vec_id bigint, adc_dist bigint")
    return pq_adc_topk(spark, root, qv, exclude_id=IVFT_PROBE_ID)


def _pq_oracle_ctes() -> str:
    """The shared WITH body of the PQ oracles: quantize -> subspace
    slices -> seed codebooks -> 1 Lloyd iteration (floor means) ->
    codes -> query ADC table -> per-vector summed lookups (``adc``)."""
    j_case = "CASE vec_id " + " ".join(
        f"WHEN {v} THEN {i}" for i, v in enumerate(PQ_SEEDS)
    ) + " END"
    sd = (
        f"CAST(list_sum(list_transform(range(1, {PQ_SUBDIM + 1}), "
        f"i -> (s.sq[i] - c.c[i]) * (s.sq[i] - c.c[i]))) AS BIGINT)"
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * {KM_QSCALE}) AS BIGINT)) AS qv
  FROM embeddings
), sub AS (
  SELECT vec_id, CAST(t.m AS INT) AS m,
         list_transform(range(1, {PQ_SUBDIM + 1}),
                        i -> qv[{PQ_SUBDIM} * (t.m - 1) + i]) AS sq
  FROM q CROSS JOIN range(1, {PQ_M + 1}) t(m)
), c0 AS (
  SELECT m, {j_case} AS j, sq AS c FROM sub WHERE vec_id IN {PQ_SEEDS}
), a1 AS (
  SELECT s.vec_id, s.m, s.sq, c.j, {sd} AS d
  FROM sub s JOIN c0 c USING (m)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                             ORDER BY d, c.j) = 1
), e1 AS (
  SELECT m, j, i, CAST(SUM(sq[i]) AS BIGINT) AS sm, COUNT(*) AS n
  FROM a1 CROSS JOIN range(1, {PQ_SUBDIM + 1}) t1(i)
  GROUP BY m, j, i
), c1 AS (
  SELECT m, j, array_agg(CAST(floor(CAST(sm AS DOUBLE) / n) AS BIGINT)
                         ORDER BY i) AS c
  FROM e1 GROUP BY m, j
), codes AS (
  SELECT s.vec_id, s.m, c.j, {sd} AS d
  FROM sub s JOIN c1 c USING (m)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                             ORDER BY d, c.j) = 1
), probe AS (
  SELECT m, sq FROM sub WHERE vec_id = {IVFT_PROBE_ID}
), tbl AS (
  SELECT c.m, c.j, {sd} AS td
  FROM c1 c JOIN probe s USING (m)
), adc AS (
  SELECT k.vec_id, CAST(SUM(t.td) AS BIGINT) AS adc_dist
  FROM codes k JOIN tbl t USING (m, j)
  WHERE k.vec_id <> {IVFT_PROBE_ID}
  GROUP BY k.vec_id
)"""


def _oracle_knn_pq_adc() -> str:
    """DuckDB re-derivation of the pure-ADC serving (top-k by summed
    table lookups)."""
    return f"""{_pq_oracle_ctes()}
SELECT vec_id, adc_dist FROM adc
ORDER BY adc_dist ASC, vec_id ASC
LIMIT {IVFT_TOP}
"""


def _oracle_knn_pq_rerank() -> str:
    """DuckDB re-derivation of shortlist + exact re-rank: ADC top-R
    candidates re-scored with the EXACT quantized L2."""
    pd = (
        f"CAST(list_sum(list_transform(range(1, {KM_DIM + 1}), "
        f"i -> (v.qv[i] - p.pqv[i]) * (v.qv[i] - p.pqv[i]))) AS BIGINT)"
    )
    return f"""{_pq_oracle_ctes()}
, shortlist AS (
  SELECT vec_id FROM adc ORDER BY adc_dist ASC, vec_id ASC
  LIMIT {PQ_RERANK}
), pv AS (
  SELECT qv AS pqv FROM q WHERE vec_id = {IVFT_PROBE_ID}
)
SELECT v.vec_id, {pd} AS dist
FROM q v JOIN shortlist USING (vec_id) CROSS JOIN pv p
ORDER BY dist ASC, vec_id ASC
LIMIT {IVFT_TOP}
"""


PQ_RERANK = 100  # ADC shortlist size feeding the exact re-rank


def q_knn_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 by EXACT quantized L2 over the ADC top-PQ_RERANK
    shortlist — the standard two-phase PQ serving (shortlist from the
    in-memory codes, refine from the on-disk exact vectors). The
    shortlist ids are a bounded R-row driver read (the codebook-seed
    precedent); the refine leg reads R rows of the SOURCE table through
    a pushed In(vec_id) filter — at 100 TB that is R point reads of a
    vec_id-sorted parquet, never a corpus scan. Recall vs exact
    brute force is the shortlist curve (1.0 at the fixtures' R; pinned
    floor in tests/test_pq.py) while the pure-ADC top-k trades recall
    for touching nothing but codes."""
    root = build_pq_index(spark, sf_dir)
    qv = quantized_probe_vector(spark, sf_dir)
    if qv is None:  # empty corpus: an empty answer, not a raise
        return spark.createDataFrame([], "vec_id bigint, dist bigint")
    short = [
        int(r.vec_id)
        for r in pq_adc_topk(
            spark, root, qv, top=PQ_RERANK, exclude_id=IVFT_PROBE_ID
        ).collect()
    ]
    if not short:  # probe exists but the codes store is empty
        return spark.createDataFrame([], "vec_id bigint, dist bigint")
    arr = "array(" + ",".join(f"{int(x)}L" for x in qv) + ")"
    dist = (
        f"aggregate(zip_with(qv, {arr}, "
        "(a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS BIGINT), (s, x) -> s + x)"
    )
    cand = _km_quantize(load_table(spark, sf_dir, "embeddings")).where(
        F.col("vec_id").isin(short)
    )
    return (
        cand.selectExpr("vec_id", dist + " AS dist")
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(IVFT_TOP)
    )


# --- filtered vector search -------------------------------------------------
# The attribute-constrained probe ("nearest neighbors WITH label = L" /
# a tenant's documents / a training split): candidates semi-join the
# filter frame INSIDE the probe (pre-top-k — a post-top-k filter would
# silently return fewer than k valid neighbors). The filter frame here
# derives from the source table's label column through a pushed
# predicate; a production caller passes whatever id frame its policy
# engine produced. Registration earmarked r13+ with the PQ family.

FILTER_LABEL = 3  # present with ~50 members at every sf


def q_knn_filtered_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 probe over the grown lists restricted to vectors whose
    source-table label equals FILTER_LABEL."""
    root = build_ivf_grown(spark, sf_dir)
    qv = quantized_probe_vector(spark, sf_dir)
    if qv is None:  # empty corpus: an empty answer, not a raise
        return _empty_probe_result(read_ivf_lists(spark, root))
    import os

    allowed = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("label") == FILTER_LABEL)
        .select("vec_id")
    )
    return ivf_probe(
        read_ivf_lists(spark, root),
        spark.read.parquet(os.path.join(root, IVF_CODEBOOK)),
        qv,
        exclude_id=IVFT_PROBE_ID,
        allowed=allowed,
    )


def _oracle_knn_filtered_label() -> str:
    return _oracle_knn_ivf_trained(
        exclude=(
            f" AND a.vec_id IN (SELECT vec_id FROM embeddings"
            f" WHERE label = {FILTER_LABEL})"
        )
    )


# --- IVF + PQ composition ---------------------------------------------------
# The classic billion-scale serving recipe (FAISS IVFPQ shape, non-
# residual variant — codes quantize the RAW vector, the coarse index
# only prunes; the residual refinement is a recall upgrade this
# deterministic-integer pipeline deliberately skips so the full DuckDB
# oracle stays one CTE chain): the coarse trained codebook prunes I/O
# to n_probe inverted lists, and each list row stores PQ CODES instead
# of the quantized vector — the scan is both pruned AND 64x narrower,
# scored by the same literal ADC table as the flat PQ path. At 100 TB:
# I/O ∝ probed-list fraction x 8 ints per vector; the only exchange is
# the final top-k.

IVFPQ_LISTS = "lists_pq"


def ivfpq_index_path(spark: SparkSession, sf_dir: str) -> str:
    from .text_analysis import artifact_path

    return artifact_path(
        spark, sf_dir, "embeddings.parquet", "ivfpq_index",
        IVF_FORMAT_VERSION,
    )


def build_ivfpq_index(spark: SparkSession, sf_dir: str) -> str:
    """One-time (per fixture identity) IVFPQ artifact: the coarse
    trained codebook (codebook/ — the IVFT pipeline), the per-subspace
    PQ codebooks (pq_codebook/), and lists_pq/ (k, vec_id, codes) —
    k-partitioned + (k, vec_id)-sorted so a probe prunes files and row
    groups. _COMPLETE-marked, validation memoized."""
    import os
    import shutil

    root = ivfpq_index_path(spark, sf_dir)
    done = os.path.join(root, "_COMPLETE")
    if root in _VERIFIED_IVF_ROOTS and os.path.exists(done):
        return root
    if os.path.isdir(root):
        try:
            if not os.path.exists(done):  # not assert: -O strips those
                raise ValueError("incomplete build: no _COMPLETE marker")
            spark.read.parquet(
                os.path.join(root, IVFPQ_LISTS)
            ).limit(1).count()
            spark.read.parquet(
                os.path.join(root, IVF_CODEBOOK)
            ).limit(1).count()
            spark.read.parquet(
                os.path.join(root, PQ_CODEBOOK)
            ).limit(1).count()
            _VERIFIED_IVF_ROOTS.add(root)
            return root
        except Exception:
            shutil.rmtree(root, ignore_errors=True)
    q = _km_quantize(load_table(spark, sf_dir, "embeddings"))
    frozen_ivf_codebook(q).write.mode("overwrite").parquet(
        os.path.join(root, IVF_CODEBOOK)
    )
    train_pq_codebook(q).write.mode("overwrite").parquet(
        os.path.join(root, PQ_CODEBOOK)
    )
    cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    pq_cb = spark.read.parquet(os.path.join(root, PQ_CODEBOOK))
    coarse = _km_assign(q, cents).select("vec_id", "k")
    codes = pq_encode(q, pq_cb)
    (
        coarse.join(codes, "vec_id")
        .select("k", "vec_id", "codes")
        .repartition("k")
        .sortWithinPartitions("k", "vec_id")
        .write.mode("overwrite")
        .parquet(os.path.join(root, IVFPQ_LISTS))
    )
    with open(done, "w") as fh:  # written LAST: marks the build whole
        fh.write("")
    _VERIFIED_IVF_ROOTS.add(root)
    return root


def ivfpq_probe(
    spark: SparkSession,
    root: str,
    query_qv,
    n_probe: int = IVFT_PROBE,
    top: int = IVFT_TOP,
    exclude_id: int | None = None,
) -> DataFrame:
    """(vec_id, adc_dist) top-``top`` over the n_probe nearest coarse
    lists, scored by ADC against the caller's vector: the ivf_probe
    list-pruning plan with the pq_adc_topk literal table in place of
    exact vector arithmetic — the only corpus-side work is a pruned
    scan of 8-int code rows."""
    import os

    arr = "array(" + ",".join(f"{int(x)}L" for x in query_qv) + ")"
    pd = (
        f"aggregate(zip_with(c, {arr}, (a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS BIGINT), (s, x) -> s + x)"
    )
    cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    plists = (
        cents.selectExpr("k", pd + " AS pd")
        .orderBy(F.asc("pd"), F.asc("k"))
        .limit(n_probe)
        .select("k")
    )
    tbl = [[0] * PQ_K for _ in range(PQ_M)]
    for m, j, c in _pq_codebook_rows(spark, root):
        lo = PQ_SUBDIM * (m - 1)
        sub = query_qv[lo:lo + PQ_SUBDIM]
        tbl[m - 1][j] = sum(
            (int(a) - int(b)) * (int(a) - int(b)) for a, b in zip(sub, c)
        )
    lit = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{v}L" for v in row) + ")" for row in tbl
        )
        + ")"
    )
    dist = (
        f"aggregate(sequence(1, {PQ_M}), CAST(0 AS BIGINT), (s, m) -> "
        f"s + element_at(element_at({lit}, m), "
        f"element_at(codes, m) + 1))"
    )
    out = spark.read.parquet(os.path.join(root, IVFPQ_LISTS)).join(
        F.broadcast(plists), "k"
    )
    if exclude_id is not None:
        out = out.where(F.col("vec_id") != exclude_id)
    return (
        out.selectExpr("vec_id", dist + " AS adc_dist")
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(top)
    )


def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 ADC neighbors of the standard probe over the IVFPQ
    artifact — pruned to the n_probe nearest coarse lists AND scored
    from 8-int codes."""
    root = build_ivfpq_index(spark, sf_dir)
    qv = quantized_probe_vector(spark, sf_dir)
    if qv is None:  # empty corpus: an empty answer, not a raise
        return spark.createDataFrame([], "vec_id bigint, adc_dist bigint")
    return ivfpq_probe(spark, root, qv, exclude_id=IVFT_PROBE_ID)


def _oracle_knn_ivfpq() -> str:
    """DuckDB re-derivation of the composed pipeline: the trained
    coarse codebook (c-prefixed CTEs — the _oracle_knn_ivf_trained
    chain) prunes the candidate set to the probe's n_probe lists; the
    PQ chain (p-prefixed CTEs) supplies codes and the query ADC table;
    the served distance is the summed lookups over the pruned
    candidates only."""
    ck_case = "CASE vec_id " + " ".join(
        f"WHEN {v} THEN {i}" for i, v in enumerate(IVFT_SEEDS)
    ) + " END"
    pj_case = "CASE vec_id " + " ".join(
        f"WHEN {v} THEN {i}" for i, v in enumerate(PQ_SEEDS)
    ) + " END"
    cdist = (
        f"CAST(list_sum(list_transform(range(1, {KM_DIM + 1}), "
        f"i -> (v.qv[i] - c.c[i]) * (v.qv[i] - c.c[i]))) AS BIGINT)"
    )
    probedist = (
        f"CAST(list_sum(list_transform(range(1, {KM_DIM + 1}), "
        f"i -> (c.c[i] - p.pqv[i]) * (c.c[i] - p.pqv[i]))) AS BIGINT)"
    )
    sd = (
        f"CAST(list_sum(list_transform(range(1, {PQ_SUBDIM + 1}), "
        f"i -> (s.sq[i] - c.c[i]) * (s.sq[i] - c.c[i]))) AS BIGINT)"
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * {KM_QSCALE}) AS BIGINT)) AS qv
  FROM embeddings
), cc0 AS (
  SELECT {ck_case} AS k, qv AS c FROM q WHERE vec_id IN {IVFT_SEEDS}
), ca1 AS (
  SELECT v.vec_id, v.qv, c.k, {cdist} AS d
  FROM q v CROSS JOIN cc0 c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY d, c.k) = 1
), ce1 AS (
  SELECT k, i, CAST(SUM(qv[i]) AS BIGINT) AS s, COUNT(*) AS n
  FROM ca1 CROSS JOIN range(1, {KM_DIM + 1}) t1(i)
  GROUP BY k, i
), cc1 AS (
  SELECT k, array_agg(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)
                      ORDER BY i) AS c
  FROM ce1 GROUP BY k
), ca2 AS (
  SELECT v.vec_id, v.qv, c.k, {cdist} AS d
  FROM q v CROSS JOIN cc1 c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY d, c.k) = 1
), cprobe AS (
  SELECT qv AS pqv FROM q WHERE vec_id = {IVFT_PROBE_ID}
), cplists AS (
  SELECT c.k FROM cc1 c CROSS JOIN cprobe p
  ORDER BY {probedist} ASC, c.k ASC
  LIMIT {IVFT_PROBE}
), sub AS (
  SELECT vec_id, CAST(t.m AS INT) AS m,
         list_transform(range(1, {PQ_SUBDIM + 1}),
                        i -> qv[{PQ_SUBDIM} * (t.m - 1) + i]) AS sq
  FROM q CROSS JOIN range(1, {PQ_M + 1}) t(m)
), pc0 AS (
  SELECT m, {pj_case} AS j, sq AS c FROM sub WHERE vec_id IN {PQ_SEEDS}
), pa1 AS (
  SELECT s.vec_id, s.m, s.sq, c.j, {sd} AS d
  FROM sub s JOIN pc0 c USING (m)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                             ORDER BY d, c.j) = 1
), pe1 AS (
  SELECT m, j, i, CAST(SUM(sq[i]) AS BIGINT) AS sm, COUNT(*) AS n
  FROM pa1 CROSS JOIN range(1, {PQ_SUBDIM + 1}) t1(i)
  GROUP BY m, j, i
), pc1 AS (
  SELECT m, j, array_agg(CAST(floor(CAST(sm AS DOUBLE) / n) AS BIGINT)
                         ORDER BY i) AS c
  FROM pe1 GROUP BY m, j
), pcodes AS (
  SELECT s.vec_id, s.m, c.j, {sd} AS d
  FROM sub s JOIN pc1 c USING (m)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                             ORDER BY d, c.j) = 1
), pprobe AS (
  SELECT m, sq FROM sub WHERE vec_id = {IVFT_PROBE_ID}
), ptbl AS (
  SELECT c.m, c.j, {sd} AS td
  FROM pc1 c JOIN pprobe s USING (m)
)
SELECT k.vec_id AS vec_id, CAST(SUM(t.td) AS BIGINT) AS adc_dist
FROM pcodes k
JOIN ptbl t USING (m, j)
JOIN ca2 a ON a.vec_id = k.vec_id
JOIN cplists pl ON pl.k = a.k
WHERE k.vec_id <> {IVFT_PROBE_ID}
GROUP BY k.vec_id
ORDER BY adc_dist ASC, k.vec_id ASC
LIMIT {IVFT_TOP}
"""


QUERIES = {
    "sim_kmeans_train": (q_kmeans_train, _oracle_kmeans_train()),
    # registered r12 (the fleet ANN probe — Q queries in one plan); its
    # slot funded by retiring sim_knn_ivf_grown: sim_knn_batch reads
    # the SAME grown lists/codebook artifacts through the same read
    # path with a strictly larger serving surface, and single-vector
    # serving stays driver-checked via sim_knn_after_delete
    "sim_knn_batch": (q_knn_batch, _oracle_knn_batch()),
    # registered r13 (the PQ-family representative — its oracle chain
    # exercises BOTH codebooks and the codes artifact; the flat
    # adc/rerank pair stays earmark-gated by tests/test_pq.py); slot
    # funded by retiring sim_knn_ivf, the untrained sign-sketch IVF
    # superseded by the trained/PQ family — its bucketed-probe plan
    # property stays pinned in tests/test_plans.py and its recall
    # property in tests/test_similarity_quality.py
    "sim_knn_ivfpq": (q_knn_ivfpq, _oracle_knn_ivfpq()),
    "sim_knn_ivf_grown": (q_knn_ivf_grown, _oracle_knn_ivf_trained()),
    # the delete-serving probe: trained-IVF oracle minus the victims —
    # the codebook/assignments still derive from the FULL corpus (deletes
    # never retrain), only the candidate set shrinks
    "sim_knn_after_delete": (
        q_knn_after_delete,
        _oracle_knn_ivf_trained(
            exclude=(
                f" AND a.vec_id % {IVF_DELETE_MOD} <> {IVF_DELETE_REM}"
            )
        ),
    ),
    "dedup_semantic_pairs": (
        q_semantic_dedup_pairs,
        _oracle_semantic_dedup_pairs(),
    ),
    "sim_knn_ivf_trained": (q_knn_ivf_trained, _oracle_knn_ivf_trained()),
    "sim_knn_bruteforce": (q_knn_bruteforce, ORACLE_KNN_BRUTEFORCE),
    "sim_embedding_quantize": (q_embedding_quantize, ORACLE_EMBEDDING_QUANTIZE),
    "sim_knn_lsh": (q_knn_lsh, ORACLE_KNN_LSH),
    "sim_knn_ivf": (q_knn_ivf, ORACLE_KNN_IVF),
    "sim_embedding_neardup": (q_embedding_neardup, ORACLE_EMBEDDING_NEARDUP),
    "sim_embedding_stats": (q_embedding_stats, ORACLE_EMBEDDING_STATS),
}

# Permanent earmark tier (plans/registry.py capacity decision): the
# flat-PQ serving pair and the filtered probe — family rep
# sim_knn_ivfpq is the registered representative; these stay gated by
# tests/test_pq.py / test_filtered_retrieval.py AND the generic
# earmark parity gate over this dict (r14).
EARMARKS = {
    "sim_knn_pq_adc": (q_knn_pq_adc, _oracle_knn_pq_adc()),
    "sim_knn_pq_rerank": (q_knn_pq_rerank, _oracle_knn_pq_rerank()),
    "sim_knn_filtered": (q_knn_filtered_label, _oracle_knn_filtered_label()),
}
