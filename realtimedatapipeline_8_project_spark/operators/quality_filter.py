"""Trained quality filter (SURVEY §2.13 "quality scoring" at its
production shape): a LEARNED linear classifier over cheap text
features, the Spark-native analog of the quality filters every public
LLM corpus pipeline trains — GPT-3's LR-over-features "quality
classifier" (Brown et al. 2020 §A), CCNet's fastText filter (Wenzek
et al. 2020) — rather than the static-threshold gates the engine
already has (``sample_quality_gate``).

Design, 100 TB first:

* **One corpus pass for training.** The trainer never iterates over
  the corpus: a single map-side-combined aggregation produces the
  integer sufficient statistics (the d x d Gram matrix ``X'X``, the
  moment vector ``X'y``, and n — 28 numbers for d=6), and gradient
  descent runs driver-local on those 28 numbers. Iteration count never
  touches data size; the only distributed costs are one stats pass and
  one scoring projection.
* **Integer-exact everywhere** (the ``sim_kmeans_train`` /
  ``dist_quantile_hist`` discipline): features are integer-quantized
  ratios, sums/products stay in int64, the GD update uses floor
  division by a power of two, and weights are integers at a fixed
  scale ``QF_W``. Both engines run the identical arithmetic, so the
  DuckDB oracle (which unrolls the same ``QF_ITERS`` updates as CTEs)
  matches bit for bit. The ONLY subtlety: Python ``//`` floors while
  DuckDB ``//`` truncates toward zero, so the oracle spells floor
  division explicitly as ``(x - ((x % m) + m) % m) // m``.
* **Labels by planted degradation** (the dedup-fixture discipline —
  the synthetic corpus has no organic quality signal): the training
  corpus is every document (label 1) plus a token-doubled copy of
  every third document (label 0) — token doubling is the canonical
  boilerplate/repetition degradation, visible to the repetition and
  distinct-ratio features by construction. The operator itself is
  label-agnostic: any (doc_id, text, y) frame trains the same way.

Features (all integers; ratios quantized to 1e4, positive numerators
so ``//`` == floor in both engines):
  f0 intercept (QF_FSCALE), f1 = 100 * n_tokens,
  f2 = distinct-token ratio, f3 = adjacent-repeat ratio,
  f4 = stopword ratio, f5 = 100 * mean token length.

``quality_lr_train`` returns the learned (feature, weight) rows;
``quality_lr_score`` scores the corpus with them — margin ``w . f`` at
scale ``QF_W`` and the 0.5-threshold flag ``2 * margin < QF_W`` (no
division). Loss monotonicity, planted separation, and the
empty-corpus contract are pinned in tests/test_quality_filter.py; the
oracle parity at sf0.001/sf0.01/sf0.1 rides the generic earmark gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

QF_FSCALE = 10_000  # ratio quantization + intercept value
QF_STOP = ("a", "the")  # fixture stopwords
QF_DEGRADE_EVERY = 3  # every 3rd doc gets a degraded copy
# Degraded doc_id = -(doc_id) - 1: a bijective mirror into the
# negative id space, collision-free for ANY non-negative corpus id
# (review r15 — a fixed additive offset collides once real ids reach
# it; at 100 TB they would). The corpus gate doc_id >= 0 IS the
# contract that keeps the mirror injective, applied identically in
# both engines.
QF_W = 1 << 40  # weight scale: margin ~ QF_W means "label 1"
# GD step = gradient >> QF_LR_SHIFT. Tuned once against the measured
# spectrum (2026-08-16): lambda_max(A) = 1.7e8 at all three fixture
# scales (A is n-averaged, so the spectrum is scale-stable), giving
# lr * lambda_max ~ 0.64 — inside the strict-monotone-descent bound 1
# with 36% headroom. 48 rounds separate the planted corpus at 100%
# (sf0.001/sf0.01) / 99.88% (sf0.1) accuracy with strictly decreasing
# loss; int64 worst cases measured: |gradient| 8.2e15, sufficient-stat
# sums 6.7e11, margins 1.4e12 — 1e6x headroom everywhere.
QF_LR_SHIFT = 28
QF_ITERS = 48  # fixed GD rounds, unrolled in the oracle
QF_FEATURES = ("f_intercept", "f_tokens", "f_distinct", "f_repeat",
               "f_stop", "f_len")
_D = len(QF_FEATURES)


def _stop_sql() -> str:
    return ", ".join(f"'{t}'" for t in QF_STOP)


def _training_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, text, y): originals labeled 1 plus token-doubled
    degraded copies of every QF_DEGRADE_EVERY-th doc labeled 0."""
    base = docs.where(
        F.col("doc_id").isNotNull()
        & (F.col("doc_id") >= 0)
        & F.col("text").isNotNull()
    ).select("doc_id", "text")
    degraded = base.where(F.col("doc_id") % QF_DEGRADE_EVERY == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.expr(
            "array_join(transform(split(text, ' '),"
            " t -> concat(t, ' ', t)), ' ')"
        ).alias("text"),
    )
    return (
        base.withColumn("y", F.lit(1).cast("long"))
        .unionByName(degraded.withColumn("y", F.lit(0).cast("long")))
    )


def _with_features(corpus: DataFrame) -> DataFrame:
    """Append the 6 integer feature columns. All expressions are
    JVM-side (codegen) with positive-numerator integer division, so
    Spark's DIV and DuckDB's // agree exactly."""
    f = QF_FSCALE
    return (
        corpus.withColumn("toks", F.split("text", " "))
        .withColumn("n_tok", F.size("toks").cast("long"))
        .select(
            "doc_id",
            "y",
            F.lit(QF_FSCALE).cast("long").alias("f_intercept"),
            (F.lit(100) * F.col("n_tok")).alias("f_tokens"),
            F.expr(
                f"CAST({f} AS BIGINT) * size(array_distinct(toks))"
                " DIV n_tok"
            ).alias("f_distinct"),
            F.expr(
                f"CAST({f} AS BIGINT) * aggregate("
                "   zip_with(slice(toks, 1, CAST(n_tok AS INT) - 1),"
                "            slice(toks, 2, CAST(n_tok AS INT) - 1),"
                "            (a, b) -> IF(a = b, 1L, 0L)),"
                "   0L, (acc, x) -> acc + x)"
                " DIV greatest(n_tok - 1, 1L)"
            ).alias("f_repeat"),
            F.expr(
                f"CAST({f} AS BIGINT) * size(filter(toks,"
                f" t -> t IN ({_stop_sql()}))) DIV n_tok"
            ).alias("f_stop"),
            F.expr(
                "CAST(100 AS BIGINT) * (length(text) - n_tok + 1)"
                " DIV n_tok"
            ).alias("f_len"),
        )
    )


def _stats_agg_exprs() -> list:
    """The 28 sufficient-statistic aggregate expressions (n, the 6x6
    Gram upper triangle s_j_k, X'y as b_j) — ONE spelling shared by
    the batch operator and the streaming partial-stats sink
    (streaming/quality_ingest.py), so the stream==batch integer
    identity can never drift through two hand-maintained copies
    (review r15, the cut_projection precedent). COALESCE(..., 0) makes
    a zero-row frame aggregate to the all-zero identity row — harmless
    for the batch path (n == 0 short-circuits before the sums are
    read) and required for the stream's mergeable partials."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for j in range(_D):
        for k in range(j, _D):
            aggs.append(
                F.coalesce(
                    F.sum(F.col(QF_FEATURES[j]) * F.col(QF_FEATURES[k])),
                    F.lit(0),
                ).alias(f"s_{j}_{k}")
            )
    for j in range(_D):
        aggs.append(
            F.coalesce(
                F.sum(F.col(QF_FEATURES[j]) * F.col("y")), F.lit(0)
            ).alias(f"b_{j}")
        )
    return aggs


def _stats_row_to_Ac(row) -> tuple:
    """(n, A, c) from a combined stats row: A[j][k] = floor(s_j_k / n),
    c[j] = floor(b_j / n). The reconstruction half of the shared
    spelling — the stream's train-from-artifact path runs this exact
    loop on its merged row."""
    n = row["n"]
    if n == 0:
        return 0, [[0] * _D for _ in range(_D)], [0] * _D
    A = [[0] * _D for _ in range(_D)]
    c = [0] * _D
    for j in range(_D):
        for k in range(j, _D):
            # positive sums: // is floor == truncation in both engines
            A[j][k] = A[k][j] = row[f"s_{j}_{k}"] // n
        c[j] = row[f"b_{j}"] // n
    return n, A, c


def _sufficient_stats(feats: DataFrame) -> tuple:
    """ONE aggregation -> (n, A, c). The exchange is a single combined
    row (map-side partial aggregation); n never appears in a shuffle
    key."""
    # bounded driver read: 1 row
    row = feats.agg(*_stats_agg_exprs()).collect()[0]
    return _stats_row_to_Ac(row)


def _gd_weights(A, c) -> tuple[list[int], list[int]]:
    """Driver-local fixed-iteration GD on the sufficient statistics.
    Returns (weights, loss_trace); loss_t = w'Aw - 2 w'cW (the
    n-averaged SSE up to the constant sum(y^2) term, exactly what the
    gradient minimizes) for the monotonicity pin. Python // floors —
    the oracle spells the identical floor division explicitly."""
    w = [0] * _D
    trace = []
    for _ in range(QF_ITERS):
        g = [
            c[j] * QF_W - sum(A[j][k] * w[k] for k in range(_D))
            for j in range(_D)
        ]
        w = [w[j] + (g[j] // (1 << QF_LR_SHIFT)) for j in range(_D)]
        trace.append(
            sum(w[j] * A[j][k] * w[k] for j in range(_D) for k in range(_D))
            - 2 * sum(w[j] * c[j] * QF_W for j in range(_D))
        )
    return w, trace


def train_quality_lr(
    spark: SparkSession, sf_dir: str
) -> tuple[list[int], list[int]]:
    """(weights, loss_trace) for the fixture training corpus."""
    docs = load_table(spark, sf_dir, "documents")
    n, A, c = _sufficient_stats(_with_features(_training_corpus(docs)))
    if n == 0:
        return [0] * _D, []
    return _gd_weights(A, c)


def q_quality_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface: the learned (feature, weight) rows."""
    w, _ = train_quality_lr(spark, sf_dir)
    rows = [(QF_FEATURES[j], w[j]) for j in range(_D)]
    # 1-slice local relation (the fleet-frame discipline): 6 rows must
    # not become 32 near-empty tasks
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "feature string, weight long",
    )


def q_quality_lr_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margins + 0.5-threshold flags over the training corpus with the
    just-learned weights (broadcast as literals into one projection —
    the scoring pass is a single corpus scan)."""
    w, _ = train_quality_lr(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    feats = _with_features(_training_corpus(docs))
    margin = None
    for j in range(_D):
        term = F.lit(w[j]) * F.col(QF_FEATURES[j])
        margin = term if margin is None else margin + term
    return feats.select(
        "doc_id",
        F.col("y").alias("label"),
        margin.alias("margin_q"),
        (margin * 2 < F.lit(QF_W)).alias("is_low_quality"),
    )


# --- DuckDB oracles --------------------------------------------------------

_O_CORPUS = f"""
  SELECT doc_id, text, CAST(1 AS BIGINT) AS y FROM documents
  WHERE doc_id IS NOT NULL AND doc_id >= 0 AND text IS NOT NULL
  UNION ALL
  SELECT -doc_id - 1,
         array_to_string(list_transform(string_split(text, ' '),
                                        t -> t || ' ' || t), ' '),
         CAST(0 AS BIGINT)
  FROM documents
  WHERE doc_id IS NOT NULL AND doc_id >= 0 AND text IS NOT NULL
    AND doc_id % {QF_DEGRADE_EVERY} = 0
"""

_O_FEATS = f"""
  SELECT doc_id, y,
         CAST({QF_FSCALE} AS BIGINT) AS f_intercept,
         100 * n_tok AS f_tokens,
         ({QF_FSCALE} * CAST(len(list_distinct(toks)) AS BIGINT))
           // n_tok AS f_distinct,
         ({QF_FSCALE} * CAST(len(list_filter(range(1, CAST(n_tok AS INT)),
                                i -> toks[i] = toks[i + 1])) AS BIGINT))
           // greatest(n_tok - 1, 1) AS f_repeat,
         ({QF_FSCALE} * CAST(len(list_filter(toks,
                                t -> t IN ({_stop_sql()}))) AS BIGINT))
           // n_tok AS f_stop,
         (100 * (CAST(len(text) AS BIGINT) - n_tok + 1))
           // n_tok AS f_len
  FROM (
    SELECT doc_id, y, text, toks,
           CAST(len(toks) AS BIGINT) AS n_tok
    FROM (SELECT doc_id, y, text,
                 string_split(text, ' ') AS toks
          FROM corpus)
  )
"""


def _o_stats_select() -> str:
    terms = ["COUNT(*) AS n"]
    for j in range(_D):
        for k in range(j, _D):
            terms.append(
                f"SUM({QF_FEATURES[j]} * {QF_FEATURES[k]}) AS s_{j}_{k}"
            )
        terms.append(f"SUM({QF_FEATURES[j]} * y) AS b_{j}")
    return ",\n         ".join(terms)


def _o_a_select() -> str:
    # COALESCE(x // NULLIF(n, 0), 0): an empty corpus must yield the
    # SAME all-zero weights the Spark n==0 short-circuit returns —
    # without the guard, SUM-of-empty NULLs propagate through all GD
    # CTEs and the oracle diverges exactly on the documented
    # empty-corpus contract (review r15)
    terms = []
    for j in range(_D):
        for k in range(_D):
            jj, kk = min(j, k), max(j, k)
            terms.append(
                f"COALESCE(s_{jj}_{kk} // NULLIF(n, 0), 0) AS a_{j}_{k}"
            )
        terms.append(f"COALESCE(b_{j} // NULLIF(n, 0), 0) AS c_{j}")
    return ",\n         ".join(terms)


def _o_floordiv(x: str, m: int) -> str:
    # exact floor division for possibly-negative x (DuckDB // truncates
    # toward zero; (x % m) carries the dividend's sign)
    return f"((({x}) - (((({x}) % {m}) + {m}) % {m})) // {m})"


def _o_gd_ctes() -> str:
    zero = ", ".join(f"CAST(0 AS BIGINT) AS w_{j}" for j in range(_D))
    ctes = [f"w0 AS (SELECT {zero})"]
    for t in range(1, QF_ITERS + 1):
        prev = f"w{t - 1}"
        exprs = []
        for j in range(_D):
            dot = " + ".join(
                f"a.a_{j}_{k} * {prev}.w_{k}" for k in range(_D)
            )
            g = f"a.c_{j} * {QF_W} - ({dot})"
            exprs.append(
                f"{prev}.w_{j} + {_o_floordiv(g, 1 << QF_LR_SHIFT)}"
                f" AS w_{j}"
            )
        ctes.append(
            f"w{t} AS (SELECT " + ",\n           ".join(exprs)
            + f" FROM {prev}, a)"
        )
    return ",\n".join(ctes)


def _oracle_train() -> str:
    final = " UNION ALL ".join(
        f"SELECT '{QF_FEATURES[j]}' AS feature, w_{j} AS weight"
        f" FROM w{QF_ITERS}"
        for j in range(_D)
    )
    return f"""
WITH corpus AS ({_O_CORPUS}),
feats AS ({_O_FEATS}),
stats AS (
  SELECT {_o_stats_select()}
  FROM feats
),
a AS (
  SELECT {_o_a_select()}, n FROM stats
),
{_o_gd_ctes()}
{final}
"""


def _oracle_score() -> str:
    margin = " + ".join(
        f"w.w_{j} * f.{QF_FEATURES[j]}" for j in range(_D)
    )
    return f"""
WITH corpus AS ({_O_CORPUS}),
feats AS ({_O_FEATS}),
stats AS (
  SELECT {_o_stats_select()}
  FROM feats
),
a AS (
  SELECT {_o_a_select()}, n FROM stats
),
{_o_gd_ctes()}
SELECT f.doc_id,
       f.y AS label,
       {margin} AS margin_q,
       ({margin}) * 2 < {QF_W} AS is_low_quality
FROM feats f, w{QF_ITERS} w
"""


QUERIES: dict = {}

# Earmarks (plans/registry.py capacity decision): full-rigor candidates
# for an r16+ slot, oracle-gated every build by the generic earmark
# parity compare at sf0.001/sf0.01 and the sf0.1 sweep, plus the
# loss-monotonicity / separation / empty-corpus battery in
# tests/test_quality_filter.py. The train row is the family
# representative when a slot frees.
EARMARKS = {
    "quality_lr_train": (q_quality_lr_train, _oracle_train()),
    "quality_lr_score": (q_quality_lr_score, _oracle_score()),
}
