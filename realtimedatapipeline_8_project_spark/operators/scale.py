"""Scale techniques as first-class, correctness-checked operators.

These exist to keep 100 TB plans healthy; each is oracle-checked to prove
the technique does not change semantics:

* salted aggregation — two-phase groupBy for skewed keys: shuffle on
  (key, salt) spreads a hot key over N reducers, then a tiny second
  aggregate merges the partials. Result identical to a plain groupBy.
* broadcast-dim denormalized rollup — the serving-layer pattern: join the
  small dim AFTER aggregating the fact side (aggregate-then-join), so the
  shuffle carries grouped keys instead of enriched rows.

AQE's skew-join handling covers sort-merge joins automatically
(spark.sql.adaptive.skewJoin.enabled, on in our session factory); salting
is the explicit fallback for aggregations, which AQE does not re-balance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import oracle_dsum
from ..sources.tables import load_table

N_SALT = 16


def salted_sum(
    df: DataFrame, key: str, value_col: str, alias: str, n_salt: int = N_SALT
) -> DataFrame:
    """Two-phase exact sum per key: partial agg on (key, salt), final agg on
    key. Decimal accumulation keeps the result bit-identical to single-phase.
    The salt is row-position derived, spreading even a single hot key over
    n_salt reducers."""
    partial = (
        df.withColumn("_salt", (F.monotonically_increasing_id() % n_salt))
        .groupBy(key, "_salt")
        .agg(
            F.sum(F.col(value_col).cast("decimal(27,6)")).alias("_psum"),
            F.count(F.lit(1)).alias("_pn"),
        )
    )
    return partial.groupBy(key).agg(
        F.round(F.sum("_psum"), 2).cast("double").alias(alias),
        F.sum("_pn").alias("n"),
    )


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag revenue through the salted two-phase plan — the
    oracle proves it equals the plain single-phase aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return salted_sum(li, "l_returnflag", "l_extendedprice", "sum_price")


ORACLE_SALTED_AGG = f"""
SELECT l_returnflag, {oracle_dsum('l_extendedprice', 'sum_price')}, COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def q_agg_then_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-then-join: sum order totals per custkey FIRST, then attach
    the customer dim — the shuffle carries one row per key, not one per
    order. Same result as join-then-aggregate. The dim join is hint-free:
    customer grows with scale, so the optimizer picks broadcast below the
    size threshold (the local plan, pinned in tests/test_plans.py) and a
    shuffle join at 100x; the aggregate-first shape is what this operator
    pins, not the dim strategy."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = orders.groupBy("o_custkey").agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(27,6)")), 2)
        .cast("double")
        .alias("spend")
    )
    return (
        per_cust.join(cust, per_cust["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum(F.col("spend").cast("decimal(27,6)")), 2)
            .cast("double")
            .alias("segment_spend"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


ORACLE_AGG_THEN_JOIN = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,6))), 2) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment,
       CAST(ROUND(SUM(CAST(spend AS DECIMAL(27,6))), 2) AS DOUBLE) AS segment_spend,
       COUNT(*) AS n_customers
FROM per_cust JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# --- salted shuffle join: explicit skew spreading for joins ---------------
# AQE skew-join splits oversized SMJ partitions, but only after one has
# materialized; when a key is hot enough that a single (key) hash bucket
# can't even build, the explicit form is: salt the big side
# deterministically into S sub-keys and replicate the small side S times,
# joining on (key, salt) — the hot key now occupies S reducers by
# construction. Replication cost = |small| * S rows, paid only when this
# plan is chosen. The oracle is the plain unsalted join, proving the
# rewrite changes nothing.
JOIN_SALT = 16


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    salted = ev.withColumn(
        "_salt", (F.col("event_id") % JOIN_SALT).cast("int")
    )
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(JOIN_SALT - 1)))
    )
    joined = salted.hint("shuffle_hash").join(
        replicated,
        (salted["user_id"] == replicated["c_custkey"])
        & (salted["_salt"] == replicated["_salt"]),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(27,6)")), 2)
        .cast("double")
        .alias("sum_value"),
    )


ORACLE_SALTED_JOIN = """
SELECT c_mktsegment, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 2) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


# --- Bloom-filter semi-join reduction -------------------------------------
# The shuffle-reduction pattern for a selective join whose dim side is too
# big to broadcast whole but whose BLOOM FILTER is not: build a bit table
# from the dim keys (one tiny aggregation -> <=1024 rows of 64-bit words),
# broadcast it, and pre-filter the fact side map-side before the exact
# shuffle join. False positives only ever ADD rows to the (exact) join
# input, so the result is bit-identical to the plain semi join — the
# oracle proves it. At 100 TB this turns "shuffle every fact row" into
# "shuffle only rows that can match" for the cost of k broadcast hash
# probes per row; Spark's own runtime bloom filter
# (spark.sql.optimizer.runtime.bloomFilter.enabled) does this implicitly
# for suitable shapes — this operator is the explicit, plannable form.

BLOOM_BITS = 1 << 16  # 65 536 bits -> 1024 64-bit words
BLOOM_SALTS = (2_654_435_761, 2_246_822_519, 3_266_489_917)
_BLOOM_MOD = 2**32


def _bloom_bit(key_col, salt: int):
    return (key_col * F.lit(salt)) % F.lit(_BLOOM_MOD) % F.lit(BLOOM_BITS)


def build_bloom(dim: DataFrame, key: str) -> DataFrame:
    """(word, bits) Bloom table over the dim keys — one aggregation,
    output bounded by BLOOM_BITS/64 rows regardless of dim size."""
    cells = dim.select(
        F.explode(
            F.array(*[_bloom_bit(F.col(key), s) for s in BLOOM_SALTS])
        ).alias("bit")
    ).select(
        (F.col("bit") / 64).cast("long").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").alias(
            "mask"
        ),
    )
    return cells.groupBy("word").agg(F.expr("bit_or(mask)").alias("bits"))


def bloom_prefilter(fact: DataFrame, key: str, bloom: DataFrame) -> DataFrame:
    """Keep only fact rows whose key passes all k Bloom probes. Each probe
    is a broadcast hash join on the word index — map-side, no shuffle of
    the fact table. A key absent from a probed word (null bits) fails.

    Probe bookkeeping columns are named fresh against the fact schema so a
    caller column can never be clobbered or silently dropped."""
    taken = set(fact.columns)
    tag = 0

    def _names(i: int) -> tuple[str, str, str]:
        p = f"_bloom{tag}_" if tag else "_"
        return (f"{p}bit{i}", f"{p}w{i}", f"{p}bits{i}")

    while any(
        c in taken for i in range(len(BLOOM_SALTS)) for c in _names(i)
    ):
        tag += 1
    out = fact
    for i, s in enumerate(BLOOM_SALTS):
        bit, w, bits = _names(i)
        out = out.withColumn(bit, _bloom_bit(F.col(key), s))
        b = bloom.select(F.col("word").alias(w), F.col("bits").alias(bits))
        out = (
            out.join(
                F.broadcast(b),
                (F.col(bit) / 64).cast("long") == F.col(w),
                "left",
            )
            .where(
                F.expr(
                    f"(`{bits}` & shiftleft(CAST(1 AS BIGINT), "
                    f"CAST(`{bit}` % 64 AS INT))) != 0"
                )
            )
            .drop(bit, w, bits)
        )
    return out


def q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event rollup restricted to BUILDING-segment users via Bloom
    pre-filter + exact shuffle join. Identical to the plain semi join
    (the oracle) — the Bloom stage only reduces shuffled rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    bloom = build_bloom(dim, "c_custkey")
    filtered = bloom_prefilter(ev, "user_id", bloom)
    # exact join: shuffle_hash (NOT broadcast — the scenario is a dim too
    # large to broadcast; only its bloom fits in memory)
    joined = filtered.hint("shuffle_hash").join(
        dim, filtered["user_id"] == dim["c_custkey"]
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(27,6)")), 2)
        .cast("double")
        .alias("sum_value"),
    )


ORACLE_BLOOM_SEMIJOIN = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 2) AS DOUBLE) AS sum_value
FROM events
WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY event_type
"""


QUERIES = {
    "scale_salted_agg": (q_salted_agg, ORACLE_SALTED_AGG),
    "scale_agg_then_join": (q_agg_then_join, ORACLE_AGG_THEN_JOIN),
    "scale_salted_join": (q_salted_join, ORACLE_SALTED_JOIN),
    "scale_bloom_semijoin": (q_bloom_semijoin, ORACLE_BLOOM_SEMIJOIN),
}
