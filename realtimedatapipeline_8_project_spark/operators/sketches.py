"""Sketch structures + time-hierarchy rollups (SURVEY §2.6/§2.13 scale
extensions: "hypertable rollup, a novel sketch").

* ``hypertable_rollup`` — one pass, multi-resolution continuous-aggregate
  table (hour / day / full-range rows distinguished by GROUPING ID), the
  batch analog of TimescaleDB-style hierarchical caggs. Spark computes
  every resolution in a single shuffle via GROUPING SETS; serving reads
  filter on ``resolution`` (partition-prunable if materialized
  partitionBy("resolution")).
* ``count_min_sketch`` — the classic streaming frequency sketch built as
  a DataFrame: d hash rows per key (Knuth multiplicative family, exact
  integer arithmetic — portable to the oracle), groupBy (depth, slot)
  with map-side combine. The sketch table is W*D counters regardless of
  corpus size; point estimates = min over d counters. The build is ONE
  aggregation over the fact table — no per-key state.

Both are exact-arithmetic DataFrame programs with full DuckDB oracles
(the estimate query also demonstrates the sketch's overcount guarantee:
estimate >= true count, checked in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import fround, oracle_fround
from ..sources.tables import load_table

# --- hypertable rollup -----------------------------------------------------


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    day = F.date_trunc("day", F.col("ts"))
    with_buckets = ev.select(
        hour.alias("bucket_hour"), day.alias("bucket_day"), "event_type", "value"
    )
    with_buckets.createOrReplaceTempView("_ht_events")
    return spark.sql(
        """
        SELECT CASE WHEN GROUPING(bucket_hour) = 0 THEN 'hour'
                    WHEN GROUPING(bucket_day) = 0 THEN 'day'
                    ELSE 'all' END AS resolution,
               COALESCE(bucket_hour, bucket_day) AS bucket_start,
               event_type,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 6) AS DOUBLE)
                 AS sum_value
        FROM _ht_events
        GROUP BY GROUPING SETS (
          (bucket_hour, event_type),
          (bucket_day, event_type),
          (event_type)
        )
        """
    )


ORACLE_HYPERTABLE_ROLLUP = """
WITH e AS (
  SELECT date_trunc('hour', ts) AS bucket_hour,
         date_trunc('day', ts) AS bucket_day,
         event_type, value
  FROM events
)
SELECT CASE WHEN GROUPING(bucket_hour) = 0 THEN 'hour'
            WHEN GROUPING(bucket_day) = 0 THEN 'day'
            ELSE 'all' END AS resolution,
       COALESCE(bucket_hour, bucket_day) AS bucket_start,
       event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 6) AS DOUBLE) AS sum_value
FROM e
GROUP BY GROUPING SETS (
  (bucket_hour, event_type),
  (bucket_day, event_type),
  (event_type)
)
"""

# --- count-min sketch ------------------------------------------------------

CM_WIDTH = 2048
CM_DEPTH = 4
# Odd multipliers (distinct per depth) for the multiplicative hash family.
CM_SALTS = (2_654_435_761, 2_246_822_519, 3_266_489_917, 668_265_263)
CM_MOD = 2**32


def _cm_slot(key_col, depth: int):
    """Deterministic slot for a non-negative integer key at one depth.
    key*salt stays below 2^63 for keys < ~2^31 (user ids here)."""
    return (key_col * F.lit(CM_SALTS[depth])) % F.lit(CM_MOD) % F.lit(CM_WIDTH)


def q_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the W x D counter table over event user_ids: explode each row
    into its d (depth, slot) cells, one map-side-combined aggregation."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _cm_slot(F.col("user_id"), d).alias("slot"),
                    )
                    for d in range(CM_DEPTH)
                ]
            )
        ).alias("c")
    ).select("c.depth", "c.slot")
    return cells.groupBy("depth", "slot").agg(F.count(F.lit(1)).alias("n"))


def _oracle_cm_slot(key_sql: str, depth: int) -> str:
    return f"({key_sql} * {CM_SALTS[depth]} % {CM_MOD} % {CM_WIDTH})"


ORACLE_COUNT_MIN_SKETCH = f"""
WITH cells AS (
  {" UNION ALL ".join(
    f"SELECT {d} AS depth, {_oracle_cm_slot('user_id', d)} AS slot FROM events"
    for d in range(CM_DEPTH)
  )}
)
SELECT depth, slot, COUNT(*) AS n FROM cells GROUP BY depth, slot
"""


def q_count_min_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-estimate per-user event counts from the sketch (min over the
    d counters) joined against true counts — the overcount guarantee
    (estimate >= true) is visible in the result and pinned by a test."""
    sketch = q_count_min_sketch(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    probes = users.select(
        "user_id",
        "true_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _cm_slot(F.col("user_id"), d).alias("slot"),
                    )
                    for d in range(CM_DEPTH)
                ]
            )
        ).alias("c"),
    ).select("user_id", "true_n", "c.depth", "c.slot")
    return (
        probes.join(F.broadcast(sketch), ["depth", "slot"])
        .groupBy("user_id", "true_n")
        .agg(F.min("n").alias("estimate"))
    )


ORACLE_COUNT_MIN_ESTIMATE = f"""
WITH cells AS (
  {" UNION ALL ".join(
    f"SELECT {d} AS depth, {_oracle_cm_slot('user_id', d)} AS slot FROM events"
    for d in range(CM_DEPTH)
  )}
), sketch AS (
  SELECT depth, slot, COUNT(*) AS n FROM cells GROUP BY depth, slot
), users AS (
  SELECT user_id, COUNT(*) AS true_n FROM events GROUP BY user_id
), probes AS (
  {" UNION ALL ".join(
    f"SELECT user_id, true_n, {d} AS depth, "
    f"{_oracle_cm_slot('user_id', d)} AS slot FROM users"
    for d in range(CM_DEPTH)
  )}
)
SELECT p.user_id, p.true_n, MIN(s.n) AS estimate
FROM probes p JOIN sketch s USING (depth, slot)
GROUP BY p.user_id, p.true_n
"""


# --- portable HyperLogLog --------------------------------------------------
# Spark's approx_count_distinct is HLL++ but its hash (xxhash64) has no
# DuckDB twin, so it can only be rows-only checked. This is the portable
# twin: the SAME deterministic 32-bit mix, register table, and estimator
# evaluated in both engines — the sketch semantics (register max, zero
# count, linear-counting branch) earn a hard value-hash row. The estimator
# keeps ALL reductions in integer space (sum of 2^(K - M_j) as BIGINT) so
# no float ordering can diverge; the only float ops are one division and
# one ln(), identical bit patterns in both engines.
#
# Grouped form: distinct user_id per event_type — a per-group sketch is
# one groupBy((group, bucket)) then one groupBy(group): two map-side-
# combined shuffles of at most |groups| * m rows, regardless of fact size.

HLL_P = 6
HLL_M = 1 << HLL_P  # 64 registers
HLL_K = 27  # max rho for a 26-bit remainder (32 - p bits)
HLL_ALPHA = 0.709  # alpha_64 (Flajolet et al., HLL for m = 64)
_HLL_MOD = 2**32


def _hll_hash_sql(key: str) -> str:
    """Portable 32-bit avalanche: mul-xor-shift twice. Intermediates stay
    under 2^63 (key < 2^31, multipliers chosen so product < 9.2e18) —
    identical BIGINT arithmetic in Spark SQL and DuckDB."""
    h0 = f"(({key} * 2654435761) % {_HLL_MOD})"
    h1 = f"xor({h0}, {h0} // 65536)"
    h2 = f"(({h1} * 1000000007) % {_HLL_MOD})"
    return f"xor({h2}, {h2} // 8192)"


def _hll_hash_spark(key: str) -> str:
    h0 = f"(({key} * 2654435761) % {_HLL_MOD})"
    h1 = f"({h0} ^ ({h0} div 65536))"
    h2 = f"(({h1} * 1000000007) % {_HLL_MOD})"
    return f"({h2} ^ ({h2} div 8192))"


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimate from a 64-register portable
    HLL, joined against the true distinct count. rho = leading-zero count
    of the 26-bit remainder + 1, via the bit-length of bin() (no leading
    zeros in either engine); estimate = alpha * m^2 / sum(2^-M_j) with the
    standard linear-counting branch for small ranges."""
    ev = load_table(spark, sf_dir, "events")
    h = _hll_hash_spark("user_id")
    cells = ev.select(
        "event_type",
        F.expr(f"{h} % {HLL_M}").alias("bucket"),
        F.expr(f"{h} div {HLL_M}").alias("rem"),
    ).select(
        "event_type",
        "bucket",
        F.when(F.col("rem") == 0, F.lit(HLL_K))
        .otherwise(F.lit(HLL_K) - F.length(F.bin("rem")))
        .alias("rho"),
    )
    regs = cells.groupBy("event_type", "bucket").agg(F.max("rho").alias("m_j"))
    per_type = regs.groupBy("event_type").agg(
        (F.lit(HLL_M) - F.count(F.lit(1))).cast("long").alias("n_zero"),
        F.sum(F.expr(f"CAST(pow(2, {HLL_K} - m_j) AS BIGINT)"))
        .cast("long")
        .alias("s_present"),
    )
    # numerator precomputed once so both engines divide the SAME double
    num = HLL_ALPHA * HLL_M * HLL_M * float(2**HLL_K)
    raw = F.lit(num) / F.col("s_total")
    lin = F.lit(float(HLL_M)) * F.ln(F.lit(float(HLL_M)) / F.col("n_zero"))
    est = per_type.select(
        "event_type",
        "n_zero",
        (
            F.col("s_present") + F.col("n_zero") * F.lit(2**HLL_K)
        ).alias("s_total"),
    ).select(
        "event_type",
        "n_zero",
        fround(
            F.when(
                (F.col("n_zero") > 0) & (raw <= F.lit(2.5 * HLL_M)), lin
            ).otherwise(raw),
            4,
        ).alias("hll_estimate"),
    )
    truth = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("true_distinct")
    )
    return est.join(truth, "event_type").select(
        "event_type", "true_distinct", "hll_estimate", "n_zero"
    )


def _oracle_hll_distinct() -> str:
    h = _hll_hash_sql("user_id")
    num = HLL_ALPHA * HLL_M * HLL_M * float(2**HLL_K)
    return f"""
WITH cells AS (
  SELECT event_type,
         {h} % {HLL_M} AS bucket,
         {h} // {HLL_M} AS rem
  FROM events
), rhos AS (
  SELECT event_type, bucket,
         CASE WHEN rem = 0 THEN {HLL_K}
              ELSE {HLL_K} - length(bin(rem)) END AS rho
  FROM cells
), regs AS (
  SELECT event_type, bucket, MAX(rho) AS m_j FROM rhos
  GROUP BY event_type, bucket
), per_type AS (
  SELECT event_type,
         CAST({HLL_M} - COUNT(*) AS BIGINT) AS n_zero,
         CAST(SUM(CAST(pow(2, {HLL_K} - m_j) AS BIGINT)) AS BIGINT)
           AS s_present
  FROM regs GROUP BY event_type
), est AS (
  SELECT event_type, n_zero,
         s_present + n_zero * {2**HLL_K} AS s_total
  FROM per_type
), truth AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS true_distinct FROM events
  GROUP BY event_type
)
SELECT e.event_type, t.true_distinct,
       {oracle_fround(
           f"CASE WHEN e.n_zero > 0 AND {num!r} / e.s_total <= {2.5 * HLL_M!r} "
           f"THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / e.n_zero) "
           f"ELSE {num!r} / e.s_total END",
           4,
       )} AS hll_estimate,
       e.n_zero
FROM est e JOIN truth t USING (event_type)
"""


QUERIES = {
    "hypertable_rollup": (q_hypertable_rollup, ORACLE_HYPERTABLE_ROLLUP),
    "sketch_count_min": (q_count_min_sketch, ORACLE_COUNT_MIN_SKETCH),
    "sketch_count_min_estimate": (q_count_min_estimate, ORACLE_COUNT_MIN_ESTIMATE),
    "sketch_hll_portable": (q_hll_distinct, _oracle_hll_distinct()),
}
