"""Relational operator family: projections, filters, sorts, set ops, KV
shapes (SURVEY §2.3 P1-P14, §2.4 F1-F5, §2.8 O1-O2, §2.9).

Each operator is a (spark, sf_dir) -> DataFrame callable paired with the
DuckDB oracle SQL that defines its semantics. All expressions are JVM-side
built-ins (whole-stage codegen) — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.uuid_repair import oracle_uuid_from_hash, uuid_from_hash
from ..schemas import FIXTURE_EVENT_TYPES
from ..sources.tables import load_table


# --- S4/K3: per-event point lookup, all-string hash projection ------------
# Reference: Redis HGETALL engagement_events:event:{id} (README.md:209-212);
# the writer casts every field to string (stream-processor.py:89-94).
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_id") == 42).select(
        F.col("event_id").cast("string").alias("event_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        F.col("user_id").cast("string").alias("user_id"),
        F.col("event_type"),
        F.col("value").cast("decimal(12,2)").cast("string").alias("value_str"),
    )


ORACLE_POINT_LOOKUP = """
SELECT
  CAST(event_id AS VARCHAR) AS event_id,
  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
  CAST(user_id AS VARCHAR) AS user_id,
  event_type,
  CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) AS value_str
FROM events WHERE event_id = 42
"""


# --- F1/F4: status + enum-domain validation filter ------------------------
# Reference: WHERE status='pending' (utils/utils.py:41) and CHECK enum
# constraints (setup.sql:6,16) enforced as isin() filters.
def q_enum_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type").isin(*FIXTURE_EVENT_TYPES))
        .where(F.col("value").isNotNull() & (F.col("value") > 0))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_ENUM_VALIDATION = """
SELECT event_type, COUNT(*) AS n
FROM events
WHERE event_type IN ('signup', 'click', 'error', 'view', 'purchase')
  AND value IS NOT NULL AND value > 0
GROUP BY event_type
"""


# --- O2/F5: time-descending top-k (serving "latest events" scan) ----------
# Reference: CLUSTERING ORDER BY (event_time DESC) (cassandra-setup.cql:23);
# Spark compiles orderBy().limit() to TakeOrderedAndProject — no full sort
# at scale, each partition keeps k rows and the driver merges.
def q_topk_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(20)
        .select("event_id", "ts", "user_id", "event_type")
    )


ORACLE_TOPK_RECENT = """
SELECT event_id, ts, user_id, event_type
FROM events ORDER BY ts DESC, event_id ASC LIMIT 20
"""


# --- O1/S3: ordered batched drain (outbox replay semantics) ---------------
# Reference: SELECT ... WHERE status='pending' ORDER BY id LIMIT n
# (utils/utils.py:37-44). 'error' events play the non-pending rows.
def q_ordered_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") != "error")
        .orderBy(F.asc("event_id"))
        .limit(100)
        .select("event_id", "user_id", "event_type", "value")
    )


ORACLE_ORDERED_DRAIN = """
SELECT event_id, user_id, event_type, value
FROM events WHERE event_type <> 'error'
ORDER BY event_id ASC LIMIT 100
"""


# --- P2/P13: schema'd JSON decode -----------------------------------------
# Reference: from_json with explicit schema (stream-processor.py:242);
# unknown fields dropped, nulls on mismatch.
def q_json_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    ).where(F.col("k").isNotNull())


ORACLE_JSON_DECODE = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
"""


# --- semi-structured VARIANT path (Spark 4 native JSON) -------------------
# The modern alternative to schema'd from_json for open/evolving payloads:
# parse once into VariantType (binary-encoded, no schema declared), then
# typed path extraction. At 100 TB the win is shredded parquet storage and
# pruned path access instead of repeated string re-parsing. The payload
# here is built nested (envelope around the flat fixture props) so the
# extraction exercises multi-level paths; DuckDB's native JSON type
# replays it.
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    payload = F.to_json(
        F.struct(
            F.col("event_type").alias("type"),
            F.struct(
                F.col("user_id"),
                F.get_json_object("props", "$.k").cast("int").alias("k"),
            ).alias("ctx"),
        )
    )
    v = F.parse_json(payload)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.type", "string").alias("etype"),
        F.variant_get(v, "$.ctx.user_id", "long").alias("vuser"),
        F.variant_get(v, "$.ctx.k", "int").alias("vk"),
    )


ORACLE_JSON_VARIANT = """
WITH payload AS (
  SELECT event_id,
         to_json(struct_pack(
           type := event_type,
           ctx := struct_pack(
             user_id := user_id,
             k := CAST(json_extract_string(props, '$.k') AS INTEGER)))) AS j
  FROM events
)
SELECT event_id,
       json_extract_string(j, '$.type') AS etype,
       CAST(json_extract(j, '$.ctx.user_id') AS BIGINT) AS vuser,
       CAST(json_extract(j, '$.ctx.k') AS INTEGER) AS vk
FROM payload
"""


# --- P10/K4: KV-sink projection (concat key + JSON-ish value) -------------
# Reference: key = concat('event:', id) (stream-processor.py:96-97); value
# assembled by concat of literals (:127-159). We mirror the concat shape;
# the engine's blessed path for real JSON is to_json(struct(*)).
def q_kv_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.concat(F.lit("event:"), F.col("event_id").cast("string")).alias("redis_key"),
        F.concat(
            F.lit('{"event_id":"'),
            F.col("event_id").cast("string"),
            F.lit('","event_type":"'),
            F.col("event_type"),
            F.lit('","value":"'),
            F.col("value").cast("decimal(12,2)").cast("string"),
            F.lit('"}'),
        ).alias("redis_value"),
    )


ORACLE_KV_PROJECTION = """
SELECT
  concat('event:', CAST(event_id AS VARCHAR)) AS redis_key,
  concat('{"event_id":"', CAST(event_id AS VARCHAR),
         '","event_type":"', event_type,
         '","value":"', CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR),
         '"}') AS redis_value
FROM events
"""


# --- P14: deterministic UUID repair ---------------------------------------
def q_uuid_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        uuid_from_hash(F.col("event_id").cast("string")).alias("event_uuid"),
    )


ORACLE_UUID_REPAIR = f"""
SELECT event_id, {oracle_uuid_from_hash('event_id')} AS event_uuid
FROM events
"""


# --- K5/P12: Kafka-producer projection (keyed JSON payload) ----------------
# Reference: per-row json.dumps + keyed produce (utils/utils.py:62-95);
# engine form is the one-line to_json(struct(...)) -> kafka sink shape.
# NOTE: Spark's to_json omits NULL fields (DuckDB keeps them), so the
# payload is restricted to non-null columns — the engine's JSON contract.
def q_kafka_producer_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.where(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    ).select(
        F.col("event_id").cast("string").alias("key"),
        F.to_json(F.struct("event_id", "event_type", "value")).alias("value"),
    )


ORACLE_KAFKA_PRODUCER = """
SELECT CAST(event_id AS VARCHAR) AS key,
       to_json(struct_pack(event_id := event_id,
                           event_type := event_type,
                           value := value)) AS value
FROM events
WHERE event_type IS NOT NULL AND value IS NOT NULL
"""


# --- P2 variant: JSON decode to MapType (schema-free extras) ---------------
# prop_keys is emitted as a sorted comma-joined string (not an array):
# array cells are unhashable in the driver's pandas canonicalization, and
# map-key order is engine-dependent anyway — the sorted join is the
# deterministic, hash-friendly shape.
def q_json_as_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
        F.element_at(m, "k").cast("int").alias("k"),
    )


ORACLE_JSON_AS_MAP = """
SELECT event_id,
       array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
"""


# --- exact percentiles (distribution summary) ------------------------------
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


ORACLE_PERCENTILES = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""


# --- §2.9: set operations --------------------------------------------------
# Users that viewed but never purchased (anti-join, distinct-set), and the
# INTERSECT of clickers and signup users — same semantics in both engines.
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    viewers = ev.where(F.col("event_type") == "view").select("user_id")
    buyers = ev.where(F.col("event_type") == "purchase").select("user_id")
    clickers = ev.where(F.col("event_type") == "click").select("user_id")
    signups = ev.where(F.col("event_type") == "signup").select("user_id")
    # distinct-set semantics via anti-join: EXCEPT ALL would be multiset
    # subtraction (a user with 3 views and 1 purchase would survive and be
    # misclassified); left_anti removes every user with >=1 purchase.
    viewed_never_bought = (
        viewers.distinct()
        .join(buyers, "user_id", "left_anti")
        .withColumn("cohort", F.lit("viewed_never_bought"))
    )
    click_and_signup = clickers.intersect(signups).withColumn(
        "cohort", F.lit("click_and_signup")
    )
    return viewed_never_bought.unionByName(click_and_signup)


ORACLE_SET_OPS = """
SELECT DISTINCT user_id, 'viewed_never_bought' AS cohort
FROM events e
WHERE event_type = 'view'
  AND NOT EXISTS (SELECT 1 FROM events p
                  WHERE p.event_type = 'purchase' AND p.user_id = e.user_id)
UNION ALL
SELECT user_id, 'click_and_signup' AS cohort FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'signup'
)
"""


# --- J1 generalization: semi / anti / full join variants ------------------
# The reference has only the broadcast left join; capability parity exposes
# the full how= family (SURVEY §2.5). The fact (orders) side is NEVER
# broadcast — at 100 TB that is a driver OOM. The existence check rides on
# the distinct key set: map-side partial dedup shrinks the shuffle to one
# row per key, and AQE upgrades to a broadcast existence join at runtime
# when the distinct set fits under the threshold.
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    order_keys = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    with_orders = cust.join(
        order_keys, cust["c_custkey"] == order_keys["o_custkey"], "left_semi"
    ).select("c_custkey", F.lit("has_orders").alias("cohort"))
    without = cust.join(
        order_keys, cust["c_custkey"] == order_keys["o_custkey"], "left_anti"
    ).select("c_custkey", F.lit("no_orders").alias("cohort"))
    return with_orders.unionByName(without)


ORACLE_JOIN_SEMI_ANTI = """
SELECT c_custkey, 'has_orders' AS cohort FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, 'no_orders' AS cohort FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-user event activity vs the customer dim —
    rows survive from both unmatched sides."""
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return ev.join(cust, ev["user_id"] == cust["c_custkey"], "full_outer").select(
        "user_id", "n_events", "c_custkey", "c_mktsegment"
    )


ORACLE_JOIN_FULL_OUTER = """
SELECT user_id, n_events, c_custkey, c_mktsegment
FROM (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) e
FULL OUTER JOIN (SELECT c_custkey, c_mktsegment FROM customer) c
  ON e.user_id = c.c_custkey
"""


# --- data-quality audit (F4 generalized: the validation summary a -----
# pipeline runs before promoting a batch). One pass over events (null
# rates + enum violations via conditional aggregation) plus one
# broadcast anti-join for referential orphans — no full-table second
# scan, no Python.
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id")
    )
    valid_types = ("click", "view", "purchase", "signup", "error")
    base = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("null_value"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias("null_props"),
        F.sum(
            F.when(~F.col("event_type").isin(*valid_types), 1).otherwise(0)
        ).alias("bad_enum"),
    )
    orphans = (
        ev.join(F.broadcast(cust), "user_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("fk_orphans"))
    )
    return base.crossJoin(orphans)


ORACLE_DQ_AUDIT = """
WITH base AS (
  SELECT COUNT(*) AS n_rows,
         -- BIGINT casts: DuckDB SUM(int) is HUGEINT (int128), which lands
         -- as float64 in pandas and breaks the bit-level value hash even
         -- though the values equal Spark's bigint counters.
         CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_value,
         CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_props,
         CAST(SUM(CASE WHEN event_type NOT IN
             ('click','view','purchase','signup','error')
             THEN 1 ELSE 0 END) AS BIGINT) AS bad_enum
  FROM events
), orphans AS (
  SELECT COUNT(*) AS fk_orphans FROM events e
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
)
SELECT * FROM base, orphans
"""


# --- DQ: per-column table profile -----------------------------------------
# One row per events column: null count + exact distinct count, plus the
# table row count. Single input scan; the multi-distinct aggregate is
# Spark's Expand plan (one pass, rows duplicated per distinct spec) — at
# 100 TB swap count_distinct for approx_count_distinct and the plan
# collapses to one partial-aggregated pass. stack() unpivots the 1-row
# aggregate into the per-column report shape.
_PROFILE_COLS = ("event_id", "user_id", "event_type", "value", "props")


def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}")
            for c in _PROFILE_COLS
        ],
        *[F.count_distinct(F.col(c)).alias(f"nd_{c}") for c in _PROFILE_COLS],
    )
    stack_args = ", ".join(
        f"'{c}', null_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return agg.select(
        F.col("n_rows"),
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args})"
            " AS (col_name, n_null, n_distinct)"
        ),
    )


ORACLE_DQ_PROFILE = f"""
WITH a AS (
  SELECT COUNT(*) AS n_rows,
         {', '.join(
             f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
             f" AS null_{c}, COUNT(DISTINCT {c}) AS nd_{c}"
             for c in _PROFILE_COLS
         )}
  FROM events
)
{' UNION ALL '.join(
    f"SELECT n_rows, '{c}' AS col_name, null_{c} AS n_null,"
    f" nd_{c} AS n_distinct FROM a"
    for c in _PROFILE_COLS
)}
"""


# --- DQ: referential integrity across relations ---------------------------
# Orphan counts for every FK edge in the fixture schema, one row per
# relation. Each check is an anti-join aggregated to a count: the shuffle
# carries only the FK column (or a broadcast of the parent key set when
# the parent is dim-sized).
def q_dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    def orphan_count(child, fk, parent, pk, label):
        return (
            child.select(F.col(fk).alias("k"))
            .join(
                F.broadcast(parent.select(F.col(pk).alias("k")).distinct()),
                "k",
                "left_anti",
            )
            .agg(
                F.lit(label).alias("relation"),
                F.count(F.lit(1)).alias("n_orphans"),
            )
        )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    checks = [
        orphan_count(li, "l_orderkey", orders, "o_orderkey", "lineitem->orders"),
        orphan_count(orders, "o_custkey", cust, "c_custkey", "orders->customer"),
        orphan_count(cust, "c_nationkey", nation, "n_nationkey", "customer->nation"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


ORACLE_DQ_REFERENTIAL = """
SELECT 'lineitem->orders' AS relation, COUNT(*) AS n_orphans
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders->customer', COUNT(*)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer->nation', COUNT(*)
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
"""


# --- DQ: per-entity z-score outliers ---------------------------------------
# Anomaly surfacing for the engagement stream: events whose value sits
# > 3 sigma from their user's own distribution. The integer-twin
# discipline makes it hash-checkable: values are half-up quantized to
# centi-units ONCE (floor(v*100 + 0.5) — exact double ops), the moments
# are exact int64 sums, and the remaining mean/variance/sqrt arithmetic
# is the identical IEEE expression in both engines. One user-key shuffle
# for the moments (map-side combined), broadcast back over the scan.

DQ_Z_THRESHOLD = 3.0
DQ_Z_MIN_N = 20


def quantize_events(ev: DataFrame) -> DataFrame:
    """(event_id, user_id, value, v100): half-up centi-quantization — the
    shared first step of the batch query and the incremental moments sink
    (streaming/sinks.py), so both score against identical integers."""
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v100"),
    )


def event_moments(q: DataFrame) -> DataFrame:
    """Exact per-user integer moments (n, s, ss) of v100. Associative —
    partial moment tables from micro-batches/shards sum cell-wise to the
    one-pass result (the mergeable-sink property)."""
    return q.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v100").alias("s"),
        F.sum(F.expr("v100 * v100")).alias("ss"),
    )


def outliers_vs_moments(q: DataFrame, m: DataFrame) -> DataFrame:
    """Score quantized events against a (user_id, n, s, ss) moment table:
    |z| > DQ_Z_THRESHOLD where the user has >= DQ_Z_MIN_N events and
    positive variance. The moment table may come from the inline
    aggregation (batch) or from merged micro-batch partials (streaming) —
    identical integers either way."""
    from ..functions.exact import fround

    m = m.where(F.col("n") >= DQ_Z_MIN_N)
    z = F.expr(
        "(v100 - CAST(s AS DOUBLE) / n) / "
        "sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n)"
    )
    return (
        q.join(m, "user_id")
        .where(
            F.expr(
                "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n > 0"
            )
        )
        .withColumn("zscore", fround(z, 6))
        .where(F.abs(F.col("zscore")) > DQ_Z_THRESHOLD)
        .select("event_id", "user_id", "value", "zscore")
    )


def q_dq_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = quantize_events(load_table(spark, sf_dir, "events"))
    return outliers_vs_moments(q, event_moments(q))


def _oracle_dq_outliers() -> str:
    from ..functions.exact import oracle_fround

    z = oracle_fround(
        "(q.v100 - CAST(m.s AS DOUBLE) / m.n) / "
        "sqrt((CAST(m.ss AS DOUBLE) - CAST(m.s AS DOUBLE) * m.s / m.n) / m.n)",
        6,
    )
    return f"""
WITH q AS (
  SELECT event_id, user_id, value,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v100
  FROM events
), m AS (
  SELECT user_id, COUNT(*) AS n,
         CAST(SUM(v100) AS BIGINT) AS s,
         CAST(SUM(v100 * v100) AS BIGINT) AS ss
  FROM q GROUP BY user_id
  HAVING COUNT(*) >= {DQ_Z_MIN_N}
)
SELECT q.event_id, q.user_id, q.value, {z} AS zscore
FROM q JOIN m USING (user_id)
WHERE (CAST(m.ss AS DOUBLE) - CAST(m.s AS DOUBLE) * m.s / m.n) / m.n > 0
  AND abs({z}) > {DQ_Z_THRESHOLD}
"""


QUERIES = {
    "dq_audit": (q_dq_audit, ORACLE_DQ_AUDIT),
    "dq_profile": (q_dq_profile, ORACLE_DQ_PROFILE),
    "dq_referential": (q_dq_referential, ORACLE_DQ_REFERENTIAL),
    "dq_outliers": (q_dq_outliers, _oracle_dq_outliers()),
    "point_lookup_string_hash": (q_point_lookup, ORACLE_POINT_LOOKUP),
    "join_semi_anti": (q_join_semi_anti, ORACLE_JOIN_SEMI_ANTI),
    "join_full_outer": (q_join_full_outer, ORACLE_JOIN_FULL_OUTER),
    "enum_validation_filter": (q_enum_validation, ORACLE_ENUM_VALIDATION),
    "topk_recent": (q_topk_recent, ORACLE_TOPK_RECENT),
    "ordered_drain": (q_ordered_drain, ORACLE_ORDERED_DRAIN),
    "json_decode": (q_json_decode, ORACLE_JSON_DECODE),
    "json_variant": (q_json_variant, ORACLE_JSON_VARIANT),
    "kv_projection": (q_kv_projection, ORACLE_KV_PROJECTION),
    "uuid_repair": (q_uuid_repair, ORACLE_UUID_REPAIR),
    "kafka_producer_projection": (q_kafka_producer_projection, ORACLE_KAFKA_PRODUCER),
    "json_as_map": (q_json_as_map, ORACLE_JSON_AS_MAP),
    "agg_percentiles": (q_percentiles, ORACLE_PERCENTILES),
    "set_ops": (q_set_ops, ORACLE_SET_OPS),
}
