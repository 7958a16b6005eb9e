"""Deterministic UUID normalization (SURVEY P14).

The reference repairs malformed UUIDs with a row-at-a-time Python UDF that
falls back to ``uuid.uuid4()`` (stream-processor.py:33-38, registered 3x at
:44-46) — non-deterministic and a per-row JVM<->Python boundary. Our engine
replaces it with a pure-JVM, whole-stage-codegen-friendly expression:

* already-valid UUID strings are lowercased and passed through;
* anything else maps to a *name-based* UUID derived from sha256 of the
  value (uuid5-style layout: version nibble 5, RFC variant bits), so repair
  is deterministic, oracle-checkable, and idempotent.

No Python UDF => no per-row serialization boundary at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UUID_RE = (
    r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
    r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)


def uuid_from_hash(col: Column | str) -> Column:
    """Deterministic uuid5-style identifier from an arbitrary string."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.sha2(c.cast("string"), 256)  # 64 lowercase hex chars
    # RFC-4122 variant nibble: (x & 0x3) | 0x8 => one of 8/9/a/b.
    variant_idx = (F.conv(F.substring(h, 17, 1), 16, 10).cast("int") % 4) + 1
    variant = F.element_at(
        F.array(F.lit("8"), F.lit("9"), F.lit("a"), F.lit("b")), variant_idx
    )
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("5"), F.substring(h, 14, 3)),
        F.concat(variant, F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


def uuid_normalize(col: Column | str) -> Column:
    """Valid UUID -> lowercase passthrough; NULL -> NULL; otherwise
    deterministic repair. (The NULL guard matters: concat_ws silently skips
    NULL fragments, which would turn NULL input into a malformed string.)"""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(c.rlike(UUID_RE), F.lower(c))
        .otherwise(uuid_from_hash(c))
    )


def oracle_uuid_from_hash(col_sql: str) -> str:
    """DuckDB SQL mirroring :func:`uuid_from_hash` bit-for-bit."""
    h = f"sha256(CAST({col_sql} AS VARCHAR))"
    hex_val = (
        f"CASE substr({h},17,1) "
        "WHEN '0' THEN 0 WHEN '1' THEN 1 WHEN '2' THEN 2 WHEN '3' THEN 3 "
        "WHEN '4' THEN 4 WHEN '5' THEN 5 WHEN '6' THEN 6 WHEN '7' THEN 7 "
        "WHEN '8' THEN 8 WHEN '9' THEN 9 WHEN 'a' THEN 10 WHEN 'b' THEN 11 "
        "WHEN 'c' THEN 12 WHEN 'd' THEN 13 WHEN 'e' THEN 14 ELSE 15 END"
    )
    variant = (
        f"(['8','9','a','b'])[(({hex_val}) % 4) + 1]"
    )
    return (
        f"concat(substr({h},1,8), '-', substr({h},9,4), '-', '5', substr({h},14,3), "
        f"'-', {variant}, substr({h},18,3), '-', substr({h},21,12))"
    )


def oracle_uuid_normalize(col_sql: str) -> str:
    """DuckDB SQL mirroring :func:`uuid_normalize`."""
    uuid_re = (
        "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        "-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
    )
    return (
        f"CASE WHEN {col_sql} IS NULL THEN NULL "
        f"WHEN regexp_matches(CAST({col_sql} AS VARCHAR), '{uuid_re}') "
        f"THEN lower(CAST({col_sql} AS VARCHAR)) "
        f"ELSE {oracle_uuid_from_hash(col_sql)} END"
    )
