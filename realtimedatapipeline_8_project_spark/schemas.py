"""Canonical schema registry (SURVEY.md §1.3).

The reference declares the same logical event schema four times (Postgres
DDL setup.sql:12-21, Kafka JSON via to_jsonb setup.sql:43, Spark StructType
stream-processor.py:217-225, Cassandra DDL cassandra-setup.cql:12-23). Here
each dataset has exactly one canonical StructType; ``from_json`` decoding is
strict (null-on-mismatch), matching the reference's behavior.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Reference-shaped engagement event (stream payload), mirroring the Spark
# decode schema at stream-processor.py:217-225 (id/content_id/user_id/
# event_type/event_ts/duration_ms/device).
ENGAGEMENT_EVENT = StructType(
    [
        StructField("id", LongType(), False),
        StructField("content_id", StringType(), True),
        StructField("user_id", StringType(), True),
        StructField("event_type", StringType(), True),
        StructField("event_ts", StringType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("device", StringType(), True),
    ]
)

# Reference-shaped content dimension (setup.sql:2-9; consumed columns
# stream-processor.py:264).
CONTENT = StructType(
    [
        StructField("id", StringType(), False),
        StructField("slug", StringType(), True),
        StructField("title", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("length_seconds", IntegerType(), True),
        StructField("publish_ts", TimestampType(), True),
    ]
)

# Enriched output contract (cassandra-setup.cql:12-23; produced columns
# stream-processor.py:48-51,270-280).
ENGAGEMENT_METRICS = StructType(
    [
        StructField("event_id", StringType(), False),
        StructField("content_id", StringType(), True),
        StructField("user_id", StringType(), True),
        StructField("event_time", TimestampType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("content_type", StringType(), True),
        StructField("length_seconds", IntegerType(), True),
        StructField("engagement_seconds", DoubleType(), True),
        StructField("engagement_pct", DoubleType(), True),
    ]
)

# Driver-generated fixture tables (/root/testdata/sf*/, TESTDATA.md).
EVENTS = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)

#: Enum domains enforced by CHECK constraints in the reference
#: (setup.sql:6,16); our engine validates with isin() filters (SURVEY F4).
CONTENT_TYPES = ("podcast", "newsletter", "video")
REFERENCE_EVENT_TYPES = ("play", "pause", "finish", "click")
#: Fixture events use a different enum domain (observed in testdata).
FIXTURE_EVENT_TYPES = ("signup", "click", "error", "view", "purchase")
