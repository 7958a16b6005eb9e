"""Golden unit tests for the reference worked example (README.md:176-188)
and its NULL-semantics edge cases (SURVEY §5.2): play 30000ms on an 1800s
podcast -> pct 0.02; pause with NULL duration -> NULL; finish 1800000ms ->
1.0; click with NULL duration on a 5400s video -> NULL; unmatched
content_id -> left-join NULLs; newsletter -> NULL length_seconds."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators.reference_pipeline import (
    enrich_reference,
)

PODCAST = "11111111-1111-1111-1111-111111111111"
VIDEO = "22222222-2222-2222-2222-222222222222"
NEWSLETTER = "33333333-3333-3333-3333-333333333333"
USER = "99999999-9999-9999-9999-999999999999"


def _fixture(spark):
    content = spark.createDataFrame(
        [
            (PODCAST, "ep-1", "Episode 1", "podcast", 1800, "2024-01-01T00:00:00"),
            (VIDEO, "v-1", "Video 1", "video", 5400, "2024-01-01T00:00:00"),
            (NEWSLETTER, "n-1", "News 1", "newsletter", None, "2024-01-01T00:00:00"),
        ],
        "id string, slug string, title string, content_type string, "
        "length_seconds int, publish_ts string",
    )
    events = spark.createDataFrame(
        [
            (1, PODCAST, USER, "play", "2024-01-02T10:00:00.000", 30000, "ios"),
            (2, PODCAST, USER, "pause", "2024-01-02T10:05:00.000", None, "ios"),
            (3, PODCAST, USER, "finish", "2024-01-02T11:00:00.000", 1800000, "ios"),
            (4, VIDEO, USER, "click", "2024-01-02T12:00:00.000", None, "web"),
            (5, NEWSLETTER, USER, "play", "2024-01-02T13:00:00.000", 60000, "web"),
            (6, "not-a-real-content-id", USER, "play", "2024-01-02T14:00:00.000", 5000, "web"),
        ],
        "id long, content_id string, user_id string, event_type string, "
        "event_ts string, duration_ms long, device string",
    )
    return events, content


def test_worked_example_golden(spark):
    events, content = _fixture(spark)
    out = enrich_reference(events, content)
    rows = {r.engagement_seconds: r for r in out.collect()}
    by_dur = {r.duration_ms: r for r in out.collect()}

    play = by_dur[30000]
    assert play.engagement_seconds == 30.0
    assert play.engagement_pct == 0.02  # README.md:178 worked value
    assert play.content_type == "podcast"

    pause = [r for r in out.collect() if r.duration_ms is None and r.content_type == "podcast"][0]
    assert pause.engagement_seconds is None
    assert pause.engagement_pct is None

    finish = by_dur[1800000]
    assert finish.engagement_pct == 1.0

    click = [r for r in out.collect() if r.duration_ms is None and r.content_type == "video"][0]
    assert click.engagement_pct is None

    news = by_dur[60000]
    assert news.content_type == "newsletter"
    assert news.length_seconds is None
    assert news.engagement_seconds == 60.0
    assert news.engagement_pct is None  # NULL length => NULL pct

    miss = by_dur[5000]
    assert miss.content_type is None  # left-join miss
    assert miss.length_seconds is None
    assert miss.engagement_pct is None
    assert miss.engagement_seconds == 5.0


def test_uuid_passthrough_and_repair(spark):
    events, content = _fixture(spark)
    out = enrich_reference(events, content).collect()
    # valid UUIDs pass through lowercased
    assert all(r.user_id == USER for r in out)
    # malformed content id repaired to a deterministic uuid5-style value
    miss = [r for r in out if r.engagement_seconds == 5.0][0]
    parsed = uuid.UUID(miss.content_id)
    assert parsed.version == 5
    assert str(parsed) == miss.content_id
    # repair is deterministic across runs
    out2 = enrich_reference(events, content).collect()
    miss2 = [r for r in out2 if r.engagement_seconds == 5.0][0]
    assert miss2.content_id == miss.content_id


def test_all_event_ids_become_uuids(spark):
    events, content = _fixture(spark)
    out = enrich_reference(events, content).collect()
    for r in out:
        u = uuid.UUID(r.event_id)  # raises if malformed
        assert u.version == 5
