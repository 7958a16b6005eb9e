"""Multimodal plumbing tests: schema, Arrow batch shape, deterministic
decode stub, frame sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators.multimodal import (
    DECODED,
    decode_media,
    frame_sample,
    synthesize_media,
)


def test_media_schema_and_payload_roundtrip(spark, sf_small):
    media = synthesize_media(spark, sf_small)
    row = media.orderBy("media_id").first()
    assert isinstance(row.payload, bytearray | bytes)
    assert row.byte_len == len(row.payload)
    assert len(row.sha256) == 64
    assert row.kind in ("image", "audio", "video")


def test_decode_widen_schema_and_determinism(spark, sf_small):
    media = synthesize_media(spark, sf_small).limit(50)
    d1 = decode_media(media)
    assert d1.schema == DECODED
    rows1 = sorted(map(str, d1.collect()))
    rows2 = sorted(map(str, decode_media(media).collect()))
    assert rows1 == rows2
    got = d1.collect()
    assert all(64 <= r.width <= 255 and 64 <= r.height <= 255 for r in got)
    assert all(1 <= r.n_frames <= 30 for r in got)


def test_decode_preserves_partitioning(spark, sf_small):
    media = synthesize_media(spark, sf_small).repartition(4)
    decoded = decode_media(media)
    assert decoded.rdd.getNumPartitions() == 4  # mapInPandas is narrow


def test_frame_sample_only_video_and_stride(spark, sf_small):
    media = decode_media(synthesize_media(spark, sf_small))
    frames = frame_sample(media, every_n=10)
    got = frames.collect()
    assert all(r.frame_idx % 10 == 0 for r in got)
    # every video with n_frames>=11 yields >=2 sampled frames
    vids = media.where((F.col("kind") == "video") & (F.col("n_frames") >= 11)).count()
    multi = (
        frames.groupBy("media_id").count().where(F.col("count") >= 2).count()
    )
    assert multi == vids


def test_media_resize_matches_sql_replay(spark, sf_oracle):
    """The resize stub (r13+ earmark): dims and digest from the Arrow
    mapInPandas pass must equal the DuckDB hex-arithmetic replay —
    value-checking the whole decode->resize plumbing chain."""
    from realtimedatapipeline_8_project_spark.operators.multimodal import (
        ORACLE_MEDIA_RESIZE,
        q_media_resize,
    )

    from .oracle_harness import compare, duck_connection

    con = duck_connection(sf_oracle)
    try:
        df = q_media_resize(spark, sf_oracle)
        assert df.count() > 0
        assert not compare(df, con, ORACLE_MEDIA_RESIZE, "media_resize")
    finally:
        con.close()


def test_media_resize_aspect_invariants(spark, sf_small):
    """Longest side lands exactly on RESIZE_TARGET, the other never
    exceeds it, and orientation is preserved."""
    from realtimedatapipeline_8_project_spark.operators.multimodal import (
        RESIZE_TARGET,
        q_media_resize,
    )

    for r in q_media_resize(spark, sf_small).collect():
        assert max(r.out_w, r.out_h) == RESIZE_TARGET
        assert min(r.out_w, r.out_h) <= RESIZE_TARGET
        assert (r.width >= r.height) == (r.out_w >= r.out_h)


def test_media_resize_empty_input(spark):
    from realtimedatapipeline_8_project_spark.operators.multimodal import (
        DECODED,
        resize_media,
    )

    empty = spark.createDataFrame([], DECODED)
    assert resize_media(empty).count() == 0
