"""The outbox-poll Python DataSource (sources/outbox_stream.py): ordered
drain in rate-limited micro-batches, checkpoint resume after new arrivals
(the mark-as-sent analog), deterministic replay, and the batch reader."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.sources.outbox_stream import (
    make_outbox_source,
)
from realtimedatapipeline_8_project_spark.sources.tables import load_table


def _write_outbox(path, ids, fname="b0.jsonl"):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, fname), "w") as fh:
        for i in ids:
            fh.write(
                json.dumps(
                    {
                        "id": i,
                        "topic": "engagement_events",
                        "key": str(i),
                        "payload": json.dumps({"event_id": i, "v": i * 10}),
                    }
                )
                + "\n"
            )


@pytest.fixture()
def outbox_spark(spark):
    # registration is idempotent per session; re-register defensively so
    # test ordering never matters
    spark.dataSource.register(make_outbox_source())
    return spark


def test_outbox_stream_drains_in_rate_limited_ordered_batches(
    outbox_spark, tmp_path
):
    spark = outbox_spark
    src = str(tmp_path / "outbox")
    _write_outbox(src, range(25))
    out = str(tmp_path / "out")
    seen: list[tuple[int, list[int]]] = []

    def sink(df, bid):
        ids = [r.id for r in df.select("id").collect()]
        df.write.mode("append").parquet(out)
        # record AFTER the write: the poll below keys off `seen`, so the
        # final batch's parquet must be on disk before the stop races it
        seen.append((bid, ids))

    # availableNow drains ONE prefetched batch for a simple stream
    # reader, so the rate-limit (multi-batch) path needs a continuous
    # trigger: poll until the rate-limited batches have drained the queue
    import time

    q = (
        spark.readStream.format("outbox")
        .option("path", src)
        .option("maxRowsPerTrigger", "10")
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .foreachBatch(sink)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while sum(len(ids) for _, ids in seen) < 25:
            assert time.time() < deadline, f"drained only {seen}"
            time.sleep(0.3)
    finally:
        q.stop()
    batches = [ids for _, ids in seen if ids]
    # rate limit honored, ids contiguous and ordered across batches
    assert all(len(b) <= 10 for b in batches)
    assert [i for b in batches for i in b] == list(range(25))
    got = spark.read.parquet(out)
    assert got.count() == 25
    # the payload column round-trips
    assert (
        got.where(F.get_json_object("payload", "$.v").cast("long") == 40)
        .select("id")
        .collect()[0]
        .id
        == 4
    )


def test_outbox_stream_resumes_after_new_arrivals(outbox_spark, tmp_path):
    """K6 semantics: the committed offset is the mark-as-sent watermark —
    a second run with the same checkpoint serves only ids beyond it."""
    spark = outbox_spark
    src = str(tmp_path / "outbox")
    _write_outbox(src, range(10))
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")

    def run():
        (
            spark.readStream.format("outbox")
            .option("path", src)
            .load()
            .writeStream.outputMode("append")
            .option("checkpointLocation", chk)
            .foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run()
    assert {r.id for r in spark.read.parquet(out).collect()} == set(range(10))
    _write_outbox(src, range(10, 17), fname="b1.jsonl")
    run()
    rows = spark.read.parquet(out).collect()
    ids = sorted(r.id for r in rows)
    assert ids == list(range(17))  # no re-delivery of committed ids


def _reader(src, **options):
    cls = make_outbox_source()

    class _Opts(dict):
        pass

    return cls(_Opts(path=src, **options)).simpleStreamReader(None)


def test_outbox_replay_between_offsets_is_deterministic(tmp_path):
    src = str(tmp_path / "outbox")
    _write_outbox(src, range(30))
    reader = _reader(src)
    start = reader.initialOffset()
    assert start == {"files": {}}
    it, off = reader.read(start)
    first = list(it)
    assert [t[0] for t in first] == list(range(30))
    # the committed offset is the file's byte length (whole log consumed)
    # plus the head fingerprint guarding against name recreation
    import zlib

    fpath = os.path.join(src, "b0.jsonl")
    with open(fpath, "rb") as fh:
        head = fh.read(4096)
    assert off == {
        "files": {"b0.jsonl": os.path.getsize(fpath)},
        "sigs": {
            "b0.jsonl": [
                min(4096, os.path.getsize(fpath)),
                zlib.crc32(head[: min(4096, os.path.getsize(fpath))])
                & 0xFFFFFFFF,
            ]
        },
    }
    replay = list(reader.readBetweenOffsets(start, off))
    assert replay == first
    # empty range and no-new-data behave
    assert list(reader.readBetweenOffsets(off, off)) == []
    it2, off2 = reader.read(off)
    assert list(it2) == [] and off2 == off
    # a legacy round-6 watermark offset fails loudly, never silently skips
    with pytest.raises(ValueError, match="last_id"):
        reader.read({"last_id": 4})


def test_outbox_poll_is_o_pending_drained_files_never_reopened(
    tmp_path, monkeypatch
):
    """VERDICT r6 item 3: poll cost tracks the PENDING backlog. After a
    file is fully drained, subsequent polls stat it but never open it;
    only files with appended bytes are read, and only their new bytes."""
    import builtins

    src = str(tmp_path / "outbox")
    _write_outbox(src, range(10), fname="a0.jsonl")
    _write_outbox(src, range(10, 20), fname="a1.jsonl")
    reader = _reader(src)
    it, off = reader.read(reader.initialOffset())
    assert [t[0] for t in it] == list(range(20))

    opened: list[str] = []
    real_open = builtins.open

    def counting_open(file, *a, **kw):
        opened.append(os.path.basename(str(file)))
        return real_open(file, *a, **kw)

    monkeypatch.setattr(builtins, "open", counting_open)
    # fully drained outbox: zero file opens on an idle poll
    it2, off2 = reader.read(off)
    assert list(it2) == [] and off2 == off and opened == []
    # append to ONE file: only that file is opened, and the rows served
    # are exactly the appended ones
    with real_open(os.path.join(src, "a0.jsonl"), "a") as fh:
        fh.write('{"id": 99, "topic": "t", "key": "99", "payload": "{}"}\n')
    it3, off3 = reader.read(off2)
    assert [t[0] for t in it3] == [99]
    assert opened == ["a0.jsonl"]
    assert off3["files"]["a1.jsonl"] == off2["files"]["a1.jsonl"]


def test_outbox_out_of_order_id_is_still_delivered(tmp_path):
    """ADVICE r6 (medium): a row committed late with an id BELOW already
    delivered ids must not be skipped. Offsets are log positions, not id
    predicates, so the late row is simply the next pending log entry —
    the reference relay's WHERE status='pending' re-poll behavior
    (ingestion-layer/utils/utils.py:33-45)."""
    src = str(tmp_path / "outbox")
    _write_outbox(src, [10, 11, 12])
    reader = _reader(src)
    it, off = reader.read(reader.initialOffset())
    assert [t[0] for t in it] == [10, 11, 12]
    # the classic out-of-order outbox commit: id 5 becomes visible AFTER
    # ids 10..12 were drained (appended by a straggler transaction)
    with open(os.path.join(src, "b0.jsonl"), "a") as fh:
        fh.write('{"id": 5, "topic": "t", "key": "5", "payload": "{}"}\n')
    it2, off2 = reader.read(off)
    assert [t[0] for t in it2] == [5]  # delivered, not silently dropped
    # and replay of that committed span re-serves it deterministically
    assert [t[0] for t in reader.readBetweenOffsets(off, off2)] == [5]


def test_outbox_batch_reader(outbox_spark, tmp_path):
    spark = outbox_spark
    src = str(tmp_path / "outbox")
    _write_outbox(src, range(12))
    df = spark.read.format("outbox").option("path", src).load()
    assert df.count() == 12
    assert [f.name for f in df.schema] == ["id", "topic", "key", "payload"]
    assert df.agg(F.min("id"), F.max("id")).collect()[0][:] == (0, 11)


def _write_event_outbox(spark, sf_dir, src, fname, lo, hi):
    """Events fixture rows [lo, hi) serialized as outbox rows whose payload
    is the Kafka-value JSON (the to_jsonb(NEW) trigger shape)."""
    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.where((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        .select(
            F.col("event_id").alias("id"),
            F.to_json(
                F.struct(
                    "event_id",
                    F.date_format(
                        "ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
                    ).alias("ts"),
                    "user_id",
                    "event_type",
                    "value",
                    "props",
                )
            ).alias("payload"),
        )
        .collect()
    )
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, fname), "w") as fh:
        for r in rows:
            fh.write(
                json.dumps(
                    {
                        "id": r.id,
                        "topic": "engagement_events",
                        "key": str(r.id),
                        "payload": r.payload,
                    }
                )
                + "\n"
            )
    return len(rows)


def test_outbox_to_pipeline_end_to_end(outbox_spark, sf_small, tmp_path):
    """VERDICT r6 item 5 — the reference's FULL E1 dataflow with zero
    analogized stages: outbox source -> decode_events -> broadcast enrich
    -> derive -> foreachBatch fan-out (history + latest), run twice
    against one checkpoint to prove the committed source offset is the
    mark-as-sent boundary, then checked for parity with the equivalent
    batch computation."""
    from realtimedatapipeline_8_project_spark.operators.enrich import (
        enrich_events,
        load_dim,
    )
    from realtimedatapipeline_8_project_spark.streaming.pipeline import (
        derive,
        start_pipeline,
    )
    from realtimedatapipeline_8_project_spark.streaming.sinks import (
        read_latest,
    )

    spark = outbox_spark
    src = str(tmp_path / "outbox")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    dim = load_dim(spark, sf_small)

    def run():
        raw = (
            spark.readStream.format("outbox")
            .option("path", src)
            .option("maxRowsPerTrigger", "5000")
            .load()
        )
        start_pipeline(
            spark,
            raw.select(F.col("payload").alias("value")),
            dim,
            out,
            chk,
            trigger={"availableNow": True},
        ).awaitTermination()

    n1 = _write_event_outbox(spark, sf_small, src, "b0.jsonl", 0, 700)
    run()
    hist = spark.read.parquet(os.path.join(out, "history"))
    assert hist.count() == n1
    # second run, same checkpoint: only the newly appended outbox rows
    n2 = _write_event_outbox(spark, sf_small, src, "b1.jsonl", 700, 10**9)
    run()
    hist = spark.read.parquet(os.path.join(out, "history"))
    assert hist.count() == n1 + n2  # no re-delivery of committed rows

    ev = load_table(spark, sf_small, "events")
    batch = derive(enrich_events(ev, dim))
    cols = sorted(c for c in hist.columns if c != "batch_id")
    got = sorted(map(str, hist.select(*cols).collect()))
    want = sorted(map(str, batch.select(*cols).collect()))
    assert got == want
    # the keyed latest view is consistent with the batch key set
    latest = read_latest(spark, out)
    assert latest.count() == ev.select("event_id").distinct().count()


def test_outbox_drain_is_chunked_across_large_backlog(tmp_path):
    """The reader's per-poll I/O tracks CONSUMED bytes, not backlog: a
    pending tail larger than the 1 MiB read chunk drains correctly in
    rate-limited slices, offsets land on exact line boundaries, and a
    replay of each committed span is byte-identical."""
    src = str(tmp_path / "outbox")
    os.makedirs(src)
    pad = "x" * 500
    with open(os.path.join(src, "big.jsonl"), "w") as fh:
        for i in range(4000):  # ~2 MB > one read chunk
            fh.write(
                json.dumps(
                    {"id": i, "topic": "t", "key": str(i), "payload": pad}
                )
                + "\n"
            )
    reader = _reader(src, maxRowsPerTrigger="700")
    off = reader.initialOffset()
    seen: list[int] = []
    spans = []
    for _ in range(10):
        it, new_off = reader.read(off)
        rows = list(it)
        if not rows and new_off == off:
            break
        spans.append((off, new_off, [t[0] for t in rows]))
        seen.extend(t[0] for t in rows)
        off = new_off
    assert seen == list(range(4000))
    assert len(spans) == 6  # ceil(4000/700) rate-limited polls
    for start, end, ids in spans:
        assert [t[0] for t in reader.readBetweenOffsets(start, end)] == ids


def test_outbox_poll_survives_midpoll_file_rotation(tmp_path, monkeypatch):
    """A drained file rotated to the archive prefix between the
    directory listing and the stat/open must not kill the stream: the
    poll skips it (its offset is retained) and keeps serving the rest."""
    src = str(tmp_path / "outbox")
    _write_outbox(src, range(5), fname="a0.jsonl")
    _write_outbox(src, range(5, 9), fname="a1.jsonl")
    reader = _reader(src)
    real_listdir = os.listdir

    def racing_listdir(path):
        # report a file that an archiver removed right after the listing
        return [*real_listdir(path), "ghost.jsonl"]

    monkeypatch.setattr(os, "listdir", racing_listdir)
    it, off = reader.read(reader.initialOffset())
    assert [t[0] for t in it] == list(range(9))
    assert "ghost.jsonl" not in off["files"]


def test_outbox_random_interleavings_never_lose_or_duplicate(tmp_path):
    """Property: under ANY interleaving of appends (across files, with
    blank lines, partial trailing lines completed later, out-of-order
    ids) and rate-limited polls, the reader delivers every completed
    row exactly once, preserving each file's append order, and every
    committed span replays byte-identically. (GLOBAL order across files
    is poll-time file order — a file created later with an earlier
    name legally interleaves — so the order guarantee is per-file.)"""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ops = st.lists(
        st.one_of(
            st.tuples(
                st.just("append"),
                st.integers(0, 2),  # file index
                st.integers(0, 999),  # id (collisions/out-of-order fine)
                st.booleans(),  # leave the line incomplete (no newline)?
            ),
            st.tuples(st.just("blank"), st.integers(0, 2)),
            st.tuples(st.just("poll"), st.integers(1, 4)),  # limit
        ),
        min_size=1,
        max_size=40,
    )

    @settings(
        max_examples=60,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(ops=ops)
    def run(ops):
        import shutil
        import uuid

        src = str(tmp_path / f"ob-{uuid.uuid4().hex[:8]}")
        os.makedirs(src)
        try:
            reader = None
            off = None
            pending_tail = {0: False, 1: False, 2: False}
            delivered: list[tuple] = []
            spans: list[tuple[dict, dict, list[tuple]]] = []
            seq = 0  # unique payload per appended row

            def fname(i):
                return os.path.join(src, f"f{i}.jsonl")

            def complete_partial(fh, i):
                if pending_tail[i]:
                    fh.write("\n")
                    pending_tail[i] = False

            for op in ops:
                if op[0] == "append":
                    _, i, rid, incomplete = op
                    seq += 1
                    line = json.dumps(
                        {
                            "id": rid,
                            "topic": f"f{i}",
                            "key": str(rid),
                            "payload": f"p{seq}",
                        }
                    )
                    with open(fname(i), "a") as fh:
                        complete_partial(fh, i)
                        fh.write(line + ("" if incomplete else "\n"))
                    pending_tail[i] = incomplete
                elif op[0] == "blank":
                    _, i = op
                    with open(fname(i), "a") as fh:
                        complete_partial(fh, i)
                        fh.write("\n")
                else:
                    _, limit = op
                    if reader is None:
                        reader = _reader(src, maxRowsPerTrigger=str(limit))
                        off = reader.initialOffset()
                    reader._limit = limit
                    it, new_off = reader.read(off)
                    rows = list(it)
                    if rows:
                        spans.append((off, new_off, rows))
                    delivered.extend(rows)
                    off = new_off

            # drain fully with a final sequence of polls
            if reader is None:
                reader = _reader(src, maxRowsPerTrigger="3")
                off = reader.initialOffset()
            for _ in range(200):
                it, new_off = reader.read(off)
                rows = list(it)
                if not rows and new_off == off:
                    break
                if rows:
                    spans.append((off, new_off, rows))
                delivered.extend(rows)
                off = new_off

            # ground truth: every COMPLETED line per file, in file order
            visible: dict[str, list[str]] = {}
            all_payloads: list[str] = []
            for i in (0, 1, 2):
                p = fname(i)
                if not os.path.exists(p):
                    continue
                with open(p, "rb") as fh:
                    data = fh.read()
                upto = data.rfind(b"\n")
                if upto == -1:
                    continue
                for line in data[: upto + 1].split(b"\n"):
                    if line.strip():
                        r = json.loads(line)
                        visible.setdefault(r["topic"], []).append(r["payload"])
                        all_payloads.append(r["payload"])

            # exactly-once: the delivered multiset is exactly the
            # completed rows (unique payloads make this unambiguous)
            assert sorted(t[3] for t in delivered) == sorted(all_payloads)
            # per-file append order preserved
            for topic, plist in visible.items():
                got = [t[3] for t in delivered if t[1] == topic]
                assert got == plist
            # deterministic replay of every committed span
            for start, end, rows in spans:
                assert list(reader.readBetweenOffsets(start, end)) == rows
        finally:
            shutil.rmtree(src, ignore_errors=True)

    run()


def test_outbox_archive_drained_keeps_stream_working(tmp_path):
    """Retention utility: fully drained files move to the archive
    subdir (undrained ones never do), polls keep working with the
    archived files' offsets retained, and new arrivals still flow."""
    from realtimedatapipeline_8_project_spark.sources.outbox_stream import (
        archive_drained,
    )

    src = str(tmp_path / "outbox")
    _write_outbox(src, range(6), fname="a0.jsonl")
    _write_outbox(src, range(6, 10), fname="a1.jsonl")
    reader = _reader(src, maxRowsPerTrigger="6")
    it, off = reader.read(reader.initialOffset())
    assert [t[0] for t in it] == list(range(6))  # a0 drained, a1 pending
    moved = archive_drained(src, off)
    assert moved == ["a0.jsonl"]
    assert os.path.exists(os.path.join(src, "archive", "a0.jsonl"))
    assert os.path.exists(os.path.join(src, "a1.jsonl"))  # untouched
    it2, off2 = reader.read(off)
    assert [t[0] for t in it2] == list(range(6, 10))
    # a0's offset is retained (harmless) and the drain is complete
    assert off2["files"]["a0.jsonl"] == off["files"]["a0.jsonl"]
    _write_outbox(src, range(10, 12), fname="a2.jsonl")
    it3, _ = reader.read(off2)
    assert [t[0] for t in it3] == [10, 11]
    # legacy offsets rejected here too
    with pytest.raises(ValueError, match="last_id"):
        archive_drained(src, {"last_id": 3})


def test_outbox_torn_write_invisible_to_batch_and_stream(
    outbox_spark, tmp_path
):
    """Visibility contract (ADVICE r7): an unterminated trailing line is
    a torn write in progress — invisible to BOTH readers (the batch
    reader must not parse it, let alone crash on half a JSON object),
    and visible to both the instant its newline lands."""
    spark = outbox_spark
    src = str(tmp_path / "outbox")
    _write_outbox(src, range(4))
    fpath = os.path.join(src, "b0.jsonl")
    torn = json.dumps({"id": 4, "topic": "t", "key": "4", "payload": "{"})
    with open(fpath, "a") as fh:
        fh.write(torn[: len(torn) // 2])  # mid-append: invalid JSON, no \n
    batch_ids = [
        r.id
        for r in spark.read.format("outbox").option("path", src).load().collect()
    ]
    assert batch_ids == [0, 1, 2, 3]
    reader = _reader(src)
    it, off = reader.read(reader.initialOffset())
    assert [t[0] for t in it] == [0, 1, 2, 3]
    # stream offset stops at the last complete line — batch == stream
    with open(fpath, "a") as fh:
        fh.write(torn[len(torn) // 2 :] + "\n")  # newline lands: row exists
    it2, _ = reader.read(off)
    assert [t[0] for t in it2] == [4]
    batch_ids = [
        r.id
        for r in spark.read.format("outbox").option("path", src).load().collect()
    ]
    assert batch_ids == [0, 1, 2, 3, 4]


def test_outbox_archive_quiesce_window_skips_recent_files(tmp_path):
    """archive_drained(min_quiet_secs=...) must not move a file the
    producer touched within the window (the live-writer hazard from
    ADVICE r7); a file older than the window archives normally."""
    from realtimedatapipeline_8_project_spark.sources.outbox_stream import (
        archive_drained,
    )

    src = str(tmp_path / "outbox")
    _write_outbox(src, range(3), fname="a0.jsonl")
    _write_outbox(src, range(3, 5), fname="a1.jsonl")
    reader = _reader(src)
    _, off = reader.read(reader.initialOffset())
    # a0 quiesced long ago; a1 modified just now
    old = os.path.join(src, "a0.jsonl")
    os.utime(old, (os.path.getmtime(old) - 3600, os.path.getmtime(old) - 3600))
    moved = archive_drained(src, off, min_quiet_secs=600)
    assert moved == ["a0.jsonl"]
    assert os.path.exists(os.path.join(src, "a1.jsonl"))
    # once quiet, the remaining drained file archives too
    moved2 = archive_drained(src, off, min_quiet_secs=0)
    assert moved2 == ["a1.jsonl"]


def test_outbox_recreated_file_fails_loudly_not_garbage(tmp_path):
    """A drained file deleted and recreated under the same name with
    SAME-OR-LARGER size would silently serve another file's bytes under
    the committed offset (the shrink check can't see it) — the head
    fingerprint turns both poll and replay into loud failures before a
    byte is delivered (an inode would be cheaper, but filesystems
    recycle inode numbers on the spot). A pre-sigs (r7-format) offset
    carries no identity either, but a committed offset always sits on a
    line boundary of the file it was taken from — so a parse failure
    while resuming at one IS the identity violation, and must raise the
    same loud "recreated" ValueError, never a raw JSONDecodeError and
    never silently-served garbage (the module's "garbage bytes are
    never DELIVERED" contract)."""
    src = str(tmp_path / "outbox")
    _write_outbox(src, range(5))
    reader = _reader(src)
    it, off = reader.read(reader.initialOffset())
    assert len(list(it)) == 5
    # recreate with same name, same-or-larger size, different identity
    fpath = os.path.join(src, "b0.jsonl")
    os.remove(fpath)
    _write_outbox(src, range(100, 107))
    assert os.path.getsize(fpath) >= off["files"]["b0.jsonl"]
    with pytest.raises(ValueError, match="recreated"):
        reader.read(off)
    with pytest.raises(ValueError, match="recreated"):
        list(reader.readBetweenOffsets(reader.initialOffset(), off))
    # a pre-sigs offset resuming mid-line in the recreated file fails
    # loudly too — the committed position is not a line boundary here
    legacy = {"files": dict(off["files"])}
    with pytest.raises(ValueError, match="recreated"):
        reader.read(legacy)
    with pytest.raises(ValueError, match="recreated"):
        list(reader.readBetweenOffsets(reader.initialOffset(), legacy))


def test_outbox_legacy_offset_adopts_fingerprint_on_clean_file(tmp_path):
    """The happy migration path: a pre-sigs (r7-format) checkpoint
    against the ORIGINAL, untouched file keeps working — the pending
    tail is served, the new offset adopts the current file's head
    fingerprint, and from then on the identity check protects it."""
    src = str(tmp_path / "outbox")
    _write_outbox(src, range(5))
    reader = _reader(src)
    it, off = reader.read(reader.initialOffset())
    assert len(list(it)) == 5
    # producer appends more rows; simulate an r7 checkpoint (no sigs)
    with open(os.path.join(src, "b0.jsonl"), "a") as fh:
        for i in range(5, 9):
            fh.write(json.dumps({"id": i, "topic": "t", "key": str(i), "payload": "{}"}) + "\n")
    legacy = {"files": dict(off["files"])}
    it2, off2 = reader.read(legacy)
    assert [t[0] for t in it2] == [5, 6, 7, 8]
    assert "b0.jsonl" in off2.get("sigs", {})
    # the adopted fingerprint now guards the file: a recreation under
    # the same name fails loudly on the next consumption
    fpath = os.path.join(src, "b0.jsonl")
    os.remove(fpath)
    _write_outbox(src, range(100, 112))
    assert os.path.getsize(fpath) >= off2["files"]["b0.jsonl"]
    with pytest.raises(ValueError, match="recreated"):
        reader.read(off2)


def test_outbox_legacy_offset_post_checkpoint_garbage_is_not_recreation(
    tmp_path,
):
    """A pre-sigs offset on the ORIGINAL file whose producer later
    appended a malformed-but-complete line: only the FIRST line (the
    one starting AT the committed offset) carries the line-boundary
    identity argument — the post-checkpoint garbage must surface as the
    raw parse error, not a bogus 'recreated' diagnosis that sends the
    operator chasing a recreation that never happened."""
    src = str(tmp_path / "outbox")
    _write_outbox(src, range(5))
    reader = _reader(src)
    it, off = reader.read(reader.initialOffset())
    assert len(list(it)) == 5
    with open(os.path.join(src, "b0.jsonl"), "a") as fh:
        fh.write(json.dumps({"id": 5, "topic": "t", "key": "5", "payload": "{}"}) + "\n")
        fh.write("{not valid json\n")
    legacy = {"files": dict(off["files"])}
    with pytest.raises(json.JSONDecodeError):
        reader.read(legacy)
