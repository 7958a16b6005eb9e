"""Outbox-poll streaming source as a Spark 4 Python DataSource (S3 + T4
+ K6 made native instead of analogized).

The reference's ingestion relay (ingestion-layer/utils/utils.py:33-45,
107-134) polls a transactional outbox table: ordered batched reads of
pending rows (``ORDER BY id ... LIMIT n``), at-least-once delivery, and
a mark-as-sent commit (``:47-59``) so replays resume after the last
acknowledged id. This module re-expresses that contract as a first-class
Structured Streaming source:

* ordered drain   -> each micro-batch is the next contiguous slice of
                     the append log (filename-major, append-minor);
* ``LIMIT n``     -> ``maxRowsPerTrigger`` option (the reference's
                     batch-size / Kafka maxOffsetsPerTrigger analog, T4);
* mark-as-sent    -> the source offset — a per-file byte position map
                     ``{"files": {name: bytes_consumed}}`` — committed by
                     the Spark checkpoint: exactly-once on our side
                     without an UPDATE back into the source (K6 subsumed);
* at-least-once replay -> ``readBetweenOffsets`` re-reads the exact byte
  ranges of a committed offset span; append-only files make committed
  bytes immutable, so replay is deterministic.

Offsets are LOG POSITIONS, not id predicates (the Kafka partition-offset
model). Two properties fall out, both fixes owed from round 6:

* **O(pending) polls.** A fully drained file (size == consumed bytes) is
  skipped on a stat alone and never re-opened; each trigger reads only
  the bytes appended since the last commit, so poll cost tracks the
  pending backlog — like the reference's indexed ``LIMIT n`` poll — not
  the outbox's lifetime history.
* **No out-of-order-id skips.** A row that becomes visible with an id
  BELOW already-delivered ids (the classic transactional-outbox
  out-of-order commit) is still appended at some log position beyond the
  consumed offset, so it is delivered like any other pending row —
  matching the reference relay, whose ``WHERE status='pending'`` re-poll
  serves such rows regardless of id. The only producer contract is the
  outbox trigger discipline itself: files are append-only (committed
  bytes are never rewritten or truncated; a shrink fails the poll
  loudly). Delivery order is log order; it equals id order exactly when
  the producer appends in id order (the common single-writer case).

Byte offsets identify positions in a FILE IDENTITY, not a path — a file
deleted (e.g. archived) and recreated under the same name would silently
serve garbage slices whenever the new file is at least as large as the
committed offset (a shrink is caught by the size check, a same-or-larger
recreation is not). Offsets therefore also carry a head fingerprint per
file (``{"sigs": {name: [plen, crc32]}}`` over the first committed
bytes, recorded at first consumption — committed bytes are immutable
under the append-only contract, so the fingerprint is stable for the
file's lifetime; an inode would be cheaper but inode numbers are
recycled on the spot by common filesystems). Every open-to-read — poll
drain, committed-range replay, batch read — verifies the fingerprint
first and fails loudly on mismatch, so garbage bytes are never
DELIVERED. Idle polls stay stat-only (the O(pending) property): an
equal-size recreation of a fully drained file is therefore detected at
the next append or replay, before anything is served from it. Offsets
from the previous format (no ``sigs``) are accepted; fingerprints are
adopted on the next consumption. A pre-sigs offset carries no identity
to check, so a recreation is only detectable indirectly: committed
offsets always sit on line boundaries of the file they were taken
from, so a parse failure while resuming at one is the identity
violation itself and raises the same loud "recreated" ValueError —
never a raw JSONDecodeError, and never silently-served garbage.

**Visibility contract: a row exists once its newline is written.** Both
readers share the torn-write rule — an unterminated trailing line is a
write in progress and is invisible (the stream reader leaves it for the
next poll; the batch reader stops at the last newline) — so batch and
stream never disagree about the same file, and neither can crash on a
line caught mid-append.

The outbox itself is a directory of JSON-lines files (the test stand-in
for the Postgres table; rows carry ``id, topic, key, payload``). The
SimpleDataSourceStreamReader variant reads on the DRIVER — faithful to
the reference, whose relay is a single poller process, and appropriate
for an outbox (a queue drained in log order is inherently sequential;
the heavy lifting happens downstream, distributed). A long-lived outbox
should rotate drained files into an archive prefix so the per-trigger
directory stat stays small; offsets for files that disappear are simply
retained (re-polls skip unlisted names), so retention of drained files
is safe. The class bodies live inside a factory so they pickle by value
(cloudpickle) — executors and a vanilla driver session never need this
package importable (the UDTF/pandas-UDF discipline from
operators/udtf_ops.py).
"""

from __future__ import annotations

OUTBOX_SCHEMA = "id bigint, topic string, key string, payload string"

_LEGACY_MSG = (
    "outbox offset {'last_id': ...} is the retired round-6 format; "
    "offsets are now per-file byte positions {'files': {...}} — start "
    "from a fresh checkpoint (the old watermark cannot express which "
    "log bytes were consumed)"
)


def make_outbox_source():
    """Return the DataSource class (register with
    ``spark.dataSource.register(make_outbox_source())``; then
    ``spark.readStream.format("outbox").option("path", dir)``).

    Options: ``path`` (required) — directory of ``*.jsonl`` files;
    ``maxRowsPerTrigger`` (default 1000) — T4 rate limit per batch."""
    import json
    import os

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        SimpleDataSourceStreamReader,
    )

    def _list_files(path: str) -> list[str]:
        return sorted(n for n in os.listdir(path) if n.endswith(".jsonl"))

    def _parse(line: bytes) -> tuple:
        r = json.loads(line)
        return (int(r["id"]), r.get("topic"), r.get("key"), r.get("payload"))

    _CHUNK = 1 << 20  # 1 MiB
    _SIG_LEN = 4096  # head-fingerprint cap (committed bytes only)

    def _recreated_on_legacy(name: str, start_byte: int, exc) -> ValueError:
        """A pre-sigs (round-7 format) offset carries no identity to
        verify, so a recreated file is only detectable when the drain
        lands mid-line in the new file and parsing fails. Under the
        append-only contract a committed byte position always sits on a
        line boundary of the ORIGINAL file, so a parse failure at that
        position means the bytes belong to another file — the identity
        violation itself, surfaced loudly per the "garbage bytes are
        never DELIVERED" contract rather than escaping as a raw
        JSONDecodeError."""
        return ValueError(
            f"outbox file {name} appears recreated under a committed "
            f"name: a pre-sigs offset resumed at byte {start_byte} but "
            "the bytes there do not parse as an outbox line — committed "
            "offsets always sit on line boundaries of the file they were "
            "taken from, so these bytes belong to a different file. "
            "Start from a fresh checkpoint, or restore the original file "
            f"(cause: {exc})"
        )

    def _verify_sig(fh, name: str, sig) -> None:
        """Fail loudly if the open file's head no longer matches the
        committed fingerprint: the name was recreated (deleted/archived
        and rewritten), so its committed byte positions describe ANOTHER
        file's log and reading would deliver garbage slices. ``sig`` is
        ``[plen, crc32]`` or None (pre-sigs offset / first contact —
        identity adopted at first consumption). Leaves ``fh`` at an
        unspecified position."""
        import zlib

        if sig is None:
            return
        plen, crc = int(sig[0]), int(sig[1])
        fh.seek(0)
        if (zlib.crc32(fh.read(plen)) & 0xFFFFFFFF) != crc:
            raise ValueError(
                f"outbox file {name} was recreated under a committed "
                "name (head fingerprint mismatch): its committed byte "
                "offsets belong to the previous file — archive only "
                "closed/rotated files and never reuse their names "
                "(see archive_drained)"
            )

    def _make_sig(fh, end_byte: int):
        """Fingerprint of the first min(_SIG_LEN, end_byte) bytes —
        committed (hence immutable) once the offset carrying it is."""
        import zlib

        plen = min(_SIG_LEN, end_byte)
        fh.seek(0)
        return [plen, zlib.crc32(fh.read(plen)) & 0xFFFFFFFF]

    def _drain_file(fpath: str, start_byte: int, max_rows: int, sig=None):
        """Parse up to ``max_rows`` complete lines from the append-only
        file starting at ``start_byte``; returns (rows, end_byte,
        sig_out). An incomplete trailing line (no newline yet) is left
        for the next poll; blank lines advance the offset without
        producing rows. Reads in bounded chunks and stops once
        ``max_rows`` lines are consumed, so a poll's I/O and memory
        track the CONSUMED bytes — a multi-GB pending backlog drained
        1000 rows at a time never re-reads (or buffers) the whole tail
        per trigger. The head fingerprint is verified (or, when absent,
        adopted) on the same open handle."""
        size = os.path.getsize(fpath)
        if size < start_byte:
            raise ValueError(
                f"outbox file {fpath} shrank below the committed offset "
                f"({size} < {start_byte}): append-only contract violated "
                "(classic cause: the file was archived while its producer "
                "was live and then recreated by path — archive only "
                "closed/rotated files; see archive_drained)"
            )
        if size == start_byte:
            return [], start_byte, sig
        rows: list[tuple] = []
        end = start_byte
        legacy_resume = sig is None and start_byte > 0
        with open(fpath, "rb") as fh:
            _verify_sig(fh, os.path.basename(fpath), sig)
            fh.seek(start_byte)
            remaining = size - start_byte
            buf = b""
            pos = 0
            while len(rows) < max_rows:
                nl = buf.find(b"\n", pos)
                if nl == -1:
                    if remaining <= 0:
                        break  # incomplete trailing line: next poll
                    chunk = fh.read(min(_CHUNK, remaining))
                    if not chunk:
                        # the size check passed at entry, yet EOF
                        # arrived early: the file shrank DURING the
                        # drain (append-only violated mid-poll). Without
                        # this guard the loop spins forever on empty
                        # reads — fail loudly like the entry check does.
                        raise ValueError(
                            f"outbox file {fpath} shrank while being "
                            f"drained (EOF {size - remaining} bytes "
                            f"before the observed size {size}): "
                            "append-only contract violated mid-poll"
                        )
                    remaining -= len(chunk)
                    buf = buf[pos:] + chunk
                    pos = 0
                    continue
                line = buf[pos:nl]
                if line.strip():
                    try:
                        rows.append(_parse(line))
                    except (ValueError, KeyError, TypeError) as exc:
                        # only the FIRST line — the one starting AT the
                        # committed offset — carries the line-boundary
                        # identity argument; a later line is a
                        # post-checkpoint append, and its parse failure
                        # is producer garbage, not a recreation
                        if legacy_resume and end == start_byte:
                            raise _recreated_on_legacy(
                                os.path.basename(fpath), start_byte, exc
                            ) from exc
                        raise
                end += nl + 1 - pos
                pos = nl + 1
            if sig is None and end > start_byte:
                sig = _make_sig(fh, end)
        return rows, end, sig

    def _complete_size(fpath: str) -> int:
        """Byte count of the newline-terminated prefix — the only bytes
        the visibility contract admits. Scans backwards in bounded
        chunks, so the cost is the torn tail, not the file."""
        size = os.path.getsize(fpath)
        with open(fpath, "rb") as fh:
            pos = size
            while pos > 0:
                step = min(_CHUNK, pos)
                fh.seek(pos - step)
                nl = fh.read(step).rfind(b"\n")
                if nl != -1:
                    return pos - step + nl + 1
                pos -= step
        return 0

    def _read_slice(
        fpath: str,
        start_byte: int,
        end_byte: int,
        sig=None,
        committed_range: bool = True,
    ) -> list[tuple]:
        """Rows in the byte range [start, end). For a COMMITTED range
        (``committed_range``, the replay path) the bytes are immutable in
        an append-only file, hence a deterministic replay; a missing file
        there means retention deleted a range a replay still needs: fail
        loudly rather than silently dropping data; likewise a head
        fingerprint mismatch (name recreated) fails before a byte is
        served. A FIRST read (the batch reader: committed_range=False)
        carries no committed-lines argument — its garbage is garbage,
        and gets the raw parse error, exactly as the stream reader's own
        first read reports it (batch and stream must diagnose the same
        file the same way)."""
        with open(fpath, "rb") as fh:
            _verify_sig(fh, os.path.basename(fpath), sig)
            fh.seek(start_byte)
            buf = fh.read(end_byte - start_byte)
        out: list[tuple] = []
        for line in buf.split(b"\n"):
            if not line.strip():
                continue
            try:
                out.append(_parse(line))
            except (ValueError, KeyError, TypeError) as exc:
                if sig is None and committed_range:
                    # a committed range is a span of whole lines of the
                    # file it was taken from — a parse failure inside it
                    # with no identity to verify means the name was
                    # recreated, not that the log ever held garbage
                    raise _recreated_on_legacy(
                        os.path.basename(fpath), start_byte, exc
                    ) from exc
                raise
        return out

    def _files_of(offset: dict) -> dict:
        files = offset.get("files")
        if files is None:
            raise ValueError(_LEGACY_MSG)
        return files

    class OutboxStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self._path = options["path"]
            self._limit = int(options.get("maxRowsPerTrigger", "1000"))

        def initialOffset(self) -> dict:
            return {"files": {}}

        def read(self, start: dict):
            prior = _files_of(start)
            files = dict(prior)
            sigs = dict(start.get("sigs", {}))
            budget = self._limit
            out: list[tuple] = []
            for name in _list_files(self._path):
                if budget <= 0:
                    break
                consumed = int(files.get(name, 0))
                fpath = os.path.join(self._path, name)
                try:
                    if os.path.getsize(fpath) == consumed:
                        continue  # drained: stat only, never re-opened
                    rows, end, sig = _drain_file(
                        fpath, consumed, budget, sigs.get(name)
                    )
                except FileNotFoundError:
                    # rotated to the archive prefix between listdir and
                    # stat/open (the documented retention pattern for
                    # DRAINED files): skip; its offset is retained. A
                    # rotation that removed unconsumed bytes surfaces on
                    # replay, loudly, not here.
                    continue
                if end != consumed:
                    files[name] = end
                    if sig is not None:
                        sigs[name] = sig
                    out.extend(rows)
                    budget -= len(rows)
            if files == prior:
                return iter([]), start
            return iter(out), {"files": files, "sigs": sigs}

        def readBetweenOffsets(self, start: dict, end: dict):
            sf = _files_of(start)
            ef = _files_of(end)
            sigs = end.get("sigs", {})
            rows: list[tuple] = []
            for name in sorted(ef):
                s = int(sf.get(name, 0))
                e = int(ef[name])
                if e > s:
                    rows.extend(
                        _read_slice(
                            os.path.join(self._path, name),
                            s,
                            e,
                            sigs.get(name),
                        )
                    )
            return iter(rows)

    class OutboxBatchReader(DataSourceReader):
        def __init__(self, options):
            self._path = options["path"]

        def read(self, partition):
            rows: list[tuple] = []
            for name in _list_files(self._path):
                fpath = os.path.join(self._path, name)
                # same torn-write rule as the stream reader: parse only
                # the newline-terminated prefix, so a line caught
                # mid-append is invisible rather than a JSONDecodeError
                # (and batch == stream on identical files)
                rows.extend(
                    _read_slice(
                        fpath, 0, _complete_size(fpath), committed_range=False
                    )
                )
            rows.sort(key=lambda t: t[0])
            return iter(rows)

    class OutboxDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "outbox"

        def schema(self) -> str:
            return OUTBOX_SCHEMA

        def simpleStreamReader(self, schema):
            return OutboxStreamReader(self.options)

        def reader(self, schema):
            return OutboxBatchReader(self.options)

    return OutboxDataSource


def archive_drained(
    path: str,
    offset: dict,
    archive_subdir: str = "archive",
    min_quiet_secs: float = 0.0,
):
    """Retention: move files the committed ``offset`` has fully drained
    (size == committed byte position) into ``path/archive_subdir``,
    returning the moved names. The reader only lists ``*.jsonl`` at the
    directory root, so archived files vanish from polls while their
    offsets are retained — safe to run concurrently with the stream
    READER (a mid-poll move is tolerated and skipped). Never touches a
    file with unconsumed or in-flight bytes; replaying a span that needs
    an archived file fails loudly rather than dropping data, so archive
    only beyond your replay horizon (e.g. after checkpoint compaction).

    **Producer contract (late-append hazard): a file may be archived
    only once its producer has closed/rotated it.** The size check and
    the move are not atomic against a LIVE writer: a producer holding an
    open fd keeps appending into the archived inode (those rows are
    never polled — silently lost), and a producer that reopens by path
    recreates the file SMALLER than the retained offset, failing every
    subsequent poll with the shrank-below-offset error. Belt-and-braces,
    ``min_quiet_secs`` skips any file modified within that window — set
    it to comfortably exceed the producer's append cadence (it
    approximates "closed/rotated" for producers that can't signal it);
    the default 0.0 preserves the archive-everything-drained behavior
    for quiesced outboxes (tests, post-shutdown compaction)."""
    import os
    import shutil
    import time

    files = offset.get("files")
    if files is None:
        raise ValueError(_LEGACY_MSG)
    dest_dir = os.path.join(path, archive_subdir)
    moved: list[str] = []
    for name, consumed in sorted(files.items()):
        fpath = os.path.join(path, name)
        try:
            st = os.stat(fpath)
            if st.st_size != int(consumed):
                continue  # pending or in-flight bytes: not drained
            if min_quiet_secs > 0 and time.time() - st.st_mtime < min_quiet_secs:
                continue  # recently written: producer may still be live
        except FileNotFoundError:
            continue  # already rotated
        os.makedirs(dest_dir, exist_ok=True)
        shutil.move(fpath, os.path.join(dest_dir, name))
        moved.append(name)
    return moved
