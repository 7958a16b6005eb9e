"""Outbox-poll streaming source as a Spark 4 Python DataSource (S3 + T4
+ K6 made native instead of analogized).

The reference's ingestion relay (ingestion-layer/utils/utils.py:33-45,
107-134) polls a transactional outbox table: ordered batched reads of
pending rows (``ORDER BY id ... LIMIT n``), at-least-once delivery, and
a mark-as-sent commit (``:47-59``) so replays resume after the last
acknowledged id. This module re-expresses that contract as a first-class
Structured Streaming source:

* ordered drain   -> each micro-batch is the next contiguous id range;
* ``LIMIT n``     -> ``maxRowsPerTrigger`` option (the reference's
                     batch-size / Kafka maxOffsetsPerTrigger analog, T4);
* mark-as-sent    -> the source offset {"last_id": N} committed by the
                     Spark checkpoint — exactly-once on our side without
                     an UPDATE back into the source (K6 subsumed);
* at-least-once replay -> ``readBetweenOffsets`` re-serves any committed
  id range deterministically.

The outbox itself is a directory of JSON-lines files (the test stand-in
for the Postgres table; rows carry ``id, topic, key, payload``). The
SimpleDataSourceStreamReader variant reads on the DRIVER — faithful to
the reference, whose relay is a single poller process, and appropriate
for an outbox (a queue drained in id order is inherently sequential;
the heavy lifting happens downstream, distributed). The class bodies
live inside a factory so they pickle by value (cloudpickle) — executors
and a vanilla driver session never need this package importable (the
UDTF/pandas-UDF discipline from operators/udtf_ops.py).
"""

from __future__ import annotations

OUTBOX_SCHEMA = "id bigint, topic string, key string, payload string"


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

    def _scan(path: str) -> list[tuple]:
        """All outbox rows in id order. Files are append-only (outbox
        INSERT trigger discipline), so re-scans only ever see a superset;
        id-ordering makes the scan deterministic regardless of file
        layout."""
        rows = []
        for name in sorted(os.listdir(path)):
            if not name.endswith(".jsonl"):
                continue
            with open(os.path.join(path, name)) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    r = json.loads(line)
                    rows.append(
                        (
                            int(r["id"]),
                            r.get("topic"),
                            r.get("key"),
                            r.get("payload"),
                        )
                    )
        rows.sort(key=lambda t: t[0])
        return rows

    class OutboxStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self._path = options["path"]
            self._limit = int(options.get("maxRowsPerTrigger", "1000"))

        def initialOffset(self) -> dict:
            return {"last_id": -1}

        def read(self, start: dict):
            pending = [
                r for r in _scan(self._path) if r[0] > start["last_id"]
            ][: self._limit]
            if not pending:
                return iter([]), start
            return iter(pending), {"last_id": pending[-1][0]}

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter(
                r
                for r in _scan(self._path)
                if start["last_id"] < r[0] <= end["last_id"]
            )

    class OutboxBatchReader(DataSourceReader):
        def __init__(self, options):
            self._path = options["path"]

        def read(self, partition):
            return iter(_scan(self._path))

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
