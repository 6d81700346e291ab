"""Custom streaming source: ``spark.readStream.format("events_replay")``.

A Python DataSource stream reader that replays the events table in
bounded micro-batches of ``rows_per_batch`` rows, in event-id order —
the deterministic replay harness the streaming operators are tested
against (production swaps in kafka/delta; the operators don't care).

Offset model: the (exclusive) row index into the event-id-ordered
table. initialOffset=0; each microbatch advances by rows_per_batch
until the table is exhausted, after which the offset stops moving and
processAllAvailable() unblocks — the file-source-like bounded-backlog
behavior, but through the SimpleDataSourceStreamReader contract
(initialOffset/read/readBetweenOffsets), exercising exactly-once
replay: a restarted query re-reads any offset range and gets identical
rows because the order is a pure function of the data.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql import types as T

EVENTS_REPLAY_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("sec", T.LongType()),  # epoch seconds (ts pre-floored)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


class EventsReplayReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options["path"]
        self.rows_per_batch = int(options.get("rows_per_batch", "500"))
        self._rows = None  # lazily loaded, driver-side

    def _load(self):
        if self._rows is None:
            import duckdb

            f = os.path.join(self.path, "events.parquet")
            self._rows = duckdb.sql(
                "SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, "
                "user_id, event_type, CAST(value AS DOUBLE) AS value "
                f"FROM '{f}' ORDER BY event_id"
            ).fetchall()
        return self._rows

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):
        rows = self._load()
        lo = start["idx"]
        hi = min(lo + self.rows_per_batch, len(rows))
        return iter(rows[lo:hi]), {"idx": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # exactly-once replay on recovery: same range → same rows
        rows = self._load()
        return iter(rows[start["idx"] : end["idx"]])


class EventsReplayDataSource(DataSource):
    """format("events_replay") — options: ``path`` (sf dir),
    ``rows_per_batch`` (default 500)."""

    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self):
        return EVENTS_REPLAY_SCHEMA

    def simpleStreamReader(self, schema) -> EventsReplayReader:
        return EventsReplayReader(self.options)


def register_replay_source(spark) -> None:
    """Idempotent registration on a session."""
    spark.dataSource.register(EventsReplayDataSource)
