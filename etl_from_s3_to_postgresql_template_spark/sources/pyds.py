"""Custom connector via Spark 4's Python DataSource API.

The modern answer to "my data lives behind an API/protocol Spark has no
built-in source for": subclass ``pyspark.sql.datasource.DataSource``,
implement partition planning + per-partition reads in Python, register
once per session, and the source behaves like any format — partitioned,
lazily planned, usable from ``spark.read.format(...)``. This is the seam
a reference user would use to replace the boto3 download loop with a
first-class source (list objects -> one InputPartition per object ->
stream rows), without any JVM code.

The shipped implementation is a deterministic synthetic events generator
(closed-form rows from the partition index), which keeps it oracle-
checkable: DuckDB reproduces every row from ``range(n)``, so the driver
gate hash-verifies the whole partition-planning + read path.

Scale shape: ``partitions()`` returns P independent splits; each
``read()`` generates only its [start, end) slice — no driver
materialization, no skew (equal slices). A real connector returns one
partition per object/page/shard and the same properties hold.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

__all__ = ["SyntheticEventsDataSource", "EVENT_TYPES"]

EVENT_TYPES = ("click", "view", "purchase", "scroll", "login")


class _SliceReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n_rows", 10000))
        self.parts = int(options.get("partitions", 8))
        self.n_users = int(options.get("n_users", 150))

    def partitions(self):  # equal [start, end) slices, no skew
        bounds = [self.n * i // self.parts for i in range(self.parts + 1)]
        return [InputPartition((bounds[i], bounds[i + 1])) for i in range(self.parts)]

    def read(self, partition: InputPartition):
        start, end = partition.value
        for i in range(start, end):
            yield (
                i,
                i % self.n_users,
                EVENT_TYPES[i % 5],
                (i % 9973) / 100.0,
            )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("n_rows", N)`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id long, user_id long, event_type string, value double"

    def reader(self, schema) -> DataSourceReader:
        return _SliceReader(self.options)


from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402

__all__ += ["SyntheticEventsStreamDataSource"]


class _SliceStreamReader(SimpleDataSourceStreamReader):
    """Offset-managed streaming read of the same deterministic rows: the
    offset is just the next row index, each micro-batch advances it by
    ``rows_per_batch``. ``readBetweenOffsets`` regenerates any committed
    range on replay — the determinism that makes restart recovery
    exactly-once (the same contract a Kafka offset range gives)."""

    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.n_users = int(options.get("n_users", 150))

    def initialOffset(self):
        return {"i": 0}

    def _rows(self, start: int, end: int):
        return [
            (i, i % self.n_users, EVENT_TYPES[i % 5], (i % 9973) / 100.0)
            for i in range(start, end)
        ]

    def read(self, start: dict):
        end = {"i": start["i"] + self.rows_per_batch}
        return iter(self._rows(start["i"], end["i"])), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["i"], end["i"]))


class SyntheticEventsStreamDataSource(DataSource):
    """``spark.readStream.format("synthetic_events_stream")`` after
    registration: an UNBOUNDED custom source with Python-side offset
    tracking (checkpointed by the engine like any streaming source)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return "event_id long, user_id long, event_type string, value double"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SliceStreamReader(self.options)
