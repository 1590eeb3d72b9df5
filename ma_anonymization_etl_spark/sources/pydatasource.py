"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
SURVEY §2.A stretch: the engine's extension point for reading systems
Spark has no built-in connector for.

``SyntheticEventsDataSource`` is the demo instance: a deterministic
closed-form row generator (the shape a REST-paginated API, a key-value
scan, or a proprietary file format connector would take).  The parts
that carry over to a real connector:

- ``partitions()`` declares the parallel split — each InputPartition
  becomes one Spark task, so a 1000-executor cluster reads 1000 splits
  concurrently; no driver bottleneck.
- ``read(partition)`` runs ON THE EXECUTOR, yielding tuples for its
  split only.
- Values are exact binary fractions (k/4), so float SUMs over them are
  exact and order-independent — the demo query is DuckDB-oracle-checkable
  with a plain SUM, no scaled-int64 dance.

Registration is per-session: ``spark.dataSource.register(cls)``, then
``spark.read.format("synthetic_events")``.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsDataSource(DataSource):
    """format name: ``synthetic_events``; options: n (rows), parts."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id BIGINT, grp INT, val DOUBLE"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 10000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        step = max(1, -(-self.n // self.parts))
        return [
            RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, i % 10, (i * 7 % 100) / 4.0)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source: offsets are row ids; each
    micro-batch emits the next ``batch_rows`` closed-form rows.  A real
    connector would replace the closed form with a poll (API page, log
    segment, queue drain) and keep the offset bookkeeping identical.
    SimpleDataSourceStreamReader reads on the driver and is for
    low-throughput sources; high-throughput ones implement
    DataSourceStreamReader with partitioned executor reads."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.max_rows = int(options.get("n", 10000))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch_rows, self.max_rows)
        # iter-of-list, not a generator: the driver-side prefetch cache
        # copy.copy()s and may pickle the iterator; list_iterators
        # support both, generators neither.
        return iter(self.readBetweenOffsets(start, {"next": hi})), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return [
            (i, i % 10, (i * 7 % 100) / 4.0)
            for i in range(start["next"], end["next"])
        ]


def register_synthetic_source(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(SyntheticEventsDataSource)
