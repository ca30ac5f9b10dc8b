"""Custom Python DataSource (Spark 4 DataSource API).

The reference's only extensibility point for storage is the pluggable
``MonadStore`` shuffle-store class with file/memory/Redis backends
(reference ``src/Core/Store.hs:41-119``).  Spark's user-visible analog
is the DataSource API: a pip-installable reader/writer that plugs into
``spark.read.format(...)`` with full planner integration (schema,
partitions, optional filter pushdown).  This module registers a
deterministic generator source — the simplest complete witness of the
API: declared schema, partition planning (one ``InputPartition`` per
split so a 1000-executor cluster scans in parallel), and per-partition
iteration.

A production source (e.g. an internal record service) implements the
same three methods; for heavy rows, ``read`` may yield pyarrow
RecordBatches instead of tuples to skip per-row Python overhead.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class SequenceDataSource(DataSource):
    """``spark.read.format("seqgen").option("n", N).option("parts", P)``:
    rows (id, id_sq, bucket) for id in [0, N), bucket = 'b' + id % 10."""

    @classmethod
    def name(cls) -> str:
        return "seqgen"

    def schema(self) -> str:
        return "id bigint, id_sq bigint, bucket string"

    def reader(self, schema) -> "SequenceReader":
        return SequenceReader(self.options)


class SequenceReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 4))

    def partitions(self):
        bounds = [round(i * self.n / self.parts) for i in range(self.parts + 1)]
        return [_Range(bounds[i], bounds[i + 1]) for i in range(self.parts)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield (i, i * i, f"b{i % 10}")


def register(spark) -> None:
    """Idempotent registration of all custom Python data sources."""
    spark.dataSource.register(SequenceDataSource)
