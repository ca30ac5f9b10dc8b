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

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


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
    spark.dataSource.register(SequenceStreamDataSource)
    spark.dataSource.register(KVFileDataSource)


# ---------------------------------------------------------------------------
# Custom Python SINK (DataSourceWriter) — the write side of the API
# ---------------------------------------------------------------------------

@dataclass
class _Wrote(WriterCommitMessage):
    file: str
    rows: int


class KVFileDataSource(DataSource):
    """``df.write.format("kvfiles").option("path", dir).save()``: one
    tab-separated file per partition + a committed ``_MANIFEST``.

    The write-side witness of the Python DataSource API, and the
    user-visible analog of the reference store's WRITE half
    (``sendDataToPartitions`` → one entry per partition under a
    deterministic path, reference ``src/Core/Partition.hs:60-65``,
    ``src/Core/Store.hs:56-62``).  The same idempotency argument
    carries over: task retries overwrite the SAME per-partition path,
    and only ``commit`` (driver-side, after every task succeeded)
    publishes the manifest — readers who insist on the manifest never
    observe a partial write.  ``abort`` removes the orphans.
    """

    @classmethod
    def name(cls) -> str:
        return "kvfiles"

    def schema(self) -> str:  # sink only; schema comes from the frame
        return "key string, value string"

    def writer(self, schema, overwrite: bool) -> "KVFileWriter":
        return KVFileWriter(self.options, schema, overwrite)


class KVFileWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("kvfiles sink requires .option('path', ...)")
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        # deterministic per-partition path → retry-idempotent (same
        # discipline as the reference's space-<wid>-<pid>-<tid> keys)
        f = os.path.join(self.path, f"part-{pid:05d}.tsv")
        n = 0
        with open(f, "w") as fh:
            for row in iterator:
                fh.write("\t".join("" if v is None else str(v) for v in row) + "\n")
                n += 1
        return _Wrote(file=f, rows=n)

    def commit(self, messages):
        total = sum(m.rows for m in messages if m is not None)
        with open(os.path.join(self.path, "_MANIFEST"), "w") as fh:
            fh.write(f"files={sum(1 for m in messages if m is not None)}\nrows={total}\n")

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


# ---------------------------------------------------------------------------
# Streaming Python data source (Spark 4 SimpleDataSourceStreamReader)
# ---------------------------------------------------------------------------

class SequenceStreamDataSource(DataSource):
    """``spark.readStream.format("seqstream").option("n", N)``: a
    bounded deterministic stream of (id, id_sq, bucket) rows emitted in
    ``chunk``-row micro-batch increments — the streaming twin of
    ``seqgen`` and the minimal witness of the Python STREAMING source
    API: offset management (``initialOffset``/``read``) plus exact
    replay (``readBetweenOffsets``) for recovery.  A production source
    (message queue, CDC feed) implements the same three methods against
    its real offsets; Spark handles checkpointing them.
    """

    @classmethod
    def name(cls) -> str:
        return "seqstream"

    def schema(self) -> str:
        return "id bigint, id_sq bigint, bucket string"

    def simpleStreamReader(self, schema) -> "SequenceStreamReader":
        return SequenceStreamReader(self.options)


class SequenceStreamReader:
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.chunk = int(options.get("chunk", 100))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i = int(start["i"])
        end = min(i + self.chunk, self.n)
        # an ITERATOR over a materialized list: the prefetch cache both
        # advances it (next()) and pickles the remainder for replay
        return (iter(self._rows(i, end)), {"i": end})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(int(start["i"]), int(end["i"])))

    def commit(self, end: dict) -> None:
        pass

    @staticmethod
    def _rows(lo: int, hi: int):
        # a LIST, not a generator: the simple-reader prefetch cache
        # pickles the batch for replay, and generators can't pickle
        return [(i, i * i, f"b{i % 10}") for i in range(lo, hi)]
