"""Custom Python DataSource — the engine's extension point for storages
Spark has no built-in source for.

The reference's core identity is "extensible with storage adapters"
(README.md:1-3; registry A21, `Main.java:114-117`). On Spark 4 the
idiomatic equivalent is the Python DataSource API: a subclass declares
schema + partition planning, and each InputPartition is read
independently on executors — the same driver-plans/executors-read split
the reference hand-rolls in `S3DirectInput.load()`
(`S3DirectInput.java:55-119`), with Spark owning scheduling, retries and
Arrow transfer.

`SyntheticSequenceSource` is the registry's reference implementation: a
deterministic partitioned sequence (id, v = id*2654435761 mod 1000) used
by the correctness gate; real adapters (a REST paginator, a proprietary
blob store) follow the identical skeleton — options in, partitions
planned on the driver, generators yielded per partition.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

MULT = 2654435761  # Knuth multiplicative hash constant


class SyntheticSequenceSource(DataSource):
    """``spark.read.format("synthseq").option("n", ...).option("parts", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "synthseq"

    def schema(self) -> str:
        return "id bigint, v bigint"

    def reader(self, schema) -> "SyntheticSequenceReader":
        return SyntheticSequenceReader(self.options)


class SyntheticSequenceReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 4))

    def partitions(self):
        # Driver-side partition planning: contiguous id ranges, one
        # InputPartition per chunk (≙ the reference's whole-file grouping
        # into part_count groups, S3DirectInput.java:102-116).
        step = (self.n + self.parts - 1) // self.parts
        return [
            InputPartition((i * step, min((i + 1) * step, self.n)))
            for i in range(self.parts)
            if i * step < self.n
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, (i * MULT) % 1000)


class JsonLinesSinkSource(DataSource):
    """Custom Python DataSource SINK — the write half of the extension
    point (the reference's output-adapter story, e.g. its hand-rolled S3
    multipart upload finalize, ``S3DirectTextOutputFunction.java:57-74``).

    ``df.write.format("pyjsonl").save(path)``: each task streams its
    partition to a temp file and returns a WriterCommitMessage; the driver
    finalizes by renaming temp files to ``part-NNNNN.jsonl`` on commit and
    deletes them on abort — the classic two-phase task-commit protocol,
    here in user Python with Spark owning retries and message transport.
    """

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def writer(self, schema, overwrite: bool):
        return JsonLinesWriter(self.options, overwrite)


class _JsonCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyjsonl sink requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        """Executor-side: stream the partition to a task-scoped temp file
        (never the final name — a retried task must not collide)."""
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp_{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonCommit(tmp, n)

    def commit(self, messages):
        """Driver-side finalize: rename every task's temp file into place —
        the rename barrier makes the output all-or-nothing."""
        import os

        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-"):
                    os.remove(os.path.join(self.path, name))
        for i, m in enumerate(messages):
            os.rename(
                m.path, os.path.join(self.path, f"part-{i:05d}.jsonl")
            )

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is safe)."""
    spark.dataSource.register(SyntheticSequenceSource)
    spark.dataSource.register(JsonLinesSinkSource)
