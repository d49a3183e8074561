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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is safe)."""
    spark.dataSource.register(SyntheticSequenceSource)
