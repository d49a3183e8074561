"""Generation-bounded localCheckpoint chaining.

Iterative operators (BPE merge rounds, union-find CC passes, PageRank /
BFS rounds) re-materialize a DataFrame per round with ``localCheckpoint``
to truncate lineage. Spark gives no public handle to release a
localCheckpoint's blocks from a DataFrame: ``df.rdd.unpersist`` detaches a
DERIVED javaToPython RDD, not the internal checkpointed RDD, so every
generation stays pinned in block storage and a long training run grows
storage linearly (ADVICE r02, empirically confirmed).

``CheckpointChain`` fixes that by diffing the SparkContext's persistent-RDD
map around each checkpoint: the ids that appear are the new generation's
blocks, and the previous generation is unpersisted THROUGH the JVM RDD
handle — verified to actually drop the blocks (tests/test_operators.py).
Storage therefore holds at most ``keep`` generations no matter how many
rounds run.

Driver-side bookkeeping only; assumes checkpoints on this chain are not
interleaved with concurrent persists from other driver threads (true for
every caller here — single-threaded operator loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _persistent_ids(sc) -> set[int]:
    m = sc._jsc.sc().getPersistentRDDs()
    jmap = sc._jvm.scala.collection.JavaConverters.mapAsJavaMapConverter(
        m
    ).asJava()
    return set(jmap.keySet().toArray())


def _unpersist_ids(sc, ids: set[int]) -> None:
    m = sc._jsc.sc().getPersistentRDDs()
    jmap = sc._jvm.scala.collection.JavaConverters.mapAsJavaMapConverter(
        m
    ).asJava()
    for i in ids:
        rdd = jmap.get(i)
        if rdd is not None:
            rdd.unpersist(False)


class CheckpointChain:
    """Chain eager localCheckpoints, releasing all but the last ``keep``
    generations' blocks (default: the current one only — i.e. at most two
    corpus copies alive during the handoff, one after)."""

    def __init__(self, keep: int = 1):
        self.keep = keep
        self._gens: list[set[int]] = []

    def checkpoint(self, df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        before = _persistent_ids(sc)
        out = df.localCheckpoint()  # eager
        self._gens.append(_persistent_ids(sc) - before)
        while len(self._gens) > self.keep:
            _unpersist_ids(sc, self._gens.pop(0))
        return out

    def release(self, spark_or_df) -> None:
        """Drop every generation still held (end-of-loop cleanup)."""
        sc = (
            spark_or_df.sparkSession.sparkContext
            if isinstance(spark_or_df, DataFrame)
            else spark_or_df.sparkContext
        )
        while self._gens:
            _unpersist_ids(sc, self._gens.pop(0))
