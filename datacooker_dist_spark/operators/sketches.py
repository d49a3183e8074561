"""Count-min sketch: mergeable point-frequency estimation.

Completes the engine's sketch family — HLL (approx distinct), exact
bitmap uniques, freqItems heavy-hitter candidates, approx_percentile —
with the classic counter sketch: a depth×width table of counters whose
point query MIN over the depth rows never under-counts (one-sided error:
estimate ∈ [true, true + εN] w.h.p., ε = e/width). At 100 TB the sketch
is the thing you CAN keep per partition/day/source and merge by plain
addition: the build is one hash aggregate whose output is depth·width
rows regardless of corpus size, merges are a groupBy-sum over those
rows, and a probe touches depth broadcast-joined rows per key.

Everything JVM-side: the depth hash family is ``xxhash64(key, row_idx)``
(seeded by the row index — the engine-wide deterministic hash family, so
sketches built by different sessions/engines over the same data are
bit-identical and merge-compatible).

Reference parity: datacooker-dist has no aggregation operators at all
(``README.md:1-3``); engine-extension surface (SURVEY.md §2.B).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _coords(key: Column, depth: int, width: int) -> Column:
    """Array of (row, slot) structs — the key's counter coordinates."""
    return F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(width)).alias("slot"),
        )
        for i in range(depth)
    ])


def countmin_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build a count-min sketch over ``key_col`` occurrences (one count
    per input ROW — pre-aggregate upstream to sketch weighted counts).
    One narrow explode (depth rows per input) + one hash aggregate with
    map-side partial combine: the exchange carries at most depth·width
    rows PER MAP PARTITION, never the corpus. Output: (row, slot, cnt),
    at most depth·width rows — parquet-persistable and mergeable
    (:func:`countmin_merge`)."""
    return (
        df.select(F.explode(_coords(F.col(key_col), depth, width)).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.slot").alias("slot"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME (depth, width): counter tables
    add position-wise — the property that lets per-day/per-source
    sketches roll up without touching raw data."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "slot").agg(F.sum("cnt").alias("cnt"))


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for the probe keys: each key reads its
    ``depth`` counters via a BROADCAST join on (row, slot) — the sketch
    is depth·width rows, broadcast-sized by construction — and takes the
    MIN (missing counter rows read as 0: that slot was never touched).
    The estimate never under-counts; collisions only inflate it.
    Output: probes' columns + ``cms_estimate``."""
    coords = probes.select(
        "*", F.explode(_coords(F.col(key_col), depth, width)).alias("c")
    ).select("*", F.col("c.row").alias("row"), F.col("c.slot").alias("slot"))
    joined = coords.join(F.broadcast(sketch), ["row", "slot"], "left")
    others = [c for c in probes.columns]
    return (
        joined.groupBy(*others)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate")
        )
    )

def _mg_absorb(counters: dict, batch_counts, k: int) -> dict:
    """Mergeable-summaries MERGE of exact batch counts into a running
    Misra-Gries summary: pointwise add, then (if over k entries) subtract
    the (k+1)-th largest count from every entry and drop the non-positive
    — the Agarwal et al. (SODA'12) merge, which preserves the invariant
    ``true - n/(k+1) <= estimate <= true`` for the n items absorbed so
    far. Batch counts are exact (a zero-error summary of any size), so
    absorbing per-batch ``value_counts`` is both correct and vectorized —
    the classic one-item-at-a-time decrement loop would be O(n·k) Python."""
    for key, c in batch_counts.items():
        counters[key] = counters.get(key, 0) + int(c)
    if len(counters) > k:
        kth = sorted(counters.values(), reverse=True)[k]
        counters = {key: c - kth for key, c in counters.items() if c > kth}
    return counters


def misra_gries_summary(
    df: DataFrame,
    key_col: str,
    k: int = 256,
) -> DataFrame:
    """Misra-Gries heavy-hitter summary over ``key_col`` occurrences: the
    DETERMINISTIC-guarantee counterpart of the count-min sketch. Where
    CMS over-counts w.h.p., MG under-counts with a HARD bound: summing
    the per-partition summaries gives, for every key,
    ``true - N/(k+1) <= estimate <= true`` (each partition's summary
    under-counts by at most its row count /(k+1); the sums telescope and
    absence reads as 0, itself within the bound) — so any key with true
    frequency above N/(k+1) is guaranteed present. The bound holds under
    ANY partitioning, which is what makes downstream invariants
    engine-stable even though individual estimates are partition-dependent.

    Plan shape: one linear ``mapInPandas`` pass (each task absorbs its
    Arrow batches' exact ``value_counts`` into a ≤k-entry dict — the
    mergeable-summaries merge, vectorized) emitting ≤k rows per
    partition, then one hash aggregate over ≤ k·partitions rows. At
    100 TB the exchange carries k rows per task regardless of corpus
    size, same posture as :func:`countmin_build`; sketches persisted per
    day/source combine by the same groupBy-sum.
    Output: (key_col, mg_count) — at most k·partitions rows, typically ≪.
    """
    field = df.schema[key_col]
    schema = StructType([field, StructField("_mg", LongType())])

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            counters = _mg_absorb(
                counters, pdf[key_col].value_counts(), k
            )
        yield pd.DataFrame(
            {key_col: list(counters.keys()), "_mg": list(counters.values())}
        )

    return (
        df.select(key_col)
        .mapInPandas(mg, schema)
        .groupBy(key_col)
        .agg(F.sum("_mg").alias("mg_count"))
    )
