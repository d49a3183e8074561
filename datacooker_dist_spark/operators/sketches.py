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

import math

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
    weight_col: str | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build a count-min sketch over ``key_col`` occurrences (one count
    per input ROW; pass ``weight_col`` — a non-negative integer column —
    to sketch weighted counts, e.g. pre-aggregated (key, n) rows: the
    one-sided-error invariant needs non-negative increments).
    ``group_cols`` builds one sketch PER GROUP in a single table — the
    partitioned-artifact shape (per-source/per-day sketches in one
    parquet, depth·width rows per group) that later rolls up by summing
    ``cnt`` over (row, slot): the ``sketch_roundtrip`` suite query
    proves that persist → cold read → merge → probe contract.
    One narrow explode (depth rows per input) + one hash aggregate with
    map-side partial combine: the exchange carries at most depth·width
    rows PER MAP PARTITION (per group), never the corpus. Output:
    (group_cols…, row, slot, cnt) — parquet-persistable and mergeable
    (:func:`countmin_merge`)."""
    if weight_col is not None:
        # Zero-weight rows must not materialize counter rows (they would
        # bloat the persisted artifact with cnt=0 entries); negative
        # weights are outside the contract and dropped with them.
        df = df.filter(F.col(weight_col) > 0)
    group_cols = group_cols or []
    cols = [key_col] + group_cols + ([weight_col] if weight_col else [])
    return (
        df.select(
            *cols,
            F.explode(_coords(F.col(key_col), depth, width)).alias("_cms_c"),
        )
        .groupBy(
            *group_cols,
            F.col("_cms_c.row").alias("row"),
            F.col("_cms_c.slot").alias("slot"),
        )
        .agg(
            (
                F.count(F.lit(1))
                if weight_col is None
                else F.sum(weight_col)
            ).alias("cnt")
        )
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
    Output: probes' columns + ``cms_estimate``. Working columns are
    ``_cms_``-prefixed so probe tables may themselves carry row/slot/cnt
    payload columns (e.g. an exact-count table as the probe set)."""
    coords = (
        probes.select(
            "*",
            F.explode(_coords(F.col(key_col), depth, width)).alias("_cms_c"),
        )
        .select(
            "*",
            F.col("_cms_c.row").alias("_cms_row"),
            F.col("_cms_c.slot").alias("_cms_slot"),
        )
        .drop("_cms_c")
    )
    sk = sketch.select(
        F.col("row").alias("_cms_row"),
        F.col("slot").alias("_cms_slot"),
        F.col("cnt").alias("_cms_cnt"),
    )
    joined = coords.join(F.broadcast(sk), ["_cms_row", "_cms_slot"], "left")
    others = [c for c in probes.columns]
    return (
        joined.groupBy(*others)
        .agg(
            F.min(F.coalesce(F.col("_cms_cnt"), F.lit(0))).alias(
                "cms_estimate"
            )
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
    trim: bool = True,
    weight_col: str | None = None,
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
    partition, then one hash aggregate over ≤ k·partitions rows, then
    (``trim``, default) the mergeable-summaries TRIM — subtract the
    (k+1)-th largest count from every entry and keep the positive — so
    the OUTPUT is ≤k rows total: genuinely broadcastable and the
    bounded artifact you persist. The trim preserves the bound by the
    residual argument (err ≤ (N − mass)/(k+1) holds for the sum of
    per-partition summaries; subtracting v from ≥k+1 entries lowers
    mass by ≥(k+1)·v, absorbing the extra v of error), and it no-ops
    when the summary already fits in k entries — so estimates stay
    EXACT whenever k ≥ vocabulary. At 100 TB the exchange carries k
    rows per task regardless of corpus size, same posture as
    :func:`countmin_build`; sketches persisted per day/source combine
    by the same groupBy-sum (+ optional re-trim).
    Output: (key_col, mg_count) — ≤k rows (``trim=False``:
    ≤k·partitions, exact partial sums for diagnostics/tests).
    ``weight_col`` (non-negative integers, e.g. pre-aggregated (key, n)
    rows) counts each row that many times; the bound becomes
    true − W/(k+1) ≤ est ≤ true for total weight W — the merge argument
    is weight-oblivious.
    """
    field = df.schema[key_col]
    schema = StructType([field, StructField("_mg", LongType())])

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            batch_counts = (
                pdf[key_col].value_counts()
                if weight_col is None
                else pdf.groupby(key_col, sort=False)[weight_col].sum()
            )
            counters = _mg_absorb(counters, batch_counts, k)
        yield pd.DataFrame(
            {key_col: list(counters.keys()), "_mg": list(counters.values())}
        )

    if weight_col is not None:
        # Zero-weight keys must not enter the summary (phantom entries
        # would consume the k budget and surface as mg_count=0 rows on
        # the trim=False diagnostics path); negative weights are outside
        # the contract and dropped with them.
        df = df.filter(F.col(weight_col) > 0)
    cols = [key_col] + ([weight_col] if weight_col else [])
    merged = (
        df.select(*cols)
        .mapInPandas(mg, schema)
        .groupBy(key_col)
        .agg(F.sum("_mg").alias("mg_count"))
    )
    if not trim:
        return merged
    # TakeOrdered(k+1) → 1-row stats: when more than k entries survive
    # the merge, the (k+1)-th largest is the subtrahend; otherwise 0.
    stats = (
        merged.orderBy(F.desc("mg_count"), key_col)
        .limit(k + 1)
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min("mg_count").alias("_kth"),
        )
    )
    return (
        merged.crossJoin(F.broadcast(stats))
        .select(
            key_col,
            (
                F.col("mg_count")
                - F.when(F.col("_c") > k, F.col("_kth")).otherwise(F.lit(0))
            ).alias("mg_count"),
        )
        .filter(F.col("mg_count") > 0)
    )


def grid_histogram(
    df: DataFrame,
    val_col: str,
    lo: float,
    hi: float,
    buckets: int = 4096,
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-grid counting histogram — the quantile member of the
    mergeable-sketch family (CMS = frequencies, MG = heavy hitters, HLL
    = distinct, grid = quantiles): values bucket by
    ``clamp(floor((v−lo)/width), 0, buckets−1)`` and the sketch is the
    (bucket, cnt) table, ≤``buckets`` rows, mergeable by plain addition.
    Unlike t-digest/KLL the grid is DETERMINISTIC — bucket assignment is
    a pure arithmetic expression, so sketches built by any engine over
    any partitioning are bit-identical (pick lo/hi/buckets so ``width``
    is exactly representable, e.g. a power-of-two bucket count dividing
    an integer range). Build is one hash aggregate with map-side partial
    combine: the exchange carries ≤``buckets`` rows per map partition.
    Quantile error from :func:`grid_quantiles` is ≤ one bucket width for
    in-range values; out-of-range values clamp to the edge buckets
    (document the range or widen it). ``weight_col`` (non-negative
    integers, e.g. pre-aggregated (value, n) rows) counts each row that
    many times — the CMS/MG weighted contract; zero/negative weights are
    filtered at the boundary."""
    if weight_col is not None:
        df = df.filter(F.col(weight_col) > 0)
    width = (hi - lo) / buckets
    b = F.least(
        F.greatest(
            F.floor((F.col(val_col) - F.lit(lo)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(buckets - 1),
    )
    cols = [b.cast("int").alias("bucket")] + (
        [F.col(weight_col)] if weight_col else []
    )
    return (
        df.select(*cols)
        .groupBy("bucket")
        .agg(
            (
                F.count(F.lit(1))
                if weight_col is None
                else F.sum(weight_col)
            ).alias("cnt")
        )
    )


def grid_quantiles(
    hist: DataFrame,
    qs_pct: list[int],
    lo: float,
    hi: float,
    buckets: int = 4096,
) -> DataFrame:
    """Quantile probe over a :func:`grid_histogram` sketch: for each
    integer percentile q, the estimate is the UPPER EDGE of the first
    bucket whose cumulative count reaches q% of the total — compared in
    exact integer arithmetic (cum·100 ≥ q·N), so the answer is the same
    on every engine. The cumulative window runs over the ≤``buckets``-row
    sketch — sketch-sized by construction, the right single-task shape
    for a probe (audited in the suite's global-window sweep). Output:
    (q_pct, grid_quantile), one row per requested percentile."""
    from pyspark.sql import Window

    width = (hi - lo) / buckets
    spark = hist.sparkSession
    qdf = spark.createDataFrame([(int(q),) for q in qs_pct], "q_pct int")
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("bucket", F.sum("cnt").over(w).alias("cum"))
    tot = hist.agg(F.sum("cnt").alias("_n"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(qdf),
            F.col("cum") * 100 >= F.col("q_pct").cast("long") * F.col("_n"),
        )
        .groupBy("q_pct")
        .agg(
            (F.lit(lo) + (F.min("bucket") + 1) * F.lit(width)).alias(
                "grid_quantile"
            )
        )
    )


def mg_bound_report(
    toks: DataFrame,
    summary: DataFrame,
    k: int,
    key_col: str = "token",
) -> DataFrame:
    """Shared probe for the MG suite queries (batch + streaming twin):
    the exact top-10 keys by true count, each asserting the hard bound
    true − N/(k+1) ≤ estimate ≤ true in exact integer arithmetic
    ((exact−est)·(k+1) ≤ N, all longs; absence reads as 0, itself within
    the bound). The boolean is provably TRUE under any partitioning and
    any micro-batch split — which is what makes it oracle-checkable —
    so batch and streaming consumers must stay arithmetically in
    lockstep: that is why this lives in one place.
    Output: (key_col, exact_n, mg_within_bound)."""
    exact = (
        toks.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), key_col)
        .limit(10)
    )
    total = toks.agg(F.count(F.lit(1)).alias("_n"))
    est = F.coalesce(F.col("mg_count"), F.lit(0))
    return (
        exact.join(summary, key_col, "left")
        .crossJoin(F.broadcast(total))
        .select(
            key_col, "exact_n",
            (
                (est <= F.col("exact_n"))
                & ((F.col("exact_n") - est) * (k + 1) <= F.col("_n"))
            ).alias("mg_within_bound"),
        )
    )


def _kmin_of_union(col: str, k: int):
    """k smallest distinct values of a collected column — the KMV merge
    expression shared by every fold level."""
    return F.slice(
        F.array_sort(F.array_distinct(F.collect_list(col))), 1, k
    )


def kmin_values(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
    fold_buckets: int | None = None,
) -> DataFrame:
    """Per-group KMV sketch: the k smallest DISTINCT values of
    ``value_col`` per group, built in the family's mergeable shape
    (Bar-Yossef et al. 2002; same posture as :func:`countmin_build` /
    :func:`misra_gries_summary`).

    Plan shape: one linear ``mapInPandas`` pass — each task keeps, per
    group, a ≤k-entry ascending array of the smallest distinct values
    seen in its partition (k integers of state, the KMV partial; absorb
    is a vectorized ``np.unique`` merge per Arrow batch) — emitting
    ≤ k rows per (group, partition); then a HIERARCHICAL k-min-of-union
    fold (VERDICT r09 task 2): the partials first pre-aggregate by
    (group, pmod(partition_id, B)) with B = ceil(sqrt(P)) over P
    upstream tasks, so the first-level buffers hold ≤ k·ceil(P/B)
    values and the final per-group merge holds ≤ k·B — both
    O(k·sqrt(P)) instead of the single-level k·P (at 10⁶ tasks and
    k=64 that is ~64k values per buffer, not ~64M). No window, no
    corpus-sized shuffle: the raw data never moves, only the bounded
    partial rows do — at 100 TB the exchange carries k values per
    (group, task) regardless of corpus size, and local duplicates are
    already collapsed map-side. k-min-of-union is associative, so the
    fold is value-identical to the flat merge for ANY bucketing
    (``test_kmin_values_merge_equals_rebuild`` sweeps splits). Output:
    (group_cols…, ``kmin`` array) with ≤k ascending distinct values
    per group.
    """
    partials = kmin_partials(df, group_cols, value_col, k)
    if fold_buckets is None:
        p = df.rdd.getNumPartitions()
        fold_buckets = max(1, math.isqrt(max(p - 1, 0)) + 1)
    folded = partials.groupBy(
        *group_cols,
        F.pmod(F.spark_partition_id(), F.lit(fold_buckets)).alias("_fold"),
    ).agg(_kmin_of_union(value_col, k).alias("_kmin"))
    return (
        folded.select(*group_cols, F.explode("_kmin").alias(value_col))
        .groupBy(*group_cols)
        .agg(_kmin_of_union(value_col, k).alias("kmin"))
    )


def kmin_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
) -> DataFrame:
    """The partial stage of :func:`kmin_values`, exposed so the scale
    test can assert its physical bound directly: one linear
    ``mapInPandas`` pass emitting, per (group, partition), the ≤k
    smallest DISTINCT values seen in that partition — these rows are
    the ONLY thing that ever shuffles, ≤ partitions·groups·k total."""
    import numpy as np

    fields = [df.schema[c] for c in group_cols] + [df.schema[value_col]]
    schema = StructType(list(fields))

    def partial(batches):
        state: dict = {}
        for pdf in batches:
            for key, grp in pdf.groupby(
                group_cols, sort=False, dropna=False
            )[value_col]:
                vals = grp.to_numpy()
                cur = state.get(key)
                merged = np.unique(
                    vals if cur is None else np.concatenate([cur, vals])
                )
                state[key] = merged[:k]
        rows = []
        for key, arr in state.items():
            keys = key if isinstance(key, tuple) else (key,)
            for v in arr:
                rows.append(tuple(keys) + (v,))
        if rows:
            yield pd.DataFrame(rows, columns=group_cols + [value_col])

    return df.select(*group_cols, value_col).mapInPandas(partial, schema)


def kmin_merge(k: int, *sketches: DataFrame) -> DataFrame:
    """MERGE of :func:`kmin_values` sketches built over disjoint (or
    overlapping) slices: explode the ≤k-entry arrays back to rows and
    re-run the same k-min-of-union aggregate. Exactly the union
    property ``test_kmv_merge_equals_direct_sketch`` proves in
    arithmetic: the k smallest of a union equal the k smallest of the
    merged per-slice k-mins — so sketches persisted per day/source
    combine without touching raw data, over ≤ k·sketches rows per
    group."""
    from functools import reduce

    u = reduce(DataFrame.unionAll, sketches)
    group_cols = [c for c in u.columns if c != "kmin"]
    return (
        u.select(*group_cols, F.explode("kmin").alias("_v"))
        .groupBy(*group_cols)
        .agg(_kmin_of_union("_v", k).alias("kmin"))
    )
