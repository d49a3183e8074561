"""Relational operator library (SURVEY.md §2.B core rows).

The reference deliberately has no relational operators (its README scopes it
to copy/reshape only — reference ``README.md:1-3``; empty op registries at
``DocGen.java:86-87``); this module supplies the operator set the engine adds
on top. Everything is declarative DataFrame API so Catalyst keeps predicate
pushdown, column pruning, join selection and AQE re-planning (SURVEY §4).

Scale posture per operator is documented inline: what shuffles, on which
keys, and which side broadcasts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------- projection

def project(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Column select + reorder, with the reference's ``_`` placeholder
    meaning "skip" (A10/A11). Catalyst prunes the scan to the kept columns."""
    return df.select(*[c for c in columns if c != "_"])


# ---------------------------------------------------------------- filtering

def filter_rows(df: DataFrame, predicate: Column | str) -> DataFrame:
    """Predicate filter. Plain comparisons/IN/LIKE/BETWEEN/null-checks all
    push down to the parquet scan (visible as PushedFilters in .explain)."""
    return df.filter(predicate)


# ---------------------------------------------------------------- joins

def join(
    df: DataFrame,
    other: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi/theta join. ``broadcast_right`` hints a map-side (broadcast-hash)
    join for small dimension tables — at 100 TB the fact side then never
    shuffles. Without the hint AQE still converts to broadcast when the
    built side is under ``spark.sql.autoBroadcastJoinThreshold``."""
    right = F.broadcast(other) if broadcast_right else other
    return df.join(right, on=on, how=how)


def join_semi(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """LEFT SEMI: existence filter without duplicating or widening rows.
    Cheaper than inner+distinct — the build side stores only keys."""
    return df.join(other, on=list(on), how="left_semi")


def join_anti(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """LEFT ANTI: NOT EXISTS."""
    return df.join(other, on=list(on), how="left_anti")


def salted_join(
    df: DataFrame,
    other: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed (left) side's key into
    ``salt_buckets`` sub-keys and replicate the right side across all salts,
    so one hot key spreads over ``salt_buckets`` reducers instead of one.

    AQE's skew-join split handles most cases at runtime; explicit salting
    remains the tool when a single key exceeds what one task can hold even
    after AQE splitting (e.g. a null-key flood or a power-law head), or when
    AQE is unavailable (streaming joins). Cost: right side inflates
    ``salt_buckets``×, so use it on joins whose right side is modest.
    """
    salt = F.floor(F.rand(seed=42) * salt_buckets).cast("int")
    left = df.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return left.join(right, on=[on, "_salt"], how=how).drop("_salt")


# ---------------------------------------------------------------- aggregation

def aggregate(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """Hash aggregate with map-side partial aggregation (Spark always plans
    partial_agg → shuffle-on-keys → final_agg, so the shuffle moves one row
    per key per input partition, not raw rows)."""
    return df.groupBy(*keys).agg(*aggs)


def rollup(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def cube(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


# ---------------------------------------------------------------- windows

def ranked(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    rank_col: str = "rnk",
    method: str = "row_number",
) -> DataFrame:
    """Attach a rank column. Callers must order by a deterministic (tiebroken)
    key list so results are engine-stable."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    return df.withColumn(rank_col, fn().over(w))


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
) -> DataFrame:
    """Top-k per group via row_number filter. One shuffle on the group keys;
    no global sort. At scale this beats orderBy().limit() whenever k·groups
    ≪ rows."""
    return (
        ranked(df, partition_by, order_by, "_rnk")
        .filter(F.col("_rnk") <= k)
        .drop("_rnk")
    )


# ---------------------------------------------------------------- sort/limit

def sort_limit(df: DataFrame, order_by: Sequence[Column], n: int) -> DataFrame:
    """Global top-n. Spark plans TakeOrderedAndProject: per-partition heaps of
    size n, then an n-row merge on the driver — no full sort, no full shuffle.
    Order must be tiebroken for a deterministic result set."""
    return df.orderBy(*order_by).limit(n)


# ---------------------------------------------------------------- set ops

def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION ALL by column name (no shuffle at all)."""
    return a.unionByName(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Multiset INTERSECT ALL (duplicates kept up to the min of the two
    sides' counts) — plans as one shuffle on the full row, same as
    intersect, with per-row count bookkeeping instead of dedup."""
    return a.intersectAll(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.subtract(b)


# ---------------------------------------------------------------- dedup

def dedup_exact(
    df: DataFrame, keys: Sequence[str], tiebreak: Sequence[Column] | None = None
) -> DataFrame:
    """Exact dedup on ``keys``. With ``tiebreak`` the survivor is the first
    row under that ordering (deterministic — SURVEY §7.3 calls out that bare
    ``dropDuplicates`` keeps an arbitrary survivor). One shuffle on keys."""
    if tiebreak is None:
        return df.dropDuplicates(list(keys))
    return top_k_per_group(df, keys, tiebreak, 1)
