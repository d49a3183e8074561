"""Data-quality audit operators (the Deequ/Great-Expectations report
shapes, engine-extension surface per SURVEY §2.B ETL patterns).

Reference parity note: datacooker-dist has no audit operators — its
data-quality posture is "copy what parses" (README.md:1-3); these are the
checks a warehouse load runs around such copies.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: Sequence[tuple[str, str]],
    approx: bool = False,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Column-profile audit: completeness (null count), cardinality, and
    min/max per audited column — all from ONE scan.

    ``cols`` is [(name, kind)] with kind in {"bigint", "double", "string"}.
    Min/max are emitted as TYPED columns — numerics in (min_num, max_num)
    as double, strings in (min_str, max_str) — never as engine-rendered
    decimal strings, so the report hashes identically across engines and
    canonicalization layers (VERDICT r02 task 1: the old
    decimal(18,2)→string rendering was hash-fragile).

    ``approx=False`` (default): exact count_distinct; the multi-distinct
    aggregate plans as a single Expand, so the table is read once however
    many columns are audited (plan-pinned in tests/test_plans.py) — but
    the Expand multiplies shuffled rows by (cols+1), and exact distinct on
    a near-unique key shuffles the whole table at 100 TB. ``approx=True``
    switches every column to approx_count_distinct (HLL sketch, relative
    error ``approx_rsd``): no Expand, partial aggregation map-side, one
    ordinary 1-row shuffle — the right mode for free-text/high-cardinality
    columns at scale (VERDICT r02 task 8).

    Output: one row per column — (col_name, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in cols:
        nd = (
            F.approx_count_distinct(F.col(c), approx_rsd)
            if approx
            else F.count_distinct(F.col(c))
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint").alias(f"_nn_{c}"),
            nd.alias(f"_nd_{c}"),
        ]
        if kind == "string":
            aggs += [
                F.min(c).alias(f"_mns_{c}"),
                F.max(c).alias(f"_mxs_{c}"),
            ]
        else:
            aggs += [
                F.min(c).cast("double").alias(f"_mnn_{c}"),
                F.max(c).cast("double").alias(f"_mxn_{c}"),
            ]
    row = df.agg(*aggs)
    null_d = "CAST(NULL AS DOUBLE)"
    null_s = "CAST(NULL AS STRING)"
    parts = []
    for c, kind in cols:
        if kind == "string":
            parts.append(
                f"'{c}', _nn_{c}, _nd_{c}, {null_d}, {null_d}, "
                f"_mns_{c}, _mxs_{c}"
            )
        else:
            parts.append(
                f"'{c}', _nn_{c}, _nd_{c}, _mnn_{c}, _mxn_{c}, "
                f"{null_s}, {null_s}"
            )
    stack = ", ".join(parts)
    return row.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct",
             "min_num", "max_num", "min_str", "max_str")
