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
    decimal_scale: int = 2,
) -> DataFrame:
    """Column-profile audit: completeness (null count), exact cardinality,
    and min/max per audited column — all from ONE scan.

    ``cols`` is [(name, kind)] with kind in {"bigint", "double", "string"}:
    numeric min/max normalize through decimal(18, ``decimal_scale``) before
    the string cast so the report is engine-stable; strings pass through.
    The multi-distinct aggregate plans as a single Expand, so the table is
    read once however many columns are audited (plan-pinned in
    tests/test_plans.py). Exact distincts are the audit-grade choice for
    key columns; swap approx_count_distinct for free-text ones.
    Output: one row per column — (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in cols:
        mn, mx = F.min(c), F.max(c)
        if kind == "double":
            mn = mn.cast(f"decimal(18,{decimal_scale})")
            mx = mx.cast(f"decimal(18,{decimal_scale})")
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint").alias(f"_nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            mn.cast("string").alias(f"_mn_{c}"),
            mx.cast("string").alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c, _ in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(col_name, n_nulls, n_distinct, min_value, max_value)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct",
             "min_value", "max_value")
