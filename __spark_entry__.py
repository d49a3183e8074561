"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual surface lives in ``datacooker_dist_spark.suite`` — one entry per
operator of SURVEY.md §2.B (429 queries, 386 with exact DuckDB oracles);
queries without an oracle are approximate/hash-specific ops (LSH/IVF
candidates, sampling, engine-specific hashes) recorded as rows-only.
Exactness conventions that make the oracles hash-stable: decimal-
accumulated double aggregation, deterministic tiebreaks on every ranked
output, 6-digit rounding on ULP-divergent scalars (see SCALING.md).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datacooker_dist_spark.suite import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return QUERIES["agg_hash"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.B."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; approximate/hash-specific ops omitted
    (rows-only check)."""
    return dict(ORACLES)
