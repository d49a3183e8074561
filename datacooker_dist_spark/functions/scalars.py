"""Scalar expression helpers shared by operators and the query surface.

Cross-engine exactness notes (the DuckDB oracle hashes values exactly):

- ``dsum``/``davg``: double addition is not associative, so a plain
  ``SUM(double)`` differs bitwise between engines (and between Spark runs
  with different partitionings). Monetary/quantity columns in the synthetic
  tables carry ≤2 decimal places, so summing them as ``DECIMAL(25,2)`` is
  exact and deterministic; the final cast back to double is then bit-stable
  on every engine. This also makes aggregate results invariant to partition
  count — a property the pytest suite asserts (SURVEY §5.2 item 4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for 1e9 rows of 1e13-scaled values, exact at 2 decimals.
_DEC = "decimal(25,2)"


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Deterministic double sum via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(25,{scale})")).cast("double")


def davg(col: str | Column, scale: int = 2) -> Column:
    """Deterministic double mean: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(25,{scale})")).cast("double")
        / F.count(c)
    )


def dsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
