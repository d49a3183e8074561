"""Spatial operators (the upstream commons' JTS/Point record family,
SURVEY §1.2/§1.5, re-expressed relationally).

The engine's spatial posture: points are plain numeric columns, and the
radius join is a GRID-BUCKETED equi-join — each probe point checks only the
3×3 neighborhood of its grid cell, so candidate generation is one shuffle
keyed by cell id and never a cross join. With cell size ≥ radius, the
neighborhood is guaranteed to cover every true match (a point within
``radius`` of another lies in the same or an adjacent cell).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    x: str = "x",
    y: str = "y",
    cell: float | None = None,
) -> DataFrame:
    """All (left, right) pairs within planar ``radius`` (same units as the
    coordinates), with the distance attached as ``dist``.

    Left rows land in their exact cell; right rows explode to the 3×3
    neighbor cells (9× row fanout on ONE side only — the smaller side
    should be passed as ``right``). The join is a hash equi-join on
    (cell_x, cell_y); the exact circle test runs on bucket-mates only.
    Shuffle volume is |left| + 9·|right| rows — linear, never quadratic.
    """
    cell = cell or radius
    lx, ly = F.col(f"l.{x}"), F.col(f"l.{y}")
    rx, ry = F.col(f"r.{x}"), F.col(f"r.{y}")

    l = left.withColumn("_cx", F.floor(F.col(x) / cell)).withColumn(
        "_cy", F.floor(F.col(y) / cell)
    )
    offsets = F.expr("explode(sequence(-1, 1))")
    r = (
        right.withColumn("_dx", offsets)
        .withColumn("_dy", F.expr("explode(sequence(-1, 1))"))
        .withColumn("_cx", F.floor(F.col(x) / cell) + F.col("_dx"))
        .withColumn("_cy", F.floor(F.col(y) / cell) + F.col("_dy"))
        .drop("_dx", "_dy")
    )
    d2 = (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry)
    return (
        l.alias("l")
        .join(r.alias("r"), ["_cx", "_cy"])
        .filter(d2 <= F.lit(float(radius) * float(radius)))
        .withColumn("dist", F.sqrt(d2))
        .drop("_cx", "_cy")
    )
