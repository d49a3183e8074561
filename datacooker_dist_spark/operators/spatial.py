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

    ``cell`` must be ≥ ``radius`` (the 3×3 neighborhood only covers the
    circle under that invariant — violating it would silently drop true
    matches, so it raises instead). The right side's coordinate columns
    come back suffixed ``{x}_r``/``{y}_r`` so the output has no ambiguous
    names.
    """
    if radius <= 0:
        raise ValueError(f"radius must be > 0, got {radius}")
    if cell is None:
        cell = radius
    elif cell < radius:
        raise ValueError(
            f"cell ({cell}) must be >= radius ({radius}): the 3x3 "
            "neighborhood no longer covers the radius otherwise"
        )
    xr, yr = f"{x}_r", f"{y}_r"
    lx, ly = F.col(x), F.col(y)
    rx, ry = F.col(xr), F.col(yr)

    l = left.withColumn("_cx", F.floor(F.col(x) / cell)).withColumn(
        "_cy", F.floor(F.col(y) / cell)
    )
    offsets = F.expr("explode(sequence(-1, 1))")
    r = (
        right.withColumnRenamed(x, xr)
        .withColumnRenamed(y, yr)
        .withColumn("_dx", offsets)
        .withColumn("_dy", F.expr("explode(sequence(-1, 1))"))
        .withColumn("_cx", F.floor(F.col(xr) / cell) + F.col("_dx"))
        .withColumn("_cy", F.floor(F.col(yr) / cell) + F.col("_dy"))
        .drop("_dx", "_dy")
    )
    d2 = (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry)
    return (
        l.join(r, ["_cx", "_cy"])
        .filter(d2 <= F.lit(float(radius) * float(radius)))
        .withColumn("dist", F.sqrt(d2))
        .drop("_cx", "_cy")
    )
