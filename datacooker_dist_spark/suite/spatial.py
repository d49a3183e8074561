"""Spatial suite entries — the commons JTS/Point record family (SURVEY
§1.2/§1.5) as relational operators over planar coordinates.

Coordinates are synthesized deterministically from integer keys (the
word-soup testdata carries no geometry): multiplicative hashing onto a
1000×1000 planar field held in integer CENTI-units. All geometry up to and
including the radius predicate is 64-bit integer arithmetic — engines may
fuse double multiply-adds differently (FMA), but integers are exact
everywhere. The one double op, sqrt of an identical integer, is correctly
rounded on both engines, so even the returned distance is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query, table

# Deterministic planar points: centi-unit integers in [0, 100000).
_XC = "({k} * 7919) % 100000"
_YC = "({k} * 104729) % 100000"


@query(
    "geo_radius_join",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, {_XC.format(k="c_custkey")} AS x,
             {_YC.format(k="c_custkey")} AS y
      FROM customer),
    s AS (
      SELECT s_suppkey, {_XC.format(k="s_suppkey")} AS x,
             {_YC.format(k="s_suppkey")} AS y
      FROM supplier)
    SELECT c.c_custkey, s.s_suppkey,
           sqrt((c.x - s.x) * (c.x - s.x)
                + (c.y - s.y) * (c.y - s.y)) / 100.0 AS dist
    FROM c JOIN s
      ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
         <= 6250000
    """,
)
def geo_radius_join(spark, sf):
    """Spatial radius join (customers within 25 planar units of a
    supplier site) via grid-cell bucketing: probe side lands in its exact
    cell, build side explodes to the 3×3 neighborhood, and the exact
    circle test runs on bucket-mates only — a hash equi-join on cell ids,
    never a cross join (plan-asserted). The oracle brute-forces the pair
    space; at engine scale only the linear grid join runs. This is the
    engine's mapping of the reference commons' JTS Point records."""
    from ..operators.spatial import grid_radius_join

    def points(df, key):
        return df.select(
            F.col(key),
            F.expr(_XC.format(k=key)).alias("x"),
            F.expr(_YC.format(k=key)).alias("y"),
        )

    cust = points(table(spark, sf, "customer"), "c_custkey")
    supp = points(table(spark, sf, "supplier"), "s_suppkey")
    joined = grid_radius_join(cust, supp, radius=2500)  # centi-units
    return joined.select(
        F.col("c_custkey"),
        F.col("s_suppkey"),
        (F.col("dist") / 100.0).alias("dist"),
    )


@query(
    "geo_knn_join",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, {_XC.format(k="c_custkey")} AS x,
             {_YC.format(k="c_custkey")} AS y
      FROM customer),
    s AS (
      SELECT s_suppkey, {_XC.format(k="s_suppkey")} AS x,
             {_YC.format(k="s_suppkey")} AS y
      FROM supplier),
    pairs AS (
      SELECT c.c_custkey, s.s_suppkey,
             (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS d2
      FROM c JOIN s
        ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
           <= 25000000),
    ranked AS (
      SELECT c_custkey, s_suppkey, d2,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY d2, s_suppkey) AS rn
      FROM pairs)
    SELECT c_custkey, s_suppkey, CAST(rn AS BIGINT) AS rank,
           sqrt(d2) / 100.0 AS dist
    FROM ranked WHERE rn <= 3
    """,
)
def geo_knn_join(spark, sf):
    """Bounded-radius k-nearest-neighbor join: each customer's 3 closest
    supplier sites within 50 planar units — grid-bucketed candidates (the
    same linear equi-join as geo_radius_join, wider cells) ranked by a
    per-customer window with a total-order tiebreak (distance, then key).
    Bounding the search radius is what keeps kNN scalable: the unbounded
    version degrades to a cross join for isolated points, while real
    pipelines always carry a 'too far is no match' cutoff."""
    from pyspark.sql import Window

    from ..operators.spatial import grid_radius_join

    def points(df, key):
        return df.select(
            F.col(key),
            F.expr(_XC.format(k=key)).alias("x"),
            F.expr(_YC.format(k=key)).alias("y"),
        )

    cust = points(table(spark, sf, "customer"), "c_custkey")
    supp = points(table(spark, sf, "supplier"), "s_suppkey")
    joined = grid_radius_join(cust, supp, radius=5000)  # centi-units
    w = Window.partitionBy("c_custkey").orderBy("dist", "s_suppkey")
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "c_custkey", "s_suppkey", "rank",
            (F.col("dist") / 100.0).alias("dist"),
        )
    )


@query(
    "geo_grid_density",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, c_acctbal, {_XC.format(k="c_custkey")} AS x,
             {_YC.format(k="c_custkey")} AS y
      FROM customer)
    SELECT x // 5000 AS cell_x, y // 5000 AS cell_y,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS sum_acctbal
    FROM c GROUP BY 1, 2
    """,
)
def geo_grid_density(spark, sf):
    """Raster aggregation (spatial binning): point density + an exact
    value sum per 50×50-unit grid cell — the heat-map / density-surface
    pass every geospatial pipeline runs before choosing finer analysis.
    ONE narrow projection (integer floor-div cell ids) + one hash
    aggregate; output is bounded by the grid (20×20 cells), independent
    of point count — the constant-size profile of a 100 TB point set.
    Integer cell arithmetic matches the oracle exactly."""
    c = table(spark, sf, "customer")
    cell = 5000
    return (
        c.select(
            F.col("c_acctbal"),
            F.expr(_XC.format(k="c_custkey")).alias("x"),
            F.expr(_YC.format(k="c_custkey")).alias("y"),
        )
        .groupBy(
            F.expr(f"x div {cell}").alias("cell_x"),
            F.expr(f"y div {cell}").alias("cell_y"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("c_acctbal").cast("decimal(25,2)"))
            .cast("double")
            .alias("sum_acctbal"),
        )
    )


@query(
    "geo_cluster_radius",
    oracle=f"""
    WITH RECURSIVE c AS (
      SELECT c_custkey, {_XC.format(k="c_custkey")} AS x,
             {_YC.format(k="c_custkey")} AS y
      FROM customer),
    pairs AS (
      SELECT a.c_custkey AS s, b.c_custkey AS t
      FROM c a JOIN c b
        ON a.c_custkey < b.c_custkey
       AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
           <= 6250000),
    edges AS (SELECT s, t FROM pairs UNION SELECT t, s FROM pairs),
    reach AS (
      SELECT s, t FROM edges
      UNION
      SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
      WHERE e.t <> r.s),
    labels AS (SELECT s AS id, LEAST(s, MIN(t)) AS cluster_id
               FROM reach GROUP BY s)
    SELECT c.c_custkey,
           COALESCE(l.cluster_id, c.c_custkey) AS cluster_id
    FROM c LEFT JOIN labels l ON l.id = c.c_custkey
    """,
)
def geo_cluster_radius(spark, sf):
    """Single-linkage spatial clustering (DBSCAN with minPts=2, all
    points core): customer sites within 25 planar units chain into one
    cluster. Pairs come from the grid-bucketed radius SELF-join (linear
    equi-join on cells, never all-pairs), components from the SAME
    min-label-propagation operator the dedup families use — one CC
    implementation serving text, embedding, and now spatial modalities.
    Isolated points keep their own id as cluster_id (left join +
    coalesce). The oracle brute-forces the pair space and closes it with
    a recursive CTE; integer-exact geometry keeps both engines
    bit-identical."""
    from ..operators.dedup import connected_components
    from ..operators.spatial import grid_radius_join

    pts = table(spark, sf, "customer").select(
        "c_custkey",
        F.expr(_XC.format(k="c_custkey")).alias("x"),
        F.expr(_YC.format(k="c_custkey")).alias("y"),
    )
    right = (
        pts.withColumnRenamed("c_custkey", "b_key")
    )
    pairs = (
        grid_radius_join(pts, right, radius=2500)
        .filter(F.col("c_custkey") < F.col("b_key"))
        .select(F.col("c_custkey").alias("id_a"), F.col("b_key").alias("id_b"))
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        labels = connected_components(pairs)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        pts.join(
            labels.withColumnRenamed("id_a", "c_custkey"),
            "c_custkey",
            "left",
        )
        .select(
            "c_custkey",
            F.coalesce("cluster_id", "c_custkey").alias("cluster_id"),
        )
    )
