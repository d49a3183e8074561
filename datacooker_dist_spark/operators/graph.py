"""Graph operators over edge DataFrames.

Connected components lives in ``operators/dedup.py`` (it grew out of the
near-dup clustering path and is shared by text and embedding dedup);
this module holds the rank-propagation family.

Reference parity: datacooker-dist has no graph operators (README.md:1-3)
— engine-extension surface per SURVEY.md §2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SCALE_PPB = 1_000_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_ppb: int = 850_000_000,
    src: str = "src",
    dst: str = "dst",
    eager: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over an (src, dst) edge DataFrame,
    computed in FIXED-POINT parts-per-billion (rank_ppb: BIGINT).

    Scale shape: each iteration is ONE shuffle — join current ranks to
    edges on src (both sides hash-partitioned on the node id, so AQE
    reuses the partitioning across iterations) followed by a hash
    aggregate on dst. The loop builds a single lazy plan (fixed K, no
    convergence test), so one action executes K join+agg stages
    back-to-back; out-degrees are computed once and re-joined each round.

    Exactness: all arithmetic is BIGINT (contribution = rank div degree;
    damping = (d_ppb · sum) div 1e9) — bit-identical on every engine and
    partitioning, unlike double rounding whose tie-break behavior differs
    between engines and COMPOUNDS over iterations (observed: 2% of nodes
    diverged by iteration 5 with round-to-9 doubles). Max intermediate is
    d_ppb · total_mass ≈ 8.5e17 < 2^63. Floor division loses < 1 ppb per
    edge per round — deterministic, identical loss in the SQL oracle.

    Dangling-node caveat: nodes without out-edges leak rank mass (the
    standard simplification); feed a bidirectionalized edge set if every
    node must keep nonzero rank.
    """
    # The edge list is consumed 2·K+2 times (every iteration's join, the
    # degree table, the node set); persist it once or the upstream edge
    # derivation re-executes per consumer. At cluster scale this is the
    # standard cached-adjacency form (MEMORY_AND_DISK spills, never OOMs).
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    base_ppb = (SCALE_PPB - damping_ppb) // n_nodes

    ranks = nodes.withColumn("rank_ppb", F.lit(SCALE_PPB // n_nodes))
    for _ in range(iterations):
        contrib = (
            ranks.join(e, ranks["node"] == e["src"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_ppb div deg").alias("_c"),
            )
        )
        ranks = contrib.groupBy("node").agg(
            (
                F.lit(base_ppb)
                + F.expr(f"({damping_ppb} * sum(_c)) div {SCALE_PPB}")
            ).alias("rank_ppb")
        )
    if eager:
        # Materialize the loop now (under the caller's current session
        # conf) and release the cached adjacency — downstream consumers
        # get the small rank table, not the 2·K-stage lineage.
        ranks = ranks.localCheckpoint()
        e.unpersist()
        deg.unpersist()
    return ranks
