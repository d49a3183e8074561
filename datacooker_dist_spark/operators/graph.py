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
    # Rejected variant (A/B-measured): folding deg INTO the persisted
    # adjacency (src, dst, deg) to drop the per-round deg join was ~5%
    # SLOWER over 6 interleaved runs (median 4.08 s vs 3.87 s at sf0.1,
    # 8 partitions) — the wider cached rows ride every round's shuffle,
    # costing more than the small-table join they replace.
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


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    strategy: str = "frontier",
) -> DataFrame:
    """Breadth-first min-hop labeling from a seed set. Two strategies:

    ``frontier`` (default, the unbounded-depth scale path): each round
    expands only the nodes discovered in the previous round (frontier ⋈
    edges, then anti-join against the visited set), not the whole
    visited set — the full-relaxation alternative re-joins every settled
    node every round, which at 100 TB multiplies shuffle volume by the
    diameter. Each round localCheckpoints the (small) frontier so the
    lineage stays flat instead of compounding K joins deep; the cost is
    one driver-synchronized round (2-3 jobs) per hop.

    ``unrolled`` (the small-fixed-K path): builds all K levels as ONE
    declarative plan — level_k = distinct(level_{k-1} ⋈ edges) — closed
    by a min-hops aggregate, and lets Catalyst run it as a single job
    with no checkpoints, no isEmpty probes, no driver round-trips.
    Levels re-include already-settled nodes (the per-level distinct
    bounds each level at the reachable-node count), so prefer it only
    when K is small and the reachable set per level is not huge;
    measured at K=3 it halves the frontier loop's wall clock purely by
    deleting per-round job overhead.

    Returns (node, hops) for everything reachable within ``max_hops``;
    ``hops`` is exact min-distance under either strategy (BFS settles a
    node the first level it appears, and the unrolled aggregate takes
    the min over levels).
    """
    if strategy == "unrolled":
        e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        level = seeds.select(F.col(node).alias("node")).distinct()
        tagged = [level.withColumn("hops", F.lit(0))]
        for k in range(1, max_hops + 1):
            level = (
                level.join(e, level["node"] == e["src"])
                .select(F.col("dst").alias("node"))
                .distinct()
            )
            tagged.append(level.withColumn("hops", F.lit(k)))
        out = tagged[0]
        for t in tagged[1:]:
            out = out.unionAll(t)
        return out.groupBy("node").agg(F.min("hops").alias("hops"))
    # Each round's localCheckpoint is an action, so an unpersisted edge
    # plan would re-derive its upstream (scan + distinct) once per round
    # — persist the adjacency like the pagerank loop does.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    visited = (
        seeds.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited
    for k in range(1, max_hops + 1):
        reached = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = (
            reached.join(visited, "node", "left_anti")
            .withColumn("hops", F.lit(k))
            .localCheckpoint()
        )
        if frontier.isEmpty():
            break
        visited = visited.unionAll(frontier)
    # visited is a union of checkpointed frontiers only — safe to release.
    e.unpersist()
    return visited


def triangle_participation(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle membership counts over an UNDIRECTED edge set
    (one row per edge, endpoints in either order; self-loops and
    duplicates are removed here).

    Degree-ordered counting: orient every edge from the (degree, id)-
    smaller endpoint to the larger, enumerate wedges u→v, u→w (v before
    w in the same order), and close each wedge against the oriented edge
    v→w. Every triangle is produced exactly once. Orientation bounds the
    out-degree of any node by O(sqrt(|E|)) on skewed (power-law) graphs —
    the wedge join stays near-linear where the naive triple self-join
    explodes on hub nodes. Both joins are hash equi-joins on a node id.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # consumed by both the degree aggregate and the orientation join
        # — persist or the (possibly expensive) upstream edge derivation
        # runs twice.
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    # Orient low → high in the total order (deg, node id).
    oriented = (
        und.join(da, F.col("a") == F.col("da.n"))
        .join(db, F.col("b") == F.col("db.n"))
        .select(
            F.when(
                (F.col("da.deg") < F.col("db.deg"))
                | (
                    (F.col("da.deg") == F.col("db.deg"))
                    & (F.col("a") < F.col("b"))
                ),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
        .persist()
    )
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    # Wedges u→v, u→w (v ≠ w, both orders kept); only the order whose
    # (v, w) matches the oriented closing edge v→w survives the e3 join,
    # so each triangle is produced exactly once.
    wedges = e1.join(e2, F.col("e1.u") == F.col("e2.u")).filter(
        F.col("e1.v") != F.col("e2.v")
    )
    tri = wedges.join(
        e3,
        (F.col("e1.v") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v")),
    ).select(
        F.col("e1.u").alias("x"), F.col("e3.u").alias("y"), F.col("e3.v").alias("z")
    )
    counts = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    # Materialize now so the double/triple-consumed caches can be
    # released (the counts table is tiny: one row per triangle-member).
    counts = counts.localCheckpoint()
    oriented.unpersist()
    und.unpersist()
    return counts


def k_core(
    edges: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly remove ALL
    nodes whose degree in the current induced subgraph is < k, until a
    fixpoint — the classic cohesion filter (spam/bot subgraph mining,
    community cores, nucleus extraction) the rank-propagation family
    doesn't cover. Expects a bidirectionalized edge set (every undirected
    edge present in both orientations, as :func:`pagerank` documents).

    Scale shape: each round is two semi-joins of the persisted adjacency
    against the (shrinking) survivor set + one hash aggregate on the
    node id — shuffle is O(surviving edges), and the survivor table the
    round hands forward is O(nodes). Rounds are driver-synchronized on
    the survivor count (the fixpoint test), with survivor tables run
    through a :class:`~..functions.checkpoints.CheckpointChain` so the
    loop holds at most two generations of blocks — the same bounded-
    storage discipline as the CC finisher and BPE trainer. Peeling is
    monotone (survivors only shrink), so it terminates in ≤ |V| rounds;
    ``max_rounds`` is a loud backstop against a caller bug, not a
    convergence knob. Simultaneous (not sequential) removal per round —
    the standard parallel peeling semantics, which an unrolled SQL
    oracle replays round-for-round.

    Output: (node, core_deg) for nodes in the k-core, where core_deg is
    the node's degree within the final induced subgraph (≥ k by
    construction).
    """
    from ..functions.checkpoints import CheckpointChain

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    chain = CheckpointChain(keep=1)
    surv = chain.checkpoint(e.select(F.col("src").alias("node")).distinct())
    prev = surv.count()
    for _ in range(max_rounds):
        deg = (
            e.join(surv.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(surv.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("core_deg"))
            .filter(F.col("core_deg") >= k)
        )
        deg = chain.checkpoint(deg)
        n = deg.count()
        surv = deg.select(F.col("src").alias("node"))
        if n == prev:
            e.unpersist()
            chain_out = deg.select(
                F.col("src").alias("node"), F.col("core_deg")
            )
            return chain_out
        prev = n
    e.unpersist()
    raise RuntimeError(
        f"k_core did not reach a fixpoint within max_rounds={max_rounds} "
        "(peeling is monotone, so this indicates a caller bug — e.g. a "
        "non-deterministic edge source re-sampling per round)"
    )
