"""Graph suite entries: iterative rank propagation over a derived trade
graph, oracle-checked by unrolling the iterations into chained SQL CTEs
(recursive CTEs can't aggregate in the recursive term, so the oracle
unrolls — same math, K copies).

Cross-engine discipline: ranks are fixed-point BIGINT parts-per-billion;
every operation is integer (floor division for contribution and damping)
so both engines agree bit-for-bit — double rounding's tie-break behavior
differs between engines and compounds over iterations (~2% of nodes by
round 5 when this used round-to-9 doubles).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query, table

_ITERS = 5
_DAMP_PPB = 850_000_000
_SCALE_PPB = 1_000_000_000

_GRAPH_PRELUDE = f"""
WITH pairs AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey + 1000000 AS s
  FROM lineitem),
edges AS (SELECT p AS src, s AS dst FROM pairs
          UNION ALL SELECT s AS src, p AS dst FROM pairs),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT node FROM (SELECT src AS node FROM edges
                            UNION SELECT dst AS node FROM edges)),
nn AS (SELECT COUNT(*) AS n FROM nodes),
it0 AS (SELECT node, {_SCALE_PPB} // (SELECT n FROM nn) AS rank_ppb
        FROM nodes)"""


def _pagerank_oracle(iters: int) -> str:
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""
it{k} AS (
  SELECT e.dst AS node,
         ({_SCALE_PPB} - {_DAMP_PPB}) // (SELECT n FROM nn)
           + ({_DAMP_PPB} * SUM(r.rank_ppb // d.deg)) // {_SCALE_PPB}
           AS rank_ppb
  FROM it{k - 1} r
  JOIN edges e ON e.src = r.node
  JOIN deg d ON d.src = r.node
  GROUP BY e.dst)""")
    return (
        _GRAPH_PRELUDE + "," + ",".join(steps)
        + f"\nSELECT node, CAST(rank_ppb AS BIGINT) AS rank_ppb FROM it{iters}"
    )


@query("graph_pagerank", oracle=_pagerank_oracle(_ITERS))
def graph_pagerank(spark, sf):
    """PageRank (5 fixed iterations, damping 0.85, fixed-point ppb ranks)
    over the bidirectional part↔supplier trade graph (one distinct pass
    over lineitem, no join; supplier ids offset by 1e6 to disjoin the id
    spaces; bidirectional edges avoid dangling-node mass leaks). Each
    iteration is one join + one hash aggregate on the node id — the whole
    K-round loop is a single lazy plan over the persisted adjacency.
    Shuffle partitions scoped to the ~1.2M-edge graph (8 beats 32: less
    per-stage scheduling across the 12-stage loop). The oracle unrolls
    the same five integer-arithmetic rounds as chained CTEs."""
    from ..operators.graph import pagerank

    li = table(spark, sf, "lineitem")
    pairs = li.select(
        F.col("l_partkey").alias("p"),
        (F.col("l_suppkey") + 1000000).alias("s"),
    ).distinct()
    edges = pairs.select(
        F.col("p").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("p").alias("dst")))
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        # eager: the loop executes NOW, while the scoped partition count
        # is in force (a lazy return would run under the caller's restored
        # conf), and the operator releases its cached adjacency.
        return pagerank(
            edges, iterations=_ITERS, damping_ppb=_DAMP_PPB, eager=True
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
