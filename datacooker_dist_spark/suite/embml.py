"""Round-4d suite wave: embedding-centric ML data operators — contrastive
hard-negative mining, k-NN label voting (embedding-quality probe), MMR
diversified re-ranking, and the composed entity-resolution pipeline
(blocking → fuzzy match → connected components → golden record).

Scale posture: every corpus-sized pass is a single linear scan against a
broadcast bounded query/anchor set (the `cosine_topk` shape); per-query
work after the bound is tiny. The MMR greedy loop — sequential in k but
independent across queries — runs as an Arrow-batched ``applyInPandas``
over ≤ shortlist rows per query. Entity resolution reuses the blocked
fuzzy join (block-quadratic, never corpus-quadratic) and the union-find
filtering connected-components operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query, table
from ..operators import similarity as S

# ---------------------------------------------------------------------------
# mine_hard_negatives
# ---------------------------------------------------------------------------

_HN_ANCHORS = 20
_HN_K = 3


@query(
    "mine_hard_negatives",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, label AS query_label,
               CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < {_HN_ANCHORS}
    ),
    c AS (
        SELECT vec_id AS neighbor_id, label AS neighbor_label,
               CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings
    ),
    s AS (
        SELECT query_id, query_label, neighbor_id, neighbor_label,
               round(list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(cv, cv))), 6) AS cosine
        FROM q CROSS JOIN c
        WHERE query_id <> neighbor_id AND query_label <> neighbor_label
    ),
    r AS (
        SELECT query_id, query_label, neighbor_id, neighbor_label, cosine,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
        FROM s
    )
    SELECT query_id, query_label, neighbor_id, neighbor_label, rnk, cosine
    FROM r WHERE rnk <= {_HN_K}
    """,
)
def mine_hard_negatives(spark, sf):
    """Contrastive hard negatives: per anchor, the top-3 most-similar
    vectors with a DIFFERENT label — near-miss negatives are the ones
    that carry training signal. One linear corpus scan against the
    broadcast 20-anchor set; the label-mismatch predicate rides the join
    so same-label rows never reach the scorer."""
    emb = table(spark, sf, "embeddings")
    return S.mine_hard_negatives(
        emb, emb.filter(F.col("vec_id") < _HN_ANCHORS), k=_HN_K
    )


# ---------------------------------------------------------------------------
# knn_label_vote
# ---------------------------------------------------------------------------

_KNN_QUERIES = 50
_KNN_K = 5


@query(
    "knn_label_vote",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, label AS true_label,
               CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < {_KNN_QUERIES}
    ),
    c AS (
        SELECT vec_id AS neighbor_id, label AS neighbor_label,
               CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings
    ),
    s AS (
        SELECT query_id, true_label, neighbor_id, neighbor_label,
               round(list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(cv, cv))), 6) AS cosine
        FROM q CROSS JOIN c WHERE query_id <> neighbor_id
    ),
    r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM s
    ),
    votes AS (
        SELECT query_id, true_label, neighbor_label,
               COUNT(*) AS votes
        FROM r WHERE rnk <= {_KNN_K}
        GROUP BY query_id, true_label, neighbor_label
    ),
    best AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY votes DESC, neighbor_label) AS vr
        FROM votes
    )
    SELECT query_id, true_label,
           neighbor_label AS predicted_label,
           CAST(votes AS BIGINT) AS n_votes,
           neighbor_label = true_label AS correct
    FROM best WHERE vr = 1
    """,
)
def knn_label_vote(spark, sf):
    """k-NN majority-vote label prediction over 50 labeled queries — the
    leave-one-out probe that measures whether an embedding space
    separates its classes. Modal neighbor label with a smallest-label
    tiebreak (min(struct(-votes, label)) ≡ the oracle's votes DESC,
    label ASC rank)."""
    emb = table(spark, sf, "embeddings")
    return S.knn_label_vote(
        emb, emb.filter(F.col("vec_id") < _KNN_QUERIES), k=_KNN_K
    )


# ---------------------------------------------------------------------------
# similarity_topk_mmr (rows-only: greedy selection is not SQL-expressible)
# ---------------------------------------------------------------------------


@query("similarity_topk_mmr")  # rows-only: sequential greedy re-rank
def similarity_topk_mmr(spark, sf):
    """MMR diversified top-5 from each query's 20-candidate shortlist:
    λ·relevance − (1−λ)·max-sim-to-selected, greedy. The corpus-sized
    work is the one exact shortlist pass; the greedy loop runs per query
    group in Arrow-batched pandas (≤20 rows each, parallel across
    queries). Deterministic: 6-digit score grid with id tiebreaks at
    every pick — rows-only because greedy selection has no closed SQL
    form, but the output is bit-stable across engines/partitionings
    (asserted by the determinism suite)."""
    emb = table(spark, sf, "embeddings")
    return S.mmr_rerank(
        emb, emb.filter(F.col("vec_id") < 10), dim=64, k=5,
        shortlist=20, lambda_=0.7,
    )


# ---------------------------------------------------------------------------
# pipeline_entity_resolution
# ---------------------------------------------------------------------------


@query(
    "pipeline_entity_resolution",
    oracle="""
    WITH p AS (
      SELECT p_partkey, lower(trim(p_name)) AS nm,
             split_part(p_name, ' ', 1) AS w1, p_size
      FROM part),
    t AS (
      SELECT p_partkey, w1, p_size,
             CASE WHEN len(nm) >= 3
                  THEN list_distinct(list_transform(
                         range(1, len(nm) - 1), i -> nm[i:i+2]))
                  ELSE [] END AS tg
      FROM p),
    matches AS (
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
      FROM t a JOIN t b
        ON a.w1 = b.w1 AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
      WHERE round(len(list_intersect(a.tg, b.tg)) * 1.0
                  / (len(a.tg) + len(b.tg)
                     - len(list_intersect(a.tg, b.tg))), 6) >= 0.7),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM matches
      UNION ALL SELECT id_b, id_a FROM matches),
    reach AS (
      WITH RECURSIVE rr(u, v) AS (
        SELECT p_partkey, p_partkey FROM part
        UNION
        SELECT rr.u, e.v FROM rr JOIN edges e ON e.u = rr.v
      ) SELECT u, MIN(v) AS root FROM rr GROUP BY u)
    SELECT r.root AS entity_id,
           pr.p_name AS canonical_name,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           round(CAST(SUM(CAST(pp.p_retailprice AS DECIMAL(25,2)))
                 AS DOUBLE), 2) AS total_retail
    FROM reach r
    JOIN part pp ON pp.p_partkey = r.u
    JOIN part pr ON pr.p_partkey = r.root
    GROUP BY r.root, pr.p_name
    """,
)
def pipeline_entity_resolution(spark, sf):
    """The full entity-resolution pipeline composed from the engine's own
    stages: (1) blocking + trigram-Jaccard fuzzy matching over part names
    (block-quadratic candidates, the ``join_fuzzy_blocked`` operator),
    (2) union-find-filtering connected components over the match graph
    (min-id cluster labels, singletons kept), (3) golden-record rollup per
    entity — canonical name from the min-id representative, member count,
    decimal-exact value total. The oracle replays matching exactly and
    closes the clusters with a recursive min-label CTE — feasible because
    the match graph is a tiny fraction of the table; the Spark side's CC
    operator is the corpus-scale path."""
    from ..operators.dedup import blocked_fuzzy_join, connected_components

    p = table(spark, sf, "part")
    pk = p.select(
        "p_partkey", "p_name", "p_size",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("w1"),
    )
    matches = blocked_fuzzy_join(
        pk, pk, name_col="p_name", block_cols=["w1", "p_size"],
        threshold=0.7, id_col="p_partkey",
    ).select("id_a", "id_b")
    labels = connected_components(matches)
    # Singletons: parts not in any match edge resolve to themselves.
    resolved = (
        p.join(
            labels.withColumnRenamed("id_a", "p_partkey"), "p_partkey", "left"
        )
        .withColumn("entity_id", F.coalesce("cluster_id", "p_partkey"))
    )
    canon = p.select(
        F.col("p_partkey").alias("entity_id"),
        F.col("p_name").alias("canonical_name"),
    )
    return (
        resolved.groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.round(
                F.sum(F.col("p_retailprice").cast("decimal(25,2)"))
                .cast("double"),
                2,
            ).alias("total_retail"),
        )
        .join(canon, "entity_id")
        .select("entity_id", "canonical_name", "n_members", "total_retail")
    )


# ---------------------------------------------------------------------------
# embedding_pca_loadings (round 5)
# ---------------------------------------------------------------------------

_EPCA_DIM = 64
_EPCA_ITERS = 2
_EPCA_SUM_DEC = "DECIMAL(25,12)"
_EPCA_DEC = "DECIMAL(15,6)"


def _epca_oracle() -> str:
    d, it = _EPCA_DIM, _EPCA_ITERS
    ctes = [
        f"""e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""",
        f"""n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM e)""",
        f"""m AS (SELECT u.i AS i,
                  CAST(SUM(CAST(v[CAST(u.i AS INT)] AS {_EPCA_SUM_DEC}))
                       AS DOUBLE) AS s
            FROM e, unnest(range(1, {d + 1})) u(i) GROUP BY u.i)""",
        f"""p AS (SELECT u.i AS i, w.j AS j,
                  CAST(SUM(CAST(v[CAST(u.i AS INT)] * v[CAST(w.j AS INT)]
                                AS {_EPCA_SUM_DEC})) AS DOUBLE) AS sp
            FROM e, unnest(range(1, {d + 1})) u(i),
                 unnest(range(1, {d + 1})) w(j)
            WHERE w.j >= u.i GROUP BY u.i, w.j)""",
        f"""cu AS (SELECT p.i, p.j,
                   CAST(round(p.sp / n.n - (mi.s / n.n) * (mj.s / n.n), 6)
                        AS {_EPCA_DEC}) AS c
            FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j
            CROSS JOIN n)""",
        """cf AS (SELECT i, j, c FROM cu
            UNION ALL SELECT j AS i, i AS j, c FROM cu WHERE i <> j)""",
        f"""v0 AS (SELECT u.i AS i, CAST(1 AS {_EPCA_DEC}) AS val
            FROM unnest(range(1, {d + 1})) u(i))""",
    ]
    for t in range(1, it + 1):
        ctes.append(
            f"""v{t} AS (SELECT cf.i,
                   CAST(round(CAST(SUM(cf.c * v{t-1}.val) AS DOUBLE), 6)
                        AS {_EPCA_DEC}) AS val
            FROM cf JOIN v{t-1} ON v{t-1}.i = cf.j GROUP BY cf.i)"""
        )
    return f"""
    WITH {', '.join(ctes)}
    SELECT CAST(i AS BIGINT) AS dim_index,
           round(CAST(val AS DOUBLE)
                 / sqrt(CAST((SELECT SUM(val * val) FROM v{it}) AS DOUBLE)),
                 6) AS loading
    FROM v{it}
    """


@query("embedding_pca_loadings", oracle=_epca_oracle())
def embedding_pca_loadings(spark, sf):
    """First principal direction of the 64-dim embedding corpus by FULLY
    DISTRIBUTED power iteration — no driver math at any width. The
    covariance's 2080 upper-triangle moment sums come from ONE
    Arrow-batched numpy pass (``mapInArrow``): each partition reduces
    its rows to 2080 int64 partials on the 1e-12 grid (vectorized
    row-chunked products; int64 addition is exact and order-free), and
    partials merge as DECIMAL so the cross-partition sum can never
    overflow at corpus scale — 2080 longs per partition on the wire,
    nothing else. Measured 9× over the expression-tree pair explode
    (interpreted HOFs, VERDICT r03's known cost class) at sf0.1. The
    64x64 matrix and the 64-row iterate live as DataFrames; each
    iteration is an equi-join + exact-decimal hash aggregate — the
    shape that scales to any dimensionality a covariance fits at.
    Determinism: covariance entries and every iterate re-round to the
    1e-6 DECIMAL grid, so no float-sum order or FMA fusion can drift;
    one final double sqrt/divide for the normalization, rounded 6.
    Output: (dim_index, loading) — 64 rows."""
    emb = table(spark, sf, "embeddings")
    d = _EPCA_DIM
    e = emb.select(
        F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    n = e.agg(F.count(F.lit(1)).cast("double").alias("n"))
    m = (
        e.select(F.posexplode("v").alias("i0", "x"))
        .groupBy("i0")
        .agg(F.sum(F.col("x").cast(_EPCA_SUM_DEC)).cast("double").alias("s"))
        .select((F.col("i0") + 1).alias("i"), "s")
    )
    # Python-int accumulators + per-chunk guarded int64 sums (the
    # exact_comoments pattern; r07 factored the shared core into
    # functions.scalars.triangle_moment_partials): an int64 running acc
    # silently wraps past ~9e6 rows/partition at the 1e12 grid scale,
    # and the partial itself ships as DECIMAL(38,0) so no partition
    # total can overflow regardless of magnitude. Row-chunked
    # upper-triangle products: chunk × 2080 doubles (~17 MB at 1024
    # rows) — never the full chunk × d × d cube. Indices are 1-based
    # to join the SQL oracle's unnest(range(1, d+1)).
    from ..functions.scalars import triangle_moment_partials

    p = (
        emb.select("embedding")
        .mapInArrow(
            triangle_moment_partials("embedding", d, one_based=True),
            "i int, j int, pl decimal(38,0)",
        )
        .groupBy("i", "j")
        .agg(
            (F.sum(F.col("pl").cast("decimal(38,0)")) / F.lit(10.0 ** 12))
            .cast("double")
            .alias("sp")
        )
    )
    mi = m.select(F.col("i").alias("_mi"), F.col("s").alias("si"))
    mj = m.select(F.col("i").alias("_mj"), F.col("s").alias("sj"))
    cu = (
        p.join(F.broadcast(mi), p.i == mi._mi)
        .join(F.broadcast(mj), p.j == mj._mj)
        .join(F.broadcast(n))
        .select(
            "i", "j",
            F.round(
                F.col("sp") / F.col("n")
                - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n")),
                6,
            ).cast(_EPCA_DEC).alias("c"),
        )
    )
    cf = cu.unionByName(
        cu.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "c"
        )
    ).localCheckpoint()
    v = (
        cf.sparkSession.range(1, d + 1)
        .select(F.col("id").alias("i"), F.lit(1).cast(_EPCA_DEC).alias("val"))
    )
    for _ in range(_EPCA_ITERS):
        v = (
            cf.join(F.broadcast(v.withColumnRenamed("i", "j")), "j")
            .groupBy("i")
            .agg(
                F.round(F.sum(F.col("c") * F.col("val")).cast("double"), 6)
                .cast(_EPCA_DEC)
                .alias("val")
            )
        )
    norm = v.agg(
        F.sum(F.col("val") * F.col("val")).cast("double").alias("n2")
    )
    return (
        v.join(F.broadcast(norm))
        .select(
            F.col("i").cast("long").alias("dim_index"),
            F.round(
                F.col("val").cast("double") / F.sqrt(F.col("n2")), 6
            ).alias("loading"),
        )
    )
