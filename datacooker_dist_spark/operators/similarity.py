"""Similarity search over embedding columns (build plan M4).

Embeddings are plain ``array<float>`` columns; all vector math runs JVM-side
via ``F.zip_with``/``F.aggregate`` (whole-stage codegen) — no Python in the
hot path, no pyspark.ml Vector conversion.

Two paths:
- ``cosine_topk``      brute-force exact baseline: queries × corpus, bounded
                       because the query set is small (broadcast).
- ``cosine_topk_lsh``  scale path: random-hyperplane LSH buckets prune the
                       corpus before scoring — candidate generation is an
                       equi-join on bucket signature, linear shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_expr(a, b):
    """Cosine similarity of two array<double> columns, JVM-side."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double_array(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The (small) query side is broadcast, so the corpus never shuffles for the
    join; per-query ranking then shuffles only (query_id, candidate score)
    pairs. Scores are computed in double and optionally rounded before the
    deterministic (score desc, id asc) ranking so results are stable across
    engines and partitionings. Self-matches are excluded.
    Output: (query_id, neighbor_id, rnk, cosine).
    """
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("_cv")
    )
    cos = cosine_expr(F.col("_qv"), F.col("_cv"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = (
        c.join(F.broadcast(q), on=F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def hyperplane_signature(vec_col, dim: int, planes: int = 16, seed: int = 42):
    """Random-hyperplane (sign) LSH signature as a bit-packed long.

    Deterministic pseudo-random plane weights come from a hash of
    (plane, dim_index) — identical on every executor with zero broadcast
    state. sign(v·r_p) per plane → packed bits.
    """
    import math

    bits = []
    for p in range(planes):
        # Fixed per-(plane, i) weights in [-1, 1): derived from a splitmix-ish
        # integer mix so the literal plan stays compact and deterministic.
        weights = []
        for i in range(dim):
            h = (p * 1_000_003 + i * 97 + seed) & 0xFFFFFFFF
            h = (h ^ (h >> 16)) * 0x45D9F3B & 0xFFFFFFFF
            h = (h ^ (h >> 16)) * 0x45D9F3B & 0xFFFFFFFF
            h = h ^ (h >> 16)
            weights.append((h / 2**31) - 1.0)
        norm = math.sqrt(sum(w * w for w in weights)) or 1.0
        warr = F.array(*[F.lit(w / norm) for w in weights])
        dot = _dot(vec_col, warr)
        bits.append(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 12,
    tables: int = 4,
    round_digits: int | None = 6,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing an LSH bucket
    with the query in ≥1 of ``tables`` hash tables.

    At 100 TB the corpus is hashed once (linear scan), bucketed by
    (table, signature) — an equi-join replaces the cross join; recall is
    tuned with planes/tables.
    """
    from pyspark.sql.window import Window

    def sigs(df, ident):
        v = as_double_array(vec_col)
        return df.select(
            F.col(id_col).alias(ident),
            v.alias(f"_{ident}_v"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table"),
                            hyperplane_signature(v, dim, planes, seed=42 + t).alias("sig"),
                        )
                        for t in range(tables)
                    ]
                )
            ).alias("_s"),
        ).select(ident, f"_{ident}_v", "_s.table", "_s.sig")

    qs = sigs(queries, "query_id")
    cs = sigs(corpus, "neighbor_id")
    cand = (
        cs.join(F.broadcast(qs), on=["table", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "_query_id_v", "_neighbor_id_v")
        .distinct()
    )
    cos = cosine_expr(F.col("_query_id_v"), F.col("_neighbor_id_v"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = cand.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
