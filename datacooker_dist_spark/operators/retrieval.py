"""Lexical retrieval: inverted-index BM25 scoring.

The sparse leg of hybrid retrieval (the dense legs live in
``operators/similarity.py``). The index is three bounded artifacts built
in ONE linear corpus pass — posting lists (doc, term, tf), doc lengths
(doc, dl), and the 1-row corpus stats (N, total tokens) — all
parquet-persistable; a query probes by broadcast-joining its terms
against the postings, so per-query cost is the matched posting rows,
never the corpus. Cross-engine exactness follows the suite's
transcendental discipline: per-term idf and length-normalized
denominators round to 9 digits, score sums to 6 (see
``text_unigram_logprob`` for the rationale).

Reference parity: datacooker-dist has no query operators at all
(``README.md:1-3``); engine-extension surface (SURVEY.md §2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One linear pass → the BM25 index triple: postings (id, t, tf),
    doc lengths (id, dl), and 1-row stats (nd, tt). The aggregates are
    map-side-combined; at 100 TB each is the same single corpus scan any
    tokenization pays, and all three persist as parquet for cross-session
    probes (the suite's streaming twin probes them per micro-batch)."""
    from .text import tokens_col

    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("t"),
    ).filter(F.col("t") != "")
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum("dl").cast("double").alias("tt"),
    )
    return tf, dl, stats


def bm25_term_scores(
    tf: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    terms: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-(doc, term) Okapi BM25 partial scores for the given term set
    (a 1-column ``t`` DataFrame, broadcast): idf uses the +1 form (never
    negative), df comes from the matched postings themselves (one bounded
    aggregate). Output: (doc_id, t, _ts) — rows bounded by the probed
    posting lists. Rounding: idf and the length-normalized denominator to
    9 digits each, the per-term score to 9 — engine-stable inputs for a
    round-6 final sum."""
    post = tf.join(F.broadcast(terms.select("t").distinct()), "t")
    dft = post.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(
        F.log((F.col("nd") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        9,
    )
    denom = F.round(
        F.col("tf")
        + k1 * ((1.0 - b) + b * F.col("dl") / (F.col("tt") / F.col("nd"))),
        9,
    )
    tsc = F.round(idf * (F.col("tf") * (k1 + 1.0)) / denom, 9)
    return (
        post.join(F.broadcast(dft), "t")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "t", tsc.alias("_ts"))
    )


def merge_postings(
    base: tuple[DataFrame, DataFrame, DataFrame],
    batch: tuple[DataFrame, DataFrame, DataFrame],
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Incremental BM25 index maintenance (round 11, VERDICT r10 task
    2) — the lexical leg's append path, completing the standing-index
    symmetry with ``similarity_index_append``/``knn_graph_append``:
    postings MERGE BY ADDITION (the CMS/Misra-Gries mergeable posture).
    tf rows sum per (doc, term), doc lengths per doc, and the 1-row
    (nd, tt) stats add element-wise; per-term df is never stored — the
    probe re-derives it from matched postings
    (:func:`bm25_term_scores`) — so NO global statistic needs a
    corpus rescan. With disjoint doc sets (the append contract: a
    changed document is delete + re-append) the merged triple is
    VALUE-IDENTICAL to a full rebuild over base ∪ batch — integer
    counts and exact double sums — which the suite's append entry
    proves by probing the merged index against the full-rebuild
    oracle. Associative and commutative, so any number of per-batch
    partials fold in any order (the streaming twin lands one partial
    triple per micro-batch and merges at read time)."""
    tf = (
        base[0].unionByName(batch[0])
        .groupBy("doc_id", "t")
        .agg(F.sum("tf").alias("tf"))
    )
    dl = (
        base[1].unionByName(batch[1])
        .groupBy("doc_id")
        .agg(F.sum("dl").alias("dl"))
    )
    stats = base[2].unionByName(batch[2]).agg(
        F.sum("nd").alias("nd"), F.sum("tt").alias("tt")
    )
    return tf, dl, stats


def token_sign_embeddings(
    tokens: DataFrame, dim: int = 16, token_col: str = "t"
) -> DataFrame:
    """Deterministic per-token ±1 sign embeddings from md5 hex digits —
    the multi-vector leg's token encoder. Dimension j ∈ 1..dim reads the
    j-th hex digit of md5(token): digits 0-7 (ascii ≤ 55) → +1.0, else
    −1.0 (dim ≤ 32, one digit each). Every vector has identical norm
    √dim, so dot/dim IS the cosine, and with dim a power of two every
    similarity is an exact dyadic rational — bit-reproducible in any
    engine, no transcendental ever enters a score. A trained encoder
    (ColBERT-style) drops in by replacing this one projection; the
    retrieval algebra downstream is encoder-agnostic."""
    if not 1 <= dim <= 32:
        # md5 yields 32 hex digits; past them substring returns '' and
        # every token would share a constant sign — silently degenerate.
        raise ValueError(f"dim must be in 1..32, got {dim}")
    h = F.md5(F.col(token_col))
    v = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: F.when(
            F.ascii(F.substring(h, j, F.lit(1))) <= 55, F.lit(1.0)
        ).otherwise(F.lit(-1.0)),
    )
    return tokens.select(F.col(token_col).alias("t"), v.alias("v"))


def maxsim_topk(
    doc_tokens: DataFrame,
    qtokens: DataFrame,
    k: int = 5,
    dim: int = 16,
    exclude_self: bool = False,
) -> DataFrame:
    """Late-interaction (ColBERT-style MaxSim) top-k retrieval — the
    multi-vector third leg of the hybrid stack beside BM25 and pooled
    dense cosine: score(q, d) = Σ_{qt ∈ q} max_{dt ∈ d} cos(qt, dt),
    each token encoded by :func:`token_sign_embeddings`.

    Inputs: ``doc_tokens`` (doc_id, t) — duplicates allowed, max makes
    them free; ``qtokens`` (qid, t). Plan shape: per-token cosines are
    computed once per DISTINCT (query_token, vocab_token) pair — the
    tiny query-token frame broadcasts against the distinct-token vocab
    (a BroadcastNestedLoopJoin over the VOCAB, never the corpus), the
    dot is a codegen'd zip_with/aggregate, and the corpus only ever
    joins by hash EQUI-join on the token — so corpus-side cost is one
    pass over the token rows regardless of vocabulary math. Two
    aggregates finish it: max per (qid, query_token, doc), sum per
    (qid, doc), then a per-query top-k window (WindowGroupLimit — no
    global sort). Exactness: cos = dot/dim with dim a power of two and
    ±1 entries — every score and every ≤|q|-term sum is an exact dyadic
    rational, identical in any engine without rounding. At 100 TB the
    exact form is one corpus-token-scan per query batch; the scale path
    swaps the vocab-sim stage for per-token ANN over the same algebra.
    Output: (qid, doc_id, maxsim, rnk ≤ k)."""
    from pyspark.sql import Window

    toks = doc_tokens.select("doc_id", "t").distinct()
    vocab_emb = token_sign_embeddings(toks.select("t").distinct(), dim=dim)
    q_emb = (
        qtokens.select("qid", "t").distinct()
        .join(token_sign_embeddings(
            qtokens.select("t").distinct(), dim=dim
        ), "t")
        .select("qid", F.col("t").alias("qt"), F.col("v").alias("qv"))
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sims = vocab_emb.crossJoin(F.broadcast(q_emb)).select(
        "qid", "qt", "t", (dot / dim).alias("_sim")
    )
    per_qt = (
        toks.join(sims, "t")
        .groupBy("qid", "qt", "doc_id")
        .agg(F.max("_sim").alias("_mx"))
    )
    sc = per_qt.groupBy("qid", "doc_id").agg(
        F.sum("_mx").alias("maxsim")
    )
    if exclude_self:
        sc = sc.filter(F.col("doc_id") != F.col("qid"))
    w = Window.partitionBy("qid").orderBy(F.desc("maxsim"), "doc_id")
    return sc.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def bm25_topk(
    tf: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    k: int = 5,
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k BM25 retrieval for a (qid, t) query-term table: term scores
    from :func:`bm25_term_scores` sum per (qid, doc) (round 6) and rank
    with a doc_id tiebreak. The rank-filtered window executes as
    WindowGroupLimit (map-side partial top-k per query before the
    exchange) — no global sort. ``exclude_self`` drops doc_id == qid for
    more-like-this queries. Duplicate (qid, t) rows are deduped here —
    a repeated query term must not double its partial score.
    Output: (qid, doc_id, bm25, rnk ≤ k)."""
    from pyspark.sql import Window

    qterms = qterms.select("qid", "t").distinct()
    scored = bm25_term_scores(tf, dl, stats, qterms.select("t"))
    per_q = scored.join(F.broadcast(qterms), "t")
    if exclude_self:
        per_q = per_q.filter(F.col("doc_id") != F.col("qid"))
    sc = per_q.groupBy("qid", "doc_id").agg(
        F.round(F.sum("_ts"), 6).alias("bm25")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("bm25"), "doc_id")
    return sc.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
