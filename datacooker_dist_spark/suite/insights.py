"""Round-4b suite wave: corpus/text statistics (PMI collocations), data
profiling (functional dependencies), privacy (l-diversity), sequence and
interval analytics (paths, order streaks, interval coalescing), statistics
(correlation matrix) and multi-objective selection (2-D skyline).

Every query here is exact-oracled against DuckDB and plan-safe at corpus
scale: aggregates are hash aggregates, windows are partitioned by a
grouping key (never a global single-partition sort), and the one
non-equi join (skyline dominance) runs only on a provably pruned,
broadcastable survivor set.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import query, read_parquet_or_empty, scratch_dir, table

# ---------------------------------------------------------------------------
# text_collocations_pmi
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOPK = 20


@query(
    "text_collocations_pmi",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           x -> x <> '') AS t
        FROM documents
    ),
    bigrams AS (
        SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS bg
        FROM toks
    ),
    unigrams AS (
        SELECT unnest(t) AS w FROM toks
    ),
    bg_counts AS (
        SELECT bg, COUNT(*) AS c_ab FROM bigrams GROUP BY bg
    ),
    uni_counts AS (
        SELECT w, COUNT(*) AS c_w FROM unigrams GROUP BY w
    ),
    n_uni AS (SELECT COUNT(*) AS n FROM unigrams),
    n_bi AS (SELECT COUNT(*) AS n FROM bigrams),
    scored AS (
        SELECT string_split(b.bg, ' ')[1] AS w1,
               string_split(b.bg, ' ')[2] AS w2,
               b.c_ab,
               round(ln((b.c_ab / nb.n) /
                        ((u1.c_w / nu.n) * (u2.c_w / nu.n))), 6) AS pmi
        FROM bg_counts b
        JOIN uni_counts u1 ON u1.w = string_split(b.bg, ' ')[1]
        JOIN uni_counts u2 ON u2.w = string_split(b.bg, ' ')[2]
        CROSS JOIN n_uni nu CROSS JOIN n_bi nb
        WHERE b.c_ab >= {_PMI_MIN_COUNT}
    )
    SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab, pmi
    FROM scored
    ORDER BY pmi DESC, w1, w2
    LIMIT {_PMI_TOPK}
    """,
)
def text_collocations_pmi(spark, sf):
    """Top bigram collocations by pointwise mutual information:
    ``pmi = ln(p(w1 w2) / (p(w1) p(w2)))`` with a min-count floor.

    Scale shape: the unigram and bigram hash aggregates each scan the
    tokenized corpus once; the two corpus totals are SUMS OVER THE
    COUNT TABLES (vocabulary-sized re-aggregates whose exchanges Spark
    reuses from the count aggregates — no third/fourth corpus pass and
    no persist pinning token arrays for the session, ADVICE r04),
    broadcast back as scalar joins; the bigram→unigram count joins are
    equi-joins on the word (vocabulary-sized after the min-count
    filter); the final top-k is TakeOrdered. Nothing sorts the corpus
    globally and no per-row Python runs."""
    docs = table(spark, sf, "documents")
    toks = docs.select(
        F.filter(
            F.split(F.lower("text"), "[^a-z]+"), lambda x: x != ""
        ).alias("t")
    )
    uni = toks.select(F.explode("t").alias("w"))
    # Guard size(t) < 2: sequence(0, -1) would count DOWN in Spark
    # (inferred negative step), indexing t[-1] — emit no bigrams instead.
    bi = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN "
                "transform(sequence(0, size(t) - 2), "
                "i -> struct(t[i] AS w1, t[i + 1] AS w2)) "
                "ELSE array() END"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    uni_counts = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    bg_all = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    bg_counts = bg_all.filter(F.col("c_ab") >= _PMI_MIN_COUNT)
    # Totals from the count tables: Σc_w ≡ |unigram occurrences| and
    # Σc_ab (pre-filter) ≡ |bigram occurrences|; each reuses its count
    # aggregate's exchange instead of rescanning the corpus.
    n_uni = uni_counts.agg(F.sum("c_w").alias("n_u"))
    n_bi = bg_all.agg(F.sum("c_ab").alias("n_b"))
    scored = (
        bg_counts.join(
            uni_counts.withColumnRenamed("w", "w1")
            .withColumnRenamed("c_w", "c_w1"),
            "w1",
        )
        .join(
            uni_counts.withColumnRenamed("w", "w2")
            .withColumnRenamed("c_w", "c_w2"),
            "w2",
        )
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_bi))
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("n_b"))
                    / ((F.col("c_w1") / F.col("n_u"))
                       * (F.col("c_w2") / F.col("n_u")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(_PMI_TOPK)


# ---------------------------------------------------------------------------
# window_gaps_islands
# ---------------------------------------------------------------------------


@query(
    "window_gaps_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d
        FROM orders
    ),
    grouped AS (
        SELECT o_custkey, d,
               d - CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey ORDER BY d) AS INTEGER) AS grp
        FROM days
    ),
    islands AS (
        SELECT o_custkey, grp, CAST(COUNT(*) AS BIGINT) AS streak_len,
               MIN(d) AS streak_start
        FROM grouped GROUP BY o_custkey, grp
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           MAX(streak_len) AS longest_streak,
           MIN(streak_start) AS first_active_day
    FROM islands
    GROUP BY o_custkey
    HAVING MAX(streak_len) >= 2
    """,
)
def window_gaps_islands(spark, sf):
    """Gaps-and-islands: consecutive-order-day streaks per customer via
    the classic ``date - row_number()`` island key.

    Single-shuffle plan: ``dense_rank`` (not distinct + row_number)
    makes the island key duplicate-tolerant — same-day repeat orders get
    the same rank, so no separate de-dup exchange is needed; the one
    customer hash exchange feeding the window also satisfies both
    follow-on aggregates (subset-key clustering), which count distinct
    days per island instead. Plan-pinned to exactly one hash exchange."""
    o = table(spark, sf, "orders")
    days = o.select("o_custkey", F.to_date("o_orderdate").alias("d"))
    w = Window.partitionBy("o_custkey").orderBy("d")
    grouped = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.dense_rank().over(w))
    )
    islands = grouped.groupBy("o_custkey", "grp").agg(
        F.countDistinct("d").alias("streak_len"),
        F.min("d").alias("streak_start"),
    )
    return (
        islands.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("streak_len").alias("longest_streak"),
            F.min("streak_start").alias("first_active_day"),
        )
        .filter(F.col("longest_streak") >= 2)
    )


# ---------------------------------------------------------------------------
# interval_merge_overlaps
# ---------------------------------------------------------------------------

_INTERVAL_DAYS = 7


@query(
    "interval_merge_overlaps",
    oracle=f"""
    WITH iv AS (
        SELECT o_custkey,
               CAST(o_orderdate AS DATE) AS s,
               CAST(o_orderdate AS DATE) + {_INTERVAL_DAYS} AS e
        FROM orders
    ),
    flagged AS (
        SELECT o_custkey, s, e,
               CASE WHEN s <= MAX(e) OVER (
                        PARTITION BY o_custkey ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 0 ELSE 1 END AS is_new
        FROM iv
    ),
    numbered AS (
        SELECT o_custkey, s, e,
               SUM(is_new) OVER (
                   PARTITION BY o_custkey ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM flagged
    ),
    merged AS (
        SELECT o_custkey, island, MIN(s) AS ms, MAX(e) AS me
        FROM numbered GROUP BY o_custkey, island
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(me - ms) AS BIGINT) AS covered_days
    FROM merged
    GROUP BY o_custkey
    """,
)
def interval_merge_overlaps(spark, sf):
    """Coalesce overlapping per-customer activity intervals
    ([orderdate, orderdate+7d)) and report merged-interval count and
    total covered days — the interval-union primitive behind SLA /
    coverage / uptime rollups.

    Single-pass island construction: a running ``max(end)`` window
    partitioned by customer marks interval starts, a running sum numbers
    the islands, and a hash aggregate merges. No self-join, no global
    sort — the reference pattern for interval algebra at fact-table
    scale."""
    o = table(spark, sf, "orders")
    iv = o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("s"),
        F.date_add(F.to_date("o_orderdate"), _INTERVAL_DAYS).alias("e"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "is_new",
        F.when(F.col("s") <= F.max("e").over(w), F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    wrun = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = flagged.withColumn("island", F.sum("is_new").over(wrun))
    merged = numbered.groupBy("o_custkey", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.datediff("me", "ms")).cast("long").alias("covered_days"),
    )


# ---------------------------------------------------------------------------
# profile_fd_violations
# ---------------------------------------------------------------------------

_FD_CANDIDATES = [
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
]


def _fd_oracle() -> str:
    parts = []
    for t, lhs, rhs in _FD_CANDIDATES:
        parts.append(f"""
        SELECT '{lhs} -> {rhs}' AS fd,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(COUNT(*) FILTER (WHERE n_rhs > 1) AS BIGINT)
                   AS n_violating,
               round(COUNT(*) FILTER (WHERE n_rhs > 1) * 1.0 / COUNT(*), 6)
                   AS violation_rate
        FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS n_rhs
              FROM {t} GROUP BY {lhs})
        """)
    return " UNION ALL ".join(parts)


@query("profile_fd_violations", oracle=_fd_oracle())
def profile_fd_violations(spark, sf):
    """Functional-dependency profiling: for each candidate FD ``X → Y``
    report how many X keys map to more than one distinct Y (violation
    count + rate) — the schema-discovery / data-contract primitive.

    Each candidate costs one hash ``countDistinct`` aggregate keyed on
    the LHS (map-side partials, linear in the fact table) followed by a
    1-row summary; the per-FD rows are unioned. At 100 TB this is the
    cheapest full-fidelity shape — no sort, no join, and the reduce side
    only carries one row per distinct key."""
    outs = []
    for t, lhs, rhs in _FD_CANDIDATES:
        per_key = (
            table(spark, sf, t)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("n_rhs"))
        )
        outs.append(
            per_key.agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.count_if(F.col("n_rhs") > 1).alias("n_violating"),
                F.round(
                    F.count_if(F.col("n_rhs") > 1) / F.count(F.lit(1)), 6
                ).alias("violation_rate"),
            ).select(
                F.lit(f"{lhs} -> {rhs}").alias("fd"),
                "n_keys",
                "n_violating",
                "violation_rate",
            )
        )
    res = outs[0]
    for df in outs[1:]:
        res = res.unionByName(df)
    return res


# ---------------------------------------------------------------------------
# privacy_l_diversity
# ---------------------------------------------------------------------------


@query(
    "privacy_l_diversity",
    oracle="""
    SELECT c_mktsegment,
           c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 0
                     WHEN c_acctbal >= 10000 THEN 5
                     ELSE CAST(FLOOR(4.0 * c_acctbal / 10000) AS INTEGER) + 1
                     END) AS BIGINT) AS l_distinct,
           CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 0
                     WHEN c_acctbal >= 10000 THEN 5
                     ELSE CAST(FLOOR(4.0 * c_acctbal / 10000) AS INTEGER) + 1
                     END) < 3 AS BOOLEAN) AS below_l3
    FROM customer
    GROUP BY c_mktsegment, c_nationkey
    """,
)
def privacy_l_diversity(spark, sf):
    """l-diversity audit, the companion to ``privacy_k_anonymity``: for
    each quasi-identifier group (market segment × nation) count distinct
    values of the sensitive attribute (bucketed account balance) and
    flag groups below l=3 — groups where an attacker who locates a
    person learns their sensitive bucket almost surely.

    One hash aggregate with a distinct-count; QI-group cardinality is
    domain-bounded (segments × nations), so the reduce side is tiny no
    matter the fact volume."""
    c = table(spark, sf, "customer")
    sens = (
        F.width_bucket("c_acctbal", F.lit(0), F.lit(10000), F.lit(4))
        .cast("int")
        .alias("sens_bucket")
    )
    return (
        c.select("c_mktsegment", "c_nationkey", sens)
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("sens_bucket").alias("l_distinct"),
        )
        .withColumn("below_l3", F.col("l_distinct") < 3)
    )


# ---------------------------------------------------------------------------
# events_path_topk
# ---------------------------------------------------------------------------

_PATH_LEN = 8
_PATH_TOPK = 10


@query(
    "events_path_topk",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id,
               array_to_string(
                   list_slice(array_agg(event_type ORDER BY ts, event_id),
                              1, {_PATH_LEN}), '>') AS path
        FROM events GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM ordered
    GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT {_PATH_TOPK}
    """,
)
def events_path_topk(spark, sf):
    """Top navigation paths: each user's first 8 event types (by time,
    event_id tiebreak) joined into a path string, ranked by user count —
    the clickstream path-analysis primitive.

    A row_number window partitioned by user bounds per-user state to the
    path length; the path build is an in-group array sort of ≤8 structs
    (deterministic — never bare collect_list order); two hash aggregates
    and a TakeOrdered finish. Users hash-distribute, so skew is bounded
    by the busiest single user's event count at the window, and by the
    path-length cap everywhere after."""
    e = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_n = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PATH_LEN)
    )
    paths = first_n.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(_PATH_TOPK)
    )


# ---------------------------------------------------------------------------
# agg_corr_matrix
# ---------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


_CORR_DEC = "DECIMAL(38,4)"


def _corr_oracle() -> str:
    parts = []
    for i, x in enumerate(_CORR_COLS):
        for y in _CORR_COLS[i + 1:]:
            parts.append(f"""
            SELECT '{x}' AS x, '{y}' AS y,
                   round((n * sxy - sx * sy)
                         / (sqrt(n * sxx - sx * sx)
                            * sqrt(n * syy - sy * sy)), 6) AS r
            FROM (
              SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                     CAST(SUM(CAST({x} AS {_CORR_DEC})) AS DOUBLE) AS sx,
                     CAST(SUM(CAST({y} AS {_CORR_DEC})) AS DOUBLE) AS sy,
                     CAST(SUM(CAST({x} * {y} AS {_CORR_DEC})) AS DOUBLE) AS sxy,
                     CAST(SUM(CAST({x} * {x} AS {_CORR_DEC})) AS DOUBLE) AS sxx,
                     CAST(SUM(CAST({y} * {y} AS {_CORR_DEC})) AS DOUBLE) AS syy
              FROM lineitem)
            """)
    return " UNION ALL ".join(parts)


@query("agg_corr_matrix", oracle=_corr_oracle())
def agg_corr_matrix(spark, sf):
    """Pairwise Pearson correlation matrix (upper triangle, long form)
    over the lineitem measures — the feature-screening primitive before
    model training.

    All co-moments for all 6 pairs accumulate in ONE scan / one global
    aggregate row, then unpivot via ``stack``; the oracle's 6 scans are
    the readable-SQL equivalent. Never one-pass-per-pair on the fact
    table. The six sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as
    DECIMAL — exact, order-independent addition, so the coefficients
    are bit-stable under ANY partitioning (ADVICE r04: ``F.corr``'s
    float co-moment partials merge in partition order); r is one final
    fixed-order double expression, 6-digit-rounded like every
    transcendental suite scalar."""
    from ..functions.scalars import exact_comoments

    li = table(spark, sf, "lineitem")
    # All 15 exact sums in one Arrow-batched numpy pass (2dp measures,
    # 4dp products = true grid values; ~10x the per-row decimal SUM at
    # identical oracle parity) — see exact_comoments. Index-named sums
    # re-alias to the column-named form the formulas below read.
    idx = {c: i for i, c in enumerate(_CORR_COLS)}
    renames = ["n"]
    for c in _CORR_COLS:
        renames.append(F.col(f"s_{idx[c]}").alias(f"s_{c}"))
    for i, x in enumerate(_CORR_COLS):
        for y in _CORR_COLS[i:]:
            renames.append(F.col(f"s_{idx[x]}_{idx[y]}").alias(f"s_{x}_{y}"))
    one = exact_comoments(li, _CORR_COLS, scale=4).select(*renames)
    names = []
    exprs = []
    for i, x in enumerate(_CORR_COLS):
        for y in _CORR_COLS[i + 1:]:
            nm = f"r_{i}_{_CORR_COLS.index(y)}"
            names.append((x, y, nm))
            num = F.col("n") * F.col(f"s_{x}_{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
            den = F.sqrt(
                F.col("n") * F.col(f"s_{x}_{x}") - F.col(f"s_{x}") * F.col(f"s_{x}")
            ) * F.sqrt(
                F.col("n") * F.col(f"s_{y}_{y}") - F.col(f"s_{y}") * F.col(f"s_{y}")
            )
            exprs.append(F.round(num / den, 6).alias(nm))
    one = one.select(*exprs)
    stack_expr = ", ".join(
        f"'{x}', '{y}', {nm}" for x, y, nm in names
    )
    return one.selectExpr(f"stack({len(names)}, {stack_expr}) AS (x, y, r)")


# ---------------------------------------------------------------------------
# skyline_2d
# ---------------------------------------------------------------------------

_SKYLINE_BUCKETS = 64


@query(
    "skyline_2d",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def skyline_2d(spark, sf):
    """2-D skyline (Pareto front): parts not dominated on
    (minimize retail price, maximize size) — the multi-objective
    shortlist primitive (cheapest-per-capability frontier).

    Delegates to :func:`operators.relational.pareto_front_2d` —
    bucket-grid prefix-max pruning scan-side, then an exact broadcast
    left-anti dominance join on the small survivor set. The full table
    is never self-joined and never globally sorted."""
    from ..operators.relational import pareto_front_2d

    p = table(spark, sf, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    return pareto_front_2d(
        p, "p_retailprice", "p_size",
        lo=0, hi=2000, buckets=_SKYLINE_BUCKETS,
    )


# ---------------------------------------------------------------------------
# text_phonetic_keys
# ---------------------------------------------------------------------------

# Simplified-Soundex consonant classes (first char kept verbatim, vowels
# and h/w dropped BEFORE run-collapse — a documented deviation from
# classic Soundex that removes the letter-separated-run special case, so
# the key is expressible as pure column algebra in BOTH engines with no
# backreference regex). Deletion chars must trail the mapped ones:
# translate() drops from-chars beyond the to-string's length.
_PH_FROM = "bfpvcgjkqsxzdtlmnraeiouyhw"
_PH_TO = "111122222222334556"


@query(
    "text_phonetic_keys",
    oracle=f"""
    WITH vocab AS (
        -- DISTINCT must wrap the unnest in a subquery: DuckDB applies
        -- SELECT DISTINCT before the unnest row expansion otherwise.
        SELECT DISTINCT w FROM (
            SELECT unnest(list_filter(
                string_split_regex(lower(text), '[^a-z]+'),
                x -> len(x) >= 2)) AS w
            FROM documents)
    ),
    keyed AS (
        SELECT w,
               -- array_to_string([]) is NULL in DuckDB, not '' — coalesce
               substr(w, 1, 1) || rpad(coalesce(array_to_string(list_slice(
                   [substr(ds, i, 1)
                    FOR i IN range(1, len(ds) + 1)
                    IF i = 1 OR substr(ds, i, 1) <> substr(ds, i - 1, 1)],
                   1, 3), ''), ''), 3, '0') AS pkey
        FROM (SELECT w, translate(substr(w, 2),
                                  '{_PH_FROM}', '{_PH_TO}') AS ds
              FROM vocab)
    )
    SELECT pkey,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           string_agg(w, ',' ORDER BY w) AS words
    FROM keyed
    GROUP BY pkey
    """,
)
def text_phonetic_keys(spark, sf):
    """Phonetic vocabulary keying (simplified Soundex): map every corpus
    word to ``first letter + 3 collapsed consonant-class digits`` and
    report every key group (collisions and singletons) — the blocking-key
    primitive for
    phonetic record linkage (two name spellings that sound alike land in
    the same equi-join block; the key IS the join key, so the match
    never needs a pairwise phonetic comparison).

    Vocabulary-sized throughout: one tokenize + distinct, then pure
    column algebra (translate → per-char run-collapse via
    sequence/transform — no Python, no backreference regex, identical
    semantics in DuckDB) and one hash aggregate."""
    docs = table(spark, sf, "documents")
    vocab = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower("text"), "[^a-z]+"),
                    lambda x: F.length(x) >= 2,
                )
            ).alias("w")
        )
        .distinct()
    )
    keyed = vocab.withColumn(
        "ds", F.translate(F.expr("substring(w, 2)"), _PH_FROM, _PH_TO)
    ).withColumn(
        "pkey",
        F.expr(
            "concat(substring(w, 1, 1), rpad(concat_ws('', slice("
            "filter(CASE WHEN length(ds) >= 1 THEN "
            "transform(sequence(1, length(ds)), i -> "
            "CASE WHEN i = 1 OR substring(ds, i, 1) <> "
            "substring(ds, i - 1, 1) THEN substring(ds, i, 1) END) "
            "ELSE array() END, x -> x IS NOT NULL), 1, 3)), 3, '0'))"
        ),
    )
    return (
        keyed.groupBy("pkey")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.array_join(F.array_sort(F.collect_list("w")), ",").alias(
                "words"
            ),
        )
    )


# ---------------------------------------------------------------------------
# text_readability
# ---------------------------------------------------------------------------

# The synthetic corpus has no sentence punctuation, so grade formulas
# that need words-per-sentence use a fixed nominal sentence length.
_NOMINAL_SENTENCE_LEN = 15


@query(
    "text_readability",
    oracle=f"""
    WITH tok AS (
        SELECT source,
               unnest(list_filter(
                   string_split_regex(lower(text), '[^a-z]+'),
                   x -> x <> '')) AS w
        FROM documents
    ),
    syl AS (
        SELECT source, w,
               len(regexp_extract_all(w, '[aeiouy]+')) AS n_syl
        FROM tok
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_syl) AS BIGINT) AS n_syllables,
           round(SUM(n_syl) * 1.0 / COUNT(*), 6) AS avg_syl_per_word,
           round(COUNT(*) FILTER (WHERE n_syl >= 3) * 1.0 / COUNT(*), 6)
               AS pct_complex,
           round(0.4 * ({_NOMINAL_SENTENCE_LEN} +
                 100.0 * COUNT(*) FILTER (WHERE n_syl >= 3) / COUNT(*)),
                 6) AS fog_grade
    FROM syl
    GROUP BY source
    """,
)
def text_readability(spark, sf):
    """Per-source readability report: syllables-per-word (vowel-group
    heuristic), complex-word share (≥3 syllables) and a Gunning-FOG-
    style grade — the classic lexical-difficulty gates for training-data
    quality filtering.

    One tokenize pass, a per-token regexp count (JVM-side, codegen),
    and a single source-keyed hash aggregate — linear, shuffle bounded
    by the source-domain cardinality. Sentence length is pinned to a
    nominal constant because the synthetic corpus carries no sentence
    punctuation (documented; real corpora would count [.!?] runs)."""
    docs = table(spark, sf, "documents")
    tok = docs.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda x: x != "")
        ).alias("w"),
    )
    syl = tok.withColumn(
        "n_syl", F.size(F.regexp_extract_all("w", F.lit("[aeiouy]+"), 0))
    )
    return syl.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_syl").cast("long").alias("n_syllables"),
        F.round(F.sum("n_syl") / F.count(F.lit(1)), 6).alias(
            "avg_syl_per_word"
        ),
        F.round(
            F.count_if(F.col("n_syl") >= 3) / F.count(F.lit(1)), 6
        ).alias("pct_complex"),
        F.round(
            0.4
            * (
                F.lit(_NOMINAL_SENTENCE_LEN)
                + 100.0
                * F.count_if(F.col("n_syl") >= 3)
                / F.count(F.lit(1))
            ),
            6,
        ).alias("fog_grade"),
    )


# ---------------------------------------------------------------------------
# quality_expectation_suite (round 5)
# ---------------------------------------------------------------------------


@query(
    "quality_expectation_suite",
    oracle="""
    WITH rowchecks AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS f_null,
             SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                        OR o_totalprice > 600000 THEN 1 ELSE 0 END) AS f_range,
             SUM(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
                      THEN 1 ELSE 0 END) AS f_regex,
             SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                      THEN 1 ELSE 0 END) AS f_domain,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS f_unique
      FROM orders),
    ref AS (
      SELECT COUNT(*) AS f_ref FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey))
    SELECT u.expectation, rowchecks.n AS n_checked,
           CAST(u.f AS BIGINT) AS n_failed, u.f = 0 AS passed
    FROM rowchecks CROSS JOIN ref CROSS JOIN LATERAL (
      SELECT UNNEST(['custkey_not_null', 'totalprice_range',
                     'priority_format', 'status_domain',
                     'orderkey_unique', 'custkey_referential'])
               AS expectation,
             UNNEST([f_null, f_range, f_regex, f_domain,
                     f_unique, f_ref]) AS f) u
    """,
)
def quality_expectation_suite(spark, sf):
    """Declarative data-expectation suite (the Great-Expectations shape)
    evaluated ENGINE-SIDE in one pass: not-null, numeric range, regex
    format and value-domain checks all fold into a single aggregate
    over the fact scan (each check is a SUM of indicator expressions —
    adding a check adds a column, never a pass); uniqueness is the same
    scan's distinct-count delta; referential integrity is one left-anti
    count against the dimension. Output is the audit artifact a 100 TB
    ingest gate stores per batch: (expectation, n_checked, n_failed,
    passed)."""
    o = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    row = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "f_null"
        ),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull()
                | (F.col("o_totalprice") < 0)
                | (F.col("o_totalprice") > 600000),
                1,
            ).otherwise(0)
        ).alias("f_range"),
        F.sum(
            F.when(~F.col("o_orderpriority").rlike("^[1-5]-"), 1).otherwise(0)
        ).alias("f_regex"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("f_domain"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("f_unique"),
    )
    ref = (
        o.join(
            cust.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("f_ref"))
    )
    one = row.join(F.broadcast(ref))
    stack = ", ".join(
        f"'{name}', {col}"
        for name, col in [
            ("custkey_not_null", "f_null"),
            ("totalprice_range", "f_range"),
            ("priority_format", "f_regex"),
            ("status_domain", "f_domain"),
            ("orderkey_unique", "f_unique"),
            ("custkey_referential", "f_ref"),
        ]
    )
    return one.selectExpr(
        f"stack(6, {stack}) AS (expectation, n_failed)", "n AS n_checked"
    ).select(
        "expectation",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_failed").cast("long").alias("n_failed"),
        (F.col("n_failed") == 0).alias("passed"),
    )


# ---------------------------------------------------------------------------
# quality_quarantine_split (round 6)
# ---------------------------------------------------------------------------


@query(
    "quality_quarantine_split",
    oracle="""
    WITH g AS (
      SELECT o_orderkey,
             (o_totalprice >= 0 AND o_totalprice <= 400000) AS ok_range,
             (o_orderstatus IN ('O', 'F', 'P')) AS ok_status,
             regexp_matches(o_orderpriority, '^[1-5]-') AS ok_priority
      FROM orders)
    SELECT CASE WHEN ok_range AND ok_status AND ok_priority
                THEN 'clean' ELSE 'quarantine' END AS gate,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN NOT ok_range THEN 1 ELSE 0 END) AS BIGINT)
             AS n_range_fail,
           CAST(SUM(CASE WHEN NOT ok_status THEN 1 ELSE 0 END) AS BIGINT)
             AS n_status_fail,
           CAST(SUM(CASE WHEN NOT ok_priority THEN 1 ELSE 0 END) AS BIGINT)
             AS n_priority_fail
    FROM g GROUP BY gate
    """,
)
def quality_quarantine_split(spark, sf):
    """The OPERATIONAL half of the expectation suite (VERDICT r05 task
    7, the Deequ/dbt store_failures pattern): where
    ``quality_expectation_suite`` reports per-check failure counts,
    this query ROUTES the rows — every record failing any row-level
    expectation (price range, status domain, priority format) goes to a
    ``quarantine`` partition with a ``reasons`` audit column, the rest
    to ``clean`` — and lands BOTH through the engine's own
    hadoopParquet sink as one hive-partitioned write
    (``partition_by=[gate]``, the same machinery as
    ``adapter_partitioned_roundtrip``). The result is computed from a
    COLD read-back of the written files, re-deriving each expectation
    from the round-tripped values: equality with the oracle proves the
    split is complete (clean + quarantine = source, no row lost or
    double-routed) and the values survived the sink. At 100 TB this is
    one linear scan + a partitioned write — the gate column never
    shuffles more than the write itself."""
    from ..model import DataStream, StreamType
    from ..registry import resolve_output

    ok_range = (F.col("o_totalprice") >= 0) & (
        F.col("o_totalprice") <= 400000
    )
    ok_status = F.col("o_orderstatus").isin("O", "F", "P")
    ok_priority = F.col("o_orderpriority").rlike("^[1-5]-")
    routed = table(spark, sf, "orders").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        "o_orderpriority",
        F.when(ok_range & ok_status & ok_priority, "clean")
        .otherwise("quarantine")
        .alias("gate"),
        F.concat_ws(
            ",",
            F.when(~ok_range, F.lit("totalprice_range")),
            F.when(~ok_status, F.lit("status_domain")),
            F.when(~ok_priority, F.lit("priority_format")),
        ).alias("reasons"),
    )
    base = scratch_dir("quarantine")
    out = resolve_output("hadoopParquet")().configure(
        {"partition_by": ["gate"]}
    ).initialize(spark, base)
    out.save("orders_gated", DataStream("orders_gated", routed,
                                        StreamType.COLUMNAR))
    # Explicit read-back schema (ADVICE r06): a zero-row source writes
    # no parquet files, and a schema-less read of the bare directory
    # raises instead of returning the empty frame the empty-input
    # convention (tests/test_empty_inputs.py) requires. With the
    # writer's own schema the read infers nothing — `gate` comes back
    # from the hive partition dirs when present, and an absent dir
    # degrades to zero rows (missing-path ONLY; ADVICE r07).
    back = read_parquet_or_empty(spark, routed.schema, base)
    return back.groupBy(F.col("gate").cast("string").alias("gate")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(
            ~(
                (F.col("o_totalprice") >= 0)
                & (F.col("o_totalprice") <= 400000)
            )
        ).alias("n_range_fail"),
        F.count_if(~F.col("o_orderstatus").isin("O", "F", "P")).alias(
            "n_status_fail"
        ),
        F.count_if(~F.col("o_orderpriority").rlike("^[1-5]-")).alias(
            "n_priority_fail"
        ),
    )


# ---------------------------------------------------------------------------
# events_window_funnel (round 5)
# ---------------------------------------------------------------------------


@query(
    "events_window_funnel",
    oracle="""
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    l2 AS (
      SELECT DISTINCT v.user_id FROM v JOIN c ON c.user_id = v.user_id
       AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR),
    l3 AS (
      SELECT DISTINCT v.user_id FROM v
      JOIN c ON c.user_id = v.user_id AND c.ts > v.ts
       AND c.ts <= v.ts + INTERVAL 1 HOUR
      JOIN p ON p.user_id = v.user_id AND p.ts > c.ts
       AND p.ts <= v.ts + INTERVAL 1 HOUR),
    u AS (SELECT DISTINCT user_id FROM events)
    SELECT CASE WHEN l3.user_id IS NOT NULL THEN 3
                WHEN l2.user_id IS NOT NULL THEN 2
                WHEN v3.user_id IS NOT NULL THEN 1
                ELSE 0 END AS funnel_level,
           COUNT(*) AS n_users
    FROM u
    LEFT JOIN l3 ON l3.user_id = u.user_id
    LEFT JOIN l2 ON l2.user_id = u.user_id
    LEFT JOIN (SELECT DISTINCT user_id FROM v) v3
           ON v3.user_id = u.user_id
    GROUP BY 1
    """,
)
def events_window_funnel(spark, sf):
    """ClickHouse-windowFunnel-style STRICTLY-ORDERED funnel with a time
    window anchored at the chain start: a user reaches level 3 iff some
    view → click → purchase chain is strictly time-ordered AND completes
    within 1 hour of the view (plain `funnel_steps` has no window
    constraint — it measures lifetime conversion).

    Scale shape: every chain join is an EQUI-join on user_id with the
    interval predicate riding as a post-condition, so fanout is bounded
    by per-user event counts (the stream-stream interval-join shape);
    distinct user sets are tiny; the final level assembly is three
    left joins on the user dimension. At heavy per-user skew, band the
    join on the hour bucket exactly like `join_range_banded`."""
    ev = table(spark, sf, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("ts").alias("vts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("ts").alias("pts")
    )
    win = F.expr("vts + INTERVAL 1 HOUR")
    vc = v.join(c, "u").filter(
        (F.col("cts") > F.col("vts")) & (F.col("cts") <= win)
    )
    l2 = vc.select("u").distinct().withColumn("_l2", F.lit(1))
    l3 = (
        vc.join(p, "u")
        .filter((F.col("pts") > F.col("cts")) & (F.col("pts") <= win))
        .select("u").distinct().withColumn("_l3", F.lit(1))
    )
    l1 = v.select("u").distinct().withColumn("_l1", F.lit(1))
    u = ev.select(F.col("user_id").alias("u")).distinct()
    lvl = (
        u.join(l3, "u", "left").join(l2, "u", "left").join(l1, "u", "left")
        .select(
            F.when(F.col("_l3").isNotNull(), 3)
            .when(F.col("_l2").isNotNull(), 2)
            .when(F.col("_l1").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("funnel_level")
        )
    )
    return lvl.groupBy("funnel_level").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# ---------------------------------------------------------------------------
# privacy_t_closeness (round 5)
# ---------------------------------------------------------------------------

_TC_BUCKETS = 10


@query(
    "privacy_t_closeness",
    oracle=f"""
    WITH b AS (
      SELECT c_nationkey,
             LEAST(GREATEST(CAST(FLOOR((c_acctbal + 1000) / 1100) AS INT),
                            0), {_TC_BUCKETS - 1}) AS bkt
      FROM customer),
    g AS (SELECT c_nationkey, bkt, COUNT(*) AS cg
          FROM b GROUP BY c_nationkey, bkt),
    ng AS (SELECT c_nationkey, SUM(cg) AS n_g FROM g GROUP BY c_nationkey),
    t AS (SELECT bkt, COUNT(*) AS ct FROM b GROUP BY bkt),
    nt AS (SELECT SUM(ct) AS n FROM t),
    grid AS (
      SELECT c_nationkey, u.k AS bkt FROM ng,
             unnest(range(0, {_TC_BUCKETS})) u(k)),
    cells AS (
      SELECT grid.c_nationkey, grid.bkt,
             COALESCE(g.cg, 0) AS cg, COALESCE(t.ct, 0) AS ct
      FROM grid
      LEFT JOIN g ON g.c_nationkey = grid.c_nationkey AND g.bkt = grid.bkt
      LEFT JOIN t ON t.bkt = grid.bkt),
    cum AS (
      SELECT c_nationkey, bkt,
             SUM(cg) OVER (PARTITION BY c_nationkey ORDER BY bkt) AS cum_g,
             SUM(ct) OVER (PARTITION BY c_nationkey ORDER BY bkt) AS cum_t
      FROM cells),
    terms AS (
      SELECT cum.c_nationkey,
             CAST(round(abs(CAST(cum_g AS DOUBLE) / ng.n_g
                            - CAST(cum_t AS DOUBLE) / nt.n), 9)
                  AS DECIMAL(20,9)) AS term
      FROM cum JOIN ng ON ng.c_nationkey = cum.c_nationkey CROSS JOIN nt
      WHERE cum.bkt < {_TC_BUCKETS - 1})
    SELECT c_nationkey,
           round(CAST(SUM(term) AS DOUBLE) / {_TC_BUCKETS - 1}, 6)
             AS t_closeness,
           round(CAST(SUM(term) AS DOUBLE) / {_TC_BUCKETS - 1}, 6) <= 0.2
             AS within_t
    FROM terms GROUP BY c_nationkey
    """,
)
def privacy_t_closeness(spark, sf):
    """t-closeness audit (the k-anonymity / l-diversity companion): per
    quasi-identifier group (nation), the earth-mover distance between
    the group's sensitive-attribute distribution (account balance,
    {_TC_BUCKETS} ordered equi-width buckets) and the global one —
    EMD over an ordered 1-D domain is the mean |cumulative-difference|,
    so the whole audit is two hash aggregates + a {_TC_BUCKETS}-row
    window per group. Each cumulative term rounds to a 1e-9 grid and
    accumulates as DECIMAL, so per-group sums are partition-order-proof;
    one final division, rounded 6."""
    cust = table(spark, sf, "customer")
    b = cust.select(
        "c_nationkey",
        F.least(
            F.greatest(
                F.floor((F.col("c_acctbal") + 1000) / 1100).cast("int"),
                F.lit(0),
            ),
            F.lit(_TC_BUCKETS - 1),
        ).alias("bkt"),
    )
    g = b.groupBy("c_nationkey", "bkt").agg(F.count(F.lit(1)).alias("cg"))
    ng = g.groupBy("c_nationkey").agg(F.sum("cg").alias("n_g"))
    t = b.groupBy("bkt").agg(F.count(F.lit(1)).alias("ct"))
    nt = t.agg(F.sum("ct").alias("n"))
    grid = ng.select("c_nationkey").crossJoin(
        F.broadcast(
            cust.sparkSession.range(_TC_BUCKETS).select(
                F.col("id").cast("int").alias("bkt")
            )
        )
    )
    cells = (
        grid.join(g, ["c_nationkey", "bkt"], "left")
        .join(F.broadcast(t), "bkt", "left")
        .select(
            "c_nationkey", "bkt",
            F.coalesce("cg", F.lit(0)).alias("cg"),
            F.coalesce("ct", F.lit(0)).alias("ct"),
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy("bkt")
    cum = cells.select(
        "c_nationkey", "bkt",
        F.sum("cg").over(w).alias("cum_g"),
        F.sum("ct").over(w).alias("cum_t"),
    )
    terms = (
        cum.filter(F.col("bkt") < _TC_BUCKETS - 1)
        .join(ng, "c_nationkey")
        .join(F.broadcast(nt))
        .select(
            "c_nationkey",
            F.round(
                F.abs(
                    F.col("cum_g").cast("double") / F.col("n_g")
                    - F.col("cum_t").cast("double") / F.col("n")
                ),
                9,
            ).cast("decimal(20,9)").alias("term"),
        )
    )
    emd = F.round(
        F.sum("term").cast("double") / F.lit(_TC_BUCKETS - 1), 6
    )
    return terms.groupBy("c_nationkey").agg(
        emd.alias("t_closeness"),
        (emd <= 0.2).alias("within_t"),
    )


# ---------------------------------------------------------------------------
# text_keywords_rake (round 5)
# ---------------------------------------------------------------------------

_RAKE_STOPS = ("a", "the", "of", "and", "to", "in", "is", "on")
_RAKE_TOPK = 20


@query(
    "text_keywords_rake",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS t
      FROM documents),
    pos AS (
      SELECT doc_id, u.i AS i, t[CAST(u.i AS INT)] AS w,
             CASE WHEN t[CAST(u.i AS INT)] IN
               ({', '.join(repr(s) for s in _RAKE_STOPS)})
             THEN 1 ELSE 0 END AS stop
      FROM toks, unnest(range(1, len(t) + 1)) u(i)),
    marked AS (
      SELECT doc_id, i, w, stop,
             SUM(stop) OVER (PARTITION BY doc_id ORDER BY i) AS grp
      FROM pos),
    pw AS (SELECT doc_id, grp, i, w FROM marked WHERE stop = 0),
    plen AS (SELECT doc_id, grp, COUNT(*) AS plen
             FROM pw GROUP BY doc_id, grp),
    wstat AS (
      SELECT pw.w, COUNT(*) AS freq, SUM(plen.plen) AS deg
      FROM pw JOIN plen ON plen.doc_id = pw.doc_id AND plen.grp = pw.grp
      GROUP BY pw.w),
    wscore AS (
      SELECT w, CAST(round(CAST(deg AS DOUBLE) / freq, 9)
                     AS DECIMAL(20,9)) AS ws
      FROM wstat),
    phr AS (
      SELECT pw.doc_id, pw.grp,
             string_agg(pw.w, ' ' ORDER BY pw.i) AS phrase,
             SUM(ws.ws) AS s
      FROM pw JOIN wscore ws ON ws.w = pw.w
      GROUP BY pw.doc_id, pw.grp)
    SELECT phrase, COUNT(*) AS n_occurrences,
           round(CAST(MIN(s) AS DOUBLE), 6) AS rake_score
    FROM phr GROUP BY phrase
    ORDER BY rake_score DESC, phrase
    LIMIT {_RAKE_TOPK}
    """,
)
def text_keywords_rake(spark, sf):
    """RAKE keyword extraction (Rose et al.): candidate phrases are
    maximal stopword-free token runs; each word scores degree/frequency
    (degree = Σ length of phrases containing it); a phrase scores the
    sum of its word scores — the co-occurrence-graph heuristic that
    finds multi-word keyphrases without any model.

    Scale shape: one tokenize + posexplode pass; phrase segmentation is
    the per-doc running stop-count window (keyed, never global); word
    stats and phrase assembly are hash aggregates; per-word scores
    round to a 1e-9 grid and phrase sums accumulate as DECIMAL (exact,
    order-proof); top-k is TakeOrdered. Identical phrase text ⇒
    identical score by construction (global word stats), so the final
    group-by-phrase is well-defined."""
    docs = table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), "[^a-z]+"), lambda x: x != ""
        ).alias("t"),
    )
    pos = toks.select(
        "doc_id", F.posexplode("t").alias("i0", "w")
    ).select(
        "doc_id",
        (F.col("i0") + 1).alias("i"),
        "w",
        F.when(F.col("w").isin(*_RAKE_STOPS), 1).otherwise(0).alias("stop"),
    )
    w_doc = Window.partitionBy("doc_id").orderBy("i")
    marked = pos.withColumn("grp", F.sum("stop").over(w_doc))
    pw = marked.filter(F.col("stop") == 0).select("doc_id", "grp", "i", "w")
    plen = pw.groupBy("doc_id", "grp").agg(F.count(F.lit(1)).alias("plen"))
    wstat = (
        pw.join(plen, ["doc_id", "grp"])
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg"))
    )
    wscore = wstat.select(
        "w",
        F.round(F.col("deg").cast("double") / F.col("freq"), 9)
        .cast("decimal(20,9)")
        .alias("ws"),
    )
    phr = (
        pw.join(wscore, "w")
        .groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("phrase"),
            F.sum("ws").alias("s"),
        )
    )
    return (
        phr.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.round(F.min("s").cast("double"), 6).alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), "phrase")
        .limit(_RAKE_TOPK)
    )


# ---------------------------------------------------------------------------
# timeseries_holt_trend (round 5)
# ---------------------------------------------------------------------------


@query(
    "timeseries_holt_trend",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) * 100 AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2),
    rn AS (SELECT pri, day, cents,
                  ROW_NUMBER() OVER (PARTITION BY pri ORDER BY day) AS r
           FROM base),
    rec AS (
      SELECT pri, day, cents, r, cents AS l, CAST(0 AS BIGINT) AS b
      FROM rn WHERE r = 1
      UNION ALL
      SELECT pri, day, cents, r, l_new,
             CAST(FLOOR(((l_new - l_old) + 3 * b_old) / 4.0) AS BIGINT)
      FROM (
        SELECT n.pri AS pri, n.day AS day, n.cents AS cents, n.r AS r,
               CAST(FLOOR((n.cents + 3 * (p.l + p.b)) / 4.0) AS BIGINT)
                 AS l_new,
               p.l AS l_old, p.b AS b_old
        FROM rec p JOIN rn n ON n.pri = p.pri AND n.r = p.r + 1))
    SELECT pri, day, cents, CAST(l AS BIGINT) AS level,
           CAST(b AS BIGINT) AS trend,
           CAST(l + b AS BIGINT) AS forecast_next
    FROM rec
    """,
)
def timeseries_holt_trend(spark, sf):
    """Holt DOUBLE-exponential smoothing (level + trend, alpha = beta =
    1/4) of daily order value per priority, in exact integer fixed-point
    cents — the trend-aware forecast `timeseries_ema` lacks. The
    recurrence is inherently sequential per series, so it runs as
    ``applyInPandas`` groups (:func:`..operators.timeseries.
    holt_fixedpoint`): one shuffle on the series key, O(days) exact
    Python-int loop per Arrow batch. FLOOR division semantics (Python
    ``//``): the oracle spells it CAST(FLOOR(x / 4.0)) because DuckDB's
    integer ``//`` truncates toward zero on negatives (trends go
    negative; division by 4 is exact in doubles, so FLOOR is exact).
    The oracle replays the identical recurrence as a recursive CTE."""
    from ..operators.timeseries import holt_fixedpoint

    daily = (
        table(spark, sf, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(25,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    return holt_fixedpoint(
        daily, keys=["pri"], order_col="day", value_col="cents",
    )


# ---------------------------------------------------------------------------
# privacy_dp_noisy_count (round 8)
# ---------------------------------------------------------------------------
#
# The release mechanism the k-anonymity / l-diversity / t-closeness
# AUDITS above gate on: ε-differentially-private counts via the GEOMETRIC
# MECHANISM (Ghosh, Roughgarden & Sundararajan 2009 — the discrete
# Laplace, the utility-optimal mechanism for integer counts, sensitivity
# 1). Noise is drawn by inverse-CDF over PRECOMPUTED integer breakpoints
# on the [0, 1e6) grid: the two-sided geometric CDF with α = e^-ε is
# evaluated once at import into 25 literal thresholds, so e^x never
# enters either engine — noise is 25 integer comparisons, pure codegen.
#
# TESTABILITY vs PRIVACY, stated honestly: the uniform draw here is a
# deterministic hash of the group key (the sample_hash_reproducible
# convention), which makes the release replayable by the oracle but is
# NOT private — a production release swaps `u` for a secure RNG draw per
# release epoch and keeps everything else (same thresholds, same
# truncation, same plan). Truncation at ±12 (CDF mass < 1e-5 per tail at
# ε=1) is the standard bounded-noise variant; the ε accounting note is
# that truncation costs a δ of the truncated mass.

_DP_EPS = 1.0
_DP_B = 12          # truncation bound: ±12 at ε=1 leaves <1e-5 per tail
_DP_GRID = 1_000_000


def _dp_breakpoints():
    import math

    alpha = math.exp(-_DP_EPS)
    ws = [alpha ** abs(k) for k in range(-_DP_B, _DP_B + 1)]
    z = sum(ws)
    cum, bps = 0.0, []
    for w in ws:
        cum += w / z
        bps.append(math.floor(cum * _DP_GRID))
    return bps  # bps[i] = CDF threshold after noise value (-B + i)


_DP_BPS = _dp_breakpoints()

# noise(u) = -B + #(thresholds <= u) over the first 2B thresholds: the
# inverse CDF as a sum of integer indicators, identical in both engines.
_DP_NOISE_SQL = f"(-{_DP_B} + " + " + ".join(
    f"CASE WHEN _u >= {c} THEN 1 ELSE 0 END" for c in _DP_BPS[:-1]
) + ")"
_DP_HASH_SQL = (
    "(c_nationkey * 1000003 + "
    "list_sum(list_transform(range(1, length(c_mktsegment) + 1), "
    "i -> ascii(c_mktsegment[i:i]) * i)) * 2654435761) "
    f"% {_DP_GRID}"
)


@query(
    "privacy_dp_noisy_count",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
             {_DP_HASH_SQL} AS _u
      FROM customer GROUP BY 1, 2)
    SELECT c_nationkey, c_mktsegment,
           CAST(n + {_DP_NOISE_SQL} AS BIGINT) AS noisy_count
    FROM g
    """,
)
def privacy_dp_noisy_count(spark, sf):
    """ε-DP noisy group counts by the geometric mechanism (ε=1,
    sensitivity 1, truncated at ±12): per (nation, segment) cohort,
    count + two-sided-geometric noise drawn by inverse CDF over 24
    import-time integer thresholds — no transcendental at query time, no
    RNG in the engine, one hash aggregate + a codegen'd CASE chain. The
    uniform draw is a DETERMINISTIC group-key hash so the oracle replays
    the release bit-exactly (see the module comment for the honest
    privacy caveat: production swaps the hash for a secure RNG per
    release and keeps the identical plan). At 100 TB the aggregate is
    map-side combinable and the noise stage is free; this is how DP
    releases actually ship — noise added to AGGREGATES post-reduction,
    never to rows. Reference has no privacy surface; this rounds out the
    audit family (k-anonymity → l-diversity → t-closeness → release)."""
    c = table(spark, sf, "customer")
    segsum = F.aggregate(
        F.transform(
            F.split(F.col("c_mktsegment"), ""),
            lambda ch, i: F.ascii(ch).cast("long") * (i + F.lit(1)),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    u = F.pmod(
        F.col("c_nationkey").cast("long") * 1000003
        + segsum * F.lit(2654435761),
        F.lit(_DP_GRID),
    )
    noise = F.lit(-_DP_B) + sum(
        (F.when(F.col("_u") >= c_, 1).otherwise(0) for c_ in _DP_BPS[:-1]),
        F.lit(0),
    )
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_u", u)  # group-key-only hash: post-aggregate, free
        .select(
            "c_nationkey", "c_mktsegment",
            (F.col("_n") + noise).cast("long").alias("noisy_count"),
        )
    )
