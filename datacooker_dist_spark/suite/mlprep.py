"""Round-4c suite wave: ML feature-preparation and statistical-monitoring
operators — association rules (confidence/lift), distribution entropy/Gini
impurity, winsorization, smoothed target encoding, weight-of-evidence /
information value, day-of-week seasonal decomposition, CUSUM changepoint
scoring, and the Gini inequality coefficient.

Every query is exact-oracled against DuckDB. Scale posture: aggregates are
hash aggregates with map-side partials; corpus-scalar denominators ride the
plans as broadcast 1-row joins; windows are partitioned by a grouping key
(segment / user), never global; the two order-dependent series queries
(seasonal trend, CUSUM) operate on the one-row-per-calendar-day aggregate
and avoid global windows entirely — the trend is an offset-explode
equi-join and the CUSUM prefix is a broadcast non-equi join against the
day-domain-bounded daily table. Ratio outputs divide exact integer (or
decimal) aggregates once at the end, so results are bit-stable under any
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import query, table

# ---------------------------------------------------------------------------
# assoc_rules_lift
# ---------------------------------------------------------------------------

_RULE_MIN_PAIRS = 2


@query(
    "assoc_rules_lift",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
    item_counts AS (
        SELECT l_partkey, COUNT(*) AS n_item FROM items GROUP BY l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_ab
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING COUNT(*) >= {_RULE_MIN_PAIRS}
    ),
    directed AS (
        SELECT part_a AS antecedent, part_b AS consequent, n_ab FROM pairs
        UNION ALL
        SELECT part_b AS antecedent, part_a AS consequent, n_ab FROM pairs
    )
    SELECT d.antecedent, d.consequent, CAST(d.n_ab AS BIGINT) AS n_ab,
           round(CAST(d.n_ab AS DOUBLE) / n.n_orders, 9) AS support,
           round(CAST(d.n_ab AS DOUBLE) / ia.n_item, 9) AS confidence,
           round(CAST(d.n_ab * n.n_orders AS DOUBLE)
                 / (ia.n_item * ic.n_item), 9) AS lift
    FROM directed d
    JOIN item_counts ia ON ia.l_partkey = d.antecedent
    JOIN item_counts ic ON ic.l_partkey = d.consequent
    CROSS JOIN n
    """,
)
def assoc_rules_lift(spark, sf):
    """Directed association rules A→B over order baskets with support,
    confidence and lift — the scoring pass that turns
    ``market_basket_pairs``'s co-occurrence candidates into ranked rules
    (lift > 1 ⇒ positive association).

    Scale shape: the pair space is keyed on the basket id so fanout is
    per-basket quadratic (bounded by max basket size), never
    corpus-quadratic; the antecedent/consequent frequency joins are
    equi-joins on the item id (vocabulary-sized after the min-support
    gate); the order count is a broadcast scalar. Support/confidence/
    lift each divide exact integer counts once, so every value is
    bit-stable under any partitioning."""
    li = table(spark, sf, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    item_counts = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_item")
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.l_orderkey") == F.col("b.l_orderkey"),
                F.col("a.l_partkey") < F.col("b.l_partkey"),
            ],
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _RULE_MIN_PAIRS)
    )
    directed = pairs.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "n_ab",
    ).unionAll(
        pairs.select(
            F.col("part_b").alias("antecedent"),
            F.col("part_a").alias("consequent"),
            "n_ab",
        )
    )
    ia = item_counts.select(
        F.col("l_partkey").alias("antecedent"), F.col("n_item").alias("n_a")
    )
    ic = item_counts.select(
        F.col("l_partkey").alias("consequent"), F.col("n_item").alias("n_c")
    )
    return (
        directed.join(ia, "antecedent")
        .join(ic, "consequent")
        .join(F.broadcast(n_orders))
        .select(
            "antecedent",
            "consequent",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(F.col("n_ab").cast("double") / F.col("n_orders"), 9)
            .alias("support"),
            F.round(F.col("n_ab").cast("double") / F.col("n_a"), 9)
            .alias("confidence"),
            F.round(
                (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_c")),
                9,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# agg_entropy_gini
# ---------------------------------------------------------------------------


@query(
    "agg_entropy_gini",
    oracle="""
    WITH counts AS (
        SELECT source, lang, COUNT(*) AS c
        FROM documents GROUP BY source, lang
    ),
    totals AS (
        SELECT source, SUM(c) AS n, COUNT(*) AS n_langs FROM counts
        GROUP BY source
    )
    SELECT c.source,
           CAST(t.n AS BIGINT) AS n_docs,
           CAST(t.n_langs AS BIGINT) AS n_langs,
           round(CAST(SUM(CAST(round(
               (CAST(c.c AS DOUBLE) / t.n) * log2(CAST(t.n AS DOUBLE) / c.c),
               12) AS DECIMAL(30,12))) AS DOUBLE), 6) AS entropy_bits,
           round(CAST(1 AS DOUBLE) - CAST(SUM(CAST(round(
               (CAST(c.c AS DOUBLE) / t.n) * (CAST(c.c AS DOUBLE) / t.n),
               12) AS DECIMAL(30,12))) AS DOUBLE), 6) AS gini_impurity
    FROM counts c JOIN totals t ON t.source = c.source
    GROUP BY c.source, t.n, t.n_langs
    """,
)
def agg_entropy_gini(spark, sf):
    """Shannon entropy (bits) and Gini impurity of each source's language
    distribution — the class-balance diagnostics a corpus card reports per
    slice (entropy 0 = monolingual, log2(k) = uniform over k languages).

    Scale shape: two stacked hash aggregates — (source, lang) counts then
    a per-source reduce — both map-side partial; nothing is per-row
    Python and nothing sorts. The per-language p·log2(1/p) and p² terms
    round to a 1e-12 grid and accumulate as DECIMAL(30,12): decimal
    addition is associative, so the cross-partition sum order can't
    drift the result — each term is itself a deterministic double
    expression, making the output bit-stable against the SQL oracle."""
    counts = (
        table(spark, sf, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.groupBy("source").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_langs")
    )
    p = F.col("c").cast("double") / F.col("n")
    ent_term = F.round(
        p * F.log2(F.col("n").cast("double") / F.col("c")), 12
    ).cast("decimal(30,12)")
    gini_term = F.round(p * p, 12).cast("decimal(30,12)")
    return (
        counts.join(totals, "source")
        .groupBy("source", "n", "n_langs")
        .agg(
            F.round(F.sum(ent_term).cast("double"), 6).alias("entropy_bits"),
            F.round(
                F.lit(1).cast("double") - F.sum(gini_term).cast("double"), 6
            ).alias("gini_impurity"),
        )
        .select(
            "source",
            F.col("n").cast("long").alias("n_docs"),
            F.col("n_langs").cast("long").alias("n_langs"),
            "entropy_bits",
            "gini_impurity",
        )
    )


# ---------------------------------------------------------------------------
# feature_winsorize
# ---------------------------------------------------------------------------


@query(
    "feature_winsorize",
    oracle="""
    WITH bounds AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN e.value < b.p05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(SUM(CASE WHEN e.value > b.p95 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high,
           round(b.p05, 6) AS p05,
           round(b.p95, 6) AS p95,
           round(CAST(SUM(CAST(round(e.value, 6) AS DECIMAL(25,6)))
                 AS DOUBLE) / COUNT(*), 4) AS mean_raw,
           round(CAST(SUM(CAST(round(
                     LEAST(GREATEST(e.value, b.p05), b.p95), 6)
                 AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 4)
             AS mean_winsorized
    FROM events e JOIN bounds b ON b.event_type = e.event_type
    GROUP BY e.event_type, b.p05, b.p95
    """,
)
def feature_winsorize(spark, sf):
    """Winsorization (percentile clipping) per event type: exact p05/p95
    bounds, clip counts, and the mean before vs after clipping — the
    outlier-robust feature-scaling pass that precedes model training.

    Scale shape: the exact percentile is one sort-based aggregate per
    group (bounded group count; an unbounded key domain should switch to
    approx_percentile's t-digest); the bounds then re-join the facts as
    a broadcast (groups × 2 doubles) and the clipped mean is a single
    map-side-partial hash aggregate. Both means round each addend to a
    1e-6 grid and sum as DECIMAL(25,6) so the cross-partition addition
    order can't drift the result; the clip expression compares raw
    doubles against interpolated bounds that both engines derive with
    the same (1-g)·a + g·b formula."""
    ev = table(spark, sf, "events")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("p05"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))

    def dmean(col, digits):
        return F.round(
            F.sum(F.round(col, 6).cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            digits,
        )

    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "p05", "p95")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("value") < F.col("p05"), 1).otherwise(0)
            ).cast("long").alias("n_clipped_low"),
            F.sum(
                F.when(F.col("value") > F.col("p95"), 1).otherwise(0)
            ).cast("long").alias("n_clipped_high"),
            dmean(F.col("value"), 4).alias("mean_raw"),
            dmean(clipped, 4).alias("mean_winsorized"),
        )
        .select(
            "event_type",
            "n",
            "n_clipped_low",
            "n_clipped_high",
            F.round("p05", 6).alias("p05"),
            F.round("p95", 6).alias("p95"),
            "mean_raw",
            "mean_winsorized",
        )
    )


# ---------------------------------------------------------------------------
# feature_target_encoding
# ---------------------------------------------------------------------------

_TE_SMOOTHING = 10


@query(
    "feature_target_encoding",
    oracle=f"""
    WITH per_cat AS (
        SELECT o_orderpriority,
               COUNT(*) AS n,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS s
        FROM orders GROUP BY o_orderpriority
    ),
    gtot AS (
        SELECT SUM(n) AS big_n, SUM(s) AS big_s FROM per_cat
    )
    SELECT p.o_orderpriority,
           CAST(p.n AS BIGINT) AS n,
           round(CAST(p.s AS DOUBLE) / p.n, 6) AS raw_rate,
           round(CAST(g.big_s AS DOUBLE) / g.big_n, 6) AS global_rate,
           round(CAST(p.s * g.big_n + {_TE_SMOOTHING} * g.big_s AS DOUBLE)
                 / (g.big_n * (p.n + {_TE_SMOOTHING})), 6) AS encoded
    FROM per_cat p CROSS JOIN gtot g
    """,
)
def feature_target_encoding(spark, sf):
    """Smoothed target (mean) encoding of order priority against the
    "order fulfilled" target: enc = (s + m·global_rate)/(n + m) with
    m = 10 — the additive-smoothing category encoder that shrinks rare
    categories toward the prior instead of memorizing them.

    Scale shape: one hash aggregate per category plus a 1-row global
    rollup broadcast back as a scalar join. The encoded value is
    computed as a single division of exact integer products
    ((s·N + m·S) / (N·(n+m))), so there is no intermediate float
    accumulation to drift — bit-stable under any partitioning."""
    per_cat = (
        table(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("s"),
        )
    )
    glob = per_cat.agg(
        F.sum("n").alias("big_n"), F.sum("s").alias("big_s")
    )
    m = F.lit(_TE_SMOOTHING)
    return per_cat.join(F.broadcast(glob)).select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("raw_rate"),
        F.round(F.col("big_s").cast("double") / F.col("big_n"), 6)
        .alias("global_rate"),
        F.round(
            (F.col("s") * F.col("big_n") + m * F.col("big_s")).cast("double")
            / (F.col("big_n") * (F.col("n") + m)),
            6,
        ).alias("encoded"),
    )


# ---------------------------------------------------------------------------
# feature_woe_iv
# ---------------------------------------------------------------------------


@query(
    "feature_woe_iv",
    oracle="""
    WITH per_cat AS (
        SELECT o_orderpriority,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS g,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS b
        FROM orders GROUP BY o_orderpriority
    ),
    gtot AS (SELECT SUM(g) AS big_g, SUM(b) AS big_b FROM per_cat)
    SELECT p.o_orderpriority,
           CAST(p.g AS BIGINT) AS n_good,
           CAST(p.b AS BIGINT) AS n_bad,
           round(ln((CAST(p.g AS DOUBLE) / gl.big_g)
                    / (CAST(p.b AS DOUBLE) / gl.big_b)), 6) AS woe,
           round((CAST(p.g AS DOUBLE) / gl.big_g
                  - CAST(p.b AS DOUBLE) / gl.big_b)
                 * round(ln((CAST(p.g AS DOUBLE) / gl.big_g)
                            / (CAST(p.b AS DOUBLE) / gl.big_b)), 6), 6)
             AS iv_term
    FROM per_cat p CROSS JOIN gtot gl
    WHERE p.g > 0 AND p.b > 0
    """,
)
def feature_woe_iv(spark, sf):
    """Weight of evidence and information-value terms per category —
    the credit-scoring encoder: woe = ln((good_i/G)/(bad_i/B)), with
    iv_term = (good_i/G − bad_i/B)·woe summable into the feature's IV.

    Scale shape: one hash aggregate per category + a 1-row broadcast
    rollup for the G/B totals; every ratio divides exact integer counts
    once and the woe rounds to 6 digits BEFORE entering the iv product,
    so both engines multiply identical doubles. Zero-count categories
    are excluded (woe undefined) in both engines."""
    per_cat = (
        table(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("g"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 0).otherwise(1)
            ).alias("b"),
        )
    )
    glob = per_cat.agg(F.sum("g").alias("big_g"), F.sum("b").alias("big_b"))
    gr = F.col("g").cast("double") / F.col("big_g")
    br = F.col("b").cast("double") / F.col("big_b")
    woe = F.round(F.log(gr / br), 6)
    return (
        per_cat.join(F.broadcast(glob))
        .filter((F.col("g") > 0) & (F.col("b") > 0))
        .select(
            "o_orderpriority",
            F.col("g").cast("long").alias("n_good"),
            F.col("b").cast("long").alias("n_bad"),
            woe.alias("woe"),
            F.round((gr - br) * woe, 6).alias("iv_term"),
        )
    )


# ---------------------------------------------------------------------------
# seasonal_dow_profile
# ---------------------------------------------------------------------------


@query(
    "seasonal_dow_profile",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    contrib AS (
        SELECT d + CAST(k AS INT) AS center, cnt
        FROM daily, (SELECT unnest(range(-3, 4)) AS k)
    ),
    trend AS (
        SELECT center, SUM(cnt) AS s, COUNT(*) AS m
        FROM contrib GROUP BY center HAVING COUNT(*) = 7
    )
    SELECT CAST(isodow(dy.d) AS INT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(SUM(7 * dy.cnt - t.s) AS DOUBLE) / (7 * COUNT(*)), 6)
             AS seasonal_index
    FROM daily dy JOIN trend t ON t.center = dy.d
    GROUP BY isodow(dy.d)
    """,
)
def seasonal_dow_profile(spark, sf):
    """Day-of-week seasonal decomposition of the daily event series:
    seasonal_index(dow) = mean(daily − trend) where the trend is a
    complete 7-day centered moving average — the additive-decomposition
    seasonal component a load-forecasting pipeline subtracts out.

    Scale shape: NO global window anywhere. Each daily row fans out to
    the 7 centers it contributes to via an offset explode (narrow), and
    the trend is a hash aggregate per center date, joined back to the
    daily series on the date key — the centered moving average as an
    equi-join instead of a single-partition ordered window, so the plan
    parallelizes no matter how long the series grows. Incomplete edge
    windows (m < 7) are excluded, mirroring a trailing-edge-NULL MA.
    Arithmetic: 7·cnt − Σwindow stays in exact integers until the one
    final division — bit-stable under any partitioning. dow is ISO
    (Mon=1..Sun=7): Spark's weekday()+1 ≡ DuckDB's isodow()."""
    daily = (
        table(spark, sf, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    contrib = daily.select(
        F.explode(F.sequence(F.lit(-3), F.lit(3))).alias("k"), "d", "cnt"
    ).select(F.date_add("d", F.col("k")).alias("center"), "cnt")
    trend = (
        contrib.groupBy("center")
        .agg(F.sum("cnt").alias("s"), F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") == 7)
    )
    return (
        daily.join(trend, daily.d == trend.center)
        .groupBy((F.expr("weekday(d)") + 1).cast("int").alias("dow"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(
                F.sum(F.lit(7) * F.col("cnt") - F.col("s")).cast("double")
                / (F.lit(7) * F.count(F.lit(1))),
                6,
            ).alias("seasonal_index"),
        )
    )


# ---------------------------------------------------------------------------
# changepoint_cusum
# ---------------------------------------------------------------------------

_CUSUM_TOPK = 5


@query(
    "changepoint_cusum",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    gtot AS (SELECT COUNT(*) AS ndays, SUM(cnt) AS total FROM daily),
    prefix AS (
        SELECT a.d, SUM(b.cnt) AS csum, COUNT(*) AS k
        FROM daily a JOIN daily b ON b.d <= a.d
        GROUP BY a.d
    )
    SELECT p.d AS day,
           CAST(p.k AS BIGINT) AS k,
           round(CAST(g.ndays * p.csum - p.k * g.total AS DOUBLE)
                 / g.ndays, 6) AS cusum_dev
    FROM prefix p CROSS JOIN gtot g
    ORDER BY abs(g.ndays * p.csum - p.k * g.total) DESC, p.d
    LIMIT {_CUSUM_TOPK}
    """,
)
def changepoint_cusum(spark, sf):
    """CUSUM changepoint scoring of the daily event-count series: the
    top-{K} dates by |Σ_{{i≤k}} cnt_i − k·mean| — the peak of the CUSUM
    statistic marks the most likely level-shift point.

    Scale shape: the raw stream reduces to one row per calendar day
    FIRST (hash aggregate), so the prefix-sum's non-equi join runs on a
    day-domain-bounded table (≤366 rows/year regardless of fact volume)
    with the right side broadcast — a BroadcastNestedLoopJoin over a
    provably tiny input, not a corpus cartesian and not a global
    window. An unbounded-key series would switch to the
    ``global_prefix_sum`` operator's partition-offset form. The
    deviation n·csum − k·total stays in exact integers (one final
    division), and the top-K is a TakeOrdered on the integer score."""
    daily = (
        table(spark, sf, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    glob = daily.agg(
        F.count(F.lit(1)).alias("ndays"), F.sum("cnt").alias("total")
    )
    a = daily.select(F.col("d").alias("day"))
    b = daily.select(F.col("d").alias("bd"), "cnt")
    prefix = (
        a.join(F.broadcast(b), F.col("bd") <= F.col("day"))
        .groupBy("day")
        .agg(F.sum("cnt").alias("csum"), F.count(F.lit(1)).alias("k"))
    )
    score = F.col("ndays") * F.col("csum") - F.col("k") * F.col("total")
    return (
        prefix.join(F.broadcast(glob))
        .select(
            "day",
            F.col("k").cast("long").alias("k"),
            F.round(score.cast("double") / F.col("ndays"), 6)
            .alias("cusum_dev"),
            F.abs(score).alias("_a"),
        )
        .orderBy(F.desc("_a"), "day")
        .limit(_CUSUM_TOPK)
        .drop("_a")
    )


# ---------------------------------------------------------------------------
# inequality_gini_lorenz
# ---------------------------------------------------------------------------


@query(
    "inequality_gini_lorenz",
    oracle="""
    WITH spend AS (
        SELECT c.c_mktsegment, o.o_custkey,
               SUM(CAST(o.o_totalprice AS DECIMAL(25,2))) AS x
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment, o.o_custkey
    ),
    ranked AS (
        SELECT c_mktsegment, x,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY x, o_custkey) AS r
        FROM spend
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           round(CAST(SUM(x) AS DOUBLE), 2) AS total_spend,
           round(CAST(2 * SUM(r * x) AS DOUBLE)
                 / (COUNT(*) * CAST(SUM(x) AS DOUBLE))
                 - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini
    FROM ranked
    GROUP BY c_mktsegment
    """,
)
def inequality_gini_lorenz(spark, sf):
    """Gini inequality coefficient of customer spend per market segment,
    via the rank formulation G = 2·Σ r·x / (n·Σx) − (n+1)/n — the
    Lorenz-curve concentration measure (0 = equal spend, →1 = one
    customer dominates).

    Scale shape: spend reduces per (segment, customer) in one hash
    aggregate; the rank window is PARTITIONED by segment (each segment
    sorts in parallel — never a global single-partition window); and
    Σ r·x accumulates as exact decimal·integer products, so the only
    floating-point steps are the two final divisions. The (x, custkey)
    rank tiebreak is deterministic, and swapping ranks between equal
    spends leaves Σ r·x unchanged — the coefficient is well-defined
    under ties."""
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    spend = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(25,2)")).alias("x"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("x", "o_custkey")
    ranked = spend.withColumn("r", F.row_number().over(w))
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("x").cast("double"), 2).alias("total_spend"),
            F.round(
                (F.lit(2) * F.sum(F.col("r") * F.col("x"))).cast("double")
                / (F.count(F.lit(1)) * F.sum("x").cast("double"))
                - (F.count(F.lit(1)) + F.lit(1)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("gini"),
        )
    )


# ---------------------------------------------------------------------------
# feature_hashing_trick (round 5)
# ---------------------------------------------------------------------------

# Portable rolling string hash: fold h = (h*31 + ascii(char)) mod P over
# the characters, P = 1e9+7. Every step is exact int64 arithmetic (max
# intermediate < 3.2e10), expressible verbatim in both engines — the
# string analog of the similarity wave's multiplicative-mix id order, so
# the bucket assignment is SQL-oracle-checkable (xxhash64 would be
# engine-private).
_FH_P = 1_000_000_007
_FH_BUCKETS = 64


def _portable_string_hash(col):
    codes = F.transform(
        F.filter(F.split(col, ""), lambda ch: ch != ""), F.ascii
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda a, x: (a * 31 + x) % F.lit(_FH_P),
    )


@query(
    "feature_hashing_trick",
    oracle=f"""
    WITH h AS (
      SELECT p_partkey, p_type,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(p_type, ''),
                                x -> CAST(ascii(x) AS BIGINT))),
               (a, x) -> (a * 31 + x) % {_FH_P}) % {_FH_BUCKETS} AS bucket
      FROM part)
    SELECT bucket, COUNT(*) AS n_rows,
           COUNT(DISTINCT p_type) AS n_types,
           COUNT(DISTINCT p_type) > 1 AS has_collision
    FROM h GROUP BY bucket
    """,
)
def feature_hashing_trick(spark, sf):
    """The HASHING-TRICK featurizer: the unbounded categorical ``p_type``
    maps to a fixed {_FH_BUCKETS}-bucket feature space via a portable
    rolling string hash (h = h*31 + code mod 1e9+7 — exact int64 folds
    both engines replay), plus the collision profile (distinct source
    values per bucket) a feature pipeline audits before trusting hashed
    features. One narrow projection + one hash aggregate; no vocabulary
    is ever built or broadcast — the point of feature hashing at 100 TB
    (vocabulary-free, memory-constant, schema-stable)."""
    p = table(spark, sf, "part")
    h = p.select(
        "p_type",
        (_portable_string_hash(F.col("p_type")) % _FH_BUCKETS).alias(
            "bucket"
        ),
    )
    return h.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("p_type").alias("n_types"),
        (F.countDistinct("p_type") > 1).alias("has_collision"),
    )


# ---------------------------------------------------------------------------
# ml_kfold_assign / ml_class_rebalance (round 5)
# ---------------------------------------------------------------------------

_MIX = "((({k} % 2147483648) * 2654435761) % 9007199254740881)"
_KFOLDS = 5


@query(
    "ml_kfold_assign",
    oracle=f"""
    WITH f AS (
      SELECT vec_id, label, {_MIX.format(k="vec_id")} % {_KFOLDS} AS fold
      FROM embeddings)
    SELECT fold, label, COUNT(*) AS n,
           round(COUNT(*) / CAST(SUM(COUNT(*)) OVER (PARTITION BY fold)
                                 AS DOUBLE), 6) AS label_share
    FROM f GROUP BY fold, label
    """,
)
def ml_kfold_assign(spark, sf):
    """Deterministic k-fold CV assignment + the stratification audit: each
    row's fold is a pure function of its id through the portable
    multiplicative mix (no shuffle, no state, reproducible across runs,
    engines and cluster sizes — the property a 100 TB training pipeline
    needs so folds never move between jobs), and the output is the
    per-fold label distribution a modeler checks before trusting the
    split. One narrow projection + one hash aggregate; the per-fold
    share reuses the aggregate's own exchange for its window."""
    emb = table(spark, sf, "embeddings")
    fold = (
        F.pmod(
            F.pmod(F.col("vec_id").cast("long"), F.lit(2147483648))
            * F.lit(2654435761),
            F.lit(9007199254740881),
        )
        % _KFOLDS
    ).alias("fold")
    f = emb.select(fold, "label")
    from pyspark.sql import Window as W

    counts = f.groupBy("fold", "label").agg(F.count(F.lit(1)).alias("n"))
    tot = W.partitionBy("fold")
    return counts.select(
        "fold", "label", "n",
        F.round(
            F.col("n") / F.sum("n").over(tot).cast("double"), 6
        ).alias("label_share"),
    )


@query(
    "ml_class_rebalance",
    oracle=f"""
    WITH n_l AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    tgt AS (SELECT MIN(n) AS target FROM n_l),
    kept AS (
      SELECT d.lang FROM documents d
      JOIN n_l ON n_l.lang = d.lang CROSS JOIN tgt
      WHERE ({_MIX.format(k="d.doc_id")} % 1000000)
            < (1000000 * tgt.target) / n_l.n)
    SELECT n_l.lang, n_l.n AS n_before,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           round(COALESCE(k.n_kept, 0) / CAST(n_l.n AS DOUBLE), 6)
             AS keep_rate
    FROM n_l LEFT JOIN (
      SELECT lang, COUNT(*) AS n_kept FROM kept GROUP BY lang) k
      ON k.lang = n_l.lang
    """,
)
def ml_class_rebalance(spark, sf):
    """Deterministic class REBALANCING plan: undersample every language
    to (approximately) the minority class via a pure hash threshold —
    keep doc iff mix(id) mod 1e6 < 1e6·target/n_class. No sampling
    state, no per-class sorts or limits (a per-class LIMIT would funnel
    each class through one task): the keep decision is a row-local
    integer predicate, so it distributes perfectly and reproduces
    identically on any engine — the audit rows (per-class before/kept/
    rate) are what the pipeline logs. The threshold compares an exact
    integer hash against 1e6·target/n in double — both operands exactly
    representable, identical in both engines."""
    docs = table(spark, sf, "documents")
    n_l = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tgt = n_l.agg(F.min("n").alias("target"))
    mix = F.pmod(
        F.pmod(F.col("doc_id").cast("long"), F.lit(2147483648))
        * F.lit(2654435761),
        F.lit(9007199254740881),
    )
    kept = (
        docs.join(F.broadcast(n_l), "lang")
        .join(F.broadcast(tgt))
        .filter(
            F.pmod(mix, F.lit(1000000))
            < (F.lit(1000000) * F.col("target")).cast("long")
            / F.col("n").cast("long")
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        n_l.join(kept, "lang", "left")
        .select(
            "lang",
            F.col("n").alias("n_before"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.round(
                F.coalesce("n_kept", F.lit(0)) / F.col("n").cast("double"), 6
            ).alias("keep_rate"),
        )
    )


@query(
    "sample_mixture_plan",
    oracle="""
    WITH n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY 1),
    tgt AS (SELECT MIN(n_docs) AS n_target FROM n),
    s AS (SELECT d.source, d.doc_id,
                 ((d.doc_id % 1048576) * 2654435761 + 12345) % 1048576
                   AS u
          FROM documents d),
    sampled AS (SELECT s.source,
                       CAST(COUNT(*) AS BIGINT) AS n_sampled
                FROM s JOIN n USING (source), tgt
                WHERE s.u * n.n_docs < tgt.n_target * 1048576
                GROUP BY 1)
    SELECT n.source, n.n_docs,
           (SELECT n_target FROM tgt) AS n_target,
           COALESCE(sampled.n_sampled, 0) AS n_sampled
    FROM n LEFT JOIN sampled USING (source)
    """,
)
def sample_mixture_plan(spark, sf):
    """Training-MIX sampling plan (round 11 — the data-mixing op every
    pretraining pipeline runs before a token leaves the lake): rebalance
    sources to a target mixture — here 'equalize to the smallest
    source', the simplest production target; any per-source ppm table
    drops into the same inequality — with a DETERMINISTIC hash gate, so
    the sampled set is reproducible run-to-run and engine-to-engine
    (the property 'random()' sampling can never give an audit). The
    gate is pure bounded integer arithmetic: u = ((doc_id mod 2²⁰) ·
    2654435761 + 12345) mod 2²⁰ (a Knuth multiplicative mix on a
    pre-reduced id — pre-reducing keeps every intermediate below 2⁵²,
    so no engine's int64 overflows at ANY corpus size), and a doc is
    kept iff u · n_source < n_target · 2²⁰ — the cross-multiplied
    integer form of u/2²⁰ < target_rate, no float ratio anywhere. The
    report is the audit: per source, corpus count, the shared target,
    and the exact deterministic sampled count (~target ± grid
    granularity). Plan: one hash aggregate for the counts, the 1-row
    min as a broadcast scalar, one linear gate pass — the sample
    itself never shuffles."""
    docs = table(spark, sf, "documents")
    n = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tgt = n.agg(F.min("n_docs").alias("n_target"))
    u = (
        (F.col("doc_id") % 1048576) * F.lit(2654435761) + 12345
    ) % 1048576
    sampled = (
        docs.select("source", u.alias("_u"))
        .join(F.broadcast(n), "source")
        .crossJoin(F.broadcast(tgt))
        .filter(F.col("_u") * F.col("n_docs")
                < F.col("n_target") * 1048576)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))
    )
    return (
        n.join(sampled, "source", "left")
        .crossJoin(F.broadcast(tgt))
        .select(
            "source", "n_docs", "n_target",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        )
    )
