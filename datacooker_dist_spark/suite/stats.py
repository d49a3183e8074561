"""Round-4e suite wave: statistical inference and ML-evaluation operators
— chi-square independence, Welch's t-test, exact tie-aware ROC-AUC,
probability-calibration bins, decile lift/gains, threshold confusion
matrix (+MCC), Kaplan-Meier survival, Markov-chain stationary
distribution, grid-blocked DBSCAN, and per-group min-max scaling.

Every query except none is exact-oracled against DuckDB. Scale posture:
- No global single-partition windows anywhere: the two rank/prefix
  passes (AUC, lift deciles) run on the distributed two-pass operators
  (:func:`..operators.relational.global_rank` /
  :func:`~..operators.relational.global_prefix_sum`) — range shuffle +
  per-partition windows + a P-integer driver round-trip.
- Scalars (totals, max date, class priors) ride plans as broadcast
  1-row joins; ratios divide exact integer/decimal aggregates once at
  the end, so outputs are bit-stable under any partitioning.
- Float-sum order never leaks: per-cell/per-term doubles round to a
  fixed decimal grid and accumulate as DECIMAL (associative), or stay
  integer until a single final division.
- The two sequential computations with no parallel form — the K×K
  Markov power iteration and the Kaplan-Meier running product — operate
  on provably bounded domains (the state alphabet, the calendar-day
  span): the iteration is driver-side math on a collected ≤64-state
  matrix (the bounded-collect precedent of the BPE argmax), the product
  is an ordered fold over a per-day array, reproduced element-for-
  element by DuckDB's ordered ``list_reduce`` so both engines execute
  the identical IEEE operation sequence.
- DBSCAN's neighbor pass is the grid-bucketed radius self-join (linear
  equi-join on cells, 9x fanout on one side, never all-pairs) and its
  cluster pass is the same union-find-filtering connected-components
  operator the dedup families use.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import query, table

# ---------------------------------------------------------------------------
# stat_chi2_independence
# ---------------------------------------------------------------------------


@query(
    "stat_chi2_independence",
    oracle="""
    WITH cells AS (
        SELECT source, lang, COUNT(*) AS o
        FROM documents GROUP BY source, lang
    ),
    rt AS (SELECT source, SUM(o) AS r FROM cells GROUP BY source),
    ct AS (SELECT lang, SUM(o) AS c FROM cells GROUP BY lang),
    n AS (SELECT SUM(o) AS n, COUNT(*) AS n_cells FROM cells),
    dims AS (SELECT (SELECT COUNT(*) FROM rt) AS n_rows,
                    (SELECT COUNT(*) FROM ct) AS n_cols),
    terms AS (
        SELECT CAST(round(
            (cells.o - CAST(rt.r * ct.c AS DOUBLE) / n.n)
            * (cells.o - CAST(rt.r * ct.c AS DOUBLE) / n.n)
            / (CAST(rt.r * ct.c AS DOUBLE) / n.n), 9) AS DECIMAL(30,9))
          AS term
        FROM cells
        JOIN rt ON rt.source = cells.source
        JOIN ct ON ct.lang = cells.lang
        CROSS JOIN n
    )
    SELECT CAST(n.n AS BIGINT) AS n,
           CAST(n.n_cells AS BIGINT) AS n_cells,
           CAST((d.n_rows - 1) * (d.n_cols - 1) AS BIGINT) AS dof,
           round(CAST(SUM(term) AS DOUBLE), 6) AS chi2,
           round(sqrt(round(CAST(SUM(term) AS DOUBLE), 6)
                 / (n.n * LEAST(d.n_rows - 1, d.n_cols - 1))), 6)
             AS cramers_v
    FROM terms CROSS JOIN n CROSS JOIN dims d
    GROUP BY n.n, n.n_cells, d.n_rows, d.n_cols
    """,
)
def stat_chi2_independence(spark, sf):
    """Pearson chi-square test of independence between document source and
    language, with Cramer's V effect size — the categorical-association
    screen a feature-selection pass runs per column pair.

    Scale shape: one (source, lang) hash aggregate; row/column marginals
    are tiny re-aggregates of the cell table broadcast back via
    equi-joins; the grand total is a broadcast scalar. Each cell's
    (o-e)^2/e term is a deterministic double chain (integer product,
    one division each step — no fusable multiply-add), rounded to a
    1e-9 grid and accumulated as DECIMAL so the cross-partition sum
    order cannot drift the statistic."""
    cells = (
        table(spark, sf, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rt = cells.groupBy("source").agg(F.sum("o").alias("r"))
    ct = cells.groupBy("lang").agg(F.sum("o").alias("c"))
    n = cells.agg(
        F.sum("o").alias("n"), F.count(F.lit(1)).alias("n_cells")
    )
    dims = rt.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
        ct.agg(F.count(F.lit(1)).alias("n_cols"))
    )
    e = (F.col("r") * F.col("c")).cast("double") / F.col("n")
    term = F.round((F.col("o") - e) * (F.col("o") - e) / e, 9).cast(
        "decimal(30,9)"
    )
    chi2 = F.round(F.sum(term).cast("double"), 6)
    return (
        cells.join(rt, "source")
        .join(ct, "lang")
        .join(F.broadcast(n))
        .join(F.broadcast(dims))
        .groupBy("n", "n_cells", "n_rows", "n_cols")
        .agg(chi2.alias("_chi2"))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("n_cells").cast("long").alias("n_cells"),
            ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
            .cast("long")
            .alias("dof"),
            F.col("_chi2").alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("_chi2")
                    / (
                        F.col("n")
                        * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1)
                    )
                ),
                6,
            ).alias("cramers_v"),
        )
    )


# ---------------------------------------------------------------------------
# stat_welch_ttest
# ---------------------------------------------------------------------------


def _welch_group_sql(etype: str) -> str:
    return f"""
        SELECT COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(25,2))) AS s,
               SUM(CAST(value * value AS DECIMAL(25,4))) AS q
        FROM events WHERE event_type = '{etype}'
    """


@query(
    "stat_welch_ttest",
    oracle=f"""
    WITH g1 AS ({_welch_group_sql("purchase")}),
    g2 AS ({_welch_group_sql("view")}),
    m AS (
        SELECT g1.n AS n1, g2.n AS n2,
               CAST(g1.s AS DOUBLE) / g1.n AS m1,
               CAST(g2.s AS DOUBLE) / g2.n AS m2,
               (CAST(g1.n * g1.q AS DOUBLE)
                - round(CAST(g1.s AS DOUBLE) * CAST(g1.s AS DOUBLE), 4))
               / (CAST(g1.n AS DOUBLE) * (g1.n - 1)) AS v1,
               (CAST(g2.n * g2.q AS DOUBLE)
                - round(CAST(g2.s AS DOUBLE) * CAST(g2.s AS DOUBLE), 4))
               / (CAST(g2.n AS DOUBLE) * (g2.n - 1)) AS v2,
               CAST(g1.s * g2.n - g2.s * g1.n AS DOUBLE)
               / (CAST(g1.n AS DOUBLE) * g2.n) AS delta
        FROM g1 CROSS JOIN g2
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(m1, 6) AS mean1, round(m2, 6) AS mean2,
           round(v1, 6) AS var1, round(v2, 6) AS var2,
           round(delta / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df_welch
    FROM m
    """,
)
def stat_welch_ttest(spark, sf):
    """Welch's unequal-variance two-sample t-test comparing the value
    distributions of 'purchase' vs 'view' events: t statistic and the
    Welch-Satterthwaite effective degrees of freedom.

    Scale shape: two filtered hash aggregates (count, decimal-exact sum,
    decimal-exact sum of squares — value is cent-quantized so value^2 is
    exact at scale 4) crossed as 1-row broadcasts. Means, variances and
    the t statistic derive from those exact aggregates through a chain
    of IEEE divisions/one sqrt with no fusable multiply-add, so both
    engines produce bit-identical doubles; the one double x double
    square (s^2) re-rounds to its mathematically exact scale-4 grid
    before subtraction. n*q and s*s stay within double's exact-integer
    range at test scales; a 100 TB run would move these to DECIMAL
    throughout."""

    def grp(etype):
        v = F.col("value")
        return (
            table(spark, sf, "events")
            .filter(F.col("event_type") == etype)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(v.cast("decimal(25,2)")).alias("s"),
                F.sum((v * v).cast("decimal(25,4)")).alias("q"),
            )
        )

    g1 = grp("purchase").select(
        F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("q").alias("q1")
    )
    g2 = grp("view").select(
        F.col("n").alias("n2"), F.col("s").alias("s2"), F.col("q").alias("q2")
    )
    m = g1.join(F.broadcast(g2)).select(
        "n1",
        "n2",
        (F.col("s1").cast("double") / F.col("n1")).alias("m1"),
        (F.col("s2").cast("double") / F.col("n2")).alias("m2"),
        (
            (
                (F.col("n1") * F.col("q1")).cast("double")
                - F.round(
                    F.col("s1").cast("double") * F.col("s1").cast("double"), 4
                )
            )
            / (F.col("n1").cast("double") * (F.col("n1") - 1))
        ).alias("v1"),
        (
            (
                (F.col("n2") * F.col("q2")).cast("double")
                - F.round(
                    F.col("s2").cast("double") * F.col("s2").cast("double"), 4
                )
            )
            / (F.col("n2").cast("double") * (F.col("n2") - 1))
        ).alias("v2"),
        (
            (F.col("s1") * F.col("n2") - F.col("s2") * F.col("n1")).cast(
                "double"
            )
            / (F.col("n1").cast("double") * F.col("n2"))
        ).alias("delta"),
    )
    se1 = F.col("v1") / F.col("n1")
    se2 = F.col("v2") / F.col("n2")
    return m.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round("m1", 6).alias("mean1"),
        F.round("m2", 6).alias("mean2"),
        F.round("v1", 6).alias("var1"),
        F.round("v2", 6).alias("var2"),
        F.round(F.col("delta") / F.sqrt(se1 + se2), 6).alias("t_stat"),
        F.round(
            (se1 + se2)
            * (se1 + se2)
            / (
                se1 * se1 / (F.col("n1") - 1)
                + se2 * se2 / (F.col("n2") - 1)
            ),
            6,
        ).alias("df_welch"),
    )


# ---------------------------------------------------------------------------
# eval_roc_auc
# ---------------------------------------------------------------------------


@query(
    "eval_roc_auc",
    oracle="""
    WITH per AS (
        SELECT value,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS pos,
               SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
                 AS neg
        FROM events GROUP BY value
    ),
    c AS (
        SELECT pos, neg,
               SUM(neg) OVER (ORDER BY value
                              ROWS UNBOUNDED PRECEDING) - neg AS neg_below
        FROM per
    )
    SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(neg) AS BIGINT) AS n_neg,
           CAST(COUNT(*) AS BIGINT) AS n_scores,
           round(CAST(SUM(pos * (2 * neg_below + neg)) AS DOUBLE)
                 / (2.0 * SUM(pos) * SUM(neg)), 9) AS auc,
           round(CAST(SUM(pos * (2 * neg_below + neg))
                      - SUM(pos) * SUM(neg) AS DOUBLE)
                 / (CAST(SUM(pos) AS DOUBLE) * SUM(neg)), 9) AS gini_coef
    FROM c
    """,
)
def eval_roc_auc(spark, sf):
    """Exact tie-aware ROC-AUC of the event value as a 'purchase'
    classifier score, via the Mann-Whitney rank-sum identity:
    AUC = [sum_s pos_s * neg_below(s) + pos_s * neg_s / 2] / (P * N)
    over the distinct-score groups — ties contribute the exact 1/2.

    Scale shape: the score domain aggregates first (one hash aggregate),
    then the running negative count comes off the DISTRIBUTED prefix-sum
    operator (range shuffle + per-partition windows + a P-integer driver
    round-trip) — never a single-partition ORDER BY window. The doubled
    numerator stays in exact integers until ONE final division, so AUC
    is bit-stable under any partitioning. 100 TB posture: shuffle is
    |distinct scores| (quantized domain), linear scans elsewhere."""
    from ..operators.relational import global_prefix_sum

    per = (
        table(spark, sf, "events")
        .groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("pos"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 0).otherwise(1)
            ).alias("neg"),
        )
    )
    pre = global_prefix_sum(per, ["value"], "neg", out_col="_cum", scale=0)
    num2 = F.sum(
        F.col("pos")
        * (2 * (F.col("_cum").cast("long") - F.col("neg")) + F.col("neg"))
    )
    return pre.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.count(F.lit(1)).cast("long").alias("n_scores"),
        F.round(
            num2.cast("double") / (2.0 * F.sum("pos") * F.sum("neg")), 9
        ).alias("auc"),
        F.round(
            (num2 - F.sum("pos") * F.sum("neg")).cast("double")
            / (F.sum("pos").cast("double") * F.sum("neg")),
            9,
        ).alias("gini_coef"),
    )


# ---------------------------------------------------------------------------
# eval_calibration_bins
# ---------------------------------------------------------------------------

_CAL_SCALE = 500.0  # value in (0, 490.02] -> predicted prob = value / 500


@query(
    "eval_calibration_bins",
    oracle=f"""
    SELECT LEAST(CAST(value / 50 AS BIGINT)
                 - CASE WHEN value / 50 < CAST(value / 50 AS BIGINT)
                        THEN 1 ELSE 0 END, 9) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pos,
           round(CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE)
                 / COUNT(*) / {_CAL_SCALE}, 9) AS avg_pred,
           round(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                          END) AS DOUBLE) / COUNT(*), 9) AS frac_pos,
           round(CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE)
                 / COUNT(*) / {_CAL_SCALE}
                 - CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                            END) AS DOUBLE) / COUNT(*), 9) AS cal_gap
    FROM events
    GROUP BY 1
    """,
)
def eval_calibration_bins(spark, sf):
    """Probability-calibration (reliability) bins for the value-derived
    score: per equal-width score bin, the mean predicted probability vs
    the observed positive rate and their gap — the table a calibration
    plot (and an expected-calibration-error rollup) reads from.

    Scale shape: ONE hash aggregate keyed by the integer bin; the
    predicted-probability mean uses the decimal-exact sum so the
    division chain (sum/n/scale) is deterministic; frac_pos is an exact
    integer ratio; the gap subtracts two deterministic division results
    (no fusable multiply-add). Output is bounded by the bin count."""
    ev = table(spark, sf, "events")
    bin_ = F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("long")
    avg_pred = (
        F.sum(F.col("value").cast("decimal(25,2)")).cast("double")
        / F.count(F.lit(1))
        / _CAL_SCALE
    )
    frac = (
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("double")
        / F.count(F.lit(1))
    )
    return ev.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.round(avg_pred, 9).alias("avg_pred"),
        F.round(frac, 9).alias("frac_pos"),
        F.round(avg_pred - frac, 9).alias("cal_gap"),
    )


# ---------------------------------------------------------------------------
# eval_lift_deciles
# ---------------------------------------------------------------------------


@query(
    "eval_lift_deciles",
    oracle="""
    WITH ranked AS (
        SELECT event_type,
               NTILE(10) OVER (ORDER BY value DESC, event_id DESC) AS decile
        FROM events
    ),
    per AS (
        SELECT decile, COUNT(*) AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS n_pos
        FROM ranked GROUP BY decile
    ),
    tot AS (SELECT SUM(n) AS big_n, SUM(n_pos) AS big_p FROM per),
    cum AS (
        SELECT a.decile, SUM(b.n_pos) AS cum_pos
        FROM per a JOIN per b ON b.decile <= a.decile
        GROUP BY a.decile
    )
    SELECT CAST(p.decile AS BIGINT) AS decile,
           CAST(p.n AS BIGINT) AS n,
           CAST(p.n_pos AS BIGINT) AS n_pos,
           round(CAST(p.n_pos AS DOUBLE) / p.n, 9) AS response_rate,
           round(CAST(p.n_pos * t.big_n AS DOUBLE)
                 / (CAST(p.n AS DOUBLE) * t.big_p), 9) AS lift,
           round(CAST(c.cum_pos AS DOUBLE) / t.big_p, 9) AS cum_gain
    FROM per p JOIN cum c ON c.decile = p.decile CROSS JOIN tot t
    """,
)
def eval_lift_deciles(spark, sf):
    """Decile lift and cumulative-gains table for the value score
    against the 'purchase' outcome: decile 1 = top scores; lift is the
    decile's response rate over the base rate; cum_gain the fraction of
    all positives captured through that decile — the model-targeting
    report every campaign-scoring pipeline ships.

    Scale shape: deciles come from the DISTRIBUTED ranking operator
    (range shuffle on (value DESC, event_id DESC) + per-partition
    windows + exact NTILE arithmetic — never a single-partition NTILE
    window); per-decile stats are one hash aggregate on a 10-row key;
    cumulative gains is a bounded 10x10 non-equi self-join. Lift and
    gain divide exact integer products once."""
    from ..operators.relational import global_rank, ntile_bucket

    ev = table(spark, sf, "events").select("event_id", "event_type", "value")
    ranked = global_rank(
        ev,
        [F.col("value").desc(), F.col("event_id").desc()],
        rank_col="_r",
    )
    n_df = ev.agg(F.count(F.lit(1)).alias("_n"))
    per = (
        ranked.join(F.broadcast(n_df))
        .select(
            ntile_bucket(F.col("_r"), F.col("_n"), 10).alias("decile"),
            "event_type",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_pos"),
        )
    )
    tot = per.agg(F.sum("n").alias("big_n"), F.sum("n_pos").alias("big_p"))
    b = per.select(
        F.col("decile").alias("_bd"), F.col("n_pos").alias("_bp")
    )
    cum = (
        per.join(b, F.col("_bd") <= F.col("decile"))
        .groupBy("decile")
        .agg(F.sum("_bp").alias("cum_pos"))
    )
    return (
        per.join(cum, "decile")
        .join(F.broadcast(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n").cast("long").alias("n"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.round(F.col("n_pos").cast("double") / F.col("n"), 9).alias(
                "response_rate"
            ),
            F.round(
                (F.col("n_pos") * F.col("big_n")).cast("double")
                / (F.col("n").cast("double") * F.col("big_p")),
                9,
            ).alias("lift"),
            F.round(
                F.col("cum_pos").cast("double") / F.col("big_p"), 9
            ).alias("cum_gain"),
        )
    )


# ---------------------------------------------------------------------------
# eval_confusion_threshold
# ---------------------------------------------------------------------------

_CONF_THRESHOLD = 300.0


@query(
    "eval_confusion_threshold",
    oracle=f"""
    WITH c AS (
        SELECT
          SUM(CASE WHEN value >= {_CONF_THRESHOLD}
                    AND event_type = 'purchase' THEN 1 ELSE 0 END) AS tp,
          SUM(CASE WHEN value >= {_CONF_THRESHOLD}
                    AND event_type <> 'purchase' THEN 1 ELSE 0 END) AS fp,
          SUM(CASE WHEN value < {_CONF_THRESHOLD}
                    AND event_type = 'purchase' THEN 1 ELSE 0 END) AS fn,
          SUM(CASE WHEN value < {_CONF_THRESHOLD}
                    AND event_type <> 'purchase' THEN 1 ELSE 0 END) AS tn
        FROM events
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           round(CAST(tp AS DOUBLE) / (tp + fp), 9) AS precision_,
           round(CAST(tp AS DOUBLE) / (tp + fn), 9) AS recall_,
           round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 9) AS f1,
           round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 9)
             AS accuracy,
           round(CAST(tp * tn - fp * fn AS DOUBLE)
                 / sqrt(CAST((tp + fp) * (tp + fn) AS DOUBLE)
                        * CAST((tn + fp) * (tn + fn) AS DOUBLE)), 9) AS mcc
    FROM c
    """,
)
def eval_confusion_threshold(spark, sf):
    """Confusion matrix of the thresholded value score against the
    'purchase' outcome, with precision / recall / F1 / accuracy and the
    Matthews correlation coefficient — the fixed-operating-point report
    behind every binary-classifier dashboard.

    Scale shape: ONE full-scan hash aggregate producing four integers;
    every metric is a ratio of exact 64-bit integer products with a
    single final division (F1 uses the integer identity
    2tp/(2tp+fp+fn); MCC keeps both products in BIGINT and pairs them
    before the one sqrt) — bit-stable under any partitioning."""
    pred = F.col("value") >= _CONF_THRESHOLD
    actual = F.col("event_type") == "purchase"

    def cnt(p, a):
        return F.sum(F.when(p & a, 1).otherwise(0))

    c = table(spark, sf, "events").agg(
        cnt(pred, actual).alias("tp"),
        cnt(pred, ~actual).alias("fp"),
        cnt(~pred, actual).alias("fn"),
        cnt(~pred, ~actual).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    return c.select(
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        tn.cast("long").alias("tn"),
        F.round(tp.cast("double") / (tp + fp), 9).alias("precision_"),
        F.round(tp.cast("double") / (tp + fn), 9).alias("recall_"),
        F.round((2 * tp).cast("double") / (2 * tp + fp + fn), 9).alias("f1"),
        F.round((tp + tn).cast("double") / (tp + fp + fn + tn), 9).alias(
            "accuracy"
        ),
        F.round(
            (tp * tn - fp * fn).cast("double")
            / F.sqrt(
                ((tp + fp) * (tp + fn)).cast("double")
                * ((tn + fp) * (tn + fn)).cast("double")
            ),
            9,
        ).alias("mcc"),
    )


# ---------------------------------------------------------------------------
# stat_kaplan_meier
# ---------------------------------------------------------------------------

_KM_CENSOR_DAYS = 90


@query(
    "stat_kaplan_meier",
    oracle=f"""
    WITH cust AS (
        SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_d,
               MAX(CAST(o_orderdate AS DATE)) AS last_d
        FROM orders GROUP BY o_custkey
    ),
    mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS big_max FROM orders),
    life AS (
        SELECT last_d - first_d AS duration,
               CASE WHEN last_d <= big_max - {_KM_CENSOR_DAYS}
                    THEN 1 ELSE 0 END AS observed
        FROM cust CROSS JOIN mx
    ),
    n AS (SELECT COUNT(*) AS total FROM life),
    days AS (
        SELECT duration, SUM(observed) AS d,
               SUM(1 - observed) AS cens
        FROM life GROUP BY duration
    ),
    risk AS (
        SELECT a.duration, a.d, a.cens,
               n.total - COALESCE(SUM(b.d + b.cens), 0) AS at_risk
        FROM days a
        LEFT JOIN days b ON b.duration < a.duration
        CROSS JOIN n
        GROUP BY a.duration, a.d, a.cens, n.total
    ),
    f AS (
        SELECT duration, d, cens, at_risk,
               round(CAST(at_risk - d AS DOUBLE) / at_risk, 12) AS factor
        FROM risk
    )
    SELECT CAST(a.duration AS BIGINT) AS duration_day,
           CAST(a.at_risk AS BIGINT) AS n_at_risk,
           CAST(a.d AS BIGINT) AS n_events,
           CAST(a.cens AS BIGINT) AS n_censored,
           round(list_reduce(list(b.factor ORDER BY b.duration),
                             (x, y) -> x * y), 9) AS survival
    FROM f a JOIN f b ON b.duration <= a.duration AND b.d > 0
    WHERE a.d > 0
    GROUP BY a.duration, a.at_risk, a.d, a.cens
    """,
)
def stat_kaplan_meier(spark, sf):
    """Kaplan-Meier survival estimator over customer order-activity
    lifetimes (first to last order; lifetimes ending within
    {_KM_CENSOR_DAYS} days of the dataset's end are right-censored):
    S(t) = prod over event days t' <= t of (1 - d/n_at_risk) — the
    product-limit curve a churn/retention pipeline fits per cohort.

    Scale shape: per-customer lifetimes are one hash aggregate; the
    curve then lives on the BOUNDED duration-day domain (the calendar
    span), so the at-risk prefix and the survival product are non-equi
    joins of that bounded day table against itself — never a window
    over the customer dimension. The running product — inherently
    sequential — is an ordered fold over the per-day factor array,
    each factor pre-rounded to a 1e-12 grid; DuckDB's ordered
    ``list_reduce`` replays the identical multiply sequence, so the
    curve is bit-stable."""
    o = table(spark, sf, "orders")
    od = F.col("o_orderdate").cast("date")
    cust = o.groupBy("o_custkey").agg(
        F.min(od).alias("first_d"), F.max(od).alias("last_d")
    )
    mx = o.agg(F.max(od).alias("big_max"))
    life = cust.join(F.broadcast(mx)).select(
        F.datediff("last_d", "first_d").alias("duration"),
        F.when(
            F.col("last_d") <= F.date_sub("big_max", _KM_CENSOR_DAYS), 1
        )
        .otherwise(0)
        .alias("observed"),
    )
    n = life.agg(F.count(F.lit(1)).alias("total"))
    days = life.groupBy("duration").agg(
        F.sum("observed").alias("d"),
        F.sum(1 - F.col("observed")).alias("cens"),
    )
    b = days.select(
        F.col("duration").alias("_bd"),
        (F.col("d") + F.col("cens")).alias("_bn"),
    )
    risk = (
        days.join(b, F.col("_bd") < F.col("duration"), "left")
        .groupBy("duration", "d", "cens")
        .agg(F.coalesce(F.sum("_bn"), F.lit(0)).alias("_before"))
        .join(F.broadcast(n))
        .select(
            "duration",
            "d",
            "cens",
            (F.col("total") - F.col("_before")).alias("at_risk"),
        )
    )
    f = risk.select(
        "duration",
        "d",
        "cens",
        "at_risk",
        F.round(
            (F.col("at_risk") - F.col("d")).cast("double")
            / F.col("at_risk"),
            12,
        ).alias("factor"),
    )
    fb = f.filter(F.col("d") > 0).select(
        F.col("duration").alias("_fd"), F.col("factor").alias("_ff")
    )
    return (
        f.filter(F.col("d") > 0)
        .join(fb, F.col("_fd") <= F.col("duration"))
        .groupBy("duration", "at_risk", "d", "cens")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_fd"), F.col("_ff")))
                    ),
                    F.lit(1.0),
                    lambda acc, x: acc * x["_ff"],
                ),
                9,
            ).alias("survival")
        )
        .select(
            F.col("duration").cast("long").alias("duration_day"),
            F.col("at_risk").cast("long").alias("n_at_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.col("cens").cast("long").alias("n_censored"),
            "survival",
        )
    )


# ---------------------------------------------------------------------------
# stat_markov_stationary
# ---------------------------------------------------------------------------

# 12 power-iteration steps: the 5-state chain is stable at 9 decimals by
# step ~4; kept low because DuckDB plans the unrolled-CTE oracle in time
# quadratic-ish in the chain depth (40 steps stalls its optimizer).
_MARKOV_ITERS = 12
_MARKOV_MAX_STATES = 64


def _markov_oracle() -> str:
    """Unrolled power iteration: iteration i+1 folds, per to-state, the
    pi_k * P(k, j) products in ascending from-state order — the exact
    IEEE operation sequence the Spark-side driver math replays."""
    head = """
    WITH trans AS (
        SELECT prev AS from_state, event_type AS to_state, COUNT(*) AS c
        FROM (
            SELECT event_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events
        ) WHERE prev IS NOT NULL
        GROUP BY prev, event_type
    ),
    outs AS (SELECT from_state, SUM(c) AS n FROM trans GROUP BY from_state),
    p AS (
        SELECT t.from_state, t.to_state, CAST(t.c AS DOUBLE) / o.n AS prob
        FROM trans t JOIN outs o ON o.from_state = t.from_state
    ),
    k AS (SELECT COUNT(*) AS k FROM outs),
    pi0 AS (SELECT from_state AS state, CAST(1 AS DOUBLE) / k.k AS pi
            FROM outs CROSS JOIN k)
    """
    steps = "".join(
        f""",
    pi{i + 1} AS (
        SELECT p.to_state AS state,
               list_reduce(list(pi{i}.pi * p.prob ORDER BY pi{i}.state),
                           (x, y) -> x + y) AS pi
        FROM pi{i} JOIN p ON p.from_state = pi{i}.state
        GROUP BY p.to_state
    )"""
        for i in range(_MARKOV_ITERS)
    )
    tail = f"""
    SELECT pi{_MARKOV_ITERS}.state AS event_type,
           round(pi{_MARKOV_ITERS}.pi, 9) AS stationary_prob,
           CAST(o.n AS BIGINT) AS n_transitions_out
    FROM pi{_MARKOV_ITERS} JOIN outs o ON o.from_state = pi{_MARKOV_ITERS}.state
    """
    return head + steps + tail


@query("stat_markov_stationary", oracle=_markov_oracle())
def stat_markov_stationary(spark, sf):
    """Stationary distribution of the per-user event-type Markov chain
    (power iteration on the empirical transition matrix) — where user
    behavior concentrates in the long run.

    Scale shape: the transition count is a per-user LAG window (keyed,
    never global) + a hash aggregate; the matrix is then BOUNDED by the
    event-type alphabet (asserted <= {_MARKOV_MAX_STATES} states, K^2
    rows), so the iteration itself is driver-side math on a collected
    K x K table — the bounded-collect precedent of the BPE argmax.
    NOTE (documented eager exception, ADVICE r04): that collect runs at
    DataFrame-CONSTRUCTION time, so this builder executes one bounded
    aggregate job even for a caller that only inspects the plan — same
    contract as the eagerly-checkpointing iterative operators. Both
    engines replay the identical float sequence: probabilities are the
    same c/n divisions, and each iteration folds pi_k * P(k,j) in
    ascending from-state order (Python ``reduce`` here, DuckDB's
    ordered ``list_reduce`` in the oracle), so no float-sum order can
    drift."""
    from functools import reduce

    ev = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev")
        )
        .filter(F.col("prev").isNotNull())
        .groupBy(
            F.col("prev").alias("from_state"),
            F.col("event_type").alias("to_state"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rows = trans.collect()
    states = sorted({r["from_state"] for r in rows})
    if len(states) > _MARKOV_MAX_STATES:
        raise ValueError(
            f"Markov power iteration is driver-side math bounded to "
            f"{_MARKOV_MAX_STATES} states; got {len(states)} — use the "
            "distributed iterate-as-joins form for large alphabets"
        )
    outs = {}
    for r in rows:
        outs[r["from_state"]] = outs.get(r["from_state"], 0) + r["c"]
    # P(k, j) with the same IEEE division as the oracle's CAST/n.
    p: dict[str, list[tuple[str, float]]] = {s: [] for s in states}
    for r in rows:
        p[r["from_state"]].append(
            (r["to_state"], r["c"] / outs[r["from_state"]])
        )
    pi = {s: 1.0 / len(states) for s in states}
    for _ in range(_MARKOV_ITERS):
        terms: dict[str, list[float]] = {}
        for k in states:  # ascending from-state order
            pik = pi.get(k)
            if pik is None:
                continue
            for j, prob in p[k]:
                terms.setdefault(j, []).append(pik * prob)
        pi = {j: reduce(lambda a, b: a + b, ts) for j, ts in terms.items()}
    out = [
        (s, round(pi[s], 9), outs[s])
        for s in states
        if s in pi
    ]
    return spark.createDataFrame(
        out, "event_type string, stationary_prob double, n_transitions_out long"
    )


# ---------------------------------------------------------------------------
# stat_dbscan_grid
# ---------------------------------------------------------------------------

_DB_EPS = 2500  # centi-units, same field as the geo suite
_DB_EPS2 = _DB_EPS * _DB_EPS
_DB_MINPTS = 4
_XC = "({k} * 7919) % 100000"
_YC = "({k} * 104729) % 100000"


@query(
    "stat_dbscan_grid",
    oracle=f"""
    WITH RECURSIVE c AS (
      SELECT c_custkey, {_XC.format(k="c_custkey")} AS x,
             {_YC.format(k="c_custkey")} AS y
      FROM customer),
    nb AS (
      SELECT a.c_custkey AS s, b.c_custkey AS t
      FROM c a JOIN c b
        ON a.c_custkey <> b.c_custkey
       AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
           <= {_DB_EPS2}),
    core AS (
      SELECT s AS id FROM nb GROUP BY s
      HAVING COUNT(*) + 1 >= {_DB_MINPTS}),
    ce AS (
      SELECT nb.s, nb.t FROM nb
      JOIN core x ON x.id = nb.s JOIN core y ON y.id = nb.t),
    reach AS (
      SELECT s, t FROM ce
      UNION
      SELECT r.s, e.t FROM reach r JOIN ce e ON r.t = e.s
      WHERE e.t <> r.s),
    clab AS (
      SELECT co.id, COALESCE(LEAST(co.id, m.mt), co.id) AS cid
      FROM core co
      LEFT JOIN (SELECT s, MIN(t) AS mt FROM reach GROUP BY s) m
        ON m.s = co.id),
    blab AS (
      SELECT nb.s AS id, MIN(cl.cid) AS cid
      FROM nb JOIN clab cl ON cl.id = nb.t
      WHERE nb.s NOT IN (SELECT id FROM clab)
      GROUP BY nb.s)
    SELECT c.c_custkey,
           CASE WHEN cl.id IS NOT NULL THEN 'core'
                WHEN bl.id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           CAST(COALESCE(cl.cid, bl.cid, -1) AS BIGINT) AS cluster_id
    FROM c
    LEFT JOIN clab cl ON cl.id = c.c_custkey
    LEFT JOIN blab bl ON bl.id = c.c_custkey
    """,
)
def stat_dbscan_grid(spark, sf):
    """DBSCAN density clustering over the customer planar sites
    (eps = {_DB_EPS} centi-units, minPts = {_DB_MINPTS}): core points
    (dense neighborhoods) chain into clusters via core-core
    reachability, border points attach to their minimum adjacent core
    cluster, the rest are noise (cluster_id -1) — the density
    generalization of the suite's single-linkage ``geo_cluster_radius``.

    Scale shape: the neighbor pass is the grid-bucketed radius
    SELF-join (hash equi-join on cells, 9x fanout one side — linear,
    never all-pairs); core selection is a hash aggregate on that edge
    list; clustering reuses the union-find-filtering
    connected-components operator (core subgraph only, typically a
    small fraction of the corpus); border attachment is one more
    equi-join + min aggregate. Integer-exact geometry keeps both
    engines bit-identical; the oracle brute-forces the pair space and
    closes reachability with a recursive CTE."""
    from ..operators.dedup import connected_components
    from ..operators.spatial import grid_radius_join

    pts = table(spark, sf, "customer").select(
        "c_custkey",
        F.expr(_XC.format(k="c_custkey")).alias("x"),
        F.expr(_YC.format(k="c_custkey")).alias("y"),
    )
    right = pts.select(
        F.col("c_custkey").alias("b_key"), F.col("x").alias("x"),
        F.col("y").alias("y"),
    )
    nb = (
        grid_radius_join(pts, right, radius=_DB_EPS)
        .filter(F.col("c_custkey") != F.col("b_key"))
        .select(F.col("c_custkey").alias("s"), F.col("b_key").alias("t"))
        .persist()
    )
    core = (
        nb.groupBy("s")
        .agg(F.count(F.lit(1)).alias("_deg"))
        .filter(F.col("_deg") + 1 >= _DB_MINPTS)
        .select(F.col("s").alias("id"))
    )
    ce = (
        nb.join(core.withColumnRenamed("id", "s"), "s")
        .join(core.withColumnRenamed("id", "t"), "t")
        .filter(F.col("s") < F.col("t"))
        .select(F.col("s").alias("id_a"), F.col("t").alias("id_b"))
    )
    # parts=4: the core-core edge set is tiny (dup-dense neighborhoods
    # only), so the union-find first pass starts narrow — passed as an
    # operator arg instead of mutating session shuffle conf (ADVICE r04).
    comp = connected_components(ce, parts=4)
    clab = core.join(
        comp.withColumnRenamed("id_a", "id"), "id", "left"
    ).select("id", F.coalesce("cluster_id", "id").alias("cid"))
    blab = (
        nb.join(
            clab.select(F.col("id").alias("t"), F.col("cid")), "t"
        )
        .join(clab.select(F.col("id").alias("s")), "s", "left_anti")
        .groupBy("s")
        .agg(F.min("cid").alias("bcid"))
        .select(F.col("s").alias("b_id"), "bcid")
    )
    out = (
        pts.join(clab.withColumnRenamed("id", "c_custkey"), "c_custkey", "left")
        .join(blab.withColumnRenamed("b_id", "c_custkey"), "c_custkey", "left")
        .select(
            "c_custkey",
            F.when(F.col("cid").isNotNull(), "core")
            .when(F.col("bcid").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
            F.coalesce("cid", "bcid", F.lit(-1))
            .cast("long")
            .alias("cluster_id"),
        )
    )
    # Eager result + release: connected_components already executes jobs
    # at build time (its union-find passes checkpoint eagerly), so this
    # builder was never plan-only; materializing the per-customer labels
    # lets the corpus-sized neighbor cache drop instead of accumulating
    # across a 315-query sweep (ADVICE r04).
    out = out.localCheckpoint()
    nb.unpersist()
    return out


# ---------------------------------------------------------------------------
# feature_minmax_scale
# ---------------------------------------------------------------------------


@query(
    "feature_minmax_scale",
    oracle="""
    WITH ext AS (
        SELECT lang, MIN(n_chars) AS mn, MAX(n_chars) AS mx
        FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars,
           CASE WHEN e.mx > e.mn
                THEN round(CAST(d.n_chars - e.mn AS DOUBLE)
                           / (e.mx - e.mn), 9)
                ELSE 0.5 END AS scaled_01
    FROM documents d JOIN ext e ON e.lang = d.lang
    """,
)
def feature_minmax_scale(spark, sf):
    """Per-language min-max scaling of document length into [0, 1] —
    the grouped feature normalizer a training pipeline applies before
    mixing heterogeneous slices (degenerate single-value groups pin to
    0.5 in both engines).

    Scale shape: one hash aggregate for the per-group extrema (a
    group-count-sized table) joined back by the group key — at real
    cardinalities Catalyst broadcasts it; the scan stays linear and the
    scaled value is one exact-integer subtraction/division per row."""
    d = table(spark, sf, "documents")
    ext = d.groupBy("lang").agg(
        F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx")
    )
    return d.join(ext, "lang").select(
        "doc_id",
        "lang",
        "n_chars",
        F.when(
            F.col("mx") > F.col("mn"),
            F.round(
                (F.col("n_chars") - F.col("mn")).cast("double")
                / (F.col("mx") - F.col("mn")),
                9,
            ),
        )
        .otherwise(0.5)
        .alias("scaled_01"),
    )


# ---------------------------------------------------------------------------
# stat_pca_power_iteration (round 5)
# ---------------------------------------------------------------------------

_PCA_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_PCA_ITERS = 3
_PCA_SUM_DEC = "DECIMAL(38,4)"
# Small-precision grid for the iteration: DECIMAL(15,6) products are
# DECIMAL(31,12) in BOTH engines (no precision cap, no engine-specific
# scale reduction), so every multiply/add is exact and the per-step
# round-to-6 lands on identical grid values everywhere.
_PCA_DEC = "DECIMAL(15,6)"


def _pca_corr_sql(i: int, j: int) -> str:
    """r_ij from the decimal-exact co-moment sums (the agg_corr_matrix
    formula), rounded to the 1e-6 grid and cast to the iteration decimal."""
    if i == j:
        return f"CAST(1 AS {_PCA_DEC})"
    a, b = min(i, j), max(i, j)
    return (
        f"CAST(round((n * s_{a}_{b} - s_{a} * s_{b})"
        f" / (sqrt(n * s_{a}_{a} - s_{a} * s_{a})"
        f" * sqrt(n * s_{b}_{b} - s_{b} * s_{b})), 6) AS {_PCA_DEC})"
    )


def _pca_oracle() -> str:
    k = len(_PCA_COLS)
    sums = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for i, c in enumerate(_PCA_COLS):
        sums.append(f"CAST(SUM(CAST({c} AS {_PCA_SUM_DEC})) AS DOUBLE) AS s_{i}")
    for i in range(k):
        for j in range(i, k):
            sums.append(
                f"CAST(SUM(CAST({_PCA_COLS[i]} * {_PCA_COLS[j]} AS "
                f"{_PCA_SUM_DEC})) AS DOUBLE) AS s_{i}_{j}"
            )
    m = ", ".join(
        f"{_pca_corr_sql(i, j)} AS r_{i}_{j}"
        for i in range(k) for j in range(k)
    )
    ctes = [
        f"s AS (SELECT {', '.join(sums)} FROM lineitem)",
        f"m AS (SELECT {m} FROM s)",
        "v0 AS (SELECT m.*, "
        + ", ".join(f"CAST(1 AS {_PCA_DEC}) AS v0_{i}" for i in range(k))
        + " FROM m)",
    ]
    for t in range(1, _PCA_ITERS + 1):
        comps = ", ".join(
            f"CAST(round("
            + " + ".join(f"r_{i}_{j} * v{t-1}_{j}" for j in range(k))
            + f", 6) AS {_PCA_DEC}) AS v{t}_{i}"
            for i in range(k)
        )
        ctes.append(f"v{t} AS (SELECT v{t-1}.*, {comps} FROM v{t-1})")
    last, prev = _PCA_ITERS, _PCA_ITERS - 1
    n_last = " + ".join(f"v{last}_{i} * v{last}_{i}" for i in range(k))
    n_prev = " + ".join(f"v{prev}_{i} * v{prev}_{i}" for i in range(k))
    feats = ", ".join(f"'{c}'" for c in _PCA_COLS)
    loads = ", ".join(
        f"round(CAST(v{last}_{i} AS DOUBLE) / sqrt(CAST(({n_last}) AS DOUBLE)), 6)"
        for i in range(len(_PCA_COLS))
    )
    return f"""
    WITH {', '.join(ctes)}
    SELECT UNNEST([{feats}]) AS feature,
           UNNEST([{loads}]) AS loading,
           round(sqrt(CAST(({n_last}) AS DOUBLE)
                      / CAST(({n_prev}) AS DOUBLE)), 6) AS eigenvalue
    FROM v{last}
    """


@query("stat_pca_power_iteration", oracle=_pca_oracle())
def stat_pca_power_iteration(spark, sf):
    """First principal component of the lineitem measures by POWER
    ITERATION on their correlation matrix — distributed PCA with an
    EXACT oracle: the only corpus pass is the one decimal-exact
    co-moment aggregate (same scan as `agg_corr_matrix`); the 4x4
    matrix and the iteration are constant-size column algebra on that
    single row, fully lazy (no driver collect). Determinism: matrix
    entries round to the 1e-6 grid as DECIMAL(15,6); every iteration
    step multiplies/adds exact decimals (products are DECIMAL(31,12) in
    both engines — no precision cap) and re-rounds to the grid, so no
    float-sum or FMA-contraction drift can leak; the final normalize
    and the Rayleigh-free eigenvalue estimate ||v3||/||v2|| each spend
    ONE double sqrt/division, rounded 6 (the suite's transcendental
    convention). Output: (feature, loading, eigenvalue)."""
    from ..functions.scalars import exact_comoments

    li = table(spark, sf, "lineitem")
    k = len(_PCA_COLS)
    # One Arrow-batched numpy pass for all 15 exact sums (the measures
    # are 2dp, products 4dp — true grid values; ~10x the per-row decimal
    # cast SUM, same bit-exact oracle parity). See exact_comoments.
    one = exact_comoments(li, _PCA_COLS, scale=4)

    def r(i, j):
        if i == j:
            return F.lit(1).cast(_PCA_DEC)
        a, b = min(i, j), max(i, j)
        num = F.col("n") * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        den = F.sqrt(
            F.col("n") * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        ) * F.sqrt(
            F.col("n") * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        )
        return F.round(num / den, 6).cast(_PCA_DEC)

    one = one.select(
        *[r(i, j).alias(f"r_{i}_{j}") for i in range(k) for j in range(k)]
    )
    v = [F.lit(1).cast(_PCA_DEC) for _ in range(k)]
    for _ in range(_PCA_ITERS):
        nxt = []
        for i in range(k):
            acc = None
            for j in range(k):
                term = F.col(f"r_{i}_{j}") * v[j]
                acc = term if acc is None else acc + term
            nxt.append(F.round(acc, 6).cast(_PCA_DEC))
        prev_v, v = v, nxt
    n_last = None
    n_prev = None
    for i in range(k):
        t1 = v[i] * v[i]
        t0 = prev_v[i] * prev_v[i]
        n_last = t1 if n_last is None else n_last + t1
        n_prev = t0 if n_prev is None else n_prev + t0
    eig = F.round(F.sqrt(n_last.cast("double") / n_prev.cast("double")), 6)
    one = one.select(
        *[
            F.round(v[i].cast("double") / F.sqrt(n_last.cast("double")), 6)
            .alias(f"load_{i}")
            for i in range(k)
        ],
        eig.alias("eigenvalue"),
    )
    stack = ", ".join(
        f"'{c}', load_{i}" for i, c in enumerate(_PCA_COLS)
    )
    return one.selectExpr(
        f"stack({k}, {stack}) AS (feature, loading)", "eigenvalue"
    )


# ---------------------------------------------------------------------------
# stat_regression_multivar (round 5)
# ---------------------------------------------------------------------------

_REG_Y = "l_extendedprice"
_REG_X = ["l_quantity", "l_discount"]
_REG_DEC = "DECIMAL(38,4)"


def _reg_oracle() -> str:
    cols = [_REG_Y] + _REG_X

    def s(c):
        return f"CAST(SUM(CAST({c} AS {_REG_DEC})) AS DOUBLE)"

    def sp(a, b):
        return f"CAST(SUM(CAST({a} * {b} AS {_REG_DEC})) AS DOUBLE)"

    return f"""
    WITH s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             {s(_REG_Y)} AS sy, {s(_REG_X[0])} AS s1, {s(_REG_X[1])} AS s2,
             {sp(_REG_Y, _REG_Y)} AS syy,
             {sp(_REG_X[0], _REG_X[0])} AS s11,
             {sp(_REG_X[1], _REG_X[1])} AS s22,
             {sp(_REG_X[0], _REG_X[1])} AS s12,
             {sp(_REG_X[0], _REG_Y)} AS s1y,
             {sp(_REG_X[1], _REG_Y)} AS s2y
      FROM lineitem),
    c AS (
      SELECT n, sy, s1, s2,
             n * s11 - s1 * s1 AS c11,
             n * s22 - s2 * s2 AS c22,
             n * s12 - s1 * s2 AS c12,
             n * s1y - s1 * sy AS c1y,
             n * s2y - s2 * sy AS c2y,
             n * syy - sy * sy AS cyy
      FROM s),
    b AS (
      SELECT n, sy, s1, s2, c1y, c2y, cyy,
             round((c22 * c1y - c12 * c2y)
                   / (c11 * c22 - c12 * c12), 6) AS b1,
             round((c11 * c2y - c12 * c1y)
                   / (c11 * c22 - c12 * c12), 6) AS b2
      FROM c)
    SELECT CAST(n AS BIGINT) AS n,
           round(sy / n - b1 * (s1 / n) - b2 * (s2 / n), 6) AS intercept,
           b1 AS beta_quantity, b2 AS beta_discount,
           round((b1 * c1y + b2 * c2y) / cyy, 6) AS r2
    FROM b
    """


@query("stat_regression_multivar", oracle=_reg_oracle())
def stat_regression_multivar(spark, sf):
    """TWO-regressor least squares (revenue ~ quantity + discount) solved
    in closed form by Cramer's rule on the centered normal equations —
    the multivariate step past `agg_regression`'s single-regressor
    regr_* family, still ONE corpus scan: co-moments accumulate as
    exact DECIMAL sums (order-independent), the 2x2 solve and R^2 are
    constant-size arithmetic on the single aggregate row (coefficients
    round to the 1e-6 grid before the dependent intercept/R^2 uses
    them, so every derived figure is grid-deterministic). This is the
    normal-equation pattern that scales to any bounded feature count at
    100 TB: p^2 sums in one pass, a p x p driver-free solve riding the
    plan."""
    from ..functions.scalars import exact_comoments

    li = table(spark, sf, "lineitem")
    # All 10 exact sums in one Arrow-batched numpy pass over (y, x1, x2)
    # — see exact_comoments; index names map to the formula aliases.
    one = exact_comoments(li, [_REG_Y] + _REG_X, scale=4).select(
        "n",
        F.col("s_0").alias("sy"), F.col("s_1").alias("s1"),
        F.col("s_2").alias("s2"),
        F.col("s_0_0").alias("syy"), F.col("s_1_1").alias("s11"),
        F.col("s_2_2").alias("s22"), F.col("s_1_2").alias("s12"),
        F.col("s_0_1").alias("s1y"), F.col("s_0_2").alias("s2y"),
    )
    c = one.select(
        "n", "sy", "s1", "s2",
        (F.col("n") * F.col("s11") - F.col("s1") * F.col("s1")).alias("c11"),
        (F.col("n") * F.col("s22") - F.col("s2") * F.col("s2")).alias("c22"),
        (F.col("n") * F.col("s12") - F.col("s1") * F.col("s2")).alias("c12"),
        (F.col("n") * F.col("s1y") - F.col("s1") * F.col("sy")).alias("c1y"),
        (F.col("n") * F.col("s2y") - F.col("s2") * F.col("sy")).alias("c2y"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("cyy"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b = c.select(
        "n", "sy", "s1", "s2", "c1y", "c2y", "cyy",
        F.round(
            (F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")) / det,
            6,
        ).alias("b1"),
        F.round(
            (F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y")) / det,
            6,
        ).alias("b2"),
    )
    return b.select(
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("sy") / F.col("n")
            - F.col("b1") * (F.col("s1") / F.col("n"))
            - F.col("b2") * (F.col("s2") / F.col("n")),
            6,
        ).alias("intercept"),
        F.col("b1").alias("beta_quantity"),
        F.col("b2").alias("beta_discount"),
        F.round(
            (F.col("b1") * F.col("c1y") + F.col("b2") * F.col("c2y"))
            / F.col("cyy"),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# agg_weighted_median (round 5)
# ---------------------------------------------------------------------------


@query(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_quantity,
             SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS w
      FROM lineitem GROUP BY l_returnflag, l_quantity),
    c AS (
      SELECT l_returnflag, l_quantity, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cum,
             SUM(w) OVER (PARTITION BY l_returnflag) AS total
      FROM w)
    SELECT l_returnflag,
           MIN(l_quantity) AS weighted_median_qty
    FROM c WHERE cum * 2 >= total
    GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark, sf):
    """Exact weighted median (quantity weighted by extended price) per
    return flag — the robust-center aggregate SQL lacks natively.

    Scale shape: the corpus collapses FIRST to the bounded
    (flag, quantity) domain (quantity is a 1-50 integer grid, so each
    group's window runs over <=50 rows — never a corpus-sized sort);
    weights accumulate as exact DECIMAL so the cumulative comparison
    cum*2 >= total is integer-exact arithmetic, immune to float order.
    The same collapse-to-domain trick serves any discrete-valued
    weighted quantile at 100 TB."""
    li = table(spark, sf, "lineitem")
    w = li.groupBy("l_returnflag", "l_quantity").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(25,2)")).alias("w")
    )
    win = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    tot = Window.partitionBy("l_returnflag")
    c = w.select(
        "l_returnflag", "l_quantity",
        F.sum("w").over(win).alias("cum"),
        F.sum("w").over(tot).alias("total"),
    )
    return (
        c.filter(F.col("cum") * 2 >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.min("l_quantity").alias("weighted_median_qty"))
    )


# ---------------------------------------------------------------------------
# stat_bootstrap_ci (round 5)
# ---------------------------------------------------------------------------

_BOOT_B = 20
# floor(1e6 * CDF(Poisson(1), k)) for k = 0..5; w = 6 beyond — the
# integer thresholds both engines compare the same hash against.
_BOOT_CDF = (367879, 735758, 919698, 981011, 996340, 999405)
_BOOT_MIX = "((({k} % 2147483648) * 2654435761) % 9007199254740881)"


def _boot_w_sql(h: str) -> str:
    expr = "6"
    for k in range(len(_BOOT_CDF) - 1, -1, -1):
        expr = f"CASE WHEN {h} < {_BOOT_CDF[k]} THEN {k} ELSE {expr} END"
    return expr


def _boot_oracle() -> str:
    h = f"({_BOOT_MIX.format(k='(l_orderkey * 8 + l_linenumber) * 31 + b.b')} % 1000000)"
    return f"""
    WITH r AS (
      SELECT b.b,
             {_boot_w_sql(h)} AS w,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem, unnest(range(0, {_BOOT_B})) b(b)),
    means AS (
      SELECT b, round(CAST(SUM(w * cents) AS DOUBLE)
                      / (100.0 * SUM(w)), 6) AS m
      FROM r GROUP BY b),
    ranked AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rk FROM means)
    SELECT CAST({_BOOT_B} AS BIGINT) AS n_replicates,
           (SELECT m FROM ranked WHERE rk = 2) AS ci_lo,
           (SELECT m FROM ranked WHERE rk = {_BOOT_B - 1}) AS ci_hi,
           (SELECT round(AVG(m), 6) FROM means) AS mean_of_means
    """


@query("stat_bootstrap_ci", oracle=_boot_oracle())
def stat_bootstrap_ci(spark, sf):
    """POISSON BOOTSTRAP confidence interval for the mean extended price
    — the bootstrap that actually runs at 100 TB: instead of materializing
    B resampled copies (impossible) each row draws, per replicate, a
    deterministic Poisson(1) weight from an integer hash of (row id,
    replicate) — the standard streaming-bootstrap trick (Chamandy et al.),
    made REPRODUCIBLE by replacing the RNG with the portable
    multiplicative mix, so both engines (and any rerun at any
    parallelism) draw identical weights. One explode (B rows per input
    row) + one hash aggregate; weighted sums stay exact int64
    (w ≤ 6 × cents ≤ 1e8 per row); the CI is an order statistic over the
    B replicate means. Output: (n_replicates, ci_lo, ci_hi,
    mean_of_means)."""
    li = table(spark, sf, "lineitem")
    rid = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("long")
    rows = li.select(
        rid.alias("rid"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    ).select(
        "rid", "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    h = F.pmod(
        F.pmod(
            F.pmod(F.col("rid") * 31 + F.col("b"), F.lit(2147483648))
            * F.lit(2654435761),
            F.lit(9007199254740881),
        ),
        F.lit(1000000),
    )
    w = F.lit(6)
    for k in range(len(_BOOT_CDF) - 1, -1, -1):
        w = F.when(h < _BOOT_CDF[k], F.lit(k)).otherwise(w)
    means = (
        rows.select("b", "cents", w.alias("w"))
        .groupBy("b")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("cents")).cast("double")
                / (F.lit(100.0) * F.sum("w")),
                6,
            ).alias("m")
        )
    )
    from pyspark.sql import Window as W

    ranked = means.select(
        "m", F.row_number().over(W.orderBy("m")).alias("rk")
    )
    lo = ranked.filter(F.col("rk") == 2).select(F.col("m").alias("ci_lo"))
    hi = ranked.filter(F.col("rk") == _BOOT_B - 1).select(
        F.col("m").alias("ci_hi")
    )
    avg = means.agg(F.round(F.avg("m"), 6).alias("mean_of_means"))
    return (
        lo.crossJoin(F.broadcast(hi))
        .crossJoin(F.broadcast(avg))
        .select(
            F.lit(_BOOT_B).cast("long").alias("n_replicates"),
            "ci_lo", "ci_hi", "mean_of_means",
        )
    )
