"""Analytic-function suite entries: histograms, quantiles, ordered string
aggregation, distribution window functions."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import query, table


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 600000 THEN 13
                     ELSE FLOOR(12.0 * o_totalprice / 600000) + 1 END
                AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders GROUP BY bucket
    """,
)
def agg_histogram(spark, sf):
    """Equi-width histogram via width_bucket — a single hash aggregate, the
    constant-memory way to profile a 100 TB column (vs sort-based
    percentile scans)."""
    o = table(spark, sf, "orders")
    return o.groupBy(
        F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12))
        .cast("long")
        .alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS q50,
           quantile_cont(l_quantity, 0.75) AS q75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark, sf):
    """Exact interpolating quartiles (percentile ≡ quantile_cont). Exact
    quantiles sort per group — bounded-cardinality keys only; unbounded
    keys should use approx_percentile (t-digest) instead."""
    li = table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("q50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
               AS statuses,
           CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS n_statuses
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_string_concat(spark, sf):
    """Ordered distinct string aggregation (LISTAGG shape): collect_set →
    array_sort → array_join keeps the result deterministic under any
    partitioning (bare collect_list order is not)."""
    li = table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.countDistinct("l_linestatus").alias("n_statuses"),
    )


@query("agg_approx_percentile")  # rows-only: sketch results are engine-specific
def agg_approx_percentile(spark, sf):
    """approx_percentile: the constant-memory quantile sketch that replaces
    exact per-group sorts once key cardinality is unbounded (the 100 TB
    counterpart of `agg_percentiles`)."""
    li = table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "p50_approx"
        ),
        F.approx_percentile("l_extendedprice", F.lit(0.99), F.lit(10000)).alias(
            "p99_approx"
        ),
    )


@query(
    "events_enriched",
    oracle=f"""
    SELECT c.c_mktsegment,
           CAST(DATE_TRUNC('day', e.ts) AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(CAST(json_extract_string(e.props, '$.k') AS BIGINT)
                AS DECIMAL(25,2))) AS DOUBLE) AS sum_k
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type IN ('click', 'purchase')
    GROUP BY c.c_mktsegment, DATE_TRUNC('day', e.ts)
    """,
)
def events_enriched(spark, sf):
    """Stream-enrichment composition: events filtered, joined to a broadcast
    customer dimension, JSON props extracted, rolled up by segment × day —
    the shape of a production event pipeline (fact never shuffles for the
    join; the aggregate shuffles one row per (segment, day) per partition)."""
    e = table(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    c = table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("c_mktsegment", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(k.cast("decimal(25,2)")).cast("double").alias("sum_k"),
        )
    )


@query(
    "window_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution(spark, sf):
    """Distribution window functions: ntile/percent_rank/cume_dist. The
    rank ratios are exact rationals of row counts, so they compare
    bit-identically across engines under the tiebroken ordering."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
