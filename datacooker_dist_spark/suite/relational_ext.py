"""Third-wave relational suite entries: classic multi-join TPC-H shapes
(Q7/Q9/Q18/Q21 analogues on the synthetic join graph), value-ordered
aggregates (max_by/min_by, FILTER clause), navigation window functions
(first/last/nth value), and lateral explode with ordinality.

All shapes land as single lazy Catalyst plans: dimension joins broadcast,
fact-fact joins shuffle once on the join key, aggregates run partial →
final. At 100 TB the multi-join shapes are the canonical star/snowflake
plans AQE re-plans at runtime (skew split + dynamic broadcast)."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query, table


def _view(spark, sf, name):
    table(spark, sf, name).createOrReplaceTempView(f"{name}_v")


@query(
    "join_profit_rollup",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - 0.6 * p.p_retailprice * l.l_quantity
                    AS DECIMAL(25,4))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%a%'
    GROUP BY nation, o_year
    """,
)
def join_profit_rollup(spark, sf):
    """TPC-H Q9 shape: 5-table snowflake join + profit expression + rollup by
    nation/year. part/supplier/nation broadcast (small dims); lineitem⋈orders
    is the one shuffle join on l_orderkey. Decimal-exact profit sum.
    Reference has no joins at all (README.md:1-3) — engine extension."""
    _view(spark, sf, "lineitem")
    _view(spark, sf, "part")
    _view(spark, sf, "supplier")
    _view(spark, sf, "nation")
    _view(spark, sf, "orders")
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             - 0.6 * p.p_retailprice * l.l_quantity
                        AS DECIMAL(25,4))) AS DOUBLE) AS profit
        FROM lineitem_v l
        JOIN part_v p ON l.l_partkey = p.p_partkey
        JOIN supplier_v s ON l.l_suppkey = s.s_suppkey
        JOIN nation_v n ON s.s_nationkey = n.n_nationkey
        JOIN orders_v o ON l.l_orderkey = o.o_orderkey
        WHERE p.p_name LIKE '%a%'
        GROUP BY nation, o_year
        """
    )


@query(
    "join_nation_volume",
    oracle="""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(25,4))) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE ns.n_nationkey < 8 AND nc.n_nationkey < 8
      AND ns.n_nationkey <> nc.n_nationkey
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def join_nation_volume(spark, sf):
    """TPC-H Q7 shape: shipping volume between nation pairs — the nation
    dim joins twice under different aliases (supplier side vs customer
    side) plus an inequality predicate across the two. Both nation joins
    broadcast; the dim filters prune before the fact-fact shuffle."""
    _view(spark, sf, "lineitem")
    _view(spark, sf, "orders")
    _view(spark, sf, "customer")
    _view(spark, sf, "supplier")
    _view(spark, sf, "nation")
    return spark.sql(
        """
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(25,4))) AS DOUBLE) AS volume
        FROM lineitem_v l
        JOIN orders_v o ON l.l_orderkey = o.o_orderkey
        JOIN customer_v c ON o.o_custkey = c.c_custkey
        JOIN supplier_v s ON l.l_suppkey = s.s_suppkey
        JOIN nation_v ns ON s.s_nationkey = ns.n_nationkey
        JOIN nation_v nc ON c.c_nationkey = nc.n_nationkey
        WHERE ns.n_nationkey < 8 AND nc.n_nationkey < 8
          AND ns.n_nationkey <> nc.n_nationkey
        GROUP BY supp_nation, cust_nation, l_year
        """
    )


@query(
    "subquery_in_grouped",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(25,2))) > 180)
    """,
)
def subquery_in_grouped(spark, sf):
    """TPC-H Q18 full shape: IN over a grouped-HAVING subquery. Catalyst
    rewrites IN → left-semi join against the aggregated subquery, so the
    big orders side is filtered by a hash-join probe, never re-scanned."""
    _view(spark, sf, "customer")
    _view(spark, sf, "orders")
    _view(spark, sf, "lineitem")
    return spark.sql(
        """
        SELECT c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer_v c
        JOIN orders_v o ON o.o_custkey = c.c_custkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM lineitem_v
          GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(25,2))) > 180)
        """
    )


@query(
    "subquery_not_exists",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE c.c_acctbal > 8000
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def subquery_not_exists(spark, sf):
    """TPC-H Q22 shape: correlated NOT EXISTS → null-safe left-anti hash
    join (the engine's recommended spelling over NOT IN on nullable
    domains)."""
    _view(spark, sf, "customer")
    _view(spark, sf, "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, c.c_mktsegment
        FROM customer_v c
        WHERE c.c_acctbal > 8000
          AND NOT EXISTS (
            SELECT 1 FROM orders_v o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        """
    )


@query(
    "agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
             AS n_discounted,
           CAST(COUNT(*) FILTER (WHERE l_tax = 0) AS BIGINT) AS n_taxfree,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,2)))
                FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS open_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_filter_clause(spark, sf):
    """FILTER (WHERE ...) aggregate modifier — several differently-filtered
    aggregates in ONE scan/shuffle instead of N self-joined subqueries."""
    _view(spark, sf, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
                 AS n_discounted,
               CAST(COUNT(*) FILTER (WHERE l_tax = 0) AS BIGINT) AS n_taxfree,
               CAST(SUM(CAST(l_quantity AS DECIMAL(25,2)))
                    FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS open_qty
        FROM lineitem_v
        GROUP BY l_returnflag
        """
    )


@query(
    "agg_arg_extremes",
    oracle="""
    SELECT o_orderpriority,
           MAX_BY(o_orderkey, o_totalprice) AS top_orderkey,
           MIN_BY(o_orderkey, o_totalprice) AS bottom_orderkey,
           MAX(o_totalprice) AS max_price,
           MIN(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_arg_extremes(spark, sf):
    """max_by/min_by (argmax/argmin) — carry the witness key with the
    extreme in one aggregation, replacing the window-rank-then-filter
    pattern when only the single extreme row's key is needed. o_totalprice
    is unique per priority group in the synthetic data, so the witness is
    deterministic across engines."""
    from pyspark.sql import functions as F

    o = table(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("MAX_BY(o_orderkey, o_totalprice)").alias("top_orderkey"),
        F.expr("MIN_BY(o_orderkey, o_totalprice)").alias("bottom_orderkey"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@query(
    "window_navigation",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_navigation(spark, sf):
    """Navigation window functions (first/last/nth value) over an explicit
    full-partition frame — the frame spec matters: the default frame stops
    at CURRENT ROW and silently turns last_value into 'current value'.
    Orderkey tiebreak makes the sequence deterministic."""
    _view(spark, sf, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice,
               FIRST_VALUE(o_totalprice) OVER w AS first_price,
               LAST_VALUE(o_totalprice) OVER w AS last_price,
               NTH_VALUE(o_totalprice, 2) OVER w AS second_price
        FROM orders_v
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """
    )


@query(
    "lateral_explode",
    oracle="""
    SELECT doc_id, CAST(x.o - 1 AS BIGINT) AS pos, x.w AS word
    FROM (SELECT doc_id,
                 unnest(string_split(text, ' ')) AS w,
                 generate_subscripts(string_split(text, ' '), 1) AS o
          FROM documents WHERE doc_id < 50) x
    WHERE length(x.w) > 0
    """,
)
def lateral_explode(spark, sf):
    """Lateral explode with ordinality: posexplode(split(text)) — one row
    per token with its position. Generator runs inside whole-stage codegen;
    no shuffle (narrow transform), so at 100 TB it scales linearly with
    input bytes."""
    from pyspark.sql import functions as F

    d = table(spark, sf, "documents")
    return (
        d.filter(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .filter(F.length("word") > 0)
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "word")
    )


@query(
    "scalar_regex_extract_all",
    oracle="""
    SELECT event_id,
           array_to_string(regexp_extract_all(props, '[0-9]+'), ',') AS nums,
           CAST(len(regexp_extract_all(props, '"[a-z_]+":')) AS INT) AS n_keys
    FROM events
    WHERE event_id < 1000
    """,
)
def scalar_regex_extract_all(spark, sf):
    """regexp_extract_all → array, flattened to CSV for the engine-agnostic
    hash compare; plus a derived count. Pure narrow projection."""
    from pyspark.sql import functions as F

    e = table(spark, sf, "events")
    return e.filter(F.col("event_id") < 1000).select(
        "event_id",
        F.array_join(F.expr(r"regexp_extract_all(props, '[0-9]+', 0)"), ",").alias("nums"),
        F.size(F.expr("regexp_extract_all(props, '\"[a-z_]+\":', 0)")).alias("n_keys"),
    )


@query(
    "union_all_dedup_compare",
    oracle="""
    SELECT src, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT 'all' AS src, s_nationkey FROM (
        SELECT s_nationkey FROM supplier UNION ALL SELECT c_nationkey FROM customer)
      UNION ALL
      SELECT 'distinct' AS src, s_nationkey FROM (
        SELECT s_nationkey FROM supplier UNION SELECT c_nationkey FROM customer))
    GROUP BY src
    """,
)
def union_all_dedup_compare(spark, sf):
    """UNION ALL (bag, no shuffle) vs UNION (set, hash-dedup shuffle) over
    the same inputs, counted side by side — pins the cardinality semantics
    of both spellings in one result."""
    from pyspark.sql import functions as F

    s = table(spark, sf, "supplier").select(F.col("s_nationkey"))
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("s_nationkey"))
    union_all = s.unionByName(c).select(F.lit("all").alias("src"), "s_nationkey")
    union_set = s.unionByName(c).distinct().select(
        F.lit("distinct").alias("src"), "s_nationkey"
    )
    return (
        union_all.unionByName(union_set)
        .groupBy("src")
        .agg(F.count("*").alias("n"))
    )


@query(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regression(spark, sf):
    """Statistical aggregates: Pearson correlation + least-squares slope /
    intercept (regr_* family) per group — single-pass moment accumulation
    (partial → final merge), no per-group iteration. Rounded to 6 digits:
    the moment formulas are algebraically identical across engines but
    accumulate doubles in partition order."""
    from pyspark.sql import functions as F

    li = table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 6).alias(
            "intercept"
        ),
        F.expr("regr_count(l_extendedprice, l_quantity)").alias("n"),
    )


@query("agg_approx_topk")  # rows-only: sketch contents are engine-specific
def agg_approx_topk(spark, sf):
    """Approximate heavy hitters per column (DataFrame.freqItems — a
    distributed misra-gries-style sketch): candidate frequent values of
    p_brand and p_type at support 0.05 in one pass. Sketch output order and
    over-approximation are engine-specific → rows-only; the exact-top-k
    companion is text_term_freq."""
    p = table(spark, sf, "part")
    return p.freqItems(["p_brand", "p_type"], support=0.05)


@query(
    "scd2_dim_build",
    oracle="""
    WITH dedup AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events),
    changes AS (
      SELECT user_id, event_type, ts AS valid_from
      FROM dedup
      WHERE prev_type IS NULL OR event_type <> prev_type)
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to
    FROM changes
    """,
)
def scd2_dim_build(spark, sf):
    """Slowly-changing-dimension type 2 build from a change log: collapse
    consecutive repeats of the tracked attribute, then derive each
    version's [valid_from, valid_to) interval with a lead window —
    NULL valid_to marks the current version. Both windows share one
    user_id partitioning → a single shuffle end-to-end (the classic
    sort-merge SCD2 ETL job expressed declaratively)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dedup = e.select(
        "user_id", "event_type", "ts",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = dedup.filter(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    ).select("user_id", "event_type", F.col("ts").alias("valid_from"))
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return changes.select(
        "user_id", "event_type", "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


@query(
    "snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 11 <> 0),
    b AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 13 <> 0)
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_totalprice <> b.o_totalprice
       OR a.o_orderstatus <> b.o_orderstatus
    """,
)
def snapshot_diff(spark, sf):
    """CDC-style snapshot diff: full outer join on the business key,
    classify added / removed / changed (unchanged rows dropped). At scale
    both snapshots shuffle once on the key — or zero times if both are
    bucketed on it; comparing a value-hash instead of N columns keeps the
    probe cheap for wide tables (spelled out column-wise here for oracle
    transparency)."""
    from pyspark.sql import functions as F

    o = table(spark, sf, "orders")
    a = o.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = o.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    j = a.alias("a").join(
        b.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    return j.filter(
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
        | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
    ).select(
        F.coalesce("a.o_orderkey", "b.o_orderkey").alias("o_orderkey"),
        F.when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("b.o_orderkey").isNull(), "removed")
        .otherwise("changed")
        .alias("change_type"),
    )


@query(
    "unpivot_long",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def unpivot_long(spark, sf):
    """Wide → long unpivot (melt): the inverse of pivot_wide. DataFrame
    ``unpivot`` expands each row into one row per measure column — a
    narrow generator, no shuffle, 4× row amplification bounded by the
    measure count."""
    li = table(spark, sf, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )


@query(
    "scalar_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_bigint,
           json_extract_string(props, '$.k') AS k_str
    FROM events
    """,
)
def scalar_variant(spark, sf):
    """Semi-structured access through Spark 4's native VARIANT type:
    parse_json once into the binary variant encoding, then typed
    variant_get extraction — the scale path for ragged JSON (no
    per-query re-parse of the text, no rigid schema-of-json upfront).
    Oracle reads the same paths with DuckDB's JSON extractors."""
    from pyspark.sql import functions as F

    e = table(spark, sf, "events")
    v = e.select("event_id", F.parse_json("props").alias("pv"))
    return v.select(
        "event_id",
        F.variant_get("pv", "$.k", "bigint").alias("k_bigint"),
        F.variant_get("pv", "$.k", "string").alias("k_str"),
    )


@query(
    "incremental_agg_merge",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS o_day, o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE)
             AS day_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_day, o_orderstatus
    """,
)
def incremental_agg_merge(spark, sf):
    """Materialized-aggregate maintenance: a 'yesterday' aggregate (orders
    before 2000-01-01) merged with today's delta by re-aggregating the
    union of PARTIAL states — sum-of-sums, sum-of-counts — instead of
    recomputing from raw facts. The oracle is the full recompute, so the
    check asserts merge ≡ recompute, the property that lets a 100 TB
    pipeline update a rollup by touching only the new partition. Partials
    stay DECIMAL until after the merge so the two-step sum is exactly the
    one-step sum."""
    o = table(spark, sf, "orders")

    def partial(df):
        return df.groupBy(
            F.col("o_orderdate").cast("date").alias("o_day"),
            "o_orderstatus",
        ).agg(
            F.sum(F.col("o_totalprice").cast("decimal(25,2)")).alias("_rev"),
            F.count(F.lit(1)).alias("_n"),
        )

    cutoff = F.lit("2000-01-01").cast("timestamp_ntz")
    base = partial(o.filter(F.col("o_orderdate") < cutoff))
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("o_day", "o_orderstatus")
        .agg(
            F.sum("_rev").cast("double").alias("day_revenue"),
            F.sum("_n").alias("n_orders"),
        )
    )


@query(
    "scd2_point_in_time",
    oracle="""
    WITH dedup AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events),
    changes AS (
      SELECT user_id, event_type, ts AS valid_from
      FROM dedup
      WHERE prev_type IS NULL OR event_type <> prev_type),
    dim AS (
      SELECT user_id, event_type AS state_at, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
               AS valid_to
      FROM changes)
    SELECT o.o_orderkey, o.o_custkey, d.state_at, d.valid_from
    FROM orders o JOIN dim d
      ON o.o_custkey = d.user_id
     AND TIMESTAMP '2024-01-15 12:00:00' >= d.valid_from
     AND (d.valid_to IS NULL OR TIMESTAMP '2024-01-15 12:00:00' < d.valid_to)
    WHERE o.o_orderkey < 3000
    """,
)
def scd2_point_in_time(spark, sf):
    """Point-in-time lookup against the SCD2 dimension — the consumption
    half of scd2_dim_build: each fact row joins the EXACTLY ONE dimension
    version whose [valid_from, valid_to) interval covers the lookup
    instant (NULL valid_to = current). With a constant instant the
    interval predicate folds into a dimension FILTER before the equi-join
    — one version per key survives, so the join is 1:1 and broadcastable;
    a per-row event-time lookup is the same plan with the as-of operator
    instead of the filter."""
    from pyspark.sql import Window

    e = table(spark, sf, "events")
    o = table(spark, sf, "orders").filter(F.col("o_orderkey") < 3000)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select(
            "user_id", "event_type", "ts",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_type", F.col("ts").alias("valid_from"))
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    dim = changes.select(
        "user_id",
        F.col("event_type").alias("state_at"),
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
    at = F.lit("2024-01-15 12:00:00").cast("timestamp_ntz")
    current = dim.filter(
        (at >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (at < F.col("valid_to")))
    )
    return o.join(
        F.broadcast(current), o["o_custkey"] == current["user_id"]
    ).select("o_orderkey", "o_custkey", "state_at", "valid_from")


@query(
    "audit_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders->customer' AS fk, CAST(COUNT(*) AS BIGINT) AS n_orphans
    FROM orders o WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer->nation' AS fk, CAST(COUNT(*) AS BIGINT) AS n_orphans
    FROM customer c WHERE NOT EXISTS (
      SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    """,
)
def audit_referential_integrity(spark, sf):
    """Referential-integrity audit — the data-quality gate every warehouse
    load runs: orphan counts per foreign-key edge via anti joins (orders
    and customer sides broadcast; the lineitem check is the one shuffle).
    Zero rows of orphans is the expected healthy result — the audit's
    value is that it STAYS zero, and the count columns make violations
    quantifiable when a partial load breaks an edge."""
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")

    def orphans(fact, dim, fk, pk, label):
        return (
            fact.join(dim, fact[fk] == dim[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    return (
        orphans(li, o, "l_orderkey", "o_orderkey", "lineitem->orders")
        .unionByName(orphans(o, c, "o_custkey", "c_custkey", "orders->customer"))
        .unionByName(orphans(c, n, "c_nationkey", "n_nationkey",
                             "customer->nation"))
    )


@query(
    "join_fuzzy_blocked",
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
      FROM p)
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           round(len(list_intersect(a.tg, b.tg)) * 1.0
                 / (len(a.tg) + len(b.tg) - len(list_intersect(a.tg, b.tg))),
                 6) AS jaccard
    FROM t a JOIN t b
      ON a.w1 = b.w1 AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
    WHERE round(len(list_intersect(a.tg, b.tg)) * 1.0
                / (len(a.tg) + len(b.tg) - len(list_intersect(a.tg, b.tg))),
                6) >= 0.7
    """,
)
def join_fuzzy_blocked(spark, sf):
    """Blocked fuzzy entity matching (record linkage) over part names:
    candidates from an equi-join on (first name word, p_size) blocking
    keys, verified by character-trigram Jaccard ≥ 0.7 per candidate —
    quadratic only within a block, never a cross join. The operator is the
    cross-table ER sibling of the MinHash near-dedup family; the oracle
    mirrors blocking + verification exactly (blocking is part of the
    operator's declared semantics, as in classic record-linkage
    pipelines)."""
    from ..operators.dedup import blocked_fuzzy_join

    p = table(spark, sf, "part").select(
        "p_partkey", "p_name", "p_size",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("w1"),
    )
    return blocked_fuzzy_join(
        p, p, name_col="p_name", block_cols=["w1", "p_size"],
        threshold=0.7, id_col="p_partkey",
    )


@query(
    "join_bucketed",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_totalprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def join_bucketed(spark, sf):
    """Bucketed co-located fact↔fact join: both tables are written
    bucketed+sorted on the join key, so the join plans as a SortMergeJoin
    with ZERO Exchange — the shuffle is paid once at write time and
    amortized over every subsequent join, the organizing pattern for
    repeatedly-joined 100 TB fact tables (plan-asserted in
    test_plans/test_scale_patterns). Tables are session-scoped externals
    under a scratch path; results equal the plain join — the oracle."""
    import uuid

    from . import scratch_dir

    tag = uuid.uuid4().hex[:8]
    base = scratch_dir("bucketed")
    for name, df, key in [
        (f"bk_orders_{tag}",
         table(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
         "o_orderkey"),
        (f"bk_lineitem_{tag}",
         table(spark, sf, "lineitem").select(
             "l_orderkey", "l_linenumber", "l_quantity"),
         "l_orderkey"),
    ]:
        (
            df.write.format("parquet")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{base}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
    bo = spark.table(f"bk_orders_{tag}")
    bl = spark.table(f"bk_lineitem_{tag}")
    return bl.join(bo, bl.l_orderkey == bo.o_orderkey).select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_totalprice"
    )


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(25,4))) AS DOUBLE) AS revenue
    FROM lineitem l
    WHERE l.l_orderkey IN (
      SELECT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000)
    GROUP BY l.l_returnflag
    """,
)
def join_bloom_prefilter(spark, sf):
    """Bloom-prefiltered selective semi-join: the urgent-high-value order
    keys build a distributed Bloom filter (:mod:`..operators.bloom` —
    Kirsch–Mitzenmacher double hashing into bit_or-aggregated 64-bit
    words), the fact scan probes it via k broadcast word-joins BEFORE
    any fact-side shuffle, and the exact semi-join then runs over the
    pruned candidate set only. At 100 TB this is the difference between
    shuffling the whole fact table to discover 86% of rows don't match
    and shuffling just the candidates; the trailing exact join removes
    the filter's false positives, so results equal the plain semi-join
    — the oracle."""
    from ..operators.bloom import bloom_build, bloom_prefilter

    num_bits, k = 1 << 17, 3
    keys = (
        table(spark, sf, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 150000)
        )
        .select("o_orderkey")
    )
    words = bloom_build(keys, "o_orderkey", num_bits=num_bits, k=k)
    li = table(spark, sf, "lineitem")
    candidates = bloom_prefilter(
        li, "l_orderkey", words, num_bits=num_bits, k=k
    )
    exact = candidates.join(
        keys.withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey",
        "left_semi",
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(25,4)"
            )
        )
        .cast("double")
        .alias("revenue"),
    )


@query(
    "sole_return_supplier",
    oracle="""
    WITH su AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    multi AS (SELECT l_orderkey FROM su GROUP BY l_orderkey
              HAVING COUNT(*) > 1)
    SELECT DISTINCT l.l_suppkey, l.l_orderkey
    FROM lineitem l
    WHERE l.l_returnflag = 'R'
      AND l.l_orderkey IN (SELECT l_orderkey FROM multi)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem x
        WHERE x.l_orderkey = l.l_orderkey
          AND x.l_suppkey <> l.l_suppkey
          AND x.l_returnflag = 'R')
    """,
)
def sole_return_supplier(spark, sf):
    """TPC-H Q21 shape (adapted to this schema's returnflag semantics):
    suppliers who were the ONLY supplier with returned lines in a
    multi-supplier order — an IN over a grouped subquery plus a
    correlated NOT EXISTS against the same fact table. Catalyst plans
    the IN as a left-semi hash join and the NOT EXISTS as a null-safe
    left-anti hash join, both keyed on l_orderkey, so the three passes
    over lineitem co-partition on one key and AQE can reuse the
    exchange — the canonical "self-join heavy" TPC-H plan that
    nested-loop engines fall over on."""
    _view(spark, sf, "lineitem")
    return spark.sql(
        """
        WITH su AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem_v),
        multi AS (SELECT l_orderkey FROM su GROUP BY l_orderkey
                  HAVING COUNT(*) > 1)
        SELECT DISTINCT l.l_suppkey, l.l_orderkey
        FROM lineitem_v l
        WHERE l.l_returnflag = 'R'
          AND l.l_orderkey IN (SELECT l_orderkey FROM multi)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem_v x
            WHERE x.l_orderkey = l.l_orderkey
              AND x.l_suppkey <> l.l_suppkey
              AND x.l_returnflag = 'R')
        """
    )


@query(
    "supplier_cnt_by_part",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size IN (1, 14, 23, 45) AND p.p_brand <> 'Brand#23'
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def supplier_cnt_by_part(spark, sf):
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    bucket, excluding a NOT IN supplier subquery. The part filter
    broadcasts (attribute-filtered dim), the NOT IN decorrelates to a
    null-aware anti join against a tiny set, and the COUNT(DISTINCT)
    runs as an Expand-based two-phase aggregate — dedup before count,
    partial on the map side. One fact shuffle total."""
    _view(spark, sf, "lineitem")
    _view(spark, sf, "part")
    _view(spark, sf, "supplier")
    return spark.sql(
        """
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem_v l JOIN part_v p ON p.p_partkey = l.l_partkey
        WHERE p.p_size IN (1, 14, 23, 45) AND p.p_brand <> 'Brand#23'
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier_v WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        """
    )


_FK_PAIRS = [
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    # Deliberate NON-key pair: p_size (1..50) vs n_nationkey (0..24) —
    # partial inclusion, so the profiler's discrimination is visible.
    ("part", "p_size", "nation", "n_nationkey"),
]

_FK_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{ct}.{ck}->{pt}.{pk}' AS rel,
           CAST(COUNT(*) AS BIGINT) AS n_child_keys,
           CAST(COUNT(p.k) AS BIGINT) AS n_matched,
           CAST(COUNT(p.k) AS DOUBLE) / COUNT(*) AS inclusion_frac,
           (COUNT(p.k) = COUNT(*)) AS is_fk_candidate
    FROM (SELECT DISTINCT CAST({ck} AS BIGINT) AS k FROM {ct}) c
    LEFT JOIN (SELECT DISTINCT CAST({pk} AS BIGINT) AS k FROM {pt}) p
      USING (k)
    """
    for ct, ck, pt, pk in _FK_PAIRS
)


@query("fk_inclusion_profile", oracle=_FK_ORACLE)
def fk_inclusion_profile(spark, sf):
    """Foreign-key DISCOVERY profiling (schema inference over unknown
    data): for each candidate (child column → parent column) edge, the
    inclusion coefficient |distinct(child) ∩ distinct(parent)| /
    |distinct(child)| — 1.0 flags a containment-valid FK candidate,
    fractional values rule pairs out (a deliberate non-key pair is
    included to show discrimination). Complements
    ``audit_referential_integrity``, which counts row-level orphans on
    KNOWN edges. Each pair reduces to its distinct key sets before the
    probe join, so the wire cost is key cardinality, not row count; the
    parent side's distinct set broadcasts when small. The five 1-row
    aggregates union into one result — no driver-side loop over
    collect()ed values."""
    out = None
    for ct, ck, pt, pk in _FK_PAIRS:
        child = (
            table(spark, sf, ct)
            .select(F.col(ck).cast("long").alias("k"))
            .distinct()
        )
        parent = (
            table(spark, sf, pt)
            .select(F.col(pk).cast("long").alias("k"))
            .distinct()
            .withColumn("_m", F.lit(1))
        )
        stats = (
            child.join(parent, "k", "left")
            .agg(
                F.count(F.lit(1)).alias("n_child_keys"),
                F.count("_m").alias("n_matched"),
            )
            .select(
                F.lit(f"{ct}.{ck}->{pt}.{pk}").alias("rel"),
                "n_child_keys",
                "n_matched",
                (F.col("n_matched").cast("double") / F.col("n_child_keys"))
                .alias("inclusion_frac"),
                (F.col("n_matched") == F.col("n_child_keys"))
                .alias("is_fk_candidate"),
            )
        )
        out = stats if out is None else out.unionByName(stats)
    return out


@query(
    "window_moving_median",
    oracle="""
    WITH r AS (
      SELECT event_type, ts, event_id, value,
             list_sort(list(value) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS vals
      FROM events)
    SELECT event_type, ts, event_id, value,
           CASE WHEN len(vals) % 2 = 1 THEN vals[(len(vals) + 1) // 2]
                ELSE (vals[len(vals) // 2] + vals[len(vals) // 2 + 1]) / 2.0
           END AS moving_median
    FROM r
    """,
)
def window_moving_median(spark, sf):
    """Trailing 5-observation moving MEDIAN per event type — the robust
    smoother that survives outliers a moving average folds in. Spark has
    no MEDIAN() OVER, so the window collects its 5-row frame into an
    array (bounded: frame size, not partition size), sorts it, and picks
    the middle element — even-length frames average the two middles with
    the SAME explicit (a+b)/2 arithmetic the oracle uses, so the result
    is bit-identical across engines. One (event_type)-keyed exchange for
    the window sort; per-row state is O(frame), safe at any scale."""
    from pyspark.sql import Window

    e = table(spark, sf, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    vals = F.sort_array(F.collect_list("value").over(w))
    n = F.size(vals)
    med = F.when(
        n % 2 == 1, F.element_at(vals, ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(vals, (n / 2).cast("int"))
            + F.element_at(vals, (n / 2).cast("int") + 1)
        )
        / 2.0
    )
    return e.select(
        "event_type", "ts", "event_id", "value", med.alias("moving_median")
    )
