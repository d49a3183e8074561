"""Relational + time-series suite entries (SURVEY §2.B core rows, M2/M3).

Every aggregate over doubles uses the decimal-exact ``dsum``/``davg`` helpers
so Spark and DuckDB agree bit-for-bit regardless of partitioning (see
``functions.scalars``). Every ranked/limited query is tiebroken to a
deterministic result set. Integer-width conventions: Spark outputs are cast
to match DuckDB's natural widths (count/len/row_number → BIGINT).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.scalars import davg, davg_sql, dsum, dsum_sql
from ..operators import relational as R
from ..operators import timeseries as TS
from . import query, table

# --------------------------------------------------------------------- scans


@query(
    "scan_parquet",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def scan_parquet(spark, sf):
    """Parquet scan (reference A3/A5): self-describing schema, no cast."""
    return table(spark, sf, "region")


@query(
    "project_select",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem",
)
def project_select(spark, sf):
    """Column select+reorder with `_` skip (reference A10/A11) — Catalyst
    prunes the parquet scan to exactly these columns (ReadSchema)."""
    return R.project(
        table(spark, sf, "lineitem"),
        ["l_orderkey", "_", "l_linenumber", "l_quantity", "l_shipdate"],
    )


@query(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
    """,
)
def filter_predicate(spark, sf):
    """Compound predicate — pushed to the parquet scan (PushedFilters)."""
    li = table(spark, sf, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= "1996-01-01")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# --------------------------------------------------------------------- joins


@query(
    "join_inner_hash",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_inner_hash(spark, sf):
    """Equi inner join; both sides shuffle on the key unless AQE broadcasts
    the smaller one at runtime."""
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    return R.join(o, c, on=o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_broadcast",
    oracle=f"""
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {dsum_sql('l.l_quantity')} AS sum_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size < 10
    GROUP BY p.p_brand
    """,
)
def join_broadcast(spark, sf):
    """Broadcast-hash join: the filtered dimension ships to every executor,
    the fact table never shuffles for the join — the scale-critical pattern
    for star joins at 100 TB."""
    li = table(spark, sf, "lineitem")
    p = table(spark, sf, "part").filter(F.col("p_size") < 10)
    return (
        R.join(li, p, on=li.l_partkey == p.p_partkey, broadcast_right=True)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
    )


@query(
    "join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left(spark, sf):
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return (
        R.join(c, o, on=c.c_custkey == o.o_custkey, how="left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark, sf):
    """LEFT SEMI — existence filter; build side carries keys only."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return R.join_semi(
        c, o.select(F.col("o_custkey").alias("c_custkey")), on=["c_custkey"]
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
)
def join_anti(spark, sf):
    """Anti join with REAL orphans (VERDICT r05 task 3): 'customers with
    no high-value order'. The synthetic generator gives every customer
    at least one order, so the unfiltered anti was trivially empty —
    both engines agreed on 0 rows, proving nothing. The >400k predicate
    leaves ~13% of customers orphaned at sf0.01, so the check exercises
    both kept and dropped rows."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return R.join_anti(
        c, o.select(F.col("o_custkey").alias("c_custkey")), on=["c_custkey"]
    ).select("c_custkey", "c_name")


@query(
    "join_range",
    oracle="""
    SELECT s.s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM customer c JOIN supplier s
      ON c.c_nationkey = s.s_nationkey AND c.c_acctbal < s.s_acctbal
    GROUP BY s.s_nationkey
    """,
)
def join_range(spark, sf):
    """Theta join = equi key + inequality residual: Spark plans the hash join
    on the equi part and evaluates the range predicate as a post-filter, so
    there is no cross-join blowup."""
    c = table(spark, sf, "customer")
    s = table(spark, sf, "supplier")
    return (
        c.join(
            s,
            on=[c.c_nationkey == s.s_nationkey, c.c_acctbal < s.s_acctbal],
        )
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_asof",
    oracle="""
    WITH od AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
    FROM events e ASOF JOIN od o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def join_asof(spark, sf):
    """As-of join (latest order at-or-before each event). Right side is
    first deduped per (key, ts) so the match is well-defined; the operator
    itself is the single-shuffle union+window formulation
    (operators.timeseries.asof_join)."""
    e = table(spark, sf, "events")
    o = (
        table(spark, sf, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    return TS.asof_join(
        e.select("event_id", "user_id", "ts"),
        o,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
        how="inner",
    )


@query(
    "multi_join_topn",
    oracle=f"""
    SELECT l.l_orderkey,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def multi_join_topn(spark, sf):
    """TPC-H Q3 shape: selective dim filter → join chain → agg → top-n.
    Catalyst pushes the segment filter below the join; the final top-10 is
    TakeOrderedAndProject (per-partition heaps), not a global sort."""
    c = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    revenue = dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "join_star",
    oracle=f"""
    SELECT n.n_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def join_star(spark, sf):
    """Star join: every dimension broadcast, fact scanned once, zero fact
    shuffles before the final small agg."""
    li = table(spark, sf, "lineitem")
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    revenue = dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4)
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
    )


# ---------------------------------------------------------------- aggregates


Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
       {davg_sql('l_quantity')} AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       {davg_sql('l_discount')} AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("agg_hash", oracle=Q1_ORACLE)
def agg_hash(spark, sf):
    """Flagship: TPC-H Q1 pricing summary. Partial aggregation means the
    shuffle carries ≤ (partitions × groups) rows — at 100 TB the wire cost
    is the group count, not the row count."""
    li = table(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc_price, scale=4).alias("sum_disc_price"),
        dsum(charge, scale=6).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark, sf):
    """Multi-distinct aggregate (Spark plans an expand + two-phase agg)."""
    return table(spark, sf, "lineitem").groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query("agg_approx_distinct")  # rows-only: HLL estimates are engine-specific
def agg_approx_distinct(spark, sf):
    """approx_count_distinct (HyperLogLog++): constant-memory distinct
    estimation — the only way COUNT(DISTINCT) scales to 100 TB without an
    exact-dedup shuffle. Oracle omitted: estimates are implementation-
    defined (driver records the rows-only check)."""
    return table(spark, sf, "lineitem").groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf):
    return R.rollup(
        table(spark, sf, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        [dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows")],
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf):
    return R.cube(
        table(spark, sf, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        [dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows")],
    )


# ------------------------------------------------------------------- windows


@query(
    "window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk,
             CAST(RANK() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk_rank,
             CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk_dense
      FROM orders)
    WHERE rnk <= 10
    """,
)
def window_rank(spark, sf):
    """Ranking window functions, deterministically tiebroken. One shuffle on
    the partition key; rank filter truncates output."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        table(spark, sf, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rnk"),
            F.rank().over(w).cast("long").alias("rnk_rank"),
            F.dense_rank().over(w).cast("long").alias("rnk_dense"),
        )
        .filter(F.col("rnk") <= 10)
    )


@query(
    "window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytic(spark, sf):
    """lag/lead/running totals per customer. The running sum accumulates in
    decimal so prefixes are bit-identical across engines."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return table(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.sum(F.col("o_totalprice").cast("decimal(25,2)"))
        .over(wr)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def sort_limit(spark, sf):
    """Global top-100: TakeOrderedAndProject, no full sort/shuffle."""
    return R.sort_limit(
        table(spark, sf, "orders").select("o_orderkey", "o_totalprice", "o_orderdate"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        100,
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def topk_per_group(spark, sf):
    return R.top_k_per_group(
        table(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    )


# -------------------------------------------------------------------- setops


@query(
    "set_union",
    oracle="""
    SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier)
    GROUP BY nationkey
    """,
)
def set_union(spark, sf):
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return R.union_all(c, s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark, sf):
    c = (
        table(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return R.intersect(c, s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_nationkey < 10
    """,
)
def set_except(spark, sf):
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        table(spark, sf, "supplier")
        .filter(F.col("s_nationkey") < 10)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return R.except_distinct(c, s)


# ------------------------------------------------------------------- scalars


@query(
    "scalar_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CONCAT_WS('-', c_mktsegment, c_name) AS seg_name,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
           CAST(LENGTH(c_name) AS BIGINT) AS name_len
    FROM customer
    """,
)
def scalar_string(spark, sf):
    c = table(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.length("c_name").cast("long").alias("name_len"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
           CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
           CAST(DAY(o_orderdate) AS BIGINT) AS order_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP)
               AS order_month_start,
           CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-01')
                AS BIGINT) AS days_to_cutoff
    FROM orders
    """,
)
def scalar_date(spark, sf):
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.datediff(F.lit("1998-12-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_cutoff"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           ABS(l_discount - 0.05) AS disc_dev,
           round(LN(l_extendedprice), 6) AS ln_price,
           round(POWER(l_quantity, 2), 6) AS qty_sq,
           SQRT(l_extendedprice) AS sqrt_price,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_discount * 100) AS BIGINT) AS disc_pct
    FROM lineitem
    """,
)
def scalar_math(spark, sf):
    li = table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.sqrt("l_extendedprice").alias("sqrt_price"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("disc_pct"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    """,
)
def scalar_json(spark, sf):
    e = table(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
    )


# ------------------------------------------------------------ time windows


@query(
    "window_tumbling",
    oracle=f"""
    SELECT event_type,
           DATE_TRUNC('hour', ts) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)
    """,
)
def window_tumbling(spark, sf):
    """Tumbling 1-hour windows over the event stream (batch form; the
    streaming twin with watermark is `stream_tumbling`)."""
    out = TS.tumbling(
        table(spark, sf, "events"),
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value")],
    )
    return out.select("event_type", "window_start", "n_events", "sum_value")


@query(
    "window_sliding",
    oracle=f"""
    WITH b AS (
      SELECT event_type, value,
             DATE_TRUNC('hour', ts)
             + CASE WHEN MINUTE(ts) >= 30 THEN INTERVAL 30 MINUTE
                    ELSE INTERVAL 0 MINUTE END AS t30
      FROM events),
    w AS (
      SELECT event_type, value,
             CASE WHEN k = 0 THEN t30 ELSE t30 - INTERVAL 30 MINUTE END
             AS window_start
      FROM b CROSS JOIN (SELECT UNNEST([0, 1]) AS k))
    SELECT event_type, window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM w GROUP BY event_type, window_start
    """,
)
def window_sliding(spark, sf):
    """1-hour windows sliding every 30 min: each event lands in exactly 2
    windows (bounded 2× amplification before the agg)."""
    out = TS.sliding(
        table(spark, sf, "events"),
        "ts",
        "1 hour",
        "30 minutes",
        ["event_type"],
        [F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value")],
    )
    return out.select("event_type", "window_start", "n_events", "sum_value")


@query(
    "window_session",
    oracle="""
    WITH flags AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flags)
    SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def window_session(spark, sf):
    """Session windows, 30-min inactivity gap. Spark's session_window merges
    per-key interval chains after one shuffle; the oracle is the classic
    gaps-and-islands rewrite (two events exactly 30 min apart start a new
    session in both formulations)."""
    out = TS.session(
        table(spark, sf, "events"),
        "ts",
        "30 minutes",
        ["user_id"],
        [F.count(F.lit(1)).alias("n_events")],
    )
    return out.select("user_id", F.col("session_start"), "n_events")


@query(
    "join_asof_forward",
    oracle="""
    WITH v AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'view'),
    p AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT v.event_id, v.user_id, v.ts,
           p.purchase_id, p.ts AS purchase_ts
    FROM v ASOF JOIN p
      ON v.user_id = p.user_id AND v.ts <= p.ts
    """,
)
def join_asof_forward(spark, sf):
    """Forward as-of join: each view matched to the user's NEXT purchase
    at-or-after it — the time-to-convert primitive, mirror of
    join_asof's latest-before. Same single-shuffle union+window operator
    with the frame flipped to look ahead; purchase side deduped per
    (user, ts) so the match is well-defined."""
    e = table(spark, sf, "events")
    v = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("p_ts"))
        .agg(F.max("event_id").alias("purchase_id"))
    )
    return TS.asof_join(
        v,
        p,
        left_on="user_id",
        right_on="user_id",
        left_ts="ts",
        right_ts="p_ts",
        right_cols=["purchase_id", "p_ts"],
        how="inner",
        direction="forward",
    ).withColumnRenamed("p_ts", "purchase_ts")


@query(
    "join_asof_tolerance",
    oracle="""
    WITH c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
    p AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT c.event_id, c.user_id, c.ts, m.purchase_id, m.purchase_ts
    FROM c, LATERAL (
      SELECT p.purchase_id, p.ts AS purchase_ts
      FROM p
      WHERE p.user_id = c.user_id
        AND p.ts <= c.ts
        AND p.ts >= c.ts - INTERVAL 6 HOUR
      ORDER BY p.ts DESC LIMIT 1
    ) m
    """,
)
def join_asof_tolerance(spark, sf):
    """As-of join with a match-gap tolerance (pandas merge_asof
    tolerance=...): each click matched to the user's latest purchase
    at-or-before it but no staler than 6 hours — the stale-match guard
    every quote/price lookup needs. Same single-shuffle union+window
    operator; the tolerance is a post-carry filter, so the plan cost
    equals the unbounded as-of. Fixture lives entirely in the events
    time domain (VERDICT r05 task 3: the old orders-vs-events pairing
    had a 22-year gap, so both engines trivially agreed on 0 rows); at
    sf0.01 the 6-hour gate keeps ~220 of ~1.9k unbounded matches — the
    tolerance provably both keeps and drops."""
    e = table(spark, sf, "events")
    c = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("p_ts"))
        .agg(F.max("event_id").alias("purchase_id"))
    )
    return TS.asof_join(
        c,
        p,
        left_on="user_id",
        right_on="user_id",
        left_ts="ts",
        right_ts="p_ts",
        right_cols=["purchase_id", "p_ts"],
        how="inner",
        tolerance="6 HOURS",
    ).withColumnRenamed("p_ts", "purchase_ts")
