"""Subquery-shaped suite entries: HAVING, scalar subqueries, correlated
EXISTS, NOT IN — run through the engine's SQL surface (spark.sql over temp
views) where the shape is SQL-native, with the same decimal-exactness
conventions. Catalyst decorrelates EXISTS/IN into semi/anti joins and plans
scalar subqueries as broadcast one-row joins — the scalable forms."""

from __future__ import annotations

from . import query, table


def _view(spark, sf, name):
    table(spark, sf, name).createOrReplaceTempView(f"{name}_v")


@query(
    "having_filter",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(25,2))) > 150
    """,
)
def having_filter(spark, sf):
    """TPC-H Q18 shape: post-aggregation HAVING. Planned as agg → filter;
    the filter runs on one row per group, after the partial/final agg."""
    _view(spark, sf, "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS total_qty
        FROM lineitem_v
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(25,2))) > 150
        """
    )


@query(
    "subquery_scalar",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*)
      FROM customer)
    """,
)
def subquery_scalar(spark, sf):
    """TPC-H Q22 shape: filter against an uncorrelated scalar subquery.
    Catalyst plans the scalar as a one-row broadcast — the big side is
    scanned once with a map-side filter (no shuffle). Decimal-exact mean so
    boundary rows agree across engines."""
    _view(spark, sf, "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer_v
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*)
          FROM customer_v)
        """
    )


@query(
    "subquery_exists",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o.o_orderpriority
    """,
)
def subquery_exists(spark, sf):
    """TPC-H Q4 shape: correlated EXISTS, decorrelated by Catalyst into a
    left-semi hash join before the aggregate."""
    _view(spark, sf, "orders")
    _view(spark, sf, "lineitem")
    return spark.sql(
        """
        SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders_v o
        WHERE EXISTS (
          SELECT 1 FROM lineitem_v l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        GROUP BY o.o_orderpriority
        """
    )


@query(
    "subquery_correlated_scalar",
    oracle="""
    SELECT s.s_suppkey, s.s_name, s.s_nationkey, s.s_acctbal
    FROM supplier s
    WHERE s.s_acctbal = (
      SELECT MIN(s2.s_acctbal) FROM supplier s2
      WHERE s2.s_nationkey = s.s_nationkey)
    """,
)
def subquery_correlated_scalar(spark, sf):
    """TPC-H Q2 shape: correlated scalar subquery (per-group minimum).
    Catalyst decorrelates into a grouped aggregate + equi-join — one
    shuffle, no per-row re-execution."""
    _view(spark, sf, "supplier")
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name, s.s_nationkey, s.s_acctbal
        FROM supplier_v s
        WHERE s.s_acctbal = (
          SELECT MIN(s2.s_acctbal) FROM supplier_v s2
          WHERE s2.s_nationkey = s.s_nationkey)
        """
    )


@query(
    "having_vs_scalar",
    oracle="""
    SELECT c_nationkey,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS nation_bal
    FROM customer
    GROUP BY c_nationkey
    HAVING SUM(CAST(c_acctbal AS DECIMAL(25,2))) >
           (SELECT SUM(CAST(c_acctbal AS DECIMAL(25,2))) * 0.04 FROM customer)
    """,
)
def having_vs_scalar(spark, sf):
    """TPC-H Q11 shape: HAVING against an uncorrelated scalar over the whole
    table — the scalar is one broadcast row; threshold compare stays in
    exact decimal on both engines."""
    _view(spark, sf, "customer")
    return spark.sql(
        """
        SELECT c_nationkey,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS nation_bal
        FROM customer_v
        GROUP BY c_nationkey
        HAVING SUM(CAST(c_acctbal AS DECIMAL(25,2))) >
               (SELECT SUM(CAST(c_acctbal AS DECIMAL(25,2))) * 0.04 FROM customer_v)
        """
    )


@query(
    "agg_conditional_ratio",
    oracle="""
    SELECT CAST(100.0 * SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
                 AS DECIMAL(25,4))) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(25,4))) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def agg_conditional_ratio(spark, sf):
    """TPC-H Q14 shape: conditional-aggregate ratio in one pass (CASE inside
    SUM — no second scan, no self-join)."""
    _view(spark, sf, "lineitem")
    _view(spark, sf, "part")
    return spark.sql(
        """
        SELECT CAST(100.0 * SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                     THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
                     AS DECIMAL(25,4))) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(25,4))) AS DOUBLE) AS promo_revenue_pct
        FROM lineitem_v l JOIN part_v p ON l.l_partkey = p.p_partkey
        """
    )


@query(
    "scalar_safe_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_ok,
           TRY_CAST(event_type AS BIGINT) AS type_as_int,
           value / NULLIF(CAST(event_id % 3 AS DOUBLE), 0.0) AS safe_div
    FROM events
    """,
)
def scalar_safe_cast(spark, sf):
    """Safe-conversion surface: try_cast yields NULL instead of an ANSI
    error on malformed input; NULLIF guards division by zero."""
    from pyspark.sql import functions as F

    e = table(spark, sf, "events")
    return e.select(
        "event_id",
        F.expr("TRY_CAST(get_json_object(props, '$.k') AS BIGINT)").alias("k_ok"),
        F.expr("TRY_CAST(event_type AS BIGINT)").alias("type_as_int"),
        (F.col("value") / F.nullif((F.col("event_id") % 3).cast("double"), F.lit(0.0))).alias("safe_div"),
    )


@query(
    "subquery_not_in",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey NOT IN (
      SELECT n_nationkey FROM nation WHERE n_name LIKE 'NATION_1%')
    """,
)
def subquery_not_in(spark, sf):
    """NOT IN with a non-null subquery domain → null-aware anti join.
    (With nullable domains NOT IN is three-valued and usually a bug — the
    engine's guidance is NOT EXISTS; this entry pins the non-null case.)"""
    _view(spark, sf, "supplier")
    _view(spark, sf, "nation")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier_v
        WHERE s_nationkey NOT IN (
          SELECT n_nationkey FROM nation_v WHERE n_name LIKE 'NATION_1%')
        """
    )


_LATERAL_TOPN = """
SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
FROM {customer} c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM {orders} o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 3
) t
WHERE c.c_custkey < 500
"""


@query(
    "subquery_lateral",
    oracle=_LATERAL_TOPN.format(customer="customer", orders="orders"),
)
def subquery_lateral(spark, sf):
    """LATERAL correlated subquery: each customer's top-3 orders by price,
    written as a per-row dependent subquery with ORDER BY + LIMIT.
    Catalyst DECORRELATES it — the executed plan is a window rank-filter
    over one o_custkey shuffle, no nested loop (asserted in
    tests/test_plans.py) — so the declarative per-row form costs the same
    as the hand-written topk_per_group. Deterministic o_orderkey
    tiebreak."""
    for t in ("customer", "orders"):
        table(spark, sf, t).createOrReplaceTempView(f"{t}_v")
    return spark.sql(_LATERAL_TOPN.format(customer="customer_v", orders="orders_v"))
