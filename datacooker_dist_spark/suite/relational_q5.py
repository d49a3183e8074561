"""Fifth-wave relational suite entries: the remaining classic TPC-H
shapes, completing the 22-query family over the synthetic schema
(adaptations where the schema lacks partsupp / shipmode / commit dates
are noted per query).

Q3  → shipping_priority         (segment filter + 2 joins + grouped top-k)
Q5  → local_supplier_volume     (customer and supplier in the SAME nation)
Q6  → revenue_delta_forecast    (single-scan filter + scalar aggregate)
Q12 → priority_line_counts      (conditional two-way counts, late lines)
Q14 → promo_revenue_share       (conditional share per month)
Q18 → large_volume_customer     (grouped HAVING feeding a 3-way join)
Q20 → promo_supplier_candidates (nested IN subqueries over an agg view)
Q22 → dormant_customer_balance  (anti join on a recency window + scalar gate)

Scale notes (100 TB): dims broadcast everywhere; each shape's only
shuffles are the fact-side aggregates and the one lineitem⋈orders
exchange. Top-k shapes run as TakeOrderedAndProject (no global sort).
Double aggregates accumulate as DECIMAL(25,x) for partition-invariant,
cross-engine-exact sums; shares/averages divide once, in the same
expression order on both engines.

Reference parity: datacooker-dist has no joins/aggregates at all
(README.md:1-3; DocGen.java:86-87 hard-codes empty op maps) — this wave
is engine-extension surface per SURVEY.md §2.B.
"""

from __future__ import annotations

from . import query, table


def _views(spark, sf, *names):
    for name in names:
        table(spark, sf, name).createOrReplaceTempView(f"{name}_v")


_SHIPPING_PRIORITY = """
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(25,4))) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM {customer} c
JOIN {orders} o ON c.c_custkey = o.o_custkey
JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
"""


@query(
    "shipping_priority",
    oracle=_SHIPPING_PRIORITY.format(
        customer="customer", orders="orders", lineitem="lineitem",
    ),
)
def shipping_priority(spark, sf):
    """TPC-H Q3 shape: top-10 highest-revenue orders placed before but not
    yet shipped by a cutoff date, in the BUILDING segment. customer
    broadcasts into orders, the filtered orders side then hash-joins
    lineitem (the one shuffle); both date predicates push into their
    scans. ORDER BY ... LIMIT 10 runs as TakeOrderedAndProject — each
    partition keeps its local top-10 and only those reach the driver.
    (o_orderdate, l_orderkey) tiebreak pins the cut deterministically."""
    _views(spark, sf, "customer", "orders", "lineitem")
    return spark.sql(_SHIPPING_PRIORITY.format(
        customer="customer_v", orders="orders_v", lineitem="lineitem_v",
    ))


_LOCAL_SUPPLIER_VOLUME = """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(25,4))) AS DOUBLE) AS revenue
FROM {customer} c
JOIN {orders} o ON o.o_custkey = c.c_custkey
JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
JOIN {supplier} s
  ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN {nation} n ON s.s_nationkey = n.n_nationkey
JOIN {region} r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
"""


@query(
    "local_supplier_volume",
    oracle=_LOCAL_SUPPLIER_VOLUME.format(
        customer="customer", orders="orders", lineitem="lineitem",
        supplier="supplier", nation="nation", region="region",
    ),
)
def local_supplier_volume(spark, sf):
    """TPC-H Q5 shape: revenue per nation where the customer and the
    supplier share that nation (local fulfilment), restricted to one
    region and one order year. The same-nation condition rides the
    supplier join as an extra equi-predicate — no extra shuffle; supplier
    /nation/region/customer all broadcast, so the plan is the single
    lineitem⋈orders exchange plus a 5-group aggregate."""
    _views(spark, sf, "customer", "orders", "lineitem", "supplier",
           "nation", "region")
    return spark.sql(_LOCAL_SUPPLIER_VOLUME.format(
        customer="customer_v", orders="orders_v", lineitem="lineitem_v",
        supplier="supplier_v", nation="nation_v", region="region_v",
    ))


_REVENUE_DELTA_FORECAST = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,4)))
            AS DOUBLE) AS revenue_delta,
       COUNT(*) AS n_lines
FROM {lineitem}
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query(
    "revenue_delta_forecast",
    oracle=_REVENUE_DELTA_FORECAST.format(lineitem="lineitem"),
)
def revenue_delta_forecast(spark, sf):
    """TPC-H Q6 shape: revenue change if mid-band discounts on small
    quantities were eliminated — a pure single-scan scalar aggregate. All
    three predicates (date range, discount band, quantity bound) push to
    the parquet scan as min/max filters, so row groups outside any bound
    never decompress; the aggregate itself is a map-side partial with one
    row per partition on the wire. The cheapest possible plan shape — the
    query exists to pin that nothing (no exchange, no join) sneaks in."""
    _views(spark, sf, "lineitem")
    return spark.sql(_REVENUE_DELTA_FORECAST.format(lineitem="lineitem_v"))


_PRIORITY_LINE_COUNTS = """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM {orders} o
JOIN {lineitem} l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
"""


@query(
    "priority_line_counts",
    oracle=_PRIORITY_LINE_COUNTS.format(orders="orders", lineitem="lineitem"),
)
def priority_line_counts(spark, sf):
    """TPC-H Q12 shape: late-shipped lines split into high/low-priority
    counts per line status. (The synthetic schema has no l_shipmode or
    commit/receipt dates — the group key is re-based on l_linestatus and
    lateness on shipdate vs order date + 30 days.) The conditional counts
    are one pass — two SUM(CASE) branches in the same partial aggregate,
    not two scans; the cross-table lateness predicate evaluates after the
    equi-join, while the shipdate year-window pushes into the lineitem
    scan."""
    _views(spark, sf, "orders", "lineitem")
    return spark.sql(_PRIORITY_LINE_COUNTS.format(
        orders="orders_v", lineitem="lineitem_v",
    ))


_PROMO_REVENUE_SHARE = """
SELECT CAST(EXTRACT(MONTH FROM l.l_shipdate) AS INT) AS ship_month,
       CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(25,4))
                     ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(25,4))) AS DOUBLE) * 100 AS promo_share_pct
FROM {lineitem} l
JOIN {part} p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY CAST(EXTRACT(MONTH FROM l.l_shipdate) AS INT)
"""


@query(
    "promo_revenue_share",
    oracle=_PROMO_REVENUE_SHARE.format(lineitem="lineitem", part="part"),
)
def promo_revenue_share(spark, sf):
    """TPC-H Q14 shape: percentage of revenue from PROMO-type parts, per
    ship month of one year. part broadcasts; numerator and denominator
    accumulate as DECIMAL in the SAME partial aggregate (a CASE branch,
    not a second scan or self-join), then divide once as doubles in
    identical expression order on both engines — the share is bit-stable
    and partition-count-invariant."""
    _views(spark, sf, "lineitem", "part")
    return spark.sql(_PROMO_REVENUE_SHARE.format(
        lineitem="lineitem_v", part="part_v",
    ))


_LARGE_VOLUME_CUSTOMER = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS total_qty
FROM {customer} c
JOIN {orders} o ON c.c_custkey = o.o_custkey
JOIN {lineitem} l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM {lineitem}
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(25,2))) > 150
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@query(
    "large_volume_customer",
    oracle=_LARGE_VOLUME_CUSTOMER.format(
        customer="customer", orders="orders", lineitem="lineitem",
    ),
)
def large_volume_customer(spark, sf):
    """TPC-H Q18 shape: the 100 biggest orders by price among those whose
    total quantity exceeds 150 units, with their customers. The IN
    subquery plans as a left semi join against the per-order quantity
    aggregate — the aggregate and the semi join share the l_orderkey
    hash partitioning, so the gate adds no extra exchange over the main
    join; customer broadcasts. Decimal quantity sums make the >150 gate
    exact; (o_totalprice DESC, o_orderkey) pins the top-100 cut."""
    _views(spark, sf, "customer", "orders", "lineitem")
    return spark.sql(_LARGE_VOLUME_CUSTOMER.format(
        customer="customer_v", orders="orders_v", lineitem="lineitem_v",
    ))


_PROMO_SUPPLIER_CANDIDATES = """
SELECT s.s_suppkey, s.s_name, n.n_name AS nation
FROM {supplier} s
JOIN {nation} n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
  SELECT sq.l_suppkey
  FROM (
    SELECT l_suppkey, l_partkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS qty
    FROM {lineitem}
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey, l_partkey
  ) sq
  JOIN {part} p ON p.p_partkey = sq.l_partkey
  WHERE p.p_type = 'PROMO' AND sq.qty > 40
)
"""


@query(
    "promo_supplier_candidates",
    oracle=_PROMO_SUPPLIER_CANDIDATES.format(
        supplier="supplier", nation="nation", lineitem="lineitem",
        part="part",
    ),
)
def promo_supplier_candidates(spark, sf):
    """TPC-H Q20 shape: suppliers who moved serious volume (>40 units in
    the year) of any PROMO-type part — the nested-subquery candidate
    list. (partsupp-less adaptation: available quantity is re-based on
    shipped quantity.) The inner IN decorrelates to a semi join against
    the (l_suppkey, l_partkey) aggregate with part broadcast into it;
    supplier and nation broadcast on the outside, so the only shuffle is
    the inner aggregate. Decimal sums make the volume gate exact."""
    _views(spark, sf, "supplier", "nation", "lineitem", "part")
    return spark.sql(_PROMO_SUPPLIER_CANDIDATES.format(
        supplier="supplier_v", nation="nation_v", lineitem="lineitem_v",
        part="part_v",
    ))


_DORMANT_CUSTOMER_BALANCE = """
WITH pool AS (
  SELECT c_custkey, c_nationkey, c_acctbal
  FROM {customer}
  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
)
SELECT p.c_nationkey AS cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(p.c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS totacctbal
FROM pool p
WHERE p.c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*)
    FROM pool WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM {orders} o
    WHERE o.o_custkey = p.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY p.c_nationkey
"""


@query(
    "dormant_customer_balance",
    oracle=_DORMANT_CUSTOMER_BALANCE.format(
        customer="customer", orders="orders",
    ),
)
def dormant_customer_balance(spark, sf):
    """TPC-H Q22 shape: wealthy-but-dormant customers per country —
    above-average balance and NO recent orders. (The synthetic customers
    all have SOME order, so dormancy is re-based on a recency window:
    no order since 2000-01-01; the country code is c_nationkey.) The
    uncorrelated average computes once and broadcasts as a scalar gate;
    the NOT EXISTS plans as a left anti join on o_custkey with the
    recency filter pushed below it, so only post-cutoff orders reach the
    anti-join's build side. The average divides decimal sum by count —
    deterministic across engines and partitionings."""
    _views(spark, sf, "customer", "orders")
    return spark.sql(_DORMANT_CUSTOMER_BALANCE.format(
        customer="customer_v", orders="orders_v",
    ))
