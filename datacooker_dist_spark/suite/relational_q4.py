"""Fourth-wave relational suite entries: the remaining classic TPC-H
shapes adapted to the synthetic schema (no partsupp table, no
commit/receipt dates — predicates are re-based on columns that exist).

Q2  → min_cost_supplier      (correlated MIN decorrelated to agg+join)
Q4  → order_priority_exists  (EXISTS semi join feeding an aggregate)
Q8  → market_share           (conditional share-of-total per year)
Q10 → returns_revenue_topk   (3-way join + grouped top-k, tiebroken)
Q11 → value_concentration    (group agg gated by a global scalar)
Q13 → custdist               (outer join + two-level aggregation)
Q15 → top_supplier_revenue   (agg view reused + scalar MAX equality)
Q17 → avg_quantity_gate      (correlated per-group AVG as a join gate)
Q19 → disjunctive_filter     (OR-of-ANDs pushed into the scan)

Scale notes (100 TB): every shape keeps the dimension joins broadcast
(part/supplier/customer/nation/region are ~1e-5 of lineitem) so the only
shuffles are the fact-side aggregates; correlated subqueries are written
decorrelated (explicit agg + equi-join) so Catalyst never falls into a
nested-loop plan; the Q19 disjunction is a single scan predicate, not a
UNION of three scans. All double aggregates accumulate as DECIMAL(25,x)
for partition-count-invariant, cross-engine-exact results
(functions/scalars.py rationale).

Reference parity: datacooker-dist has no joins/aggregates at all
(README.md:1-3; DocGen.java:86-87 hard-codes empty op maps) — this wave
is engine-extension surface per SURVEY.md §2.B.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query, table


def _views(spark, sf, *names):
    for name in names:
        table(spark, sf, name).createOrReplaceTempView(f"{name}_v")


_MIN_COST_SUPPLIER = """
WITH costs AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM {lineitem}
  GROUP BY l_partkey, l_suppkey
)
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation, c.unit_cost
FROM costs c
JOIN {part} p ON p.p_partkey = c.l_partkey
JOIN {supplier} s ON s.s_suppkey = c.l_suppkey
JOIN {nation} n ON n.n_nationkey = s.s_nationkey
JOIN {region} r ON r.r_regionkey = n.n_regionkey
WHERE p.p_size <= 5
  AND r.r_name = 'EUROPE'
  AND c.unit_cost = (
    SELECT MIN(c2.unit_cost) FROM costs c2 WHERE c2.l_partkey = c.l_partkey
  )
"""


@query(
    "min_cost_supplier",
    oracle=_MIN_COST_SUPPLIER.format(
        lineitem="lineitem", part="part", supplier="supplier",
        nation="nation", region="region",
    ),
)
def min_cost_supplier(spark, sf):
    """TPC-H Q2 shape: cheapest supplier per part (unit cost derived from
    lineitem since the synthetic schema has no partsupp). The correlated
    MIN decorrelates to a per-part aggregate joined back on l_partkey;
    part/supplier/nation/region all broadcast, so the only shuffle is the
    (l_partkey, l_suppkey) aggregate. Ties keep every minimal supplier —
    a deterministic set. MIN of identical double divisions is bit-stable
    across engines (no accumulation), so no decimal detour is needed."""
    _views(spark, sf, "lineitem", "part", "supplier", "nation", "region")
    return spark.sql(_MIN_COST_SUPPLIER.format(
        lineitem="lineitem_v", part="part_v", supplier="supplier_v",
        nation="nation_v", region="region_v",
    ))


_ORDER_PRIORITY_EXISTS = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM {orders} o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM {lineitem} l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
"""


@query(
    "order_priority_exists",
    oracle=_ORDER_PRIORITY_EXISTS.format(orders="orders", lineitem="lineitem"),
)
def order_priority_exists(spark, sf):
    """TPC-H Q4 shape: orders in one quarter having at least one line item
    shipped >60 days after order date, counted by priority. (The synthetic
    schema has no commit/receipt dates, so the lateness predicate is
    re-based on l_shipdate.) Catalyst decorrelates the EXISTS to a left
    semi join on l_orderkey; the date filter prunes orders before the
    shuffle, and the count aggregate over 5 priorities is map-side
    partial."""
    _views(spark, sf, "orders", "lineitem")
    return spark.sql(_ORDER_PRIORITY_EXISTS.format(
        orders="orders_v", lineitem="lineitem_v",
    ))


_MARKET_SHARE = """
WITH sales AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,4)) AS vol,
         ns.n_name AS supp_nation
  FROM {lineitem} l
  JOIN {orders} o ON l.l_orderkey = o.o_orderkey
  JOIN {customer} c ON o.o_custkey = c.c_custkey
  JOIN {nation} nc ON c.c_nationkey = nc.n_nationkey
  JOIN {region} r ON nc.n_regionkey = r.r_regionkey
  JOIN {supplier} s ON l.l_suppkey = s.s_suppkey
  JOIN {nation} ns ON s.s_nationkey = ns.n_nationkey
  WHERE r.r_name = 'ASIA'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                     ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
       / CAST(SUM(vol) AS DOUBLE) AS mkt_share
FROM sales
GROUP BY o_year
"""


@query(
    "market_share",
    oracle=_MARKET_SHARE.format(
        lineitem="lineitem", orders="orders", customer="customer",
        nation="nation", region="region", supplier="supplier",
    ),
)
def market_share(spark, sf):
    """TPC-H Q8 shape: NATION_3's share of revenue sold into the ASIA
    customer market, per year. The nation dim joins twice (customer side
    and supplier side) under different aliases; every dim broadcasts, so
    the plan is one lineitem⋈orders shuffle followed by a 7-group
    aggregate. Numerator and denominator both accumulate as DECIMAL before
    one final double division — bit-stable on both engines and invariant
    to partition count."""
    _views(spark, sf, "lineitem", "orders", "customer", "nation",
           "region", "supplier")
    return spark.sql(_MARKET_SHARE.format(
        lineitem="lineitem_v", orders="orders_v", customer="customer_v",
        nation="nation_v", region="region_v", supplier="supplier_v",
    ))


_RETURNS_REVENUE_TOPK = """
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(25,4))) AS DOUBLE) AS revenue
FROM {customer} c
JOIN {orders} o ON o.o_custkey = c.c_custkey
JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
JOIN {nation} n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@query(
    "returns_revenue_topk",
    oracle=_RETURNS_REVENUE_TOPK.format(
        customer="customer", orders="orders", lineitem="lineitem",
        nation="nation",
    ),
)
def returns_revenue_topk(spark, sf):
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    half-year window. customer and nation broadcast; lineitem⋈orders is
    the one shuffle, the return-flag and date filters push into the scans,
    and ORDER BY ... LIMIT runs as TakeOrderedAndProject (per-partition
    top-k, no global sort). c_custkey tiebreak makes the cut
    deterministic."""
    _views(spark, sf, "customer", "orders", "lineitem", "nation")
    return spark.sql(_RETURNS_REVENUE_TOPK.format(
        customer="customer_v", orders="orders_v", lineitem="lineitem_v",
        nation="nation_v",
    ))


_VALUE_CONCENTRATION = """
WITH pv AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE)
           AS part_value
  FROM {lineitem}
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM pv
WHERE part_value > 1.5 * (
  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE)
         / COUNT(DISTINCT l_partkey)
  FROM {lineitem}
)
"""


@query(
    "value_concentration",
    oracle=_VALUE_CONCENTRATION.format(lineitem="lineitem"),
)
def value_concentration(spark, sf):
    """TPC-H Q11 shape: parts whose total sold value exceeds 1.5× the
    per-part average (partsupp-less adaptation). The uncorrelated scalar
    subquery computes once and broadcasts into the HAVING-style filter;
    both the per-part values and the global threshold accumulate as
    DECIMAL so the comparison is bit-identical across engines. The
    threshold scales with the data, so the shape is sf-stable."""
    _views(spark, sf, "lineitem")
    return spark.sql(_VALUE_CONCENTRATION.format(lineitem="lineitem_v"))


_CUSTDIST = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM {customer} c
  LEFT JOIN {orders} o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
"""


@query("custdist", oracle=_CUSTDIST.format(customer="customer", orders="orders"))
def custdist(spark, sf):
    """TPC-H Q13 shape: distribution of customers by order count, keeping
    zero-order customers via the outer join (COUNT of the null-extended
    side is 0, not 1). Two-level aggregation: the first groups on
    c_custkey (same key as the join shuffle, so AQE coalesces them), the
    second reduces to a handful of count buckets — map-side partial makes
    it near-free. The non-equi priority predicate stays in the join
    condition, not a WHERE, to preserve outer semantics."""
    _views(spark, sf, "customer", "orders")
    return spark.sql(_CUSTDIST.format(customer="customer_v", orders="orders_v"))


_TOP_SUPPLIER_REVENUE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(25,4))) AS DOUBLE) AS total_revenue
  FROM {lineitem}
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM {supplier} s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query(
    "top_supplier_revenue",
    oracle=_TOP_SUPPLIER_REVENUE.format(lineitem="lineitem", supplier="supplier"),
)
def top_supplier_revenue(spark, sf):
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue — an aggregate view consumed twice (as join input and under a
    scalar MAX). Revenue is decimal-exact, so the equality against the
    MAX scalar is safe; ties keep every maximal supplier, a deterministic
    set. The shipdate filter pushes into the parquet scan before the
    l_suppkey aggregate shuffle."""
    _views(spark, sf, "lineitem", "supplier")
    return spark.sql(_TOP_SUPPLIER_REVENUE.format(
        lineitem="lineitem_v", supplier="supplier_v",
    ))


_AVG_QUANTITY_GATE = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM {lineitem} l
JOIN {part} p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3'
JOIN (
  SELECT l_partkey,
         0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE)
                / COUNT(*)) AS qty_gate
  FROM {lineitem}
  GROUP BY l_partkey
) g ON g.l_partkey = l.l_partkey
WHERE l.l_quantity < g.qty_gate
"""


@query(
    "avg_quantity_gate",
    oracle=_AVG_QUANTITY_GATE.format(lineitem="lineitem", part="part"),
)
def avg_quantity_gate(spark, sf):
    """TPC-H Q17 shape: revenue from small-quantity orders, gated by 50%
    of each part's average order quantity. The correlated AVG is written
    decorrelated — a per-part aggregate joined back on l_partkey — so the
    plan is two scans of lineitem and one shuffle each, never a
    nested-loop. The gate is decimal-sum/count then one double multiply,
    identical on both engines; the outer sum is decimal-exact."""
    _views(spark, sf, "lineitem", "part")
    return spark.sql(_AVG_QUANTITY_GATE.format(
        lineitem="lineitem_v", part="part_v",
    ))


_DISJUNCTIVE_FILTER = """
SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
              AS DECIMAL(25,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM {lineitem} l
JOIN {part} p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@query(
    "disjunctive_filter",
    oracle=_DISJUNCTIVE_FILTER.format(lineitem="lineitem", part="part"),
)
def disjunctive_filter(spark, sf):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst keeps
    it one scan of each table — the l_quantity disjunction's common range
    (1..30) pushes to the lineitem scan and the p_brand/p_size disjunction
    to the part scan (CNF extraction), with the cross-table residual
    evaluated after the broadcast join. The alternative — UNION of three
    scans — would read lineitem three times; this plan reads it once."""
    _views(spark, sf, "lineitem", "part")
    return spark.sql(_DISJUNCTIVE_FILTER.format(
        lineitem="lineitem_v", part="part_v",
    ))


@query(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(25,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_skew_salted(spark, sf):
    """Skew-salted fact-fact join (operators/relational.salted_join): the
    left side's key is salted into 16 sub-keys and the right side
    replicated across salts, spreading any hot key over 16 reducers. The
    oracle is the PLAIN join aggregate — asserting the salting rewrite is
    semantics-preserving, the property that makes it safe to deploy
    against a power-law key. Used when one key exceeds a task even after
    AQE skew-split (null floods, power-law heads) or where AQE can't run
    (streaming joins); costs salt_buckets× replication of the right side."""
    from ..operators.relational import salted_join

    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    joined = salted_join(li, o, on="l_orderkey", salt_buckets=16)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(25,2)"))
        .cast("double").alias("revenue"),
    )


_RANGE_BANDED_ORACLE = """
WITH e AS (
  SELECT event_id, event_type, value FROM events WHERE event_id < 500)
SELECT a.event_id AS id_a, b.event_id AS id_b,
       a.event_type, abs(a.value - b.value) AS value_gap
FROM e a JOIN e b
  ON a.event_type = b.event_type
 AND a.event_id < b.event_id
 AND abs(a.value - b.value) <= 5.0
"""


@query("join_range_banded", oracle=_RANGE_BANDED_ORACLE)
def join_range_banded(spark, sf):
    """Banded range join: pairs of same-type events with values within 5 —
    executed as an EQUI-join on (type, value-band) with the right side
    replicated into its three adjacent bands, then the exact |Δ| ≤ 5
    residual. The plain inequality join (the oracle's form) degenerates
    to a per-type nested loop — quadratic; banding bounds candidates to
    3·density per row and keeps the join hash-partitioned. The 3×
    replication is the whole cost — the standard trade for interval/range
    joins at scale (plan-asserted: no nested loop)."""
    ev = table(spark, sf, "events").filter(F.col("event_id") < 500).select(
        "event_id", "event_type", "value"
    )
    band = F.floor(F.col("value") / 5).cast("long")
    a = ev.select(
        F.col("event_id").alias("id_a"), "event_type",
        F.col("value").alias("_va"), band.alias("_band"),
    )
    b = ev.select(
        F.col("event_id").alias("id_b"),
        F.col("event_type").alias("_tb"),
        F.col("value").alias("_vb"),
        F.explode(
            F.array(band - 1, band, band + 1)
        ).alias("_band"),
    )
    return (
        a.join(b, ["_band"])
        .filter(
            (F.col("event_type") == F.col("_tb"))
            & (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("_va") - F.col("_vb")) <= 5.0)
        )
        .select(
            "id_a", "id_b", "event_type",
            F.abs(F.col("_va") - F.col("_vb")).alias("value_gap"),
        )
    )
