"""Second-wave relational suite entries: outer joins, range frames,
moment-based statistics, pivot, grouping sets (SQL surface), array scalars,
median. Same exactness conventions as ``core``."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.scalars import dsum, dsum_sql
from . import query, scratch_dir, table


@query(
    "join_full_outer",
    oracle="""
    SELECT n.n_nationkey AS nationkey, n.n_name, c.cnt
    FROM nation n
    FULL OUTER JOIN (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey
    ) c ON n.n_nationkey = c.c_nationkey
    """,
)
def join_full_outer(spark, sf):
    """FULL OUTER: nations × a sparse aggregate — unmatched sides survive
    with nulls. Same shuffle shape as inner; null-handling is the point."""
    n = table(spark, sf, "nation")
    c = (
        table(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return n.join(c, n.n_nationkey == c.c_nationkey, "full_outer").select(
        F.col("n_nationkey").alias("nationkey"), "n_name", "cnt"
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS near_spend
    FROM orders
    """,
)
def window_range_frame(spark, sf):
    """RANGE frame (value-based window): all orders within 10000 below the
    current price. Unlike ROWS frames, peers enter together — decimal
    accumulation keeps it engine-exact even with peer groups."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    return table(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(25,2)"))
        .over(w)
        .cast("double")
        .alias("near_spend"),
    )


STATS_ORACLE = f"""
WITH m AS (
  SELECT l_returnflag,
         {dsum_sql('l_quantity')} AS s1,
         {dsum_sql('l_quantity * l_quantity', 4)} AS s2,
         {dsum_sql('l_extendedprice', 2)} AS t1,
         {dsum_sql('l_quantity * l_extendedprice', 4)} AS st,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       s1 / n AS mean_qty,
       sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_qty,
       (st - s1 * t1 / n) / (n - 1) AS covar_qty_price
FROM m
"""


@query("agg_stats", oracle=STATS_ORACLE)
def agg_stats(spark, sf):
    """Variance/covariance from exact decimal moments (sum, sum of squares,
    cross-moment), finished with a fixed double expression — bit-identical
    across engines and partitionings, unlike built-in stddev/covar whose
    accumulation order varies. The moment form is also the scalable one:
    a single map-side-combined aggregate, no second pass."""
    li = table(spark, sf, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("s1"),
        dsum(F.col("l_quantity") * F.col("l_quantity"), scale=4).alias("s2"),
        dsum("l_extendedprice").alias("t1"),
        dsum(F.col("l_quantity") * F.col("l_extendedprice"), scale=4).alias("st"),
        F.count(F.lit(1)).alias("n"),
    )
    n = F.col("n")
    return m.select(
        "l_returnflag",
        "n",
        (F.col("s1") / n).alias("mean_qty"),
        F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1)).alias(
            "stddev_qty"
        ),
        ((F.col("st") - F.col("s1") * F.col("t1") / n) / (n - 1)).alias(
            "covar_qty_price"
        ),
    )


@query(
    "pivot_wide",
    oracle="""
    SELECT l_linestatus,
           CAST(COUNT(*) FILTER (WHERE l_returnflag = 'A') AS BIGINT) AS A,
           CAST(COUNT(*) FILTER (WHERE l_returnflag = 'N') AS BIGINT) AS N,
           CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS R
    FROM lineitem GROUP BY l_linestatus
    """,
)
def pivot_wide(spark, sf):
    """Pivot long → wide with an explicit value list (explicit values keep
    the plan single-pass; auto-discovery would need a distinct scan first)."""
    out = (
        table(spark, sf, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .count()
    )
    return out.select(
        "l_linestatus",
        F.coalesce("A", F.lit(0)).alias("A"),
        F.coalesce("N", F.lit(0)).alias("N"),
        F.coalesce("R", F.lit(0)).alias("R"),
    )


@query(
    "grouping_sets_sql",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def grouping_sets_sql(spark, sf):
    """GROUPING SETS through the engine's full-SQL surface (spark.sql over a
    registered temp view) — the DataFrame API covers rollup/cube; arbitrary
    sets come via SQL, same Catalyst plan underneath (Expand operator)."""
    table(spark, sf, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@query(
    "scalar_array",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           list_contains([l_quantity, l_discount, l_tax], 0.0) AS has_zero,
           list_max([l_quantity, l_discount, l_tax]) AS arr_max,
           list_sort([l_quantity, l_discount, l_tax]) AS arr_sorted,
           len([l_quantity, l_discount, l_tax]) AS arr_len
    FROM lineitem
    """,
)
def scalar_array(spark, sf):
    """Array construction + containment/extremum/sort — per-row, exact."""
    li = table(spark, sf, "lineitem")
    arr = F.array("l_quantity", "l_discount", "l_tax")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.array_contains(arr, 0.0).alias("has_zero"),
        F.array_max(arr).alias("arr_max"),
        F.sort_array(arr).alias("arr_sorted"),
        F.size(arr).cast("long").alias("arr_len"),
    )


@query(
    "join_interval",
    oracle="""
    SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_follow_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
    GROUP BY a.user_id
    """,
)
def join_interval(spark, sf):
    """Time-interval self-join: pairs of events by the same user within 5
    minutes. The equi key carries the hash join; the interval is a residual
    filter — pair space is bounded per user, never a time cross join."""
    e = table(spark, sf, "events").select("event_id", "user_id", "ts")
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.user_id") == F.col("b.user_id"),
                F.col("a.event_id") < F.col("b.event_id"),
                F.col("b.ts") >= F.col("a.ts"),
                F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTE"),
            ],
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_follow_pairs"))
    )


@query(
    "agg_grouping_id",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_id(spark, sf):
    """ROLLUP with GROUPING() markers — distinguishes subtotal rows from
    genuine NULL group values (the correctness detail rollup consumers
    trip on)."""
    li = table(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        dsum("l_quantity").alias("sum_qty"),
    )


@query(
    "scalar_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(QUARTER(o_orderdate) AS BIGINT) AS qtr,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_text
    FROM orders
    """,
)
def scalar_format(spark, sf):
    """Datetime formatting/parsing surface. Format patterns are engine
    dialects (Java vs C) — the engine's contract is the OUTPUT text, which
    these pattern pairs make identical."""
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.last_day("o_orderdate").alias("month_end"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ts_text"),
    )


@query(
    "scalar_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_nested,
           event_type AS tag_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled
    FROM events
    """,
)
def scalar_struct(spark, sf):
    """Structured-record surface (reference commons BSON family → SURVEY
    §1.5): parse JSON into a typed nested struct, access dotted fields,
    rebuild structs. Output is flattened so the oracle compares values."""
    e = table(spark, sf, "events")
    parsed = e.withColumn(
        "props_s", F.from_json("props", "struct<k: int>")
    ).withColumn("tagged", F.struct(F.col("event_type").alias("t"), F.col("props_s.k").alias("k")))
    return parsed.select(
        "event_id",
        F.col("props_s.k").alias("k_nested"),
        F.col("tagged.t").alias("tag_type"),
        (F.col("tagged.k") * 2).alias("k_doubled"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_norm,
           GREATEST(o_totalprice, 50000.0) AS floored_price,
           LEAST(CAST(YEAR(o_orderdate) AS BIGINT), 1997) AS capped_year,
           IF(o_orderpriority LIKE '1%', TRUE, FALSE) AS urgent
    FROM orders
    """,
)
def scalar_conditional(spark, sf):
    """Conditional scalar surface: CASE/when chains, coalesce/nullif,
    greatest/least, IF — all fold into whole-stage codegen."""
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_norm"
        ),
        F.greatest("o_totalprice", F.lit(50000.0)).alias("floored_price"),
        F.least(F.year("o_orderdate").cast("long"), F.lit(1997)).alias("capped_year"),
        F.col("o_orderpriority").like("1%").alias("urgent"),
    )


@query(
    "agg_median",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity) AS med_qty,
           median(l_extendedprice) AS med_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_median(spark, sf):
    """Exact median (interpolating, quantile_cont semantics in both
    engines). Exact medians need a full sort per group — fine for bounded
    group counts; unbounded cardinality should switch to approx_percentile."""
    return (
        table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.median("l_quantity").alias("med_qty"),
            F.median("l_extendedprice").alias("med_price"),
        )
    )


@query(
    "scalar_higher_order",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           list_transform([l_quantity, l_extendedprice, l_tax],
                          x -> round(x * 2, 2)) AS doubled,
           list_filter([l_quantity, l_extendedprice, l_tax],
                       x -> x > 1.0) AS big_vals,
           len(list_filter([l_quantity, l_extendedprice, l_tax],
                           x -> x > 1.0)) > 0 AS any_big,
           round(l_quantity + (l_extendedprice + (l_tax + 0.0)), 2)
             AS folded_sum
    FROM lineitem
    """,
)
def scalar_higher_order(spark, sf):
    """Array higher-order lambdas — transform / filter / exists / aggregate
    (left fold) — run as Catalyst LambdaFunction expressions, per-row and
    shuffle-free. The fold is written with explicit right-nested
    parentheses in the oracle so both engines add in the identical order;
    round(·,2) keeps the lambda outputs engine-exact."""
    li = table(spark, sf, "lineitem")
    arr = F.array("l_quantity", "l_extendedprice", "l_tax")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.transform(arr, lambda x: F.round(x * 2, 2)).alias("doubled"),
        F.filter(arr, lambda x: x > 1.0).alias("big_vals"),
        F.exists(arr, lambda x: x > 1.0).alias("any_big"),
        F.round(
            F.aggregate(
                F.reverse(arr), F.lit(0.0), lambda acc, x: x + acc
            ),
            2,
        ).alias("folded_sum"),
    )


@query(
    "join_null_safe",
    oracle="""
    WITH l AS (
      SELECT l_orderkey, l_linenumber,
             NULLIF(l_returnflag, 'N') AS flag
      FROM lineitem WHERE l_orderkey < 500),
    d AS (SELECT * FROM (VALUES ('R', 'returned'), ('A', 'accepted'),
                                (NULL, 'none')) AS t(flag, label))
    SELECT l.l_orderkey, l.l_linenumber, l.flag, d.label
    FROM l JOIN d ON l.flag IS NOT DISTINCT FROM d.flag
    """,
)
def join_null_safe(spark, sf):
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of vanishing — the semantic needed when NULL is a
    legitimate dimension value (here 'N' mapped to NULL, joined to a
    'none' label). Catalyst plans <=> as a hash join key just like =, so
    the shape stays a broadcast hash join — no fallback to a nested
    loop; a plain = join would silently drop every NULL-key row."""
    li = table(spark, sf, "lineitem")
    l = li.filter(F.col("l_orderkey") < 500).select(
        "l_orderkey", "l_linenumber",
        F.nullif("l_returnflag", F.lit("N")).alias("flag"),
    )
    # numSlices=1: a default-parallelism parallelize of 3 local rows costs
    # one Python-worker round-trip per slice when the broadcast collects.
    d = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [("R", "returned"), ("A", "accepted"), (None, "none")], 1
        ),
        "flag string, label string",
    )
    return l.join(
        F.broadcast(d), l["flag"].eqNullSafe(d["flag"])
    ).select(l["l_orderkey"], l["l_linenumber"], l["flag"], d["label"])


@query(
    "adapter_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def adapter_csv_roundtrip(spark, sf):
    """Reference copy-path parity through the driver's correctness gate:
    nation flows out through the hadoopColumnar OUTPUT adapter (TAB
    delimited text + header, reference A7/A12) and back in through the
    hadoopColumnar INPUT adapter (header schema inference, A2), then
    re-casts the loose string schema. The oracle is the original table —
    asserting the full adapter round-trip is lossless. Same verb-registry
    machinery the CLI copy runner uses (A20-A22)."""

    from ..model import DataStream, StreamType
    from ..registry import resolve_input, resolve_output

    base = scratch_dir("rt")
    nation = table(spark, sf, "nation")
    out = resolve_output("hadoopColumnar")().configure(
        {"delimiter": "\t"}
    ).initialize(spark, base)
    out.save("nation", DataStream("nation", nation, StreamType.COLUMNAR))
    inp = resolve_input("hadoopColumnar")().configure(
        {"delimiter": "\t"}
    ).initialize(spark, base)
    [ds] = inp.load("nation").values()
    return ds.df.select(
        F.col("n_nationkey").cast("int"),
        F.col("n_name"),
        F.col("n_regionkey").cast("int"),
    )


@query(
    "adapter_orc_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def adapter_orc_roundtrip(spark, sf):
    """ORC round-trip through the adapter registry: supplier flows out
    through the hadoopOrc OUTPUT adapter (zstd) and back in through the
    hadoopOrc INPUT adapter. ORC is self-describing, so types round-trip
    without re-casts — the oracle is the source table, asserting
    losslessness of the engine's second columnar lake format (extends the
    reference's A5/A9 'any Hadoop format' base, which dist itself only
    exercised for text/parquet)."""

    from ..model import DataStream, StreamType
    from ..registry import resolve_input, resolve_output

    base = scratch_dir("orc")
    sup = table(spark, sf, "supplier")
    out = resolve_output("hadoopOrc")().configure(
        {"codec": "zstd"}
    ).initialize(spark, base)
    out.save("supplier", DataStream("supplier", sup, StreamType.COLUMNAR))
    inp = resolve_input("hadoopOrc")().configure({}).initialize(spark, base)
    [ds] = inp.load("supplier").values()
    return ds.df.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")


@query(
    "scalar_map",
    oracle="""
    SELECT o_orderkey,
           map_extract(MAP {'status': o_orderstatus,
                            'priority': o_orderpriority},
                       'priority')[1] AS prio,
           CAST(len(map_keys(MAP {'status': o_orderstatus,
                                  'priority': o_orderpriority}))
                AS BIGINT) AS n_keys,
           list_contains(map_keys(MAP {'status': o_orderstatus,
                                       'priority': o_orderpriority}),
                         'status') AS has_status
    FROM orders WHERE o_orderkey < 1000
    """,
)
def scalar_map(spark, sf):
    """MAP-typed scalars: construction, keyed extraction, key listing,
    membership — per-row expressions with no shuffle. Output columns are
    extracted SCALARS (maps themselves hash differently across engines'
    key ordering, so the contract surfaces values, not map objects)."""
    o = table(spark, sf, "orders").filter(F.col("o_orderkey") < 1000)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "priority").alias("prio"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.array_contains(F.map_keys(m), "status").alias("has_status"),
    )


@query(
    "adapter_jsonl_roundtrip",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events WHERE event_id < 2000
    """,
)
def adapter_jsonl_roundtrip(spark, sf):
    """Structured-record copy path through the correctness gate: events
    (with the nested props JSON parsed to a struct) flow out through the
    hadoopStructured OUTPUT adapter (JSON-lines) and back in through the
    structured INPUT adapter with a pinned DDL schema, then re-flatten.
    Oracle extracts the same nested field from the source — asserting the
    nested round-trip is lossless. Pinning ``schema_json`` on read is the
    scale posture: schema inference samples the data (an extra pass) and
    can drift between runs."""

    from . import read_events
    from ..model import DataStream, StreamType
    from ..registry import resolve_input, resolve_output

    base = scratch_dir("js")
    ev = read_events(spark, sf).filter(F.col("event_id") < 2000).select(
        "event_id",
        "event_type",
        F.from_json("props", "k bigint").alias("props"),
    )
    out = resolve_output("hadoopStructured")().configure({}).initialize(
        spark, base
    )
    out.save("events", DataStream("events", ev, StreamType.STRUCTURED))
    inp = resolve_input("hadoopStructured")().configure(
        {"schema_json": "event_id bigint, event_type string, props struct<k:bigint>"}
    ).initialize(spark, base)
    [ds] = inp.load("events").values()
    return ds.df.select(
        "event_id", "event_type", F.col("props.k").alias("prop_k")
    )


_Z_TERMS_SQL = " + ".join(
    f"(((a >> {i}) & 1) << {2 * i + 1}) + (((b >> {i}) & 1) << {2 * i})"
    for i in range(8)
)


@query(
    "layout_zorder_key",
    oracle=f"""
    WITH n AS (
      SELECT o_orderkey,
             CAST(LEAST(FLOOR(o_totalprice / 2500), 255) AS BIGINT) AS a,
             CAST(o_custkey % 256 AS BIGINT) AS b
      FROM orders)
    SELECT o_orderkey, a, b,
           CAST({_Z_TERMS_SQL} AS BIGINT) AS z
    FROM n
    """,
)
def layout_zorder_key(spark, sf):
    """Z-order (Morton) layout key: interleave the bits of two normalized
    8-bit dimensions so rows close in BOTH dimensions get close keys —
    sortWithinPartitions(z) before a parquet write then gives row-group
    min/max stats that prune on EITHER column (the multi-dimensional
    data-skipping layout Delta/Iceberg OPTIMIZE ZORDER applies; here it's
    plain integer arithmetic + a sort, no table format needed). Pure
    bit ops — bit-identical on both engines."""
    o = table(spark, sf, "orders")
    a = F.least(F.floor(F.col("o_totalprice") / 2500), F.lit(255)).cast("long")
    b = (F.col("o_custkey") % 256).cast("long")
    n = o.select("o_orderkey", a.alias("a"), b.alias("b"))
    z = None
    for i in range(8):
        ta = F.shiftleft(F.shiftright(F.col("a"), i).bitwiseAND(1), 2 * i + 1)
        tb = F.shiftleft(F.shiftright(F.col("b"), i).bitwiseAND(1), 2 * i)
        z = ta + tb if z is None else z + ta + tb
    return n.select("o_orderkey", "a", "b", z.cast("long").alias("z"))


@query("agg_hll_union")  # rows-only: sketch estimates are engine-specific
def agg_hll_union(spark, sf):
    """Mergeable cardinality sketches — the re-aggregatable rollup
    pattern: per-(type, day) HLL sketches of distinct users built once,
    then UNIONED per type and estimated, without touching raw events
    again. At 100 TB this is how daily uniques roll up to monthly:
    sketches are tiny, merge is associative, and the raw-event scan
    happens exactly once. Estimates are implementation-specific →
    rows-only (the engine guarantees determinism for a fixed input)."""
    ev = table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )


@query(
    "scalar_bitwise",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS key_xor,
           CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
           CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
    FROM orders WHERE o_orderkey < 2000
    """,
)
def scalar_bitwise(spark, sf):
    """Bitwise scalar family — AND/XOR/OR/popcount — per-row integer ops
    (codegen, no shuffle); the building blocks behind hash partitioning,
    bitmap flags, and the z-order key. Exact integers on both engines."""
    o = table(spark, sf, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").bitwiseAND(255).cast("long").alias("low_byte"),
        F.col("o_orderkey").bitwiseXOR(F.col("o_custkey")).cast("long")
        .alias("key_xor"),
        F.col("o_orderkey").bitwiseOR(4096).cast("long").alias("with_flag"),
        F.bit_count("o_orderkey").cast("long").alias("popcount"),
    )


@query(
    "compact_small_files",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderstatus = 'O'
    """,
)
def compact_small_files(spark, sf):
    """Small-file compaction — the lake-maintenance pass that keeps file
    counts sane under streaming/incremental ingestion: a deliberately
    over-fragmented landing zone (64 files) is rewritten into a handful of
    right-sized files with a single narrow coalesce (no shuffle — file
    merging needs no data movement, only fewer write tasks). The oracle is
    the source selection: compaction must be byte-lossless. At warehouse
    scale the target file count comes from bytes/target_file_size instead
    of a constant, and the rewrite is per-partition-directory."""

    base = scratch_dir("compact")
    frag, compacted = f"{base}/frag", f"{base}/compacted"
    src = (
        table(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    src.repartition(64).write.parquet(frag)
    spark.read.parquet(frag).coalesce(4).write.parquet(compacted)
    return spark.read.parquet(compacted)


@query(
    "adapter_xml_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def adapter_xml_roundtrip(spark, sf):
    """XML round-trip through the adapter registry (Spark 4 native XML
    source): nation flows out as <rows><row>...</row></rows> documents and
    back in with schema inference, then re-casts the inferred numerics.
    XML is the interchange format of record for many enterprise feeds the
    reference's JDBC/S3 adapters front — the engine covers it as a
    first-class verb."""

    from ..model import DataStream, StreamType
    from ..registry import resolve_input, resolve_output

    base = scratch_dir("xml")
    nation = table(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    out = resolve_output("hadoopXml")().configure(
        {"row_tag": "nation", "root_tag": "nations"}
    ).initialize(spark, base)
    out.save("nation", DataStream("nation", nation, StreamType.COLUMNAR))
    inp = resolve_input("hadoopXml")().configure(
        {"row_tag": "nation"}
    ).initialize(spark, base)
    [ds] = inp.load("nation").values()
    return ds.df.select(
        F.col("n_nationkey").cast("bigint"),
        F.col("n_name").cast("string"),
        F.col("n_regionkey").cast("int"),
    )


@query(
    "recursive_cte_closure",
    oracle="""
    WITH RECURSIVE up AS (
      SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
      FROM customer WHERE c_custkey < 500
      UNION ALL
      SELECT node, cur // 10, depth + 1 FROM up WHERE cur > 0)
    SELECT node, CAST(MAX(depth) AS BIGINT) AS depth_to_root,
           CAST(SUM(cur) AS BIGINT) AS path_sum
    FROM up GROUP BY node
    """,
)
def recursive_cte_closure(spark, sf):
    """Recursive CTE (Spark 4 WITH RECURSIVE) walking a synthesized
    containment hierarchy — each key's parent is key/10, a forest of
    4-level chains: per-node depth-to-root and ancestor path sum. The
    iterative union is the SQL-surface twin of the engine's
    connected-components loop; Spark bounds it with the recursion-depth
    guard the same way the CC operator bounds max_iter."""
    table(spark, sf, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        WITH RECURSIVE up AS (
          SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
          FROM customer_v WHERE c_custkey < 500
          UNION ALL
          SELECT node, cur div 10, depth + 1 FROM up WHERE cur > 0)
        SELECT node, CAST(MAX(depth) AS BIGINT) AS depth_to_root,
               CAST(SUM(cur) AS BIGINT) AS path_sum
        FROM up GROUP BY node
        """
    )


@query(
    "adapter_custom_datasource",
    oracle="""
    SELECT range AS id, (range * 2654435761) % 1000 AS v
    FROM range(10000)
    """,
)
def adapter_custom_datasource(spark, sf):
    """Custom Python DataSource through the full read path — the engine's
    answer to the reference's storage-adapter extensibility (A21): schema
    declaration, driver-side partition planning (8 InputPartitions), and
    executor-side generator reads all happen in user code; Spark owns
    scheduling and Arrow transfer. The deterministic sequence makes the
    extension point itself oracle-checkable."""
    from ..sources.pydatasource import register

    register(spark)
    return (
        spark.read.format("synthseq")
        .option("n", "10000")
        .option("parts", "8")
        .load()
    )


@query(
    "adapter_schema_evolution",
    oracle="""
    SELECT n_nationkey, n_name, CAST(NULL AS INTEGER) AS n_regionkey
    FROM nation WHERE n_nationkey < 10
    UNION ALL
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation WHERE n_nationkey >= 10
    """,
)
def adapter_schema_evolution(spark, sf):
    """Schema evolution on read — the lake reality that columns arrive
    over time: an old vintage (2 columns) and a new vintage (3 columns)
    coexist in one directory; ``mergeSchema`` unions the footers into the
    widest schema and back-fills the old files' missing column with
    nulls. The oracle spells out exactly that contract. At 100 TB,
    schema merging is a footer-only operation — no data rewrite — which
    is why additive evolution is free and renames/drops are not."""

    base = scratch_dir("evo")
    nation = table(spark, sf, "nation")
    nation.filter(F.col("n_nationkey") < 10).select(
        "n_nationkey", "n_name"
    ).write.mode("append").parquet(base)
    nation.filter(F.col("n_nationkey") >= 10).select(
        "n_nationkey", "n_name", "n_regionkey"
    ).write.mode("append").parquet(base)
    return spark.read.option("mergeSchema", "true").parquet(base).select(
        "n_nationkey", "n_name", F.col("n_regionkey").cast("int")
    )


@query(
    "adapter_custom_sink",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def adapter_custom_sink(spark, sf):
    """Custom Python DataSource SINK through the full write path — the
    output half of the extensibility story (A21/A6): executor tasks
    stream partitions to temp files, the driver finalizes with a rename
    barrier on commit (two-phase task commit, the protocol the
    reference's multipart-upload finalize hand-rolls). Write nation
    through it, read the JSON lines back — lossless round-trip is the
    oracle."""
    from ..sources.pydatasource import register
    from . import scratch_dir

    register(spark)
    base = scratch_dir("pysink")
    nation = table(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nation.write.format("pyjsonl").mode("append").save(base)
    return spark.read.schema(
        "n_nationkey bigint, n_name string, n_regionkey int"
    ).json(f"{base}/part-*.jsonl")


@query(
    "set_intersect_all",
    oracle="""
    SELECT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def set_intersect_all(spark, sf):
    """Multiset intersection: (part, supplier) pairs appearing among BOTH
    returned and accepted lines, duplicates kept to the min of the two
    multiplicities — semantics DISTINCT-based intersect can't express
    (a pair shipping 3× returned and 2× accepted contributes 2 rows).
    Plans as one hash shuffle on the full row with per-side counters;
    at 100 TB it is exactly the cost of the distinct form."""
    li = table(spark, sf, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey", "l_suppkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey", "l_suppkey")
    return r.intersectAll(a)


@query(
    "set_except_all",
    oracle="""
    SELECT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def set_except_all(spark, sf):
    """Multiset difference: returned (part, supplier) pairs with each
    occurrence cancelled by one accepted occurrence — the surviving
    multiplicity is count_R - count_A, which EXCEPT (distinct) collapses
    to membership. The reconciliation shape (ledger vs ledger, N-M
    surviving rows) that motivates EXCEPT ALL in audit pipelines."""
    li = table(spark, sf, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey", "l_suppkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey", "l_suppkey")
    return r.exceptAll(a)


@query(
    "window_trailing_days",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_7d,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_7d
    FROM orders
    """,
)
def window_trailing_days(spark, sf):
    """TIME-interval RANGE frame: each order's trailing-7-day spend and
    order count for its customer — the rolling-window feature every
    fraud/recency model starts from. Spark expresses interval frames by
    ordering on a NUMERIC day index (unix_date — timezone-free; an LTZ
    cast's epoch deltas would shift ±3600 s across DST transitions under
    a non-UTC session) with the equivalent numeric range; the order
    values are date-granular, matching the oracle's RANGE BETWEEN
    INTERVAL exactly. Decimal accumulation keeps the peer-group sums
    engine-exact. One shuffle on the partition key — frame evaluation
    is a per-partition ordered scan."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-7, Window.currentRow)
    )
    o = table(spark, sf, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(25,2)"))
        .over(w)
        .cast("double")
        .alias("spend_7d"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
    )


@query(
    "adapter_fixedwidth_roundtrip",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey,
           CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS s_acctbal
    FROM supplier
    """,
)
def adapter_fixedwidth_roundtrip(spark, sf):
    """Fixed-width text round-trip through the adapter registry — the
    mainframe/ERP feed layout: supplier flows out through the
    hadoopFixedWidth OUTPUT adapter (each field right-padded to its
    span; overflow RAISES rather than silently shifting later fields)
    and back in through the INPUT adapter (substring projection +
    trim, narrow/no-shuffle). The format is typeless, so the read-back
    strings re-cast to the source types; acctbal pins 2-decimal money
    formatting on the way out, so the double survives exactly — the
    oracle is the source table under the same decimal pin."""
    from ..model import DataStream, StreamType
    from ..registry import resolve_input, resolve_output

    base = scratch_dir("fw")
    sup = table(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey",
        F.col("s_acctbal").cast("decimal(12,2)").alias("s_acctbal"),
    )
    widths = [10, 26, 4, 12]
    out = resolve_output("hadoopFixedWidth")().configure(
        {"widths": widths}
    ).initialize(spark, base)
    out.save("supplier", DataStream("supplier", sup, StreamType.COLUMNAR))
    inp = resolve_input("hadoopFixedWidth")().configure(
        {
            "widths": widths,
            "schema_default": ["s_suppkey", "s_name", "s_nationkey",
                               "s_acctbal"],
        }
    ).initialize(spark, base)
    [ds] = inp.load("supplier").values()
    return ds.df.select(
        F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
        "s_name",
        F.col("s_nationkey").cast("int").alias("s_nationkey"),
        F.col("s_acctbal").cast("double").alias("s_acctbal"),
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark, sf):
    """EXACT distinct counts via bitmap aggregation — the roaring-bitmap
    pattern for dense integer key domains: each user_id maps to
    (word = id div 64, bit = id mod 64), a first aggregate ORs the bits
    per (group, word), a second sums the popcounts. Two hash aggregates
    whose intermediate is one 64-bit word per (group, occupied-word) —
    for dense domains far smaller than the distinct-expansion shuffle
    COUNT(DISTINCT) plans (one row per (group, value)), and unlike
    approx_count_distinct it is exact. The same bitmap words are
    mergeable across partitions/days, which is what makes the pattern
    the standard for incremental exact-uniques rollups."""
    e = table(spark, sf, "events")
    words = (
        e.select(
            "event_type",
            F.expr("user_id div 64").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"
            ).alias("b"),
        )
        .groupBy("event_type", "w")
        .agg(F.bit_or("b").alias("bits"))
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_users")
    )


@query(
    "incremental_bitmap_merge",
    oracle="""
    WITH monthly AS (
      SELECT event_type, CAST(DATE_TRUNC('month', ts) AS DATE) AS month,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY 1, 2)
    SELECT m.event_type, m.month, m.n_users, t.total_users
    FROM monthly m
    JOIN (SELECT event_type,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS total_users
          FROM events GROUP BY event_type) t
      ON t.event_type = m.event_type
    """,
)
def incremental_bitmap_merge(spark, sf):
    """EXACT mergeable-uniques rollup — the oracle-checkable twin of the
    rows-only `agg_hll_union`: per-(type, month) bitmap words of
    distinct users build once from raw events, then monthly uniques AND
    the all-time total per type both come from RE-MERGING the words
    (bit_or is associative/idempotent), never re-scanning raw events.
    This is the incremental daily→monthly→total uniques maintenance
    pattern with exact answers, where HLL trades exactness for constant
    sketch size on sparse domains. The oracle recomputes both grains
    with COUNT(DISTINCT) — merge ≡ recompute."""
    e = table(spark, sf, "events")
    words = (
        e.select(
            "event_type",
            F.date_trunc("month", "ts").cast("date").alias("month"),
            F.expr("user_id div 64").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"
            ).alias("b"),
        )
        .groupBy("event_type", "month", "w")
        .agg(F.bit_or("b").alias("bits"))
    )
    monthly = words.groupBy("event_type", "month").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_users")
    )
    totals = (
        words.groupBy("event_type", "w")
        .agg(F.bit_or("bits").alias("bits"))
        .groupBy("event_type")
        .agg(F.sum(F.bit_count("bits")).cast("bigint").alias("total_users"))
    )
    return monthly.join(F.broadcast(totals), "event_type").select(
        "event_type", "month", "n_users", "total_users"
    )


@query("agg_hll_intersect_estimate")  # rows-only: sketch estimates are engine-specific
def agg_hll_intersect_estimate(spark, sf):
    """Sketch SET ALGEBRA — estimated audience overlap between event
    types via inclusion-exclusion over HLL sketches: |A ∩ B| ≈ |A| + |B|
    − |A ∪ B|, all three terms read off per-type user sketches built in
    ONE scan of events. HLL supports union natively but not
    intersection; inclusion-exclusion is the standard two-set workaround
    (error grows with |union|/|intersection| — documented trade). The
    per-type sketches cross-pair via a small self-join (type cardinality
    squared, data-independent), so at 100 TB the raw-event scan still
    happens exactly once. Estimates are implementation-specific →
    rows-only; deterministic for a fixed input."""
    ev = table(spark, sf, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    a = sk.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a")
    )
    b = sk.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    est_a = F.hll_sketch_estimate("sk_a")
    est_b = F.hll_sketch_estimate("sk_b")
    est_u = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    return pairs.select(
        "type_a", "type_b",
        est_a.alias("users_a"),
        est_b.alias("users_b"),
        est_u.alias("users_union"),
        F.greatest(est_a + est_b - est_u, F.lit(0)).alias(
            "users_overlap_est"
        ),
    )


@query(
    "agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(25,4)))
                AS DOUBLE)
           / CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE)
             AS wavg_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE)
             AS total_weight
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_weighted_avg(spark, sf):
    """Quantity-weighted mean price per return flag — the weighted
    average every pricing/metrics layer needs, done as Σ(w·x)/Σw with
    BOTH sums accumulated as DECIMAL in one partial aggregate and a
    single double division in identical expression order on both
    engines. A naive AVG of doubles is partition-order dependent; this
    is bit-stable under any partitioning."""
    li = table(spark, sf, "lineitem")
    num = F.sum(
        (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(25,4)")
    ).cast("double")
    den = F.sum(F.col("l_quantity").cast("decimal(25,2)")).cast("double")
    return li.groupBy("l_returnflag").agg(
        (num / den).alias("wavg_price"),
        den.alias("total_weight"),
    )


_MOMENTS_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(25,4))) AS DOUBLE)
           AS s2,
         CAST(SUM(CAST(l_quantity * l_quantity * l_quantity
                  AS DECIMAL(25,6))) AS DOUBLE) AS s3,
         CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity
                  AS DECIMAL(25,8))) AS DOUBLE) AS s4
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       round(s1 / n, 9) AS mean,
       round(s2 / n - (s1 / n) * (s1 / n), 9) AS variance,
       round((s3 / n - 3 * (s1 / n) * (s2 / n)
              + 2 * (s1 / n) * (s1 / n) * (s1 / n))
             / ((s2 / n - (s1 / n) * (s1 / n))
                * sqrt(s2 / n - (s1 / n) * (s1 / n))), 9) AS skewness,
       round((s4 / n - 4 * (s1 / n) * (s3 / n)
              + 6 * (s1 / n) * (s1 / n) * (s2 / n)
              - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
             / ((s2 / n - (s1 / n) * (s1 / n))
                * (s2 / n - (s1 / n) * (s1 / n))) - 3, 9) AS excess_kurtosis
FROM m
"""


@query("agg_higher_moments", oracle=_MOMENTS_ORACLE)
def agg_higher_moments(spark, sf):
    """Population skewness and excess kurtosis per return flag — the
    distribution-shape audit behind outlier policies and normality
    checks. The four raw power sums accumulate as DECIMAL in ONE partial
    aggregate (quantity ≤ 50, so even the 4th power fits comfortably);
    the moment formulas then run in double with IDENTICAL expression
    order on both engines — sqrt is the only non-arithmetic op and is
    correctly rounded, and the 9-digit rounding absorbs any residual
    last-ulp divergence. One scan, one exchange of 5 rows per partition;
    the built-in skewness/kurtosis aggregates are avoided because their
    float accumulation is partition-order dependent."""
    li = table(spark, sf, "lineitem")
    q = F.col("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast("decimal(25,2)")).cast("double").alias("s1"),
        F.sum((q * q).cast("decimal(25,4)")).cast("double").alias("s2"),
        F.sum((q * q * q).cast("decimal(25,6)")).cast("double").alias("s3"),
        F.sum((q * q * q * q).cast("decimal(25,8)")).cast("double")
        .alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3 * mu * (F.col("s2") / n) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4 * mu * (F.col("s3") / n)
        + 6 * mu * mu * (F.col("s2") / n)
        - 3 * mu * mu * mu * mu
    )
    return m.select(
        "l_returnflag",
        n.alias("n"),
        F.round(mu, 9).alias("mean"),
        F.round(m2, 9).alias("variance"),
        F.round(m3 / (m2 * F.sqrt(m2)), 9).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 9).alias("excess_kurtosis"),
    )


@query(
    "backfill_partition_overwrite",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT'
                THEN o_totalprice + 1000.0 ELSE o_totalprice END
             AS o_totalprice,
           o_orderpriority
    FROM orders
    """,
)
def backfill_partition_overwrite(spark, sf):
    """Partition backfill — the lake-maintenance correction pass: rewrite
    ONE hive partition of a partitioned table in place without touching
    the others. The write uses dynamic partition-overwrite mode
    (partitionOverwriteMode=dynamic), which replaces exactly the
    partitions present in the written data — the idempotent reprocessing
    primitive behind every backfill/restatement job; static mode would
    silently drop every other partition, THE classic lake data-loss
    footgun. Only the corrected slice is recomputed and written; all
    other partitions' files are untouched (no read, no rewrite). The
    oracle is the expected final table state."""
    base = scratch_dir("bf")
    target = f"{base}/orders_by_priority"
    cols = ["o_orderkey", "o_totalprice", "o_orderpriority"]
    orders = table(spark, sf, "orders").select(*cols)
    # Initial load: full table, hive-partitioned by priority.
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(
        target
    )
    # Backfill: recompute ONE partition's rows (a correction) and
    # dynamic-overwrite just that partition.
    corrected = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey",
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        "o_orderpriority",
    )
    (
        corrected.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderpriority")
        .parquet(target)
    )
    return spark.read.parquet(target).select(*cols)


@query(
    "sketch_countmin_heavyhitters",
    oracle="""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents),
    cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n
            FROM tok WHERE token <> '' GROUP BY token)
    SELECT token, exact_n, TRUE AS cms_ge_exact
    FROM cnt ORDER BY exact_n DESC, token LIMIT 10
    """,
)
def sketch_countmin_heavyhitters(spark, sf):
    """Count-min sketch over the corpus token stream, probed with the
    exact top-10 tokens: the sketch family's counter member (HLL =
    distinct, bitmap = exact distinct, freqItems = candidates, CMS =
    point frequencies), mergeable by plain addition so per-day/source
    sketches roll up without raw data. The build's exchange is bounded
    at depth·width counter rows per map partition regardless of corpus
    size; probes read depth broadcast rows each. The oracle pins the
    exact counts AND the sketch's one-sided-error invariant — the
    estimate can never under-count, so ``cms_ge_exact`` is provably
    TRUE and the whole row is hash-checkable; the estimate's magnitude
    is asserted separately by property tests (exact when width ≫
    vocabulary, merge ≡ rebuild)."""
    from ..operators.sketches import countmin_build, countmin_estimate
    from ..operators.text import tokens_col

    docs = table(spark, sf, "documents")
    toks = docs.select(
        F.explode(tokens_col("text")).alias("token")
    ).filter(F.col("token") != "")
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "token")
        .limit(10)
    )
    sketch = countmin_build(toks, "token", depth=4, width=2048)
    est = countmin_estimate(sketch, exact, "token", depth=4, width=2048)
    return est.select(
        "token", "exact_n",
        (F.col("cms_estimate") >= F.col("exact_n")).alias("cms_ge_exact"),
    )


@query(
    "sketch_misra_gries_heavyhitters",
    oracle="""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents),
    cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n
            FROM tok WHERE token <> '' GROUP BY token)
    SELECT token, exact_n, TRUE AS mg_within_bound
    FROM cnt ORDER BY exact_n DESC, token LIMIT 10
    """,
)
def sketch_misra_gries_heavyhitters(spark, sf):
    """Misra-Gries heavy-hitter summary probed with the exact top-10
    tokens — the deterministic-guarantee counterpart of
    ``sketch_countmin_heavyhitters``: where CMS over-counts w.h.p., MG
    under-counts with the HARD bound true − N/(k+1) ≤ estimate ≤ true
    (absence reads as estimate 0, itself within the bound — so every
    key more frequent than N/(k+1) is guaranteed PRESENT). The bound
    holds under ANY partitioning even though individual estimates are
    partition-dependent, so ``mg_within_bound`` is provably TRUE and
    the row is hash-checkable; the comparison runs in exact integer
    arithmetic ((exact−est)·(k+1) ≤ N, all longs). Estimate magnitudes
    are pinned separately by property tests (exact when k ≥ vocabulary
    under every partitioning; bound + ≤k size + guaranteed-presence at
    forced small k). Build is one linear mapInPandas pass emitting ≤k
    rows per partition, one ≤k·partitions-row hash aggregate, and the
    mergeable-summaries final trim — so the probed artifact is ≤k rows,
    broadcast-sized by construction."""
    from ..operators.sketches import mg_bound_report, misra_gries_summary
    from ..operators.text import tokens_col

    k = 2048
    docs = table(spark, sf, "documents")
    toks = docs.select(
        F.explode(tokens_col("text")).alias("token")
    ).filter(F.col("token") != "")
    summary = misra_gries_summary(toks, "token", k=k)
    return mg_bound_report(toks, summary, k)


@query(
    "sketch_quantile_grid",
    oracle="""
    WITH b AS (
      SELECT LEAST(GREATEST(CAST(FLOOR(o_totalprice / 150.0) AS BIGINT), 0),
                   4095) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM b),
    c AS (SELECT bucket, CAST(SUM(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum
          FROM b)
    SELECT q.q_pct,
           CAST((MIN(c.bucket) + 1) * 150.0 AS DOUBLE) AS grid_quantile
    FROM (VALUES (50), (90), (95), (99)) q(q_pct), c, t
    WHERE c.cum * 100 >= q.q_pct * t.n
    GROUP BY q.q_pct
    """,
)
def sketch_quantile_grid(spark, sf):
    """Fixed-grid quantile sketch over order totals — the quantile member
    of the mergeable-sketch family (CMS = frequencies, MG = heavy
    hitters, HLL = distinct, grid = quantiles): one linear pass buckets
    every value on a 4096-cell grid (width 150 — exactly representable,
    so bucket assignment is pure IEEE arithmetic and bit-identical on
    every engine, unlike t-digest/KLL whose state is
    construction-order-dependent); the sketch is the ≤4096-row (bucket,
    cnt) table, mergeable by addition; the probe answers p50/p90/p95/p99
    as the first bucket's upper edge whose cumulative count reaches q%
    of N, compared in exact integer arithmetic. Error ≤ one bucket width
    by construction. The exchange carries ≤4096 rows per map partition;
    the probe's cumulative window runs over the sketch itself
    (sketch-domain-bounded — audited in the global-window sweep)."""
    from ..operators.sketches import grid_histogram, grid_quantiles

    orders = table(spark, sf, "orders")
    hist = grid_histogram(orders, "o_totalprice", lo=0.0, hi=614400.0,
                          buckets=4096)
    return grid_quantiles(hist, [50, 90, 95, 99], lo=0.0, hi=614400.0,
                          buckets=4096)


@query(
    "sketch_roundtrip",
    oracle="""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents),
    cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n
            FROM tok WHERE token <> '' GROUP BY token)
    SELECT token, exact_n, TRUE AS cms_ge_exact
    FROM cnt ORDER BY exact_n DESC, token LIMIT 10
    """,
)
def sketch_roundtrip(spark, sf):
    """MATERIALIZED sketch lifecycle — the operational contract behind
    "sketches are what you KEEP at 100 TB": per-SOURCE count-min
    sketches build as one grouped table (depth·width rows per source),
    persist through the engine's own hadoopParquet OUTPUT adapter, read
    back COLD through the INPUT adapter, merge by summing counters over
    (row, slot) — the roll-up that never touches raw history — and the
    merged sketch is probed with the exact top-10 tokens. Equality with
    ``sketch_countmin_heavyhitters``'s oracle witnesses that the
    persisted counters are probe-compatible across sessions (xxhash64
    is deterministic and parquet-exact for longs), the same contract
    ``dedup_index_roundtrip`` / ``dedup_substring_index_roundtrip``
    prove for the LSH band and gram indexes."""
    from ..model import DataStream, StreamType
    from ..operators.sketches import countmin_build, countmin_estimate
    from ..operators.text import tokens_col
    from ..registry import resolve_input, resolve_output

    docs = table(spark, sf, "documents")
    toks = docs.select(
        "source", F.explode(tokens_col("text")).alias("token")
    ).filter(F.col("token") != "")
    per_source = countmin_build(
        toks, "token", depth=4, width=2048, group_cols=["source"]
    )
    base_dir = scratch_dir("cmsidx")
    out = resolve_output("hadoopParquet")().configure({}).initialize(
        spark, base_dir
    )
    out.save(
        "cms_by_source",
        DataStream("cms_by_source", per_source, StreamType.COLUMNAR),
    )
    inp = resolve_input("hadoopColumnar")().configure(
        {"parquet": True}
    ).initialize(spark, base_dir)
    [ds] = inp.load("cms_by_source").values()
    merged = ds.df.groupBy("row", "slot").agg(F.sum("cnt").alias("cnt"))
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "token")
        .limit(10)
    )
    est = countmin_estimate(merged, exact, "token", depth=4, width=2048)
    return est.select(
        "token", "exact_n",
        (F.col("cms_estimate") >= F.col("exact_n")).alias("cms_ge_exact"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH od AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate),
    j AS (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY ABS(epoch_us(e.ts) - epoch_us(o.o_orderdate)),
                        CASE WHEN o.o_orderdate <= e.ts THEN 0 ELSE 1 END
             ) AS rn
      FROM events e JOIN od o ON o.o_custkey = e.user_id)
    SELECT event_id, user_id, ts, o_orderkey, o_orderdate
    FROM j WHERE rn = 1
    """,
)
def join_asof_nearest(spark, sf):
    """As-of join, pandas ``direction="nearest"`` semantics: each event
    matches whichever same-key order is CLOSEST in time on either side
    (ties break backward, like pandas). The operator computes the
    backward and forward carries over the SAME key shuffle (one
    exchange, two sorts) and picks per row by exact microsecond gap —
    still O(|L|+|R|), never the |matches|-sized range join the oracle
    brute-forces. Completes the asof family: backward (`join_asof`),
    forward (`join_asof_forward`), tolerance (`join_asof_tolerance`),
    nearest."""
    e = table(spark, sf, "events")
    o = (
        table(spark, sf, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    from ..operators import timeseries as TS

    return TS.asof_join(
        e.select("event_id", "user_id", "ts"),
        o,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
        how="inner",
        direction="nearest",
    )


# ---------------------------------------------------------------------------
# sketch_kmv_distinct (round 8)
# ---------------------------------------------------------------------------
#
# KMV / k-minimum-values distinct estimation (Bar-Yossef et al. 2002;
# the theta-sketch core): keep the k smallest normalized hash values per
# group; estimate NDV as (k−1)/u_k where u_k is the k-th minimum on the
# [0, 2^32) grid. The family's differentiator here: unlike the HLL
# entries (engine-internal xxhash → rows-only by necessity), KMV over
# the suite's REPLAYABLE multiplicative hash is EXACT-oracle-able — the
# oracle re-derives the k-th minimum and the estimate bit-for-bit. KMV
# is also trivially mergeable (k smallest of a union = k smallest of
# merged per-partition k-mins), which is what makes it a production
# sketch: the per-group state is k integers, map-side combinable.

_KMV_K = 64
_KMV_MOD = 4294967296  # 2^32 hash grid


@query(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT o_orderpriority,
             (o_custkey * 2654435761 + 12345) % {_KMV_MOD} AS u
      FROM orders),
    r AS (
      SELECT o_orderpriority, u,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY u) AS rk
      FROM h),
    t AS (
      SELECT o_orderpriority,
             COUNT(DISTINCT o_custkey) AS true_distinct
      FROM orders GROUP BY o_orderpriority)
    SELECT r.o_orderpriority,
           CAST(u AS BIGINT) AS kth_min,
           CAST(round(({_KMV_K} - 1) * {_KMV_MOD}.0 / u) AS BIGINT)
             AS est_distinct,
           CAST(true_distinct AS BIGINT) AS true_distinct,
           round(abs(round(({_KMV_K} - 1) * {_KMV_MOD}.0 / u)
                     - true_distinct) / true_distinct, 4) AS rel_err
    FROM r JOIN t USING (o_orderpriority)
    WHERE rk = {_KMV_K}
    """,
)
def sketch_kmv_distinct(spark, sf):
    """KMV distinct-count sketch per order priority (module comment
    above), in the MERGEABLE shape (VERDICT r08 task 1): the k-th
    minimum comes from :func:`~...operators.sketches.kmin_values` — a
    linear per-partition k-min partial pass (k integers of state per
    group per task, local duplicates collapsed map-side) merged by
    k-min-of-union over ≤ k·partitions bounded rows, the same posture
    as ``countmin_build``/``misra_gries_summary``. NO window over the
    group key and no corpus-sized shuffle: the raw hash set never
    moves, so the plan matches the sketch's own scale claim even when
    a group holds billions of distinct hashes. Estimate NDV as
    (k−1)·2^32/u_k and report it against the exact distinct count with
    relative error. EXACT-oracled end to end — including the estimate
    arithmetic — because the hash is the suite's replayable
    multiplicative mix, not an engine internal; this is the
    sketch-family entry the HLL rows can't give an exact oracle for.
    Merge ≡ rebuild is property-tested Spark-side
    (``test_kmin_values_merge_equals_rebuild``) on top of the
    arithmetic union property test. Measured at sf0.01: relative
    error ≤ 0.055 across all five groups at k=64 (theory: ~1/√(k−2) ≈
    0.127 expected)."""
    from ..operators.sketches import kmin_values

    o = table(spark, sf, "orders")
    h = o.select(
        "o_orderpriority",
        F.pmod(
            F.col("o_custkey") * F.lit(2654435761) + 12345,
            F.lit(_KMV_MOD),
        ).alias("u"),
    )
    sk = kmin_values(h, ["o_orderpriority"], "u", _KMV_K)
    kth = (
        sk.filter(F.size("kmin") >= _KMV_K)
        .select(
            "o_orderpriority",
            F.element_at("kmin", _KMV_K).alias("kth_min"),
        )
    )
    truth = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("true_distinct")
    )
    est = F.round((_KMV_K - 1) * F.lit(float(_KMV_MOD)) / F.col("kth_min"))
    return (
        kth.join(truth, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.col("kth_min").cast("long").alias("kth_min"),
            est.cast("long").alias("est_distinct"),
            F.col("true_distinct").cast("long").alias("true_distinct"),
            F.round(
                F.abs(est - F.col("true_distinct"))
                / F.col("true_distinct"), 4,
            ).alias("rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# layout_skipping_report (round 8)
# ---------------------------------------------------------------------------
#
# The measured payoff of ``layout_zorder_key``: simulate a 32-file table
# under three physical layouts — insert order, single-dimension sort,
# z-order — and report how many files a min/max-stats reader PRUNES for
# a predicate on each dimension. This is the artifact a lakehouse
# OPTIMIZE decision is actually made from (Delta/Iceberg data skipping):
# a single-dim sort wins on its own column and does nothing for the
# other; z-order buys substantial pruning on BOTH. Files are exact
# NTILE(32) buckets over each layout's total order (the engine side
# uses the distributed global_rank + ntile_bucket pair — NO
# single-partition window; the oracle uses SQL NTILE, whose split
# ntile_bucket reproduces exactly).

_SKIP_K = 32
_SKIP_A_LO, _SKIP_A_HI = 10, 19   # price-bucket predicate (dim a)
_SKIP_B_LO, _SKIP_B_HI = 0, 15    # custkey-byte predicate (dim b)


@query(
    "layout_skipping_report",
    oracle=f"""
    WITH n AS (
      SELECT o_orderkey,
             CAST(LEAST(FLOOR(o_totalprice / 2500), 255) AS BIGINT) AS a,
             CAST(o_custkey % 256 AS BIGINT) AS b
      FROM orders),
    z AS (SELECT o_orderkey, a, b, CAST({{zterms}} AS BIGINT) AS z FROM n),
    L AS (
      SELECT 'insert' AS layout,
             NTILE({_SKIP_K}) OVER (ORDER BY o_orderkey) AS f, a, b FROM z
      UNION ALL
      SELECT 'price_sort',
             NTILE({_SKIP_K}) OVER (ORDER BY a, o_orderkey), a, b FROM z
      UNION ALL
      SELECT 'zorder',
             NTILE({_SKIP_K}) OVER (ORDER BY z, o_orderkey), a, b FROM z),
    fs AS (
      SELECT layout, f, MIN(a) AS mina, MAX(a) AS maxa,
             MIN(b) AS minb, MAX(b) AS maxb
      FROM L GROUP BY layout, f)
    SELECT layout, predicate, CAST({_SKIP_K} AS BIGINT) AS n_files,
           n_pruned,
           round(n_pruned / {_SKIP_K}.0, 6) AS prune_frac
    FROM (
      SELECT layout, 'a_{_SKIP_A_LO}_{_SKIP_A_HI}' AS predicate,
             CAST(SUM(CASE WHEN maxa < {_SKIP_A_LO}
                           OR mina > {_SKIP_A_HI} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pruned
      FROM fs GROUP BY layout
      UNION ALL
      SELECT layout, 'b_{_SKIP_B_LO}_{_SKIP_B_HI}',
             CAST(SUM(CASE WHEN maxb < {_SKIP_B_LO}
                           OR minb > {_SKIP_B_HI} THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM fs GROUP BY layout)
    """.replace("{zterms}", _Z_TERMS_SQL),
)
def layout_skipping_report(spark, sf):
    """Data-skipping effectiveness report (module comment above): for
    each (layout, predicate) pair, the count and fraction of simulated
    files whose min/max stats let a reader skip them entirely.
    EXACT-oracled — bucketing, stats, and prune decisions all replay in
    DuckDB. Measured at sf0.01: the single-dim sort prunes ~29/32 files
    on its own column and 0 on the other; z-order prunes a substantial
    fraction on BOTH (the multi-dimensional locality Morton keys buy);
    insert order prunes nothing. Plan: three distributed global ranks
    (range shuffle each, never a single-partition window), one
    min/max aggregate per layout, and a 6-row report — at 100 TB this
    runs against a SAMPLE and the conclusion transfers, which is how
    OPTIMIZE-ZORDER decisions are actually costed."""
    from ..operators.relational import global_rank, ntile_bucket

    o = table(spark, sf, "orders")
    a = F.least(F.floor(F.col("o_totalprice") / 2500), F.lit(255)).cast("long")
    b = (F.col("o_custkey") % 256).cast("long")
    n = o.select("o_orderkey", a.alias("a"), b.alias("b"))
    zc = None
    for i in range(8):
        ta = F.shiftleft(F.shiftright(F.col("a"), i).bitwiseAND(1), 2 * i + 1)
        tb = F.shiftleft(F.shiftright(F.col("b"), i).bitwiseAND(1), 2 * i)
        zc = ta + tb if zc is None else zc + ta + tb
    z = n.withColumn("z", zc.cast("long")).localCheckpoint()
    n_rows = z.count()

    def files(layout, order_cols):
        ranked = global_rank(z, order_cols, rank_col="_r")
        return ranked.select(
            F.lit(layout).alias("layout"),
            ntile_bucket(F.col("_r"), F.lit(n_rows), _SKIP_K).alias("f"),
            "a", "b",
        )

    L = (
        files("insert", ["o_orderkey"])
        .unionAll(files("price_sort", ["a", "o_orderkey"]))
        .unionAll(files("zorder", ["z", "o_orderkey"]))
    )
    fs = L.groupBy("layout", "f").agg(
        F.min("a").alias("mina"), F.max("a").alias("maxa"),
        F.min("b").alias("minb"), F.max("b").alias("maxb"),
    )

    def report(pred_name, lo, hi, mn, mx):
        pruned = F.sum(
            F.when((F.col(mx) < lo) | (F.col(mn) > hi), 1).otherwise(0)
        ).cast("long")
        return fs.groupBy("layout").agg(
            pruned.alias("n_pruned")
        ).select(
            "layout", F.lit(pred_name).alias("predicate"),
            F.lit(_SKIP_K).cast("long").alias("n_files"), "n_pruned",
            F.round(F.col("n_pruned") / float(_SKIP_K), 6)
            .alias("prune_frac"),
        )

    return report(
        f"a_{_SKIP_A_LO}_{_SKIP_A_HI}", _SKIP_A_LO, _SKIP_A_HI, "mina", "maxa"
    ).unionAll(report(
        f"b_{_SKIP_B_LO}_{_SKIP_B_HI}", _SKIP_B_LO, _SKIP_B_HI, "minb", "maxb"
    )).select("layout", "predicate", "n_files", "n_pruned", "prune_frac")


# ---------------------------------------------------------------------------
# sketch_kmv_set_ops (round 8)
# ---------------------------------------------------------------------------
#
# The property that makes KMV a PRODUCTION sketch, demonstrated and
# exact-oracled: two groups' k-min sketches MERGE without touching raw
# data — union NDV from the k-th minimum of the merged value set, and
# intersection NDV by the theta-sketch trick (Dasgupta et al. 2016):
# the fraction of union-sketch members present in BOTH input sketches
# estimates the Jaccard similarity, and J · |A∪B| estimates the
# intersection. Everything is integer hashes + one double division, so
# the oracle replays the estimates bit-for-bit — the HLL union/
# intersect entries (engine-internal sketches) can only be rows-only.

_KMVS_A, _KMVS_B = "1-URGENT", "2-HIGH"


@query(
    "sketch_kmv_set_ops",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT o_orderpriority, o_custkey,
             (o_custkey * 2654435761 + 12345) % {_KMV_MOD} AS u
      FROM orders
      WHERE o_orderpriority IN ('{_KMVS_A}', '{_KMVS_B}')),
    sk AS (
      SELECT o_orderpriority, u FROM (
        SELECT o_orderpriority, u,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY u) rk
        FROM (SELECT DISTINCT o_orderpriority, u FROM h))
      WHERE rk <= {_KMV_K}),
    merged AS (
      SELECT u FROM (
        SELECT u, ROW_NUMBER() OVER (ORDER BY u) rk
        FROM (SELECT DISTINCT u FROM sk))
      WHERE rk <= {_KMV_K}),
    kth AS (SELECT MAX(u) AS uk, COUNT(*) AS nm FROM merged),
    both_cnt AS (
      SELECT COUNT(*) AS nb FROM merged m
      WHERE EXISTS (SELECT 1 FROM sk
                    WHERE o_orderpriority = '{_KMVS_A}' AND sk.u = m.u)
        AND EXISTS (SELECT 1 FROM sk
                    WHERE o_orderpriority = '{_KMVS_B}' AND sk.u = m.u)),
    truth AS (
      SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS true_union,
             CAST(COUNT(DISTINCT CASE WHEN in1 AND in2
                        THEN o_custkey END) AS BIGINT) AS true_intersect
      FROM (SELECT o_custkey,
                   BOOL_OR(o_orderpriority = '{_KMVS_A}') AS in1,
                   BOOL_OR(o_orderpriority = '{_KMVS_B}') AS in2
            FROM h GROUP BY o_custkey))
    SELECT CAST(round(({_KMV_K} - 1) * {_KMV_MOD}.0 / uk) AS BIGINT)
             AS est_union,
           true_union,
           CAST(round(nb * (({_KMV_K} - 1) * {_KMV_MOD}.0 / uk)
                      / {_KMV_K}) AS BIGINT) AS est_intersect,
           true_intersect,
           CAST(round(({_KMV_K} - 1) * {_KMV_MOD}.0 / uk)
                - round(nb * (({_KMV_K} - 1) * {_KMV_MOD}.0 / uk)
                        / {_KMV_K}) AS BIGINT) AS est_sym_rest,
           CAST(true_union - true_intersect AS BIGINT) AS true_sym_rest
    FROM kth, both_cnt, truth
    """,
)
def sketch_kmv_set_ops(spark, sf):
    """KMV sketch set operations (module comment above): build one k=64
    sketch per priority group via the MERGEABLE
    :func:`~...operators.sketches.kmin_values` partial aggregate
    (VERDICT r08 task 1 — per-partition k-min partials merged by
    k-min-of-union; no window over the group key, no corpus-sized
    shuffle), merge to the union sketch with a TakeOrdered over the
    ≤ 2k sketch values (never a global window over data), estimate the
    union NDV from the merged k-th minimum, and the intersection by
    the theta-sketch both-membership fraction — all against exact
    truths in the same row. Measured at sf0.01: union 1431 est vs 1472
    true (2.8% err), intersection 1028 vs 1120 (8.2% — the J·union
    product compounds both errors, the known theta-sketch trade).
    EXACT-oracled end to end including the estimate arithmetic.
    At 100 TB the raw scan happens once per group; every set operation
    after that runs on 64-integer sketches."""
    from ..operators.sketches import kmin_values

    o = table(spark, sf, "orders").filter(
        F.col("o_orderpriority").isin(_KMVS_A, _KMVS_B)
    )
    h = o.select(
        "o_orderpriority", "o_custkey",
        F.pmod(
            F.col("o_custkey") * F.lit(2654435761) + 12345,
            F.lit(_KMV_MOD),
        ).alias("u"),
    ).distinct()
    sk = (
        kmin_values(
            o.select(
                "o_orderpriority",
                F.pmod(
                    F.col("o_custkey") * F.lit(2654435761) + 12345,
                    F.lit(_KMV_MOD),
                ).alias("u"),
            ),
            ["o_orderpriority"], "u", _KMV_K,
        )
        .select("o_orderpriority", F.explode("kmin").alias("u"))
        .localCheckpoint()  # ≤ 2k rows; consumed four times below
    )
    merged = sk.select("u").distinct().orderBy("u").limit(_KMV_K)
    kth = merged.agg(F.max("u").alias("uk"))
    both = (
        merged
        .join(sk.filter(F.col("o_orderpriority") == _KMVS_A)
              .select("u"), "u", "semi")
        .join(sk.filter(F.col("o_orderpriority") == _KMVS_B)
              .select("u"), "u", "semi")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    truth = (
        h.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderpriority") == _KMVS_A).alias("in1"),
            F.max(F.col("o_orderpriority") == _KMVS_B).alias("in2"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("true_union"),
            F.count_if(F.col("in1") & F.col("in2")).cast("long")
            .alias("true_intersect"),
        )
    )
    est_u = F.round((_KMV_K - 1) * F.lit(float(_KMV_MOD)) / F.col("uk"))
    return (
        kth.crossJoin(both).crossJoin(truth)
        .select(
            est_u.cast("long").alias("est_union"),
            "true_union",
            F.round(
                F.col("nb")
                * ((_KMV_K - 1) * F.lit(float(_KMV_MOD)) / F.col("uk"))
                / _KMV_K
            ).cast("long").alias("est_intersect"),
            "true_intersect",
            (
                est_u
                - F.round(
                    F.col("nb")
                    * ((_KMV_K - 1) * F.lit(float(_KMV_MOD)) / F.col("uk"))
                    / _KMV_K
                )
            ).cast("long").alias("est_sym_rest"),
            (F.col("true_union") - F.col("true_intersect")).cast("long")
            .alias("true_sym_rest"),
        )
    )
