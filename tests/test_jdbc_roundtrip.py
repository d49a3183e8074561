"""Real JDBC adapter roundtrip (reference A1/A6) against embedded Derby —
the driver ships in pyspark's own jars, so the full write→read path runs:
batched INSERT through the output adapter, partitioned SELECT through the
input adapter."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL
from datacooker_dist_spark.model import DataStream, StreamType
from datacooker_dist_spark.registry import resolve_input, resolve_output

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def test_jdbc_write_read_roundtrip(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    orders = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(500)
    )

    out = resolve_output("jdbcColumnar")().configure(
        {"url": url, "batch_size": 100}
    ).initialize(spark, "ORDERS_COPY")
    out.save("orders", DataStream("orders", orders, StreamType.COLUMNAR))

    inp = resolve_input("jdbcColumnar")().configure(
        {
            "url": url,
            "partition_column": "o_orderkey",
            "lower_bound": 0,
            "upper_bound": 100000,
        }
    ).initialize(spark, "ORDERS_COPY")
    [ds] = inp.load("back", part_count=4).values()

    assert ds.df.rdd.getNumPartitions() == 4  # partitioned read bounds applied
    got = sorted(tuple(r) for r in ds.df.collect())
    want = sorted(tuple(r) for r in orders.collect())
    assert got == want


def test_jdbc_columns_projection_on_write(spark, tmp_path):
    """`columns` with `_` skip projects before insert (reference
    JdbcColumnarOutput.java:116-120)."""
    url = f"jdbc:derby:{tmp_path}/db2;create=true"
    nation = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    out = resolve_output("jdbcColumnar")().configure(
        {"url": url, "columns": ["n_name", "_", "n_nationkey"]}
    ).initialize(spark, "NATION_COPY")
    out.save("nation", DataStream("nation", nation, StreamType.COLUMNAR))
    back = (
        spark.read.format("jdbc").option("url", url).option("dbtable", "NATION_COPY").load()
    )
    assert [c.lower() for c in back.columns] == ["n_name", "n_nationkey"]
    assert back.count() == nation.count()


def test_jdbc_filter_pushdown(spark, tmp_path):
    """Predicates on a JDBC scan must push into the remote SELECT
    (PushedFilters on the JDBCRelation) — at scale the database prunes
    rows before they ever cross the wire, instead of Spark filtering
    after a full-table fetch."""
    url = f"jdbc:derby:{tmp_path}/dbp;create=true"
    orders = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .limit(200)
    )
    out = resolve_output("jdbcColumnar")().configure(
        {"url": url, "batch_size": 100}
    ).initialize(spark, "ORDERS_PD")
    out.save("orders", DataStream("orders", orders, StreamType.COLUMNAR))

    inp = resolve_input("jdbcColumnar")().configure({"url": url}).initialize(
        spark, "ORDERS_PD"
    )
    [ds] = inp.load("back", part_count=2).values()
    filtered = ds.df.filter(F.col("o_totalprice") > 100000)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = filtered._jdf.queryExecution().explainString(mode)
    assert "PushedFilters" in plan
    assert "GreaterThan(O_TOTALPRICE,100000" in plan.replace(
        "o_totalprice", "O_TOTALPRICE"
    )


def test_jdbc_placeholder_query_partition_binding(spark, tmp_path):
    """Reference parity (JdbcColumnarInput.java:62-77): an arbitrary SELECT
    with two '?' placeholders runs once per partition with both bound to
    the partition index — a modulo-partitioned reference config must port
    unchanged and return the full table across partitions."""
    url = f"jdbc:derby:{tmp_path}/db3;create=true"
    orders = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(400)
    )
    out = resolve_output("jdbcColumnar")().configure(
        {"url": url, "batch_size": 100}
    ).initialize(spark, "ORDERS_PH")
    out.save("orders", DataStream("orders", orders, StreamType.COLUMNAR))

    # Spark's JDBC writer creates case-sensitive quoted columns on Derby,
    # so the raw reference-style statement quotes them too.
    q = (
        'SELECT "o_orderkey", "o_custkey", "o_totalprice" FROM ORDERS_PH '
        'WHERE MOD("o_orderkey", 4) BETWEEN ? AND ?'
    )
    inp = resolve_input("jdbcColumnar")().configure({"url": url}).initialize(
        spark, q
    )
    [ds] = inp.load("back", part_count=4).values()
    assert ds.df.rdd.getNumPartitions() == 4
    got = sorted(tuple(r) for r in ds.df.collect())
    want = sorted(tuple(r) for r in orders.collect())
    assert got == want
    # each partition holds exactly its modulo class (the bound ran remotely)
    per_part = ds.df.select(
        F.spark_partition_id().alias("p"), (F.col("o_orderkey") % 4).alias("m")
    ).distinct().collect()
    assert all(r["p"] == r["m"] for r in per_part)


def test_jdbc_placeholder_query_validation(spark):
    from datacooker_dist_spark.sources.jdbc import (
        _bind_partition_query,
        _jdbc_partition_bounds,
    )

    assert (
        _bind_partition_query("SELECT * FROM t WHERE x >= ? AND x <= ?", 3, 3)
        == "SELECT * FROM t WHERE x >= 3 AND x <= 3"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exactly two"):
        _bind_partition_query("SELECT * FROM t WHERE x = ?", 0, 0)

    # Exact JdbcRDD range math (ADVICE r03): inclusive [0, part_count]
    # split over part_count partitions — every partition binds (i, i)
    # except the LAST, which binds (n-1, n); the reference's quirky
    # inclusion of value n is reproduced, not papered over.
    assert _jdbc_partition_bounds(4) == [(0, 0), (1, 1), (2, 2), (3, 4)]
    assert _jdbc_partition_bounds(1) == [(0, 1)]
    assert _jdbc_partition_bounds(0) == [(0, 0)]  # JdbcRDD(0, 0, 1) edge
