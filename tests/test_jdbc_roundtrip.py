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
