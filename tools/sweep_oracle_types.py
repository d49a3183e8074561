"""Sweep every oracled query for driver-canonicalization hazards
(VERDICT r02 task 2).

The r02 hash failures were both type-skew between the engines that a
value-level compare can't see: DuckDB SUM(BIGINT) returns HUGEINT (int128
-> float/object once fetched into pandas, so "3600000000.0" vs
"3600000000"), and engine-rendered decimal strings ("904.00") depend on
the renderer version. This tool compiles each oracle with LIMIT 0 through
DuckDB's Arrow surface and diffs the Arrow type class per column against
the Spark schema — no data needed, pure type audit.

Flag kinds:
  HUGEINT       oracle column is int128 while Spark is int64
  DEC-vs-FLOAT  oracle decimal vs Spark double (or vice versa)
  DEC-SCALE     both decimal but different scale
  CLASS         any other class mismatch (int vs str, ...)

Importable (tests/test_exactness.py runs it under -m sf_medium);
CLI usage: python tools/sweep_oracle_types.py [sf_dir]
"""
import pyarrow as pa
from pyspark.sql import types as T


def spark_class(dt):
    if isinstance(dt, T.DecimalType):
        return ("decimal", dt.scale)
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return ("int", 64)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return ("float", None)
    if isinstance(dt, T.StringType):
        return ("str", None)
    if isinstance(dt, T.BooleanType):
        return ("bool", None)
    if isinstance(dt, T.DateType):
        return ("date", None)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return ("ts", None)
    return ("other", str(dt))


def arrow_class(dt):
    if pa.types.is_decimal(dt):
        # duckdb renders HUGEINT as decimal(38,0) through Arrow
        if dt.scale == 0 and dt.precision >= 38:
            return ("hugeint", None)
        return ("decimal", dt.scale)
    if pa.types.is_integer(dt):
        return ("int", 64)
    if pa.types.is_floating(dt):
        return ("float", None)
    if pa.types.is_string(dt) or pa.types.is_large_string(dt):
        return ("str", None)
    if pa.types.is_boolean(dt):
        return ("bool", None)
    if pa.types.is_date(dt):
        return ("date", None)
    if pa.types.is_timestamp(dt):
        return ("ts", None)
    return ("other", str(dt))


def sweep_query(con, spark_schema, oracle_sql):
    """Type-diff one oracle vs one Spark schema; returns flag tuples."""
    flags = []
    sch = {f.name: spark_class(f.dataType) for f in spark_schema.fields}
    tbl = con.execute(
        f"SELECT * FROM ({oracle_sql}) LIMIT 0"
    ).fetch_arrow_table()
    for f in tbl.schema:
        a = arrow_class(f.type)
        s = sch.get(f.name)
        if s is None:
            flags.append((f.name, "MISSING", a, s))
        elif a[0] == "hugeint" and s[0] == "int":
            flags.append((f.name, "HUGEINT", a, s))
        elif {a[0], s[0]} == {"decimal", "float"}:
            flags.append((f.name, "DEC-vs-FLOAT", a, s))
        elif a[0] == "decimal" and s[0] == "decimal" and a[1] != s[1]:
            flags.append((f.name, "DEC-SCALE", a, s))
        elif a[0] != s[0]:
            flags.append((f.name, "CLASS", a, s))
    return flags


def sweep_all(spark, con, queries, oracles, sf):
    flags = []
    for name in sorted(oracles):
        try:
            sch = queries[name](spark, sf).schema
            flags += [(name, *f) for f in sweep_query(con, sch, oracles[name])]
        except Exception as e:  # noqa: BLE001
            flags.append((name, "*", "ERROR", str(e)[:150], None))
    return flags


if __name__ == "__main__":
    import sys

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tests")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from test_oracle_parity import duck_connection

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duck_connection(sf)
    flags = sweep_all(spark, con, E.queries(), E.oracle_sql(), sf)
    for f in flags:
        print("FLAG", *f, flush=True)
    print(f"DONE: {len(E.oracle_sql())} oracles, {len(flags)} flags")
    sys.exit(1 if flags else 0)
