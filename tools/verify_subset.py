"""Ad-hoc oracle parity for a named subset of suite queries.

Usage: python tools/verify_subset.py <sf_dir> name1 name2 ...
Same comparator as tools/verify_driver_sim.py (exact sorted-value compare),
restricted to the given names — the fast iteration loop when developing a
new wave without paying the full 250+-query sweep.
"""
import os, sys, traceback
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from pyspark.sql import SparkSession

_cpus = os.environ.get("DDS_SIM_CPUS", "8")
_shuf = os.environ.get("DDS_SIM_SHUFFLE", "8")
spark = (
    SparkSession.builder.master(f"local[{_cpus}]")
    .config("spark.sql.shuffle.partitions", _shuf)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
from test_oracle_parity import duck_connection, normalize, values_equal

qs, os_ = E.queries(), E.oracle_sql()
sf = sys.argv[1]
names = sys.argv[2:] or sorted(qs)
con = duck_connection(sf)
fails = []
for name in names:
    try:
        df = qs[name](spark, sf)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        if name not in os_:
            assert len(rows) > 0, "rows-only returned 0"
            print(f"  {name}: rows-only ok ({len(rows)} rows)")
            continue
        # Empty-agreement proves nothing (VERDICT r05 task 3).
        assert len(rows) > 0, "oracled query returned 0 rows (trivially green)"
        cur = con.execute(os_[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        assert sorted(cols) == sorted(dcols), f"cols {sorted(cols)} vs {sorted(dcols)}"
        assert len(rows) == len(drows), f"rowcount {len(rows)} vs {len(drows)}"
        s_norm, _ = normalize(rows, cols)
        d_norm, _ = normalize(drows, dcols)
        assert values_equal(s_norm, d_norm), "value mismatch"
        print(f"  {name}: ok ({len(rows)} rows)")
    except Exception as ex:
        fails.append(name)
        print(f"  {name}: FAIL {ex}")
        traceback.print_exc()
print(f"{len(names) - len(fails)}/{len(names)} ok; fails: {fails}")
sys.exit(1 if fails else 0)
