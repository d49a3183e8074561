"""Driver-sim verify: vanilla session, full oracle comparator (the /verify
skill entry point). Usage: python tools/verify_driver_sim.py [sf_dir].
Env: DDS_SIM_CPUS / DDS_SIM_SHUFFLE override the session shape — e.g.
DDS_SIM_CPUS=4 DDS_SIM_SHUFFLE=5 runs the odd-partitioning mirror that
shakes out partition-count-dependent results. DDS_SIM_QUERIES (comma
list) restricts to a subset — the optimization round's per-change fast
loop; the round record is always a FULL run."""
import sys, os, traceback
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import duckdb
from pyspark.sql import SparkSession
_cpus = os.environ.get("DDS_SIM_CPUS", "8")
_shuf = os.environ.get("DDS_SIM_SHUFFLE", "8")
spark = (SparkSession.builder.master(f"local[{_cpus}]")
         .config("spark.sql.shuffle.partitions", _shuf)
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
n = len(E.entry(spark).collect())
print(f"entry(): {n} rows", flush=True)
assert n > 0
from test_oracle_parity import duck_connection, normalize, values_equal
qs, os_ = E.queries(), E.oracle_sql()
_subset = os.environ.get("DDS_SIM_QUERIES")
if _subset:
    want = set(_subset.split(","))
    missing = want - set(qs)
    assert not missing, f"unknown queries: {sorted(missing)}"
    qs = {k: v for k, v in qs.items() if k in want}
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duck_connection(sf)
# Oracled queries must return ROWS: both engines agreeing on an empty
# result proves nothing about the operator (VERDICT r05 task 3 — the
# class that let join_anti ride green on 0 rows for five rounds). Any
# legitimately-empty fixture must be allow-listed here explicitly.
EMPTY_OK: set = set()
fails = []
for name in sorted(qs):
    try:
        df = qs[name](spark, sf)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        if name not in os_:
            assert len(rows) > 0, "rows-only returned 0"
            continue
        assert len(rows) > 0 or name in EMPTY_OK, (
            "oracled query returned 0 rows (trivially green)"
        )
        cur = con.execute(os_[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        assert sorted(cols) == sorted(dcols), f"cols {sorted(cols)} vs {sorted(dcols)}"
        assert len(rows) == len(drows), f"rowcount {len(rows)} vs {len(drows)}"
        s_norm, _ = normalize(rows, cols)
        d_norm, _ = normalize(drows, dcols)
        bad = [i for i, (sr, dr) in enumerate(zip(s_norm, d_norm))
               if not all(values_equal(x, y) for x, y in zip(sr, dr))]
        assert not bad, f"{len(bad)} value mismatches"
    except Exception as e:
        fails.append((name, str(e)[:200]))
        print(f"FAIL {name}: {str(e)[:200]}", flush=True)
print(f"DONE: {len(qs)} queries, {len(fails)} failures", flush=True)
sys.exit(1 if fails else 0)
