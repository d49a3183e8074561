#!/usr/bin/env python
"""Benchmark harness: times every suite query at the bench scale factor and
prints ONE JSON line:

    {"metric": "suite_total", "value": <sec>, "unit": "sec",
     "queries": {"agg_hash": <sec>, ...}, "sf": 0.1}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32),
     BENCH_QUERIES      (comma list to subset, default all),
     BENCH_SESSION_CHUNK (queries per SparkSession, default 100).

Each query is timed as plan-build + execution to completion via a count-ish
materialization (``df.write.format("noop")`` — full computation, no driver
collect cost, the honest measure of executor-side work).

Session recycling (VERDICT r04 task 4): one 315-query session accumulates
state — cached/checkpointed blocks, listener queues, broadcast-cleanup
backlog — that inflates LATE-suite queries ~0.2 s each while their plans
are unchanged (r04: suite median rose 0.52→0.75 while per-plan A/Bs were
flat). The suite therefore runs in fresh-session chunks of
``BENCH_SESSION_CHUNK`` queries (alphabetical order preserved, so
session-memoized shared indexes land with their consumers and stay billed
to their named build queries); each session re-pays the JVM/Python-path
warmup explicitly OUTSIDE the per-query timers. Cross-round medians are
comparable per chunk-size; the chunk size is recorded in the output.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402

from datacooker_dist_spark.session import build_session  # noqa: E402
from datacooker_dist_spark.suite import QUERIES  # noqa: E402


def _python_path_warmup(spark) -> None:
    """Warm the Python-worker daemon + Arrow serde on all three eval paths
    (mapInPandas, mapInArrow, pandas UDF): the forks cost ~3-4 s once per
    session and otherwise land on whichever pandas/Arrow query runs first
    (the r02 'udf regressions' were exactly this attribution)."""

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    tiny = spark.range(0, 64, 1, 32)
    tiny.mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    tiny.mapInArrow(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    tiny.select(_warm("id")).write.format("noop").mode("overwrite").save()


def _table_warmup(spark, sf_dir: str) -> None:
    """Prime each table's parquet footer/schema (memoized per session in
    suite.table) and one tiny scan, so a fresh chunk session doesn't bill
    footer inference to its first query."""
    from datacooker_dist_spark.suite import table

    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        try:
            table(spark, sf_dir, t).limit(1).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    subset = os.environ.get("BENCH_QUERIES")
    names = subset.split(",") if subset else sorted(QUERIES)

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    chunk = int(os.environ.get("BENCH_SESSION_CHUNK", "100"))

    timings: dict[str, float] = {}
    for lo in range(0, len(names), chunk):
        spark = build_session(app_name=f"dds-bench-{lo // chunk}", cpus=cpus)
        spark.sparkContext.setLogLevel("ERROR")

        # JVM/codegen warmup on a trivial job so the first query isn't
        # charged session startup.
        spark.range(1_000_000).selectExpr("sum(id)").collect()

        # r03 A/B: the r02 "udf_broadcast_dict 0.25→2.45 s regression" was
        # the session's Python-worker startup cost mis-attributed (warm
        # per-query times are 0.24-0.47 s); charge it to warmup, not to a
        # query.
        _python_path_warmup(spark)
        _table_warmup(spark, sf_dir)

        for name in names[lo:lo + chunk]:
            fn = QUERIES[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)

        spark.stop()

    total = round(sum(timings.values()), 3)
    ordered = sorted(timings.values())
    median = round(ordered[len(ordered) // 2], 3) if ordered else 0.0
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )

    # Full per-query map goes to an artifact file; stdout gets a compact line
    # (the driver's capture window truncates multi-KB lines — VERDICT r01).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "session_chunk": chunk,
            },
            fh,
            indent=1,
            sort_keys=True,
        )

    # Compact summary is the LAST stdout line so the driver's tail capture
    # always holds one complete, parse-able JSON object.
    print(
        json.dumps(
            {
                "metric": "suite_total",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(timings),
                "median_sec": median,
                "session_chunk": chunk,
                "detail": "BENCH_DETAIL.json",
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
