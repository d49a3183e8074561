"""Local mirror of the driver's DuckDB differential harness (SURVEY §5.2.1).

Runs every suite query against its oracle at sf0.001 and compares
row count, column names, and exact sorted values (the driver hashes; we
compare directly, which is strictly stronger). Rows-only queries are checked
for successful execution and row count > 0.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from datacooker_dist_spark.suite import ORACLES, QUERIES

from conftest import SF_MEDIUM, SF_SMALL

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows, columns):
    """Column-name-sorted, row-sorted value matrix (mirrors the driver's
    order-insensitive compare)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def key(row):
        return tuple(
            (v is None, str(type(v)), str(v)) for v in (row[i] for i in order)
        )

    return sorted([tuple(row[i] for i in order) for row in rows], key=lambda r: tuple(
        (v is None, str(v)) for v in r
    )), [columns[i] for i in order]


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query(name, spark):
    _run_parity(name, spark, SF_SMALL)


@pytest.mark.sf_medium
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_medium(name, spark):
    """The same mirror at the driver's sf0.01 scale — rules out
    scale-dependent divergence (e.g. percentile interpolation) before the
    driver's own differential runs (VERDICT r01 task 8). Opt-in:
    ``pytest -m sf_medium``."""
    _run_parity(name, spark, SF_MEDIUM)


def _run_parity(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    if name not in ORACLES:
        assert len(spark_rows) > 0, f"{name}: rows-only query returned 0 rows"
        return
    # Empty-agreement is trivially green and proves nothing about the
    # operator (VERDICT r05 task 3): oracled fixtures must return rows at
    # every tested scale. Legitimately-empty fixtures need an explicit
    # allow-list entry here (none currently).
    assert len(spark_rows) > 0, (
        f"{name}: oracled query returned 0 rows (trivially green)"
    )
    con = duck_connection(sf_dir)
    cur = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {sorted(spark_cols)} vs {sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_norm, _ = normalize(spark_rows, spark_cols)
    d_norm, _ = normalize(duck_rows, duck_cols)
    mismatches = [
        (i, sr, dr)
        for i, (sr, dr) in enumerate(zip(s_norm, d_norm))
        if not all(values_equal(x, y) for x, y in zip(sr, dr))
    ]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first 3: {mismatches[:3]}"
