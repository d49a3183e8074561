"""Query suite: the driver-facing contract surface.

Each operator from SURVEY.md §2.B registers a (spark, sf_dir) → DataFrame
callable and (where SQL-expressible) a DuckDB oracle string producing the
same column names and values. ``__spark_entry__.py`` re-exports these.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

#: Serializes session-memo BUILDS across driver threads (ADVICE r11:
#: the pooled composite builders relied on a hand-maintained sequential
#: pre-warm because the ``*_CACHE`` dicts were unlocked — a future
#: builder first-touching a memo inside a thread would double-build its
#: localCheckpoint). Double-checked per getter: the fast path stays a
#: plain dict hit; only a MISS takes the lock, re-checks, and builds.
#: Reentrant because memo builds call other memo getters (opq → pq).
#: Builds of DIFFERENT memos serialize too — acceptable: the pre-warm
#: convention keeps pooled sections on warm memos, so the lock is a
#: correctness backstop, not a hot path.
MEMO_BUILD_LOCK = threading.RLock()

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a suite query and optionally its DuckDB oracle SQL."""

    def deco(fn):
        if name in QUERIES:
            # A silent overwrite ships DEAD CODE: the later import wins,
            # the shadowed query never runs, and both authors think
            # theirs is registered (r09: a second snapshot_diff rode
            # green for a commit because the incumbent also passed).
            raise ValueError(
                f"duplicate query registration: {name!r} "
                f"(already registered by {QUERIES[name].__module__})"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def session_key(spark: SparkSession) -> str:
    """Stable identity for the suite's session-memo caches: the Spark
    applicationId is unique per SparkContext (timestamped in local mode)
    and — unlike ``id(spark)`` (ADVICE r03) — can never be recycled by a
    later session after the first is stopped and GC'd, so a stale cache
    entry can't be served to a fresh session that happens to reuse the
    same CPython object address."""
    return spark.sparkContext.applicationId


_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a synthetic table; the DataFrame (lazy plan root) is memoized
    per (session, path) so parquet footer/schema inference happens once per
    table instead of once per query."""
    key = (session_key(spark), sf_dir, name)
    if key not in _TABLE_CACHE:
        with MEMO_BUILD_LOCK:
            if key not in _TABLE_CACHE:
                if name == "events":
                    _TABLE_CACHE[key] = read_events(spark, sf_dir)
                else:
                    _TABLE_CACHE[key] = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _TABLE_CACHE[key]


_SHINGLE_CACHE: dict[tuple[int, str], DataFrame] = {}


def shared_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized cached shingle rows over ``documents`` — the dedup
    family (MinHash LSH, exact Jaccard, SimHash-adjacent, clustering) all
    consume the same (doc_id, _sh) pass, so shingling + its persist happen
    once per session instead of once per query."""
    key = (session_key(spark), sf_dir)
    if key not in _SHINGLE_CACHE:
        with MEMO_BUILD_LOCK:
            if key not in _SHINGLE_CACHE:
                from ..operators import dedup as D
                from ..session import fan_out

                # Fan the scan out first (optimization round 11, guide §2.5):
                # the tokenize + posexplode feeding the shingle window runs
                # BEFORE the window's exchange, i.e. single-task on the bench's
                # one-row-group documents file. (The r03 note that an up-front
                # repartition measured slower predates the split of tokenize
                # cost from window cost; the A/B now shows the fan-out winning
                # — the raw-text shuffle it adds is a few hundred KB.)
                _SHINGLE_CACHE[key] = D.shingle_rows(
                    fan_out(table(spark, sf_dir, "documents")),
                    cache=True,
                )
    return _SHINGLE_CACHE[key]


_LSH_CAND_CACHE: dict[tuple[int, str], DataFrame] = {}

# Stop-bucket cap for every SHIPPED LSH candidate path (VERDICT r03 task
# 3): buckets larger than this are dropped before the self-join, bounding
# any single bucket's pair fanout at LSH_MAX_BUCKET² — the skew guard
# that keeps the candidate join linear when a degenerate bucket
# (boilerplate/empty/template text) shows up at corpus scale. 512 is
# ~128× the largest bucket observed on the synthetic corpus (max 4 at
# sf0.1, p99.9 = 3), so at test scales the cap provably drops nothing —
# asserted by ``tests/test_operators.py::test_lsh_default_cap_lossless``
# — while still bounding a 100 TB degenerate bucket at ~262k pairs
# instead of quadratic blowup. Pass ``max_bucket=None`` explicitly for
# uncapped oracle-baseline comparisons.
LSH_MAX_BUCKET = 512


def shared_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized banded-MinHash LSH candidate pairs (id_a < id_b,
    64 hashes × 16 bands) over ``documents``, stop-bucket-capped at
    ``LSH_MAX_BUCKET``. Whether a pair shares a band bucket depends only
    on the two documents' own signatures, so ANY doc-subset restriction
    can be applied as a post-filter on this one set
    (``dedup_edit_distance`` filters it to its bounded slice) instead of
    re-running the signature + bucket join per consumer."""
    key = (session_key(spark), sf_dir)
    if key not in _LSH_CAND_CACHE:
        with MEMO_BUILD_LOCK:
            if key not in _LSH_CAND_CACHE:
                from ..operators import dedup as D

                _LSH_CAND_CACHE[key] = D.minhash_lsh_candidates(
                    table(spark, sf_dir, "documents"),
                    num_hashes=64,
                    bands=16,
                    shingles=shared_shingles(spark, sf_dir),
                    max_bucket=LSH_MAX_BUCKET,
                ).localCheckpoint()
    return _LSH_CAND_CACHE[key]


_JACCARD_PAIR_CACHE: dict[tuple[int, str], DataFrame] = {}


def shared_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized VERIFIED near-dup pairs over ``documents``:
    banded-MinHash LSH candidates → exact 3-gram Jaccard ≥ 0.8, i.e.
    (id_a, id_b, jaccard). Three suite consumers (pair listing,
    cluster building, per-source dup-rate reporting) need exactly this
    set, so it materializes once per session via localCheckpoint (the
    pair set is tiny — O(dups), not O(corpus)) instead of re-running
    the candidate join + verification per query."""
    key = (session_key(spark), sf_dir)
    if key not in _JACCARD_PAIR_CACHE:
        with MEMO_BUILD_LOCK:
            if key not in _JACCARD_PAIR_CACHE:
                from ..operators import dedup as D

                docs = table(spark, sf_dir, "documents")
                _JACCARD_PAIR_CACHE[key] = D.ngram_jaccard_pairs(
                    docs,
                    shared_lsh_candidates(spark, sf_dir),
                    threshold=0.8,
                    shingles=shared_shingles(spark, sf_dir),
                ).localCheckpoint()
    return _JACCARD_PAIR_CACHE[key]


EVENTS_RAW_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)


def scratch_dir(tag: str) -> str:
    """Process-scoped scratch directory, removed at interpreter exit.

    Suite queries that materialize intermediate files (adapter roundtrips,
    partitioned rewrites, streaming checkpoints) must allocate through
    here so repeated bench/test runs don't accumulate orphaned copies of
    the tables on disk (ADVICE r01)."""
    import atexit
    import shutil
    import tempfile
    import uuid

    d = tempfile.mkdtemp(prefix=f"dds_{tag}_{uuid.uuid4().hex[:6]}_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def is_path_not_found(exc: Exception) -> bool:
    """True iff an AnalysisException is Spark's missing-path error
    (condition ``PATH_NOT_FOUND``) — the ONLY read failure the
    empty-source read-back convention is allowed to swallow."""
    cond = getattr(exc, "getCondition", None) or getattr(
        exc, "getErrorClass", None
    )
    name = None
    if cond is not None:
        try:
            name = cond()
        except Exception:
            name = None
    return name == "PATH_NOT_FOUND" or "PATH_NOT_FOUND" in str(exc)


def read_parquet_or_empty(
    spark: SparkSession, schema: str, path: str, recursive: bool = False
) -> DataFrame:
    """Read a parquet directory with an explicit schema, degrading ONLY a
    missing path to the zero-row frame. ADVICE r07 narrowed this from a
    bare ``except Exception``: a genuine read failure (permissions,
    corrupt footer, schema mismatch) must fail loudly, not silently
    report zero rows. The missing-path case is legitimate by the
    empty-input convention — an all-empty streaming drain or zero-row
    batch source writes no files at all."""
    from pyspark.errors import AnalysisException

    reader = spark.read.schema(schema)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    try:
        return reader.parquet(path)
    except AnalysisException as e:
        if is_path_not_found(e):
            return spark.createDataFrame([], schema)
        raise


def enable_nanos_as_long(spark: SparkSession) -> None:
    """Turn on ``spark.sql.legacy.parquet.nanosAsLong`` — INTENTIONALLY
    session-global and never restored: reads are lazy, so the conf must
    still hold whenever a downstream job executes the scan, and a
    try/finally restore would race it. The conf only affects parquet
    columns physically typed TIMESTAMP(NANOS), which Spark otherwise
    refuses to read at all (PARQUET_TYPE_ILLEGAL), and every nanos read in
    this engine funnels through :func:`read_events` /
    ``streaming.events_stream``, which both expect the int64 form."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read ``events.parquet`` with ``ts`` normalized to TIMESTAMP_NTZ.

    Handles both generator vintages: ``ts`` stored as TIMESTAMP(MICROS)
    (read directly) or as TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects — read raw int64 nanoseconds and floor-divide to microseconds
    (exactly DuckDB's nanos → micros truncation)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    ts_type = str(pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type)
    if ts_type == "timestamp[ns]":
        enable_nanos_as_long(spark)
        df = spark.read.schema(EVENTS_RAW_SCHEMA).parquet(
            f"{sf_dir}/events.parquet"
        )
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


from . import (  # noqa: E402,F401
    analytics,
    core,
    core_ext,
    embml,
    graph,
    insights,
    llm,
    llm_ext,
    llm_quality,
    mlprep,
    relational_ext,
    relational_q4,
    relational_q5,
    spatial,
    stats,
    streaming,
    subqueries,
)
