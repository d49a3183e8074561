"""Structured Streaming pipelines (build plan M3 / SURVEY §2.B).

The engine's streaming surface: file-source readStream → event-time windowed
aggregation with watermark-driven late-data policy → sink. Batch parity is
testable because a watermarked windowed count over a bounded source processed
with the ``availableNow`` trigger emits exactly the batch answer once the
stream drains (no data is late relative to a watermark that only advances
between micro-batches that have already included it).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    ts: str,
    duration: str,
    keys: list[str],
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time tumbling-window counts with a late-data watermark.

    Rows older than (max event time − watermark) are dropped once the state
    for their window is evicted — the knob that bounds state size on an
    unbounded stream (at 100 TB/day the watermark IS the memory budget).
    """
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(ts, duration).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), *keys, "n_events")
    )


def run_available_now(
    result: DataFrame, spark: SparkSession, output_mode: str = "complete"
) -> DataFrame:
    """Drain a bounded stream through the real micro-batch engine into a
    memory sink and return the materialized result (test/driver harness
    path; production would writeStream to parquet/kafka with checkpointing)."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def file_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream over a parquet directory (one file per
    micro-batch). A single-file path is wrapped in a temp symlink directory
    (the streaming source only accepts directories)."""
    import hashlib
    import os
    import tempfile

    if os.path.isfile(path):
        d = os.path.join(
            tempfile.gettempdir(),
            "dds_stream_" + hashlib.md5(path.encode()).hexdigest()[:12],
        )
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, os.path.basename(path))
        if not os.path.exists(link):
            os.symlink(path, link)
        path = d
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
