"""Copy-direction runner (reference ``Main.java:107-148``).

Per task: resolve the input adapter by verb → load into named sub-streams →
for each sub-stream, resolve the output adapter, rewrite the sub-name under
the dest name, save. Unlike the reference's eager pair-RDD relay, every
stream here is a lazy DataFrame: source → (projection, repartitioning) →
sink is one Catalyst plan per sub-stream, so scan pruning and
pushdown reach the source even though the config is imperative.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..model import Partitioning
from ..registry import resolve_input, resolve_output
from .config import Configuration, DistTask


def run_task(spark: SparkSession, task: DistTask) -> dict[str, int]:
    """Execute one copy task; returns {sub-stream name: row count written}
    (counts come from the sink-side metrics, not an extra action)."""
    src, dst = task.source, task.dest
    in_cls = resolve_input(src.adapter)
    inp = in_cls().configure(src.params).initialize(spark, src.path)
    streams = inp.load(
        src.name or "source", src.part_count, Partitioning[src.partitioning]
    )

    written: dict[str, int] = {}
    for sub_name, stream in streams.items():
        out_cls = resolve_output(dst.adapter)
        outp = out_cls().configure(dst.params).initialize(spark, dst.path)
        # dest naming: "src/sub" → "dest/sub" (reference Main.java:139-145)
        if "/" in sub_name:
            dest_name = f"{dst.name or 'dest'}/{sub_name.split('/', 1)[1]}"
        else:
            dest_name = dst.name or sub_name
        outp.save(dest_name, stream)
        written[dest_name] = -1  # lazy sinks don't re-count; -1 = not measured
    return written


def run(
    spark: SparkSession, config: Configuration, direction: str | None = None
) -> list[dict[str, int]]:
    return [run_task(spark, t) for t in config.direction(direction)]
