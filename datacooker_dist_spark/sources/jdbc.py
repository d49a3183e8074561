"""JDBC storage adapters (reference A1/A6 — ``datacooker-jdbc`` module).

The reference runs a SELECT with two ``?`` placeholders bound per partition
(``JdbcColumnarInput.java:62-77``) and hand-batches INSERTs
(``JdbcColumnarOutput.java:84-147``). Spark's JDBC source supplies both
natively: predicate-bounded partitioned reads and batched writes. Three
reference bugs disappear by construction (SURVEY §2.A notes): the 0-based
column-index bug, the uninitialized-delimiter NPE, and the off-by-one batch
flush.

No JDBC driver jar ships in this environment, so the runtime path is gated:
tests exercise option-plumbing and registry wiring; a deployment provides
``spark.jars``.
"""

from __future__ import annotations

from ..model import DataStream, Lineage, Partitioning, StreamType
from ..registry import Param, input_adapter, output_adapter
from .base import InputAdapter, OutputAdapter

_CONN_PARAMS = (
    Param("url", "str", required=True,
          doc="JDBC URL (reference JDBCAdapter meta 'url')"),
    Param("driver", "str", doc="JDBC driver class name"),
    Param("user", "str", doc="connection user"),
    Param("password", "str", doc="connection password"),
)


def _props(params: dict) -> dict:
    out = {}
    if params.get("driver"):
        out["driver"] = str(params["driver"])
    if params.get("user") is not None:
        out["user"] = str(params["user"])
    if params.get("password") is not None:
        out["password"] = str(params["password"])
    return out


@input_adapter("jdbcColumnar")
class JdbcColumnarInput(InputAdapter):
    """Partitioned JDBC read. ``path`` is the query or table (reference:
    path = SELECT text); partitioning uses ``partition_column`` +
    ``lower_bound``/``upper_bound`` with ``part_count`` slices — Spark binds
    per-partition WHERE ranges exactly where the reference binds its two
    ``?`` placeholders."""

    PARAMS = _CONN_PARAMS + (
        Param("partition_column", "str",
              doc="numeric column for range-partitioned reads"),
        Param("lower_bound", "int", default=0,
              doc="partition range lower bound"),
        Param("upper_bound", "int",
              doc="partition range upper bound (default: part_count)"),
    )

    def reader(self, part_count: int | None):
        params = self.params
        r = (
            self.spark.read.format("jdbc")
            .option("url", params["url"])
            .options(**_props(params))
        )
        query = self.path.strip()
        if query.lower().startswith("select"):
            r = r.option("query", query)
        else:
            r = r.option("dbtable", query)
        if part_count and params.get("partition_column"):
            r = (
                r.option("numPartitions", int(part_count))
                .option("partitionColumn", params["partition_column"])
                .option("lowerBound", params.get("lower_bound", 0))
                .option("upperBound", params.get("upper_bound", part_count))
            )
        return r

    def load(self, name, part_count=None, partitioning=Partitioning.HASHCODE):
        df = self.reader(part_count).load()
        ds = DataStream(
            name=name,
            df=df,
            stream_type=StreamType.COLUMNAR,
            lineage=Lineage(self.verb, self.path, StreamType.COLUMNAR, partitioning),
            params=self.params,
        )
        # Reference JDBC supports only HASHCODE/RANDOM (JdbcColumnarInput.java:39-40)
        if not self.params.get("partition_column"):
            ds = ds.repartitioned(part_count, partitioning)
        return {name: ds}


@output_adapter("jdbcColumnar")
class JdbcColumnarOutput(OutputAdapter):
    """Batched JDBC append. ``path`` is the table name; ``batch_size``
    defaults to the reference's 500 (``JdbcColumnarOutput.java:49-50``);
    ``columns`` projects/reorders with ``_`` skips before insert
    (``JdbcColumnarOutput.java:116-120``)."""

    PARAMS = _CONN_PARAMS + (
        Param("batch_size", "int", default=500,
              doc="INSERT batch size (reference JdbcColumnarOutput.java:49-50)"),
        Param("columns", "list[str]",
              doc="column select + reorder with '_' skips before insert"),
    )

    def save(self, name: str, stream: DataStream) -> None:
        df = stream.select_columns(self.params.get("columns")).df
        (
            df.write.format("jdbc")
            .option("url", self.params["url"])
            .option("dbtable", self.path)
            .option("batchsize", int(self.params.get("batch_size", 500)))
            .options(**_props(self.params))
            .mode("append")
            .save()
        )
