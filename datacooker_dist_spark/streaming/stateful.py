"""Custom stateful streaming operators via applyInPandasWithState.

The pattern for operators Structured Streaming lacks natively: per-key
mutable state carried across micro-batches, Arrow-batched through Python.
State lives in the state store (checkpointed, partitioned by key), so the
operator scales exactly like a streaming aggregation: one shuffle on the
grouping key, state size bounded by keys × state schema (plus timeouts for
eviction on unbounded key spaces).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)


def running_counts(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Running per-key event counts across micro-batches.

    Each batch emits the key's cumulative count so far; the count survives
    batch boundaries in the state store. Downstream consumers take the last
    emission per key (counts are monotone)."""
    key_type = stream.schema[key_col].dataType
    out_schema = StructType(
        [StructField(key_col, key_type), StructField("n_events", LongType())]
    )
    state_schema = StructType([StructField("n", LongType())])

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n]})

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_value_stats(
    stream: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Running per-key (count, max) via ``transformWithStateInPandas`` —
    Spark 4's successor to applyInPandasWithState: typed state handles
    (ValueState here; ListState/MapState/timers available) instead of one
    opaque tuple, and per-processor lifecycle (init/close). Same scale
    posture: one shuffle on the key, state store partitioned by key.
    Each batch emits the key's cumulative stats so far; consumers keep the
    last emission per key (both stats are monotone over appends; count and
    max are order-exact floats, unlike a double sum).

    Environment gate: the transformWithState state-server protocol speaks
    protobuf between the JVM and the Python driver worker; on containers
    without ``google.protobuf`` the stream crashes at init, so this raises
    a clear ImportError up front. The applyInPandasWithState sibling
    (:func:`running_counts`) has no such dependency."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(google.protobuf) for its state-server protocol; use "
            "running_counts (applyInPandasWithState) where it is absent"
        ) from None
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import DoubleType

    key_type = stream.schema[key_col].dataType
    out_schema = StructType(
        [
            StructField(key_col, key_type),
            StructField("n_events", LongType()),
            StructField("value_max", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("m", DoubleType())]
    )

    class Stats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, m = self._state.get() if self._state.exists() else (0, None)
            for pdf in rows:
                n += len(pdf)
                batch_max = float(pdf[value_col].max())
                m = batch_max if m is None else max(m, batch_max)
            self._state.update((n, m))
            yield pd.DataFrame(
                {key_col: [key[0]], "n_events": [n], "value_max": [m]}
            )

        def close(self) -> None:
            pass

    return (
        stream.groupBy(key_col)
        .transformWithStateInPandas(
            Stats(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def running_ema(
    stream: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "cents",
    alpha_num: int = 1,
    alpha_den: int = 8,
) -> DataFrame:
    """Streaming per-key fixed-point EMA — the stateful twin of the batch
    :func:`...operators.timeseries.ema_fixedpoint`: the state store
    carries each key's last smoothed value across micro-batches, so the
    recurrence survives batch boundaries (within a batch rows sort by
    ``order_col``; across batches arrival order IS the stream order —
    the standard streaming-EMA contract). One shuffle on the key; state
    is a single long per key. Emits one row per input row with the ema
    after that observation — Python-int arithmetic, no overflow,
    identical to the batch recurrence."""
    key_type = stream.schema[key_col].dataType
    order_type = stream.schema[order_col].dataType
    out_schema = StructType(
        [
            StructField(key_col, key_type),
            StructField(order_col, order_type),
            StructField("ema_cents", LongType()),
        ]
    )
    state_schema = StructType([StructField("ema", LongType())])
    a_num, a_den = int(alpha_num), int(alpha_den)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        prev = state.get[0] if state.exists else None
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(order_col).reset_index(drop=True)
        out = []
        for v in batch[value_col]:
            x = int(v)
            prev = (
                x
                if prev is None
                else (a_num * x + (a_den - a_num) * prev) // a_den
            )
            out.append(prev)
        state.update((prev,))
        yield pd.DataFrame(
            {
                key_col: batch[key_col],
                order_col: batch[order_col],
                "ema_cents": pd.array(out, dtype="int64"),
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
