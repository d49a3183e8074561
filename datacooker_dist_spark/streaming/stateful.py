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
