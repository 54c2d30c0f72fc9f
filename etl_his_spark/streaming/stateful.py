"""Custom stateful streaming — explicit per-key state with
``applyInPandasWithState`` (Arrow-batched, GroupState-managed).

The engine's escape hatch for stateful semantics the built-in
aggregations can't express (per-entity accumulators with custom
update/expiry logic). State lives in Spark's state store —
checkpointed, partitioned by key, recovered on restart — while the
update function is plain pandas over each key's batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, cents) per user; emit the running totals once
    per micro-batch that touched the key."""
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(round(pdf["value"].fillna(0.0).mul(100).round()).sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state.

    Each micro-batch emits one row per touched user carrying the
    lifetime totals so far — the custom-accumulator shape (the built-in
    streaming agg could do this particular sum, but the state hook
    generalizes to arbitrary update logic: decaying counters, top-k
    per key, fraud heuristics...).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
