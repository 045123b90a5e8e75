"""Custom stateful streaming operator (applyInPandasWithState).

The scale path for operators Structured Streaming lacks natively: per-key
state held by the engine (RocksDB/HDFS-backed on a cluster), arbitrary pandas
logic per group per batch. Demonstrated with per-user running totals; the
same skeleton carries sessionization with custom logic, CDC folding, etc.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """i6 — engine-managed per-user state updated each micro-batch, emitting
    the current (count, total) per seen user.

    API-surface demo, NOT the preferred plan for this particular result: a
    plain running count/sum is expressible as a pure-JVM streaming
    aggregation (`groupBy(user_id).agg(count, sum)` in update mode — the i1
    shape), which at 100 TB avoids the per-group Python crossing entirely.
    `applyInPandasWithState` earns its cost only when the per-key logic is
    genuinely beyond built-in aggregates (custom session policies, CDC
    folding, model-state updates) — this module exists to prove that
    contract end-to-end, with the simplest possible state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
