"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windowed/session aggregations (streaming/windowed.py) cover the
declarative cases; this is the escape hatch for arbitrary per-key state
machines — here, running per-user totals that survive across micro-batches.
State lives in Spark's state store (checkpointed, fault-tolerant); the
pandas function sees one key's batches at a time, Arrow-transferred.

Sink note: the in-memory sink cannot resume from a checkpoint — for
cross-restart cumulative state use foreachBatch or a file/table sink with a
checkpointLocation (verified: totals carry across separate availableNow
runs that share a checkpoint).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "cnt long, total double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (uid,) = key
    if state.exists:
        cnt, total = state.get
    else:
        cnt, total = 0, 0.0
    for pdf in pdfs:
        cnt += len(pdf)
        total += float(pdf["value"].sum())
    state.update((cnt, total))
    yield pd.DataFrame(
        {"user_id": [uid], "n_events": [cnt], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Cumulative (count, sum(value)) per user, emitted every micro-batch the
    user appears in.  Update output mode."""
    return events.groupBy(key).applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
