"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the Structured Streaming extension point for
operators the built-ins can't express — brief §custom operators).

Semantics match the batch ``events_sessionize`` oracle query (lag +
running-sum windows): a session closes when a user is silent for more
than ``gap_s`` seconds. Here the state (open session aggregate + last
event time) lives in the streaming state store per user_id, so the
operator is incremental over unbounded input: each micro-batch emits the
sessions it CLOSED; the open tail session stays in state. pytest
(test_stateful_streaming.py) checks the emitted sessions against the
batch sessionization of the same events, modulo each user's final
still-open session.

At scale: state is partitioned by user_id (shuffle on the group key,
same as any streaming agg); per-batch work is Arrow-batched pandas, one
state row per user — the 10^10-frontier analogue of this shape is the
bloom seen-state, which the crawl keeps in catalog tables instead
because its rounds are self-feeding (SURVEY §2.8).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("session_start", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def sessionize_stateful(events: DataFrame, gap_s: int = 600) -> DataFrame:
    """events: STREAMING DataFrame (user_id, event_id, ts_s, value).
    Emits one row per CLOSED session. Events must arrive in event-time
    order across micro-batches per user (file-source staging in the
    test); within a batch they are sorted here."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_s", "event_id"])
        if state.exists:
            last_ts, start, n, s = state.get
        else:
            last_ts = start = None
            n, s = 0, 0.0
        closed: list[tuple] = []
        for ts, val in zip(rows["ts_s"], rows["value"]):
            ts = int(ts)
            if last_ts is not None and ts - last_ts > gap_s:
                closed.append((user_id, start, n, s))
                start, n, s = ts, 0, 0.0
            elif last_ts is None:
                start, n, s = ts, 0, 0.0
            n += 1
            s += float(val)
            last_ts = ts
        state.update((last_ts, start, n, s))
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "n_events", "sum_value"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
