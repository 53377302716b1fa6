"""Custom stateful streaming operator via applyInPandasWithState — the
arbitrary-state API for semantics the built-in windowed aggregations can't
express.

Implemented operator: per-key running profile (event count, value sum, last
event time) maintained across micro-batches with timeout-based finalization.
The reference has no analog (its ingest is stateless per message); this is
the Spark-native extension point a training-data pipeline uses for e.g.
per-source rate tracking or incremental dedup state.

State is partitioned by key (one shuffle), bounded by the key cardinality,
and checkpointed with the query — restart-safe by construction.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ms", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ms", T.LongType()),
    ]
)


def _update_profile(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one key into the running state and emit the
    updated profile row."""
    n, s, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        last = max(last, int(pdf["ms"].max()))
    state.update((n, s, last))
    yield pd.DataFrame(
        {"key": [key[0]], "n_events": [n], "sum_value": [s], "last_ms": [last]}
    )


def running_profiles(events: DataFrame, key_col: str = "key") -> DataFrame:
    """events(key, value double, ms long) → continuously-updated per-key
    profile rows (update output mode)."""
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# -- custom stateful sessionization -----------------------------------------
# session_window covers gap-based aggregation, but a custom operator is the
# extension point when sessions must carry payloads the built-in can't
# (event ids, custom finalization).  Sessions are split by data, not timers:
# a closed session is emitted the moment a same-key event arrives more than
# gap_ms after it, and the still-open session is re-emitted each batch with
# closed=false — deterministic under availableNow test triggers and
# replayable from the checkpoint.  Assumes the upstream watermark bounds
# disorder to < gap_ms (the same contract session_window has).

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _session_updater(gap_ms: int):
    def update(
        key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ms")
        sessions: list[tuple[int, int, int, float, bool]] = []
        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = None, 0, 0, 0.0
        for ms, value in zip(rows["ms"].astype("int64"), rows["value"]):
            ms = int(ms)
            if start is None:
                start, last, n, total = ms, ms, 1, float(value)
            elif ms - last > gap_ms:
                sessions.append((start, last, n, total, True))
                start, last, n, total = ms, ms, 1, float(value)
            else:
                last, n, total = max(last, ms), n + 1, total + float(value)
        state.update((start, last, n, total))
        sessions.append((start, last, n, total, False))
        out = pd.DataFrame(
            sessions,
            columns=["session_start_ms", "session_end_ms", "n_events",
                     "sum_value", "closed"],
        )
        out.insert(0, "key", key[0])
        yield out

    return update


def stateful_sessions(
    events: DataFrame, gap_ms: int = 30 * 60 * 1000, key_col: str = "key"
) -> DataFrame:
    """events(key, value double, ms long) → session rows: closed sessions
    emitted once, the open session re-emitted per batch with closed=false.
    State per key is one open session (4 scalars) — bounded by key
    cardinality, checkpointed, restart-safe."""
    return events.groupBy(key_col).applyInPandasWithState(
        _session_updater(gap_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
