"""Custom stateful streaming operator via applyInPandasWithState.

A running per-user activity profile maintained across micro-batches:
total events, total value, and last-seen timestamp per user — the
pattern for any custom accumulating state Spark's built-in windowed
aggregations can't express (e.g. decayed scores, per-key model state).

State is bounded per key (three scalars); batches arrive as pandas
DataFrames through Arrow. GroupStateTimeout can evict idle users in a
production deployment; kept NoTimeout here for deterministic tests.
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
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("total_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen_us", LongType()),
    ]
)


def _update_user_profile(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        total_events, total_value, last_seen_us = state.get
    else:
        total_events, total_value, last_seen_us = 0, 0.0, 0
    for pdf in pdfs:
        total_events += len(pdf)
        total_value += float(pdf["value"].sum())
        if len(pdf):
            last_seen_us = max(
                last_seen_us, int(pdf["ts"].astype("int64").max() // 1000)
            )
    state.update((total_events, total_value, last_seen_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "total_events": [total_events],
            "total_value": [total_value],
            "last_seen": [pd.Timestamp(last_seen_us * 1000, unit="ns")],
        }
    )


def user_profile_stream(stream: DataFrame) -> DataFrame:
    """Attach the stateful profile operator to an event stream with
    columns (ts timestamp, user_id long, value double)."""
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
