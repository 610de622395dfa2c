"""Watermarked window aggregations + sessionization over a stream.

Streaming twins of the engine's batch grains: the reference aggregates
heart-rate to minute/hour grains in batch (fitbit_heart_rate.py:58-79,
D-02/D-03); here the same aggregation runs incrementally with event-time
windows and a late-data watermark. State is bounded: watermark age
× window count per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    stream: DataFrame,
    window_len: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time window stats with late-data tolerance."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len), key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("total_value"),
            F.avg(value_col).alias("avg_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


def sessionized_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessions via native session_window — the streaming twin
    of the batch lag+cumsum sessionization (queries.relational.j02)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )
