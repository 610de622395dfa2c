"""Streaming exact dedup — the continuous twin of dd01.

A training-data ingestion stream re-delivers documents (source retries,
crawler overlap, at-least-once buses); the pipeline needs exactly-once
content downstream without unbounded state. ``dropDuplicatesWithinWatermark``
keeps each key's state only until the event-time watermark passes it, so
state is bounded by (arrival rate x watermark horizon) instead of growing
with corpus size like a plain ``dropDuplicates`` would — the property
that makes this runnable forever on a 100 TB/day stream.

Batch twin: queries/llm_dedup.dd01_exact_dedup (same md5 content key,
oracle-checked); reference ledger semantics: ingestion_logic.py:47-211
(exactly-once per file — here generalized to exactly-once per content).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deduped_stream(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per key within the watermark horizon."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def deduped_doc_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Content-exact document dedup on md5(lower(trim(text))) — dd01's
    normalization — emitting each distinct content once WITHIN the
    watermark horizon: a re-delivery arriving after the watermark has
    passed its first arrival is re-emitted by design (bounded state is
    the trade; pair with the batch dd01 sweep for horizon-crossing
    dupes)."""
    keyed = stream.withColumn(
        "content_key", F.md5(F.lower(F.trim(F.col(text_col))))
    )
    return deduped_stream(keyed, ["content_key"], ts_col=ts_col, watermark=watermark)
