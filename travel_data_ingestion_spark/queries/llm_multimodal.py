"""Multimodal plumbing as registered queries.

mm01 exercises the full binary-column path — documents -> opaque payload
+ metadata -> Arrow-batched mapInPandas feature extraction — with a
DuckDB oracle possible because the stubbed features are deterministic
(byte length + md5-derived dimensions are pure functions of the bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from travel_data_ingestion_spark.llm.multimodal import (
    extract_features,
    media_from_documents,
)
from travel_data_ingestion_spark.queries import load_table, register


@register(
    "mm01_media_features",
    """
    SELECT doc_id AS media_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
    survey_ops=("X-MM-1",),
    doc="Binary-column feature extraction via Arrow-batched mapInPandas "
    "(payload bytes never return to the JVM; only small feature rows "
    "do). Oracle checks the deterministic features; width/height come "
    "from the stubbed decoder and are verified in "
    "tests/test_multimodal.py. Texts are ASCII so utf-8 byte length == "
    "char length in the oracle.",
)
def mm01_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    feats = extract_features(media)
    return feats.select("media_id", "n_bytes", "digest")


@register(
    "mm02_frame_sample",
    """
    SELECT doc_id AS media_id,
           UNNEST(range(0, GREATEST(CAST(length(text) // 1000 AS BIGINT), 1), 10))
             AS frame_index
    FROM documents
    """,
    survey_ops=("X-MM-2",),
    doc="Frame-sampling plan shape: one row per sampled frame index, "
    "generated JVM-side with sequence+explode (no Python). The stub "
    "frame count is n_bytes // 1000; a real video decoder slots into "
    "the same plan.",
)
def mm02_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_ingestion_spark.llm.multimodal import frame_sample_plan

    docs = load_table(spark, sf_dir, "documents")
    return frame_sample_plan(media_from_documents(docs), every_n=10).select(
        "media_id", F.col("frame_index").cast("long").alias("frame_index")
    )
