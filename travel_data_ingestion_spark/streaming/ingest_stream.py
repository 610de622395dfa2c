"""Streaming file ingestion: the A-02..A-08 pipeline as a Structured
Streaming job.

``Trigger.AvailableNow`` drains whatever files exist and stops — the
streaming-native equivalent of one ingestion DAG run; the checkpoint
directory replaces the filename ledger (each file is consumed exactly
once across restarts). ``foreachBatch`` runs the same lineage-append
bronze write as the batch path, so downstream silver logic is identical.

At scale this is the preferred ingestion mode: file discovery is
incremental (no full LIST per run), and maxFilesPerTrigger bounds batch
size for predictable executor memory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from travel_data_ingestion_spark.catalog import BRONZE_SCHEMAS, LINEAGE_FIELDS, Warehouse
from travel_data_ingestion_spark.ingest import lineage_row_id

_LINEAGE_COLS = [f.name for f in LINEAGE_FIELDS]


def stream_ingest_csv(
    spark: SparkSession,
    wh: Warehouse,
    landing_dir: str,
    target_table: str,
    pattern: str = "*.csv",
    checkpoint_dir: str | None = None,
    load_id: int = 1,
) -> None:
    """Stream-ingest CSV files into bronze.<target_table> and wait for
    completion (AvailableNow drains then stops)."""
    bronze_schema = BRONZE_SCHEMAS[target_table]
    business = [f.name for f in bronze_schema.fields if f.name not in _LINEAGE_COLS]
    read_schema = T.StructType([T.StructField(c, T.StringType()) for c in business])

    checkpoint = checkpoint_dir or os.path.join(wh.root, "_checkpoints", target_table)
    stream = (
        spark.readStream.schema(read_schema)
        .option("header", True)
        .option("pathGlobFilter", pattern)
        .option("maxFilesPerTrigger", 16)
        .csv(landing_dir)
    )

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        out = (
            df.withColumn("_ingestion_time", F.current_timestamp())
            .withColumn("_source_file", F.element_at(F.split(F.input_file_name(), "/"), -1))
            .withColumn("load_id", F.lit(load_id + epoch_id).cast("long"))
            .withColumn("row_id", lineage_row_id(load_id + epoch_id))
        )
        wh.append(df.sparkSession, out, "bronze", target_table, partition_by=("load_id",))

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
