"""Streaming file ingestion: the A-02..A-08 pipeline as a Structured
Streaming job.

``Trigger.AvailableNow`` drains whatever files exist and stops — the
streaming-native equivalent of one ingestion DAG run; the checkpoint
directory replaces the filename ledger (each file is consumed exactly
once across restarts). ``foreachBatch`` lands each micro-batch through
the same idempotent per-``load_id`` partition overwrite as the batch
silver sink, so an epoch replayed after a crash overwrites its own
partition instead of appending a duplicate copy — exactly-once end to
end, not just at the source. The CSV reader carries the batch path's
exact parsing options (header, RFC-4180 doubled-quote escapes,
NULL/null/'' -> NULL, PERMISSIVE), so a file produces identical bronze
rows whichever path ingested it.

``load_id`` allocation: each epoch writes ``base + epoch_id`` where
``base`` defaults to the admin ingestion ledger's MAX(load_id)+1 the
FIRST time a stream starts against a given checkpoint, and is then
persisted inside the checkpoint directory (``_load_id_base``) so every
restart replays epochs onto the SAME load_ids — a replayed epoch
overwrites its original bronze partition instead of allocating a fresh
one. Every epoch also appends a ledger row, so the batch path's next
allocation sees the streamed loads and the two paths can never hand
out colliding ids (single-driver contract, same as the warehouse's
other ledgers).

At scale this is the preferred ingestion mode: file discovery is
incremental (no full LIST per run), and maxFilesPerTrigger bounds batch
size for predictable executor memory.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from travel_data_ingestion_spark.catalog import (
    ADMIN_SCHEMAS,
    BRONZE_SCHEMAS,
    LINEAGE_FIELDS,
    Warehouse,
)
from travel_data_ingestion_spark.io import CSV_OPTIONS
from travel_data_ingestion_spark.ingest import (
    _csv_null_tokens,
    _next_load_id,
    lineage_row_id,
)

_LINEAGE_COLS = [f.name for f in LINEAGE_FIELDS]


def _stable_load_id_base(
    spark: SparkSession, wh: Warehouse, checkpoint: str, load_id: int | None
) -> int:
    """Return the epoch->load_id base for this checkpoint, stable across
    restarts.

    The base is allocated once (ledger MAX(load_id)+1, or the caller's
    explicit ``load_id``) and persisted as ``<checkpoint>/_load_id_base``
    BEFORE the stream starts; every restart reads the persisted value
    back. Without this, a restart after a crash would recompute
    MAX(load_id)+1 — which by then includes the crashed run's own
    ledger rows — so a replayed epoch N would write ``base'+N`` instead
    of ``base+N``: the partition overwrite would land on a FRESH bronze
    partition and the first attempt's rows would survive as duplicates.
    Pinning the mapping makes replay rewrite the original partition
    (exactly-once end to end, as the module contract promises).

    Goes through the Hadoop FileSystem API so the marker lives wherever
    the checkpoint lives (local disk in tests, HDFS/S3 on a cluster);
    written via tmp-file + rename, and an unreadable/partial marker is
    treated as absent and rewritten.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    marker = jvm.org.apache.hadoop.fs.Path(os.path.join(checkpoint, "_load_id_base"))
    fs = marker.getFileSystem(hconf)
    if fs.exists(marker):
        stream = fs.open(marker)
        try:
            text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()
        try:
            return int(text.strip())
        except ValueError:
            pass  # partial write from a crash mid-create: reallocate below
    base = _next_load_id(spark, wh) if load_id is None else int(load_id)
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(checkpoint))
    tmp = jvm.org.apache.hadoop.fs.Path(
        os.path.join(checkpoint, "_load_id_base.__tmp")
    )
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(str(base).encode("utf-8")))
    finally:
        out.close()
    fs.delete(marker, False)
    fs.rename(tmp, marker)
    return base


def stream_ingest_csv(
    spark: SparkSession,
    wh: Warehouse,
    landing_dir: str,
    target_table: str,
    pattern: str = "*.csv",
    checkpoint_dir: str | None = None,
    load_id: int | None = None,
) -> None:
    """Stream-ingest CSV files into bronze.<target_table> and wait for
    completion (AvailableNow drains then stops). ``load_id`` overrides
    the ledger-allocated base (epoch N writes ``load_id + N``) on the
    FIRST start only; restarts reuse the base persisted in the
    checkpoint so replayed epochs keep their original load_ids."""
    bronze_schema = BRONZE_SCHEMAS[target_table]
    business = [f.name for f in bronze_schema.fields if f.name not in _LINEAGE_COLS]
    read_schema = T.StructType([T.StructField(c, T.StringType()) for c in business])

    checkpoint = checkpoint_dir or os.path.join(wh.root, "_checkpoints", target_table)
    base = _stable_load_id_base(spark, wh, checkpoint, load_id)
    # CSV parsing options come from the single shared set (io.CSV_OPTIONS)
    # so a file produces identical bronze rows whichever path ingested it
    stream = (
        spark.readStream.schema(read_schema)
        .options(**CSV_OPTIONS)
        .option("pathGlobFilter", pattern)
        .option("maxFilesPerTrigger", 16)
        .csv(landing_dir)
    )

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        s = df.sparkSession
        eid = base + epoch_id
        out = (
            _csv_null_tokens(df)
            .withColumn("_ingestion_time", F.current_timestamp())
            .withColumn("_source_file", F.element_at(F.split(F.input_file_name(), "/"), -1))
            .withColumn("load_id", F.lit(eid).cast("long"))
            .withColumn("row_id", lineage_row_id(eid))
        )
        # dynamic partition overwrite on load_id: an epoch replayed
        # after a crash rewrites exactly its own partition — no dupes
        wh.write_idempotent(s, out, "bronze", target_table)
        # ledger row so the batch path's MAX(load_id)+1 sees this load;
        # a replayed epoch appends a duplicate row, which the append+
        # latest-wins ledger semantics absorb (same load_id, same file)
        log = s.createDataFrame(
            [
                (
                    eid,
                    None,  # file_id: streams have no config row
                    f"stream:{target_table}",
                    target_table,
                    "SUCCESS",
                    None,
                    None,
                    datetime.now(timezone.utc),
                )
            ],
            ADMIN_SCHEMAS["ingestion_logs"],
        )
        wh.append(s, log, "admin", "ingestion_logs")

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_ingest_media(
    spark: SparkSession,
    landing_dir: str,
    out_path: str,
    checkpoint_dir: str,
    pattern: str = "*",
    media_type: str = "image",
) -> None:
    """Stream raw media files into a media table (AvailableNow drains
    then stops) — the streaming twin of the batch binaryFile source
    (io.read_table fmt='binary') feeding llm/multimodal.

    Each file becomes one MEDIA_SCHEMA-shaped row: opaque payload bytes
    plus typed metadata (source path, byte length, mime placeholder);
    media_id is the xxhash64 of the file path, so re-ingesting a file
    under the same path is the same id (downstream per-id dedup is a
    no-op) while distinct paths can't collide in practice (64-bit).
    The parquet streaming sink + checkpoint gives exactly-once per file
    across restarts — the same contract as stream_ingest_csv, with no
    load_id machinery needed because the sink is append-only and the
    file-source checkpoint is the ledger. At 100 TB: file discovery is
    incremental; payload bytes go straight from source to parquet
    without leaving the JVM; maxFilesPerTrigger bounds per-epoch memory.
    """
    # streaming sources require an explicit schema; binaryFile's is fixed
    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    stream = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("pathGlobFilter", pattern)
        .option("maxFilesPerTrigger", 16)
        .load(landing_dir)
    )
    media = stream.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col("content").alias("payload"),
        F.struct(
            F.col("path").alias("source"),
            F.col("length").cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )
    q = (
        media.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
