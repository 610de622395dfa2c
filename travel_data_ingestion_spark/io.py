"""Source/sink format registry: every format the engine reads or writes.

The reference's surface is CSV + whole-doc JSON in, warehouse tables out
(SURVEY §2.A). A complete engine also round-trips its tables through the
standard columnar/row formats; this module is the one place that knows
format-specific options, so pipelines never hand-roll reader settings.

JDBC is present but gated: the container ships no JDBC driver jars, so
`read_jdbc` raises a clear error unless a driver is configured —
the same stub-behind-a-gate pattern as the multimodal decoder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CSV_OPTIONS = {
    # file_format_csv.sql:1-6 semantics
    "header": "true",
    "quote": '"',
    "escape": '"',
    "nullValue": "NULL",
    "mode": "PERMISSIVE",
}


def read_table(spark: SparkSession, path: str, fmt: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "orc":
        return reader.orc(path)
    if fmt == "csv":
        return reader.options(**CSV_OPTIONS).csv(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "json_whole_doc":
        return spark.read.text(path, wholetext=True).toDF("raw_data")
    if fmt == "text":
        # one row per line ('value' column) — log/plain-corpus ingestion
        return spark.read.text(path)
    if fmt == "binary":
        # binaryFile source: (path, modificationTime, length, content) —
        # the multimodal ingest path: raw media files land as opaque
        # binary payloads + typed metadata, exactly the media-table
        # shape llm/multimodal.py operates on. Spark never decodes the
        # bytes; pathGlobFilter/recursiveFileLookup options apply. At
        # 100 TB each file is one row read in full — pair with
        # maxPartitionBytes sizing so a partition's payloads fit memory.
        return spark.read.format("binaryFile").load(path)
    if fmt == "avro":
        # external spark-avro module; not bundled in this environment —
        # same gate pattern as read_jdbc (works unchanged once the jar
        # is on the classpath)
        try:
            return spark.read.format("avro").load(path)
        except Exception as exc:  # AnalysisException: failed to find data source
            raise NotImplementedError(
                "avro needs the spark-avro module on the classpath "
                "(org.apache.spark:spark-avro); not bundled here"
            ) from exc
    raise ValueError(f"unsupported format: {fmt}")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "csv":
        # mirror read_table's CSV_OPTIONS: Spark's write defaults
        # (escape='\\', nullValue='') would corrupt the module's own
        # round-trip — embedded quotes misparse under the reader's
        # doubled-quote escape, NULLs come back as '' and literal
        # 'NULL' strings come back as SQL NULL. ('mode' is read-only,
        # excluded.)
        wopts = {k: v for k, v in CSV_OPTIONS.items() if k != "mode"}
        writer.options(**wopts).csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC source — STUB: no JDBC driver jars ship in this environment.

    The call shape matches spark.read.jdbc; when a driver jar is on the
    classpath this works unmodified (partitionColumn/lowerBound/
    upperBound/numPartitions options control parallel extraction).
    """
    if "driver" not in options:
        raise NotImplementedError(
            "JDBC requires a driver jar on the Spark classpath; none is "
            "bundled in this environment. Pass driver=... once available."
        )
    return spark.read.format("jdbc").options(url=url, dbtable=table, **options).load()
