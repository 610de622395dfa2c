"""Table maintenance: small-file compaction.

Incremental load_id-partitioned writes accumulate one-file-per-batch
fragments; at 100 TB the resulting small-file storm dominates scan time
(footer reads + task scheduling). Compaction rewrites a table to
size-targeted files, preserving partition columns, using a full-shuffle
repartition so output files are evenly sized (coalesce would merely
concatenate uneven inputs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def table_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Rewrite a parquet table into ~target-sized files; returns the
    output file count. Writes to a staging dir then swaps, so a failed
    compaction never corrupts the table."""
    size = table_bytes(path)
    n_files = max(1, round(size / target_file_bytes))
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + "__compacting"
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    backup = path.rstrip("/") + "__old"
    os.rename(path, backup)
    os.rename(staging, path)
    import shutil

    shutil.rmtree(backup)
    out = 0
    for _, _, files in os.walk(path):
        out += sum(1 for f in files if f.endswith(".parquet"))
    return out
