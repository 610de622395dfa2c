"""Training-data export: deterministic hash-sharded parquet writes.

The last stage of a pretraining pipeline: a corpus (typically after
dedup/filter/packing — see t08) is exported as S shards whose membership
is a pure function of the key, so the same corpus always produces the
same shard contents on any cluster size, any partition count, any run —
the reproducibility contract training jobs rely on (and the same
hash-determinism rule as cu01's sampling: no rand(), no
zipWithIndex-style physical-order dependence).

- shard id = pmod(xxhash64(key), n_shards) — uniform, stable;
- one output dir per shard (hive partition layout shard=K/), each
  written by a single task (repartition on the shard id), rows sorted
  by key within files;
- ``max_records_per_file`` bounds file sizes (Spark splits a task's
  output at the limit), so downstream loaders get bounded units.

At 100 TB: the export is one hash shuffle on the shard id + a sorted
write; no driver involvement, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"


def shard_id(key: F.Column, n_shards: int) -> F.Column:
    return F.pmod(F.xxhash64(key), F.lit(n_shards)).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str = "doc_id",
    n_shards: int = 8,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as ``n_shards`` deterministic hash shards under
    ``path`` (dirs ``shard=0/`` .. ``shard=N-1/``), rows sorted by
    ``key`` within files."""
    sharded = df.withColumn(SHARD_COL, shard_id(F.col(key), n_shards))
    writer = (
        sharded.repartition(n_shards, SHARD_COL)
        .sortWithinPartitions(SHARD_COL, key)
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
