from __future__ import annotations

import os

from pyspark.sql import functions as F

from travel_data_ingestion_spark.maintenance import compact_parquet, table_bytes


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    # simulate 20 tiny incremental appends
    for i in range(20):
        spark.range(i * 100, (i + 1) * 100).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        ).write.mode("append").parquet(path)
    before_files = sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    assert before_files >= 20
    before_rows = spark.read.parquet(path).count()
    n_out = compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert n_out < before_files
    after = spark.read.parquet(path)
    assert after.count() == before_rows == 2000
    assert sorted(r.id for r in after.collect()) == list(range(2000))
    assert table_bytes(path) > 0
