"""Training-shard export: membership is a pure function of the key."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from travel_data_ingestion_spark.export import shard_id, write_training_shards
from travel_data_ingestion_spark.queries import load_table

SF_DIR = "/root/testdata/sf0.001"


def _shard_contents(spark, path, n_shards):
    out = {}
    for s in range(n_shards):
        rows = spark.read.parquet(os.path.join(path, f"shard={s}")).collect()
        out[s] = {tuple(r) for r in rows}
    return out


def test_shards_are_deterministic_and_complete(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source", "text")
    n_shards = 4

    p1 = str(tmp_path / "run1")
    p2 = str(tmp_path / "run2")
    write_training_shards(docs, p1, key="doc_id", n_shards=n_shards)
    # second run from a differently-partitioned input — membership must
    # not depend on physical layout
    write_training_shards(docs.repartition(13), p2, key="doc_id", n_shards=n_shards)

    c1 = _shard_contents(spark, p1, n_shards)
    c2 = _shard_contents(spark, p2, n_shards)
    assert c1 == c2

    # complete and disjoint: every input row lands in exactly one shard
    total = sum(len(v) for v in c1.values())
    assert total == docs.count()
    # shard assignment matches the documented pure function
    expected = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", shard_id(F.col("doc_id"), n_shards).alias("s")
        ).collect()
    }
    for s, rows in c1.items():
        for row in rows:
            assert expected[row[0]] == s


def test_max_records_bounds_files(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    p = str(tmp_path / "bounded")
    write_training_shards(docs, p, key="doc_id", n_shards=2, max_records_per_file=50)
    for f in glob.glob(os.path.join(p, "shard=*", "*.parquet")):
        n = spark.read.parquet(f).count()
        assert n <= 50, f


def test_rows_sorted_by_key_within_files(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    p = str(tmp_path / "sorted")
    write_training_shards(docs, p, key="doc_id", n_shards=2)
    for f in glob.glob(os.path.join(p, "shard=*", "*.parquet")):
        ids = [r.doc_id for r in spark.read.parquet(f).collect()]
        assert ids == sorted(ids), f
