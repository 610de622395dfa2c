"""Format round-trip tests for the source/sink registry."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from travel_data_ingestion_spark import io as eio


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip(spark, tmp_path, fmt):
    src = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    out = str(tmp_path / fmt)
    eio.write_table(src, out, fmt)
    schema = src.schema if fmt in ("csv", "json") else None
    back = eio.read_table(spark, out, fmt, schema=schema)
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in src.collect()
    )


def test_partitioned_write(spark, tmp_path):
    src = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    out = str(tmp_path / "p")
    eio.write_table(src, out, "parquet", partition_by=("n_regionkey",))
    import os

    assert any(d.startswith("n_regionkey=") for d in os.listdir(out))
    # partition pruning: reading one partition touches only its directory
    one = eio.read_table(spark, out, "parquet").filter("n_regionkey = 0")
    assert one.count() == src.filter("n_regionkey = 0").count()


def test_jdbc_gated(spark):
    with pytest.raises(NotImplementedError):
        eio.read_jdbc(spark, "jdbc:postgresql://x/y", "t")
