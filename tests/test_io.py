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


def test_csv_roundtrip_preserves_quotes_and_nulls(spark, tmp_path):
    """write_table/read_table CSV round-trip: embedded double quotes,
    literal 'NULL' strings, and real NULLs all survive — the writer
    must mirror the reader's quote/escape/nullValue options."""
    from travel_data_ingestion_spark.io import read_table, write_table

    df = spark.createDataFrame(
        [
            (1, 'he said "hi"'),
            (2, "NULL"),   # literal string NULL... becomes NULL by contract
            (3, None),     # real NULL
            (4, "a,b"),    # embedded separator
        ],
        "id int, v string",
    )
    p = str(tmp_path / "rt.csv")
    write_table(df, p, "csv")
    got = {r.id: r.v for r in read_table(spark, p, "csv", schema="id int, v string").collect()}
    assert got[1] == 'he said "hi"'
    assert got[4] == "a,b"
    # NULL_IF contract: the literal string 'NULL' and a real NULL both
    # come back as SQL NULL (matching the reference's NULL_IF semantics)
    assert got[2] is None and got[3] is None
