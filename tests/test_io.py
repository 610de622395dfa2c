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


def test_text_and_binary_sources(spark, tmp_path):
    """Core line-text and binaryFile sources: the binary source is the
    multimodal ingest path — raw files arrive as opaque payload bytes +
    typed metadata, feeding llm/multimodal.extract_features directly."""
    from pyspark.sql import functions as F

    from travel_data_ingestion_spark.io import read_table
    from travel_data_ingestion_spark.llm.multimodal import extract_features

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two")
    (d / "b.bin").write_bytes(b"\x00\x01payload")

    lines = read_table(spark, str(d / "a.txt"), "text")
    assert {r.value for r in lines.collect()} == {"line one", "line two"}

    bins = read_table(spark, str(d), "binary")
    rows = {r.path.rsplit("/", 1)[-1]: (r.length, bytes(r.content)) for r in bins.collect()}
    assert rows["b.bin"] == (9, b"\x00\x01payload")
    assert rows["a.txt"][0] == 17

    # binary source rows flow into the multimodal feature kernel as-is
    media = bins.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.col("content").alias("payload"),
    )
    feats = {r.n_bytes for r in extract_features(media).collect()}
    assert feats == {9, 17}


def test_avro_gate_raises_without_module(spark, tmp_path):
    import pytest

    from travel_data_ingestion_spark.io import read_table

    with pytest.raises(NotImplementedError, match="spark-avro"):
        read_table(spark, str(tmp_path), "avro")
