"""Ingestion-layer unit tests: glob conversion, stage listing, per-file
failure isolation, ledger bookkeeping."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from travel_data_ingestion_spark.catalog import Warehouse
from travel_data_ingestion_spark.config import FileDetail
from travel_data_ingestion_spark.ingest import (
    glob_to_regex,
    ingest_dataset,
    ingestion_ledger,
    list_stage_files,
)


def test_glob_to_regex_matches_reference_conversion():
    # ingestion_logic.py:102: escape '.', then '*' -> '.*'
    assert glob_to_regex("transactions_*.csv") == r"transactions_.*\.csv"
    assert glob_to_regex("a.b*") == r"a\.b.*"


def test_list_stage_files_pattern(tmp_path):
    for name in ("transactions_1.csv", "transactions_2.csv", "other.csv",
                 "transactions_1.csv.bak"):
        (tmp_path / name).write_text("x")
    out = [os.path.basename(p) for p in list_stage_files(str(tmp_path), "transactions*.csv")]
    # '.bak' matches 'transactions*.csv'? regex is 'transactions_.*\.csv$'
    # -> no ('.csv.bak' fails the $ anchor); 'other.csv' fails the prefix.
    assert out == ["transactions_1.csv", "transactions_2.csv"]


def test_per_file_failure_isolation(spark, tmp_path):
    """A file the reader cannot parse logs FAILURE and does not block the
    next file (ON_ERROR='SKIP_FILE', A-06)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "transactions_good.csv").write_text(
        "country,date,name,type,amount,comments\nJP,2026-02-01,m1,Food,10.5,ok\n"
    )
    # a directory with a matching name makes spark.read.csv(path) fail
    bad = landing / "transactions_bad.csv"
    bad.mkdir()
    wh = Warehouse(str(tmp_path / "wh"))
    wh.init()
    detail = FileDetail(1, str(landing), "transactions*.csv", "bronze", "transactions", "csv")
    loads = ingest_dataset(spark, wh, detail)
    assert len(loads) == 1  # only the good file loaded
    ledger = {
        r.file_name: r.status
        for r in ingestion_ledger(spark, wh).collect()
    }
    assert ledger["transactions_good.csv"] == "SUCCESS"
    assert ledger["transactions_bad.csv"] == "FAILURE"
    rows = wh.read(spark, "bronze", "transactions").collect()
    assert len(rows) == 1
    assert rows[0]._source_file == "transactions_good.csv"
    assert rows[0].country == "JP" and rows[0].amount == "10.5"  # strings in bronze


def test_column_count_tolerance(spark, tmp_path):
    """Fewer source columns than the bronze schema -> missing trailing
    columns become NULL (error_on_column_count_mismatch=false, A-06)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "transactions_short.csv").write_text(
        "country,date,name\nJP,2026-02-01,m1\n"
    )
    wh = Warehouse(str(tmp_path / "wh"))
    wh.init()
    detail = FileDetail(1, str(landing), "transactions*.csv", "bronze", "transactions", "csv")
    ingest_dataset(spark, wh, detail)
    row = wh.read(spark, "bronze", "transactions").first()
    assert row.country == "JP" and row.type is None and row.amount is None


def test_row_id_bit_fields_disjoint_across_loads(spark):
    """Regression: the old load_id*2^32 + monotonically_increasing_id()
    formula collided across batches (partition id sits at bit 33, so
    load 1 / partition 1 == load 3 / partition 0). Disjoint bit fields
    must make row_ids globally unique across loads and partitions."""
    from pyspark.sql import functions as F

    from travel_data_ingestion_spark.ingest import lineage_row_id

    a = spark.range(0, 50_000, 1, 8).withColumn("row_id", lineage_row_id(1))
    b = spark.range(0, 50_000, 1, 8).withColumn("row_id", lineage_row_id(3))
    u = a.unionByName(b)
    assert u.count() == 100_000
    assert u.select("row_id").distinct().count() == 100_000
    # load_id occupies the top field exactly
    loads = sorted(
        r[0] for r in u.select(F.shiftright("row_id", 48)).distinct().collect()
    )
    assert loads == [1, 3]


def test_row_id_overflow_raises(spark):
    """Out-of-range load_id must fail loudly, not silently collide."""
    import pytest

    from travel_data_ingestion_spark.ingest import lineage_row_id

    df = spark.range(10).withColumn("row_id", lineage_row_id(1 << 15))
    with pytest.raises(Exception, match="row_id bit-field overflow"):
        df.collect()


def test_first_ever_empty_batch_bootstraps_readable_table(spark, tmp_path):
    """A silver table whose FIRST batch filters to zero rows must still be
    readable downstream (empty typed frame), and the next non-empty batch
    must transition it to the normal load_id-partitioned layout."""
    wh = Warehouse(str(tmp_path / "wh"))
    wh.init()
    schema = "a int, b string, load_id long"
    empty = spark.createDataFrame([], schema)
    wh.write_idempotent(spark, empty, "silver", "probe")

    back = wh.read(spark, "silver", "probe")
    assert back.count() == 0
    assert set(back.columns) == {"a", "b", "load_id"}

    # replaying the empty batch stays a no-op
    wh.write_idempotent(spark, empty, "silver", "probe")
    assert wh.read(spark, "silver", "probe").count() == 0

    # first real batch: bootstrap cleared, partitioned layout works
    rows = spark.createDataFrame([(1, "x", 7), (2, "y", 7)], schema)
    wh.write_idempotent(spark, rows, "silver", "probe")
    got = wh.read(spark, "silver", "probe")
    assert got.count() == 2
    assert {int(r.load_id) for r in got.select("load_id").collect()} == {7}
    # idempotent rerun of the same load overwrites, not duplicates
    wh.write_idempotent(spark, rows, "silver", "probe")
    assert wh.read(spark, "silver", "probe").count() == 2


def test_bootstrap_crash_window_recovers(spark, tmp_path):
    """Crash between parking the zero-row bootstrap and the partitioned
    overwrite's commit: the dir holds only the dot-prefixed parked file,
    which readers must restore (empty typed frame, not an inference
    error); the next successful real write removes the parked copy."""
    from travel_data_ingestion_spark.catalog import _BOOTSTRAP_PREFIX

    wh = Warehouse(str(tmp_path / "wh"))
    wh.init()
    schema = "a int, b string, load_id long"
    wh.write_idempotent(spark, spark.createDataFrame([], schema), "silver", "probe")
    p = wh.path("silver", "probe")
    parts = [f for f in os.listdir(p) if f.endswith(".parquet") and not f.startswith(".")]
    assert len(parts) == 1
    # simulate the crash state: bootstrap parked, overwrite never committed
    os.replace(os.path.join(p, parts[0]), os.path.join(p, _BOOTSTRAP_PREFIX + parts[0]))
    back = wh.read(spark, "silver", "probe")  # heals: restores the footer
    assert back.count() == 0 and set(back.columns) == {"a", "b", "load_id"}
    assert os.path.exists(os.path.join(p, parts[0]))  # visible again
    # a crashed write retried from the healed state completes normally
    rows = spark.createDataFrame([(1, "x", 7)], schema)
    wh.write_idempotent(spark, rows, "silver", "probe")
    assert wh.read(spark, "silver", "probe").count() == 1
    assert not any(f.startswith(_BOOTSTRAP_PREFIX) for f in os.listdir(p))
    # stale parked leftover NEXT TO committed data (crash after commit,
    # before cleanup) is swept, not restored into a layout conflict
    fake = os.path.join(p, _BOOTSTRAP_PREFIX + "part-stale.parquet")
    with open(fake, "wb") as fh:
        fh.write(b"stale")
    assert wh.read(spark, "silver", "probe").count() == 1
    assert not os.path.exists(fake)


def test_bootstrap_heal_ignores_staging_dirs(spark, tmp_path):
    """Crash DURING the partitioned overwrite: the dir holds the parked
    bootstrap plus staged part files under .spark-staging-*/_temporary.
    Staged files are NOT committed data — the heal must restore the
    parked footer, never count the staging tree as 'visible' and delete
    the only recovery file."""
    from travel_data_ingestion_spark.catalog import _BOOTSTRAP_PREFIX

    wh = Warehouse(str(tmp_path / "wh"))
    wh.init()
    schema = "a int, b string, load_id long"
    wh.write_idempotent(spark, spark.createDataFrame([], schema), "silver", "probe")
    p = wh.path("silver", "probe")
    parts = [f for f in os.listdir(p) if f.endswith(".parquet") and not f.startswith(".")]
    parked = _BOOTSTRAP_PREFIX + parts[0]
    os.replace(os.path.join(p, parts[0]), os.path.join(p, parked))
    # in-flight overwrite state: staged (uncommitted) part files
    for staging in (".spark-staging-abc123/load_id=7",
                    "_temporary/0/task_1/load_id=7"):
        d = os.path.join(p, staging)
        os.makedirs(d)
        with open(os.path.join(d, "part-00000.snappy.parquet"), "wb") as fh:
            fh.write(b"staged-not-committed")
    back = wh.read(spark, "silver", "probe")
    assert back.count() == 0 and set(back.columns) == {"a", "b", "load_id"}
    # parked bootstrap was RESTORED (visible again), not deleted
    assert os.path.exists(os.path.join(p, parts[0]))
    assert not os.path.exists(os.path.join(p, parked))


def test_write_idempotent_rejects_unpartitioned_data(spark, tmp_path):
    """Root-level files with ROWS mean the table was written via a
    different sink; write_idempotent must refuse loudly rather than
    silently deleting them as if they were the empty bootstrap."""
    import pytest

    wh = Warehouse(str(tmp_path / "wh"))
    wh.init()
    schema = "a int, b string, load_id long"
    wh.overwrite(spark, spark.createDataFrame([(1, "x", 1)], schema), "silver", "probe")
    with pytest.raises(ValueError, match="unpartitioned"):
        wh.write_idempotent(
            spark, spark.createDataFrame([(2, "y", 2)], schema), "silver", "probe"
        )
    # original data untouched
    assert wh.read(spark, "silver", "probe").count() == 1
