"""Consumer-layer recency semantics (third review batch).

Silver keeps one partition per load_id, so a re-uploaded file leaves
BOTH batches on disk; every consumer must read latest-batch-wins. The
gold builders always did; these tests pin that the dashboard layer and
daily-summary steps do too, plus the compat/transform edge cases fixed
alongside."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from travel_data_ingestion_spark.catalog import Warehouse


@pytest.fixture()
def wh2(spark, tmp_path):
    """Warehouse whose google_timeline / hourly_step_count / all_spending
    silver tables contain the SAME logical rows under two load_ids —
    the state after one full re-upload."""
    wh = Warehouse(str(tmp_path / "wh"))
    wh.init()
    tl_rows = [
        ("ACTIVITY", "2026-02-01 10:00:00", "2026-02-01 11:00:00", "WALKING",
         1000.0, 35.0, 139.0, 35.1, 139.1, None, None, None),
        ("ACTIVITY", "2026-02-01 12:00:00", "2026-02-01 13:00:00", "IN_TRAIN",
         5000.0, 35.1, 139.1, 35.5, 139.5, None, None, None),
    ]
    tl_schema = (
        "segment_type string, start_time string, end_time string,"
        "activity_type string, distance_meters double,"
        "activity_start_latitude double, activity_start_longitude double,"
        "activity_end_latitude double, activity_end_longitude double,"
        "visit_latitude double, visit_longitude double, place_id string"
    )
    for load in (1, 2):
        df = (
            spark.createDataFrame(tl_rows, tl_schema)
            .withColumn("start_time", F.col("start_time").cast("timestamp"))
            .withColumn("end_time", F.col("end_time").cast("timestamp"))
            .withColumn("load_id", F.lit(load).cast("long"))
        )
        wh.append(spark, df, "silver", "google_timeline")
        st = spark.createDataFrame(
            [("2026-02-01", h, 100) for h in range(24)],
            "date string, hour long, steps long",
        ).select(
            F.to_date("date").alias("date"), "hour", "steps",
            F.lit(load).cast("long").alias("load_id"),
        )
        wh.append(spark, st, "silver", "hourly_step_count")
        sp = spark.createDataFrame(
            [("2026-02-01", "Hotel", "m1", 100.0, "c", "f.csv")],
            "date string, type string, name string, amount double,"
            "comments string, _source_file string",
        ).withColumn("load_id", F.lit(load).cast("long"))
        wh.append(spark, sp, "silver", "all_spending")
    return wh


def test_dashboard_distance_not_doubled_by_reupload(spark, wh2):
    from travel_data_ingestion_spark.dashboard import distance_by_mode

    got = {
        r.activity_type: r.total_km
        for r in distance_by_mode(spark, wh2, "2026-01-01", "2026-12-31").collect()
    }
    assert got == {"WALKING": 1.0, "IN_TRAIN": 5.0}  # one batch, not two


def test_dashboard_spending_not_doubled_by_reupload(spark, wh2):
    from travel_data_ingestion_spark.dashboard import spending, top_expenses

    rows = spending(spark, wh2, "2026-01-01", "2026-12-31").collect()
    assert len(rows) == 1 and rows[0].amount == 100.0
    assert top_expenses(spark, wh2, "2026-01-01", "2026-12-31").count() == 1


def test_daily_steps_not_doubled_by_reupload(spark, wh2):
    from travel_data_ingestion_spark.dashboard import daily_steps

    rows = daily_steps(spark, wh2, "2026-01-01", "2026-12-31").collect()
    assert len(rows) == 1 and rows[0].total_steps == 2400  # 24h x 100


def test_dashboard_parses_slash_dates(spark, tmp_path):
    """all_spending keeps raw date strings; slash formats must not be
    silently dropped by a strict to_date."""
    wh = Warehouse(str(tmp_path / "whs"))
    wh.init()
    sp = spark.createDataFrame(
        [("2026/02/01", "Hotel", "m1", 10.0, None, "f.csv"),
         ("02/03/2026", "food", "m2", 20.0, None, "f.csv")],
        "date string, type string, name string, amount double,"
        "comments string, _source_file string",
    ).withColumn("load_id", F.lit(1).cast("long"))
    wh.append(spark, sp, "silver", "all_spending")
    from travel_data_ingestion_spark.dashboard import spending

    rows = spending(spark, wh, "2026-01-01", "2026-12-31").collect()
    assert {r.amount for r in rows} == {10.0, 20.0}


def test_movement_bearing_for_null_activity_type(spark, tmp_path):
    """NULL activity_type is a ground segment (pandas NaN != 'FLYING'
    is True in the reference): it must get a bearing and a tooltip even
    with a NULL distance."""
    wh = Warehouse(str(tmp_path / "whn"))
    wh.init()
    df = spark.createDataFrame(
        [("ACTIVITY", "2026-02-01 10:00:00", "2026-02-01 11:00:00", None,
          None, 35.0, 139.0, 35.1, 139.1, None, None, None)],
        "segment_type string, start_time string, end_time string,"
        "activity_type string, distance_meters double,"
        "activity_start_latitude double, activity_start_longitude double,"
        "activity_end_latitude double, activity_end_longitude double,"
        "visit_latitude double, visit_longitude double, place_id string",
    ).withColumn("start_time", F.col("start_time").cast("timestamp")).withColumn(
        "end_time", F.col("end_time").cast("timestamp")
    ).withColumn("load_id", F.lit(1).cast("long"))
    wh.append(spark, df, "silver", "google_timeline")
    from travel_data_ingestion_spark.dashboard import movements

    r = movements(spark, wh, "2026-01-01", "2026-12-31").collect()[0]
    assert r.bearing is not None and 0.0 <= r.bearing < 360.0
    assert r.tooltip_text is not None and "Unknown" in r.tooltip_text


def test_time_to_hours_accepts_seconds_rejects_garbage(spark):
    from travel_data_ingestion_spark.compat import try_time_to_hours

    df = spark.createDataFrame(
        [("10:30",), ("10:30:00",), ("10:30:99",), ("1:2:3:4",), ("xx",)],
        "d string",
    )
    got = [r.h for r in df.select(try_time_to_hours("d").alias("h")).collect()]
    assert got == [10.5, 10.5, None, None, None]


def test_fitbit_steps_drops_unparseable_dates(spark):
    from travel_data_ingestion_spark.silver.transforms import fitbit_steps

    bronze = spark.createDataFrame(
        [("2026-02-01 10:00:00", 500, 1), ("garbage", 999, 1)],
        "timestamp string, steps long, load_id long",
    )
    out = fitbit_steps(bronze)["hourly_step_count"]
    rows = out.collect()
    assert all(r.date is not None for r in rows)  # no NULL-date scaffold
    assert len(rows) == 24  # exactly one day's scaffold
    assert sum(r.steps for r in rows) == 500  # bad row's steps dropped, not zeroed-in


def test_run_silver_isolates_failing_dataset(spark, tmp_path, monkeypatch):
    """One failing transform must not abort the remaining datasets: the
    healthy ones process and log SUCCESS, then the run raises with the
    failure list (per-dataset isolation — each reference transform is
    its own Airflow task)."""
    from tests.fixtures_gen import generate_landing
    from travel_data_ingestion_spark.config import default_config, load_config, save_config
    from travel_data_ingestion_spark.ingest import ingest_all
    from travel_data_ingestion_spark.silver import runner

    landing = str(tmp_path / "landing")
    generate_landing(landing)
    wh = Warehouse(str(tmp_path / "wh"))
    wh.init()
    save_config(spark, wh, default_config(landing))
    ingest_all(spark, wh, load_config(spark, wh))

    def boom(bronze):
        raise RuntimeError("deliberately broken transform")

    monkeypatch.setitem(runner.SILVER_TRANSFORMS, "transactions", ("transactions", boom))
    with pytest.raises(RuntimeError, match="1 dataset"):
        runner.run_silver(spark, wh, datasets=["transactions", "manual_logs"])
    # the healthy dataset was still processed and is re-run-stable
    assert wh.read(spark, "silver", "manual_logs").count() > 0
    ledger = wh.read(spark, "admin", "transformation_logs")
    statuses = {
        (r.transformation_name, r.status) for r in ledger.collect()
    }
    assert ("manual_logs", "SUCCESS") in statuses
    assert ("transactions", "FAILURE") in statuses
