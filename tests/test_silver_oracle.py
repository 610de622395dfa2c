"""Silver-grain DuckDB oracle checks: the silver tables whose content
isn't already pinned by the gold-report oracles — daily_spend,
heart_rate_minute_log, hourly_step_count — recomputed by DuckDB straight
from BRONZE parquet with the reference's transform semantics."""

from __future__ import annotations

import pytest

import duckdb

from tests.test_pipeline_e2e import pipeline_wh  # noqa: F401 (fixture)

# slow lane (silver transforms vs reference SQL via DuckDB); default gate covers the area via faster tests
pytestmark = pytest.mark.slow


def _con(wh):
    con = duckdb.connect()
    for t in ("transactions", "fitbit_heart_rate", "fitbit_steps"):
        con.execute(
            f"CREATE VIEW bronze_{t} AS SELECT * FROM "
            f"read_parquet('{wh.path('bronze', t)}/**/*.parquet', hive_partitioning=true)"
        )
    return con


def _canon(rows, round_at=6):
    canon = []
    for r in rows:
        canon.append(
            tuple(
                round(v, round_at) if isinstance(v, float) else (str(v) if v is not None else None)
                for v in r
            )
        )
    return sorted(canon, key=str)


def test_daily_spend_matches_bronze_recompute(spark, pipeline_wh):  # noqa: F811
    got = spark.read.parquet(pipeline_wh.path("silver", "daily_spend"))
    g = _canon([(r.date, r.type, int(r.load_id), r.amount) for r in got.collect()])
    con = _con(pipeline_wh)
    o = con.execute(
        """
        SELECT date, type, CAST(load_id AS BIGINT) AS load_id,
               SUM(CAST(REGEXP_REPLACE(amount, '[$,]', '', 'g') AS DOUBLE)) AS amount
        FROM bronze_transactions GROUP BY 1, 2, 3
        """
    ).fetchall()
    assert g == _canon(o)


def test_heart_rate_minute_log_matches_bronze_recompute(spark, pipeline_wh):  # noqa: F811
    got = spark.read.parquet(pipeline_wh.path("silver", "heart_rate_minute_log"))
    g = _canon(
        [
            (r.log_timestamp, int(r.load_id), r.heart_rate_mean, r.heart_rate_min,
             r.heart_rate_max, int(r.readings_count), r.hr_zone)
            for r in got.collect()
        ]
    )
    con = _con(pipeline_wh)
    o = con.execute(
        """
        WITH m AS (
          SELECT strftime(date_trunc('minute', CAST(timestamp AS TIMESTAMP)),
                          '%Y-%m-%d %H:%M:%S') AS log_timestamp,
                 CAST(load_id AS BIGINT) AS load_id,
                 AVG(CAST(beats_per_minute AS DOUBLE)) AS mean,
                 MIN(CAST(beats_per_minute AS DOUBLE)) AS mn,
                 MAX(CAST(beats_per_minute AS DOUBLE)) AS mx,
                 COUNT(beats_per_minute) AS n
          FROM bronze_fitbit_heart_rate GROUP BY 1, 2
        )
        SELECT log_timestamp, load_id, mean, mn, mx, n,
               CASE WHEN mean IS NULL THEN 'Unknown'
                    WHEN mean < 60 THEN 'Resting'
                    WHEN mean < 100 THEN 'Normal'
                    WHEN mean < 130 THEN 'Elevated'
                    ELSE 'High' END AS hr_zone
        FROM m
        """
    ).fetchall()
    assert g == _canon(o)


def test_hourly_step_count_scaffold_matches(spark, pipeline_wh):  # noqa: F811
    got = spark.read.parquet(pipeline_wh.path("silver", "hourly_step_count"))
    g = _canon([(str(r.date), int(r.hour), int(r.steps), int(r.load_id)) for r in got.collect()])
    con = _con(pipeline_wh)
    o = con.execute(
        """
        WITH b AS (
          SELECT CAST(CAST(timestamp AS TIMESTAMP) AS DATE) AS d,
                 EXTRACT(hour FROM CAST(timestamp AS TIMESTAMP)) AS h,
                 CAST(steps AS BIGINT) AS s,
                 CAST(load_id AS BIGINT) AS load_id
          FROM bronze_fitbit_steps
        ),
        hourly AS (
          SELECT d, h, SUM(s) AS steps, MAX(load_id) AS load_id FROM b GROUP BY 1, 2
        ),
        dates AS (SELECT DISTINCT d FROM b),
        hours AS (SELECT UNNEST(RANGE(0, 24)) AS h),
        date_load AS (SELECT d, MAX(load_id) AS dl FROM b GROUP BY 1)
        SELECT CAST(dates.d AS VARCHAR) AS date, CAST(hours.h AS BIGINT) AS hour,
               COALESCE(hourly.steps, 0) AS steps,
               COALESCE(hourly.load_id, date_load.dl) AS load_id
        FROM dates CROSS JOIN hours
        LEFT JOIN hourly ON dates.d = hourly.d AND hours.h = hourly.h
        LEFT JOIN date_load ON dates.d = date_load.d
        """
    ).fetchall()
    assert g == _canon(o)
