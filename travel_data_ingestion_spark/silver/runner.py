"""Incremental silver runner: ledger-driven batch selection + idempotent
writes + transformation logging (reference transformation_logic.py:12-56
and the per-dataset boilerplate in scripts/transformations/*.py).
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from travel_data_ingestion_spark.catalog import ADMIN_SCHEMAS, Warehouse
from travel_data_ingestion_spark.silver import transforms

# dataset name -> (bronze table, transform fn)
SILVER_TRANSFORMS: dict[str, tuple[str, Callable[[DataFrame], dict[str, DataFrame]]]] = {
    "transactions": ("transactions", transforms.transactions),
    "manual_logs": ("manual_logs", transforms.manual_logs),
    "flight_logs": ("flight_logs", transforms.flight_logs),
    "fitbit_steps": ("fitbit_steps", transforms.fitbit_steps),
    "fitbit_sleep": ("fitbit_sleep_score", transforms.fitbit_sleep),
    "fitbit_heart_rate": ("fitbit_heart_rate", transforms.fitbit_heart_rate),
    "google_timeline": ("google_timeline", transforms.google_timeline),
}


def _next_transformation_id(spark: SparkSession, wh: Warehouse) -> int:
    row = (
        wh.read(spark, "admin", "transformation_logs")
        .agg(F.max("transformation_id"))
        .first()
    )
    return int(row[0] or 0) + 1


def _log(
    spark: SparkSession,
    wh: Warehouse,
    trans_id: int,
    name: str,
    load_id: int | None,
    status: str,
    rows: int | None = None,
    error: str | None = None,
) -> None:
    df = spark.createDataFrame(
        [(trans_id, name, load_id, status, rows, error, datetime.now(timezone.utc))],
        ADMIN_SCHEMAS["transformation_logs"],
    )
    wh.append(spark, df, "admin", "transformation_logs")


def pending_load_ids(
    spark: SparkSession, wh: Warehouse, dataset: str, bronze_table: str
) -> list[int]:
    """New-work detection: bronze DISTINCT load_id anti-joined against
    SUCCESS ledger rows (reference transactions.py:14-23, C-05)."""
    bronze_ids = wh.read(spark, "bronze", bronze_table).select("load_id").distinct()
    done = (
        wh.read(spark, "admin", "transformation_logs")
        .filter((F.col("transformation_name") == dataset) & (F.col("status") == "SUCCESS"))
        .select("load_id")
        .distinct()
    )
    rows = bronze_ids.join(done, "load_id", "left_anti").collect()
    return sorted(int(r.load_id) for r in rows)


def run_silver(
    spark: SparkSession,
    wh: Warehouse,
    datasets: list[str] | None = None,
    load_id: int | None = None,
    reprocess: bool = False,
) -> dict[str, int]:
    """Run silver transforms for all (or selected) datasets.

    ``load_id`` pins one batch; ``reprocess`` bypasses the ledger filter
    (reference transformation_logic.py:33-38, K-02). All pending batches
    of a dataset are processed in ONE DataFrame pass; the written rows
    keep their load_id so the idempotent sink overwrites exactly the
    affected partitions.
    """
    results: dict[str, int] = {}
    failures: dict[str, str] = {}
    for name in datasets or list(SILVER_TRANSFORMS):
        bronze_table, fn = SILVER_TRANSFORMS[name]
        if load_id is not None:
            ids = [load_id]
        elif reprocess:
            ids = [
                int(r.load_id)
                for r in wh.read(spark, "bronze", bronze_table)
                .select("load_id")
                .distinct()
                .collect()
            ]
        else:
            ids = pending_load_ids(spark, wh, name, bronze_table)
        if not ids:
            continue
        batch = wh.read(spark, "bronze", bronze_table).filter(F.col("load_id").isin(ids))
        trans_id = _next_transformation_id(spark, wh)
        _log(spark, wh, trans_id, name, max(ids), "RUNNING")
        try:
            outputs = fn(batch)
            total = 0
            for table, df in outputs.items():
                wh.write_idempotent(spark, df, "silver", table)
                total += spark.read.parquet(wh.path("silver", table)).filter(
                    F.col("load_id").isin(ids)
                ).count()
            # one SUCCESS row per processed batch: the ledger is the
            # exactly-once contract consumed by pending_load_ids
            for i in ids:
                _log(spark, wh, trans_id, name, i, "SUCCESS", rows=total)
            results[name] = total
        except Exception as exc:  # noqa: BLE001 - per-dataset isolation
            _log(spark, wh, trans_id, name, max(ids), "FAILURE", error=str(exc)[:2000])
            failures[name] = str(exc)[:500]
    if failures:
        # true per-dataset isolation (each reference transform is its own
        # Airflow task): every healthy dataset was processed and logged
        # before the run as a whole reports failure.
        raise RuntimeError(
            f"run_silver: {len(failures)} dataset(s) failed after processing "
            f"{len(results)} successfully: {failures}"
        )
    return results
