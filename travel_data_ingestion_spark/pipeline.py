"""End-to-end pipeline orchestration (K-04).

Reference: .airflow/dags/full_e2e_pipeline.py:27-55 triggers
ingestion -> silver -> gold sequentially with waits. Airflow's scheduler/
worker/warehouse process boundaries collapse into one Spark application:
driver-side control flow + executor-side DataFrame execution
(SURVEY §3.1).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from travel_data_ingestion_spark.catalog import Warehouse
from travel_data_ingestion_spark.config import FileDetail, default_config, save_config
from travel_data_ingestion_spark.gold import build_all_gold
from travel_data_ingestion_spark.ingest import ingest_all
from travel_data_ingestion_spark.silver import run_silver


def run_pipeline(
    spark: SparkSession,
    warehouse_root: str,
    landing_dir: str,
    config: dict[str, FileDetail] | None = None,
) -> Warehouse:
    """Ingestion -> silver -> gold, one call. Re-runnable: the ingestion
    filename ledger (A-07) and the transformation ledger (C-05 anti-join)
    make every stage incremental and idempotent."""
    wh = Warehouse(warehouse_root)
    wh.init()
    cfg = config or default_config(landing_dir)
    save_config(spark, wh, cfg)
    ingest_all(spark, wh, load_config(spark, wh))
    run_silver(spark, wh)
    build_all_gold(spark, wh)
    return wh


# re-export for convenience
from travel_data_ingestion_spark.config import load_config  # noqa: E402

__all__ = ["run_pipeline", "Warehouse", "load_config"]
