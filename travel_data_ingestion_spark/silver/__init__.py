"""Silver layer: cleaning/normalization transforms, bronze -> silver.

Each dataset transform is a pure function ``DataFrame -> dict[table ->
DataFrame]`` over a bronze batch; ``runner.run_silver`` handles the
incremental load_id discovery (anti-join against the transformation
ledger), idempotent writes, and logging — the reference's per-dataset
boilerplate factored out once (reference transactions.py:5-69 et al.).

A deliberate departure from the reference: where it loops load_ids in
Python and round-trips each batch through pandas, this engine processes
ALL pending load_ids in one DataFrame pass (``load_id`` stays a grouping/
partition column). Same per-batch semantics, one job, no driver loop —
the difference between O(batches) round-trips and one shuffle at 100 TB.
"""

from travel_data_ingestion_spark.silver.runner import SILVER_TRANSFORMS, run_silver

__all__ = ["SILVER_TRANSFORMS", "run_silver"]
