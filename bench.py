#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with a checksum aggregation over EVERY output
column (sum of xxhash64 over the full row struct). A bare count() lets
Catalyst delete the benched work — count(*) prunes all non-grouping
expressions, so a map-heavy query optimizes down to a parquet row count.
The checksum forces every output expression to be computed for every row
while still collecting only one value driver-side; tests/test_plans.py
asserts the checksummed plan retains the aggregate expressions. A warmup
run pays the one-time session/codegen cost so the numbers reflect
steady-state throughput.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BENCH_QUERIES = [
    # scan -> filter -> 8-agg groupBy (TPC-H Q1 shape)
    "q01_pricing_summary",
    # broadcast dim + fact-fact join + top-k
    "q03_top_revenue_orders",
    # 5-table star join
    "q05_region_nation_revenue",
    # manual pivot, one pass
    "d06_pivot_sum_case",
    # window dedup (one shuffle)
    "e02_dedup_row_number",
    # sessionization (lag + cumsum windows)
    "j02_sessionization",
    # exact dedup on md5 key
    "dd01_exact_dedup",
    # text quality features (higher-order array fns, map-only)
    "t02_quality_score",
    # brute-force cosine top-k
    "sim01_knn_bruteforce",
]

# min-of-N: single-JVM local mode has multi-second GC/broadcast noise
# (measured in scale_probe; q03/q05 swing ~±0.3-1 s run-to-run). The
# minimum of 5 runs is the steady-state number.
N_RUNS = 5


def checksum_plan(df: DataFrame) -> DataFrame:
    """Non-prunable materialization: hash every column of every row.

    Unlike count(), Catalyst cannot prune any output expression (each
    feeds the hash), and unlike a real sink nothing is written; the
    driver receives a single 8-byte value.
    """
    return df.agg(F.sum(F.xxhash64(F.struct(*df.columns))).alias("checksum"))


def materialize(df: DataFrame) -> None:
    checksum_plan(df).collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from travel_data_ingestion_spark.queries import member_queries
    from travel_data_ingestion_spark.session import get_spark

    # xxhash64 over MapType output columns needs the legacy allowance
    # (hash-of-map is order-sensitive in general; fine for a benchmark
    # checksum where we only need "all columns computed"). Shuffle
    # partitions are pinned explicitly so the benchmark is invariant to
    # session-factory default changes (BASELINE.md comparability).
    from travel_data_ingestion_spark.session import default_parallelism

    spark = get_spark(
        app_name="bench",
        extra_conf={
            "spark.sql.legacy.allowHashOnMapType": "true",
            "spark.sql.shuffle.partitions": str(default_parallelism()),
        },
    )
    specs = member_queries()

    # warmup pass: JVM spin-up, whole-stage codegen compilation, parquet
    # footer reads — one run of every query so the timed pass measures
    # steady-state throughput, not one-time compilation.
    for name in BENCH_QUERIES:
        materialize(specs[name].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            materialize(specs[name].fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    print(
        json.dumps(
            {
                "metric": "bench_total_9q",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
