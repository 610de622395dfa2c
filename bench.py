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


def run_bench(spark, specs, sf_dir: str, queries=None, n_runs: int = N_RUNS) -> dict:
    """Warmup + min-of-N timed pass over ``queries`` with per-query fault
    isolation: one broken query must not cost the timings of the healthy
    ones (round 4 shipped exactly that — j02 raised in warmup, rc=1,
    zero numbers recorded). A failing query is reported under "errors"
    and excluded from the total."""
    names = list(queries or BENCH_QUERIES)
    errors: dict[str, str] = {}

    # warmup pass: JVM spin-up, whole-stage codegen compilation, parquet
    # footer reads — one run of every query so the timed pass measures
    # steady-state throughput, not one-time compilation.
    for name in names:
        try:
            materialize(specs[name].fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — isolate, report, continue
            errors[name] = f"{type(e).__name__}: {e}"[:500]

    # Back-to-back min-of-N per query, with one extra UNTIMED local
    # warm-up run immediately before each query's timed block. The
    # global warmup pass above leaves the first timed query (q01,
    # alphabetically and temporally first) to absorb the broadcast-
    # cleanup/GC churn of the eight queries warmed after it — the r6
    # driver run's q01 1.72x vs the idle re-measure's 1.29x was exactly
    # this first-block penalty. The local warm-up run soaks that churn
    # untimed, so every query's timed block starts from the same
    # just-ran-this-query state. (An interleaved-sweeps variant was
    # measured and REJECTED: per-query min across round-robin sweeps
    # reads ~25% slower on identical hardware because every sample then
    # includes the other queries' cleanup churn — back-to-back min-of-N
    # is the steady-state number BASELINE.md was measured with.)
    timings: dict[str, float] = {}
    for name in names:
        if name in errors:
            continue
        best = float("inf")
        try:
            materialize(specs[name].fn(spark, sf_dir))  # local warm-up
            for _ in range(n_runs):
                t0 = time.perf_counter()
                materialize(specs[name].fn(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 4)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:500]

    total = round(sum(timings.values()), 4)
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    out = {
        "metric": "bench_total_9q",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    return out


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
    print(json.dumps(run_bench(spark, specs, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
