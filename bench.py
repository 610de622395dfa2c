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

import hashlib
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

# VM-speed idle references (BASELINE.md round-5 addendum protocol):
# the md5 chain tracks single-core CPU speed, the matmul tracks the
# memory bandwidth shuffles bind on. Measured on the round-6 idle VM —
# the same hardware state the 4.0842 s canonical per-query baseline was
# confirmed on. The benchmark VM is re-provisioned every round with an
# uncontrolled CPU (observed 20-40% drift WITHIN one session, r10), so
# raw totals are only comparable after dividing out the ratio
# md5_calib / MD5_IDLE_REF. value_calibrated in the emitted JSON does
# exactly that; BASELINE.md records the rule.
MD5_IDLE_REF = 0.127
MATMUL_IDLE_REF = 0.201


def microbench_md5() -> float:
    """200k-iteration chained md5 of a 1 KiB block (single-core CPU probe)."""
    h = b"x" * 1024
    t0 = time.perf_counter()
    for _ in range(200_000):
        h = hashlib.md5(h).digest()
    return time.perf_counter() - t0


def microbench_matmul() -> float:
    """2000x2000 float64 matmul (memory-bandwidth probe)."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.random((2000, 2000))
    t0 = time.perf_counter()
    (a @ a).sum()
    return time.perf_counter() - t0


def measure_calibration(samples: int = 3) -> dict:
    """Min-of-N microbench pair, same semantics as the query timings
    (the minimum is the least-contended moment, i.e. the VM's actual
    speed class rather than transient load)."""
    md5s = [microbench_md5() for _ in range(samples)]
    mms = [microbench_matmul() for _ in range(samples)]
    return {
        "md5": round(min(md5s), 4),
        "matmul": round(min(mms), 4),
        "md5_samples": [round(x, 4) for x in md5s],
        "matmul_samples": [round(x, 4) for x in mms],
    }


# Pinned reference Spark job for cross-VM calibration: the md5/matmul
# probes measure single-core burst / BLAS bandwidth, which round 11
# showed do NOT predict Spark local[32] throughput across VM classes
# (r11 VM: md5 0.081 = 1.57x faster than the r6 idle ref, yet bench
# total identical to r10's md5-0.16..0.22 VM — Spark's floor is task
# scheduling + shuffle + codegen, not single-core clock). This job IS
# that stack: in-JVM range source (no IO, no data dependence), a
# modular projection through whole-stage codegen, one hash shuffle,
# and a checksum reduce — byte-identical every round by construction.
# The probe is 64M rows (~0.6 s hot) so fixed per-job overheads (task
# scheduling, JIT warmth — measured swinging a 0.3 s variant 0.24-0.41
# within one session) amortize away, and its samples are INTERLEAVED
# between the query blocks (see run_bench) so min-of-9 samples the
# same load window the query minima do (consecutive end-of-run
# sampling swung 0.41 vs 0.64 across two otherwise-identical runs).
# SPARK_CALIB_REF is the bench-context FLOOR on the round-11 VM
# (min-semantics, like every other number in this harness: observed
# mins 0.41-0.54 across runs as machine load varied), pinned alongside
# that round's raw bench totals (5.3-7.0 s) so later rounds can compare
# value * SPARK_CALIB_REF / spark_calib against round 11's number
# directly (BASELINE.md round-11 addendum). Caveat recorded there:
# the probe deliberately excludes IO, so it tracks the compute class,
# not parquet-scan throughput — treat it as the secondary signal
# behind the md5-clamped value_calibrated and per-query ratios.
SPARK_CALIB_REF = 0.41


def microbench_spark(spark) -> float:
    """One timed run of the pinned reference job (call min-of-N)."""
    t0 = time.perf_counter()
    (
        spark.range(0, 64_000_000, 1, 64)
        .select(
            (F.col("id") % 9973).alias("k"),
            (F.col("id") * 2654435761 % 1000003).alias("v"),
        )
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
        .agg(F.sum(F.xxhash64("k", "s")).alias("checksum"))
        .collect()
    )
    return time.perf_counter() - t0


def measure_spark_calibration(spark, samples: int = 5) -> dict:
    # two warmups: the first compiles codegen, the second lets the JIT
    # finish profiling the generated loops (measured: a single warmup
    # leaves the first timed samples 10-20% slow)
    microbench_spark(spark)
    microbench_spark(spark)
    runs = [microbench_spark(spark) for _ in range(samples)]
    return {
        "spark": round(min(runs), 4),
        "spark_samples": [round(x, 4) for x in runs],
    }


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

    # VM-speed calibration BEFORE the warmup (and again after the timed
    # pass below): the drift the calibration exists to catch happens
    # within a single session, so both endpoints are recorded and the
    # faster one (min) is the VM's speed class for this run.
    calib_pre = measure_calibration()

    # warmup pass: JVM spin-up, whole-stage codegen compilation, parquet
    # footer reads — one run of every query so the timed pass measures
    # steady-state throughput, not one-time compilation. The reference
    # probe warms here too (its codegen + JIT profiling).
    microbench_spark(spark)
    microbench_spark(spark)
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
    # The reference-probe samples are INTERLEAVED between the query
    # blocks (one per block) rather than taken consecutively at the
    # end: the probe is a pure-CPU burst whose consecutive samples all
    # land in whatever machine state one instant has (two back-to-back
    # bench runs measured 0.41 vs 0.64 while the bench total itself
    # was stable at 5.5) — spreading the samples across the same
    # minute the queries are timed in makes min-of-9 sample the same
    # load window the query minima do.
    timings: dict[str, float] = {}
    spark_probe_samples: list[float] = []
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
        spark_probe_samples.append(round(microbench_spark(spark), 4))

    total = round(sum(timings.values()), 4)
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    calib_post = measure_calibration()
    spark_calib = {
        "spark": min(spark_probe_samples) if spark_probe_samples else None,
        "spark_samples": spark_probe_samples,
    }
    md5_calib = min(calib_pre["md5"], calib_post["md5"])
    out = {
        "metric": "bench_total_9q",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # Self-calibration (BASELINE.md round-5/round-11 addenda, made
        # machine-readable in round 11). value_calibrated divides out a
        # SLOW-VM multiplier only: max(md5_calib, idle_ref) in the
        # denominator clamps the correction at 1 when the VM's
        # single-core probe is FASTER than the idle reference, because
        # fast single-core does not make Spark local[32] faster (r11
        # evidence: md5 0.081 vs ref 0.127, bench total unchanged vs
        # r10's md5-0.16 VM — the floor is scheduling/shuffle, not
        # clock). The symmetric cross-VM probe is spark_calib (the
        # pinned reference job, same stack as the measured queries);
        # compare value * spark_calib_ref / spark_calib across rounds.
        "md5_calib": md5_calib,
        "idle_ref": MD5_IDLE_REF,
        "value_calibrated": round(
            total * MD5_IDLE_REF / max(md5_calib, MD5_IDLE_REF), 4
        ),
        "spark_calib": spark_calib["spark"],
        "spark_calib_ref": SPARK_CALIB_REF,
        "value_spark_calibrated": (
            round(total * SPARK_CALIB_REF / spark_calib["spark"], 4)
            if spark_calib["spark"]
            else None
        ),
        "calib": {
            "pre": calib_pre,
            "post": calib_post,
            "spark_samples": spark_calib["spark_samples"],
            "md5_idle_ref": MD5_IDLE_REF,
            "matmul_idle_ref": MATMUL_IDLE_REF,
        },
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
