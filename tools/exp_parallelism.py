#!/usr/bin/env python3
"""Measure the two local under-parallelization effects (guide §2.2/§2.4,
§6.1): (1) single-row-group parquet files make every scan+partial-agg
stage one task; (2) AQE coalescePartitions.minPartitionSize=1m collapses
tiny-byte CPU-dense post-shuffle stages (windows) to ~3 tasks.

Arms (separate sessions, same process, interleaved reps within a session
are NOT possible across confs — so arms run as consecutive sessions and
each arm re-measures the spark probe for calibration):
  base   — current session confs
  minps  — spark.sql.adaptive.coalescePartitions.minPartitionSize=64k
  repart — minps + a hash-repartition(cores) injected over the fact scan
           (prototype: wraps load_table to append .repartition(n, key))

Usage: python tools/exp_parallelism.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q05_region_nation_revenue",
    "d06_pivot_sum_case",
    "e02_dedup_row_number",
    "j02_sessionization",
    "t02_quality_score",
]


def checksum(df):
    return df.agg(F.sum(F.xxhash64(F.struct(*df.columns))).alias("c")).collect()[0][0]


def run_arm(label: str, extra_conf: dict, repart: bool, n_reps: int) -> None:
    from travel_data_ingestion_spark import queries as Q
    from travel_data_ingestion_spark.queries import member_queries
    from travel_data_ingestion_spark.session import default_parallelism, get_spark
    from bench import microbench_spark

    cores = default_parallelism()
    spark = get_spark(
        app_name=f"exp_par_{label}",
        extra_conf={
            "spark.sql.shuffle.partitions": str(cores),
            **extra_conf,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in extra_conf.items():
        spark.conf.set(k, v)  # getOrCreate may have reused a session
    specs = member_queries()

    orig_load = Q.load_table
    if repart:
        def load_repart(s, sf_dir, name):
            df = orig_load(s, sf_dir, name)
            if name in ("lineitem", "events", "orders", "documents"):
                df = df.repartition(cores)
            return df
        # queries reference load_table via module attribute at call time
        import travel_data_ingestion_spark.queries.relational as R
        import travel_data_ingestion_spark.queries.llm_text as T
        R.load_table = load_repart
        T.load_table = load_repart
    try:
        microbench_spark(spark)
        microbench_spark(spark)
        probe = min(microbench_spark(spark) for _ in range(3))
        for q in QUERIES:
            checksum(specs[q].fn(spark, SF_DIR))  # warm
        best = {}
        for _ in range(n_reps):
            for q in QUERIES:
                t0 = time.perf_counter()
                checksum(specs[q].fn(spark, SF_DIR))
                dt = time.perf_counter() - t0
                best[q] = min(best.get(q, float("inf")), dt)
        total = sum(best.values())
        print(f"[{label}] probe={probe:.4f} total={total:.4f} " +
              " ".join(f"{q.split('_')[0]}={best[q]:.4f}" for q in QUERIES),
              flush=True)
    finally:
        if repart:
            import travel_data_ingestion_spark.queries.relational as R
            import travel_data_ingestion_spark.queries.llm_text as T
            R.load_table = orig_load
            T.load_table = orig_load
        spark.stop()


def main():
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    minps = {"spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k"}
    run_arm("base", {}, False, n_reps)
    run_arm("minps", minps, False, n_reps)
    run_arm("repart", minps, True, n_reps)
    run_arm("base2", {}, False, n_reps)  # bracket for drift


if __name__ == "__main__":
    main()
