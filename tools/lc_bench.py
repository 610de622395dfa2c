#!/usr/bin/env python3
"""Multi-JVM evidence tier: the bench 9 under ``local-cluster[N,C,M]``.

Everything in BENCH_r*.json runs single-JVM ``local[32]``, where
"shuffle" is an in-process memory copy and Python workers talk to the
one driver JVM. ``local-cluster`` is Spark's real-standalone-in-a-box:
N separate executor JVM processes, real serialized+compressed shuffle
blocks over loopback, real broadcast distribution, real task
(de)serialization — the execution shape a 1000-executor cluster has,
minus the network fabric. This tool re-runs the identical bench
harness (same queries, same checksum materialization, same min-of-N)
under that master and emits ONE JSON line with
``metric: bench_total_9q_lc``. It does NOT replace the canonical
bench (the 2x bar stays single-JVM apples-to-apples vs BASELINE.md);
it exists so SCALE.md §9's "single-JVM only" honesty gap closes with
a measurement.

Usage:
  python tools/lc_bench.py                 # sf0.1, local-cluster[4,8,6144]
  SPARK_GRAFT_SF_DIR=... SPARK_LC=2,4,4096 python tools/lc_bench.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n, cores, mem = (os.environ.get("SPARK_LC") or "4,8,6144").split(",")

    from bench import run_bench
    from travel_data_ingestion_spark.queries import member_queries
    from travel_data_ingestion_spark.session import get_spark

    spark = get_spark(
        app_name="bench-local-cluster",
        master=f"local-cluster[{n},{cores},{mem}]",
        extra_conf={
            "spark.sql.legacy.allowHashOnMapType": "true",
            # shuffle partitions sized to total executor cores, the
            # cluster rule (not the single-JVM 32)
            "spark.sql.shuffle.partitions": str(int(n) * int(cores)),
            "spark.default.parallelism": str(int(n) * int(cores)),
            "spark.executor.memory": f"{mem}m",
            # the driver no longer hosts executors: shrink its heap so
            # 1 driver + N executors fit the same box
            "spark.driver.memory": os.environ.get(
                "SPARK_DRIVER_MEMORY", "8g"),
        },
    )
    out = run_bench(spark, member_queries(), sf_dir)
    out["metric"] = "bench_total_9q_lc"
    out["master"] = f"local-cluster[{n},{cores},{mem}]"
    out["executors"] = (
        spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
