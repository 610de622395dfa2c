#!/usr/bin/env python3
"""Registry-wide runtime sweep (guide §1: measure first): time every
member query once (checksum-materialized, after one untimed warm pass
of nothing — cold-ish but same-session), print a sorted table. Not a
benchmark — a triage tool to rank where the remaining time lives.

Usage: python tools/exp_member_sweep.py [min_seconds_to_print]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from travel_data_ingestion_spark.queries import member_queries  # noqa: E402
from travel_data_ingestion_spark.session import default_parallelism, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def checksum(df):
    return df.agg(F.sum(F.xxhash64(F.struct(*df.columns)))).collect()[0][0]


def main() -> None:
    floor = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
    spark = get_spark(
        app_name="exp_member_sweep",
        extra_conf={
            "spark.sql.legacy.allowHashOnMapType": "true",
            "spark.sql.shuffle.partitions": str(default_parallelism()),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    times = {}
    for name, spec in sorted(member_queries().items()):
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.perf_counter()
        try:
            checksum(spec.fn(spark, SF_DIR))
            times[name] = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 — sweep must finish
            times[name] = float("nan")
            print(f"{name}: ERROR {type(e).__name__}: {e}"[:160], flush=True)
    total = sum(v for v in times.values() if v == v)
    print(f"\nTOTAL {total:.1f}s over {len(times)} members; slowest first:")
    for name, v in sorted(times.items(), key=lambda kv: -(kv[1] if kv[1] == kv[1] else 0)):
        if v >= floor:
            print(f"  {v:7.2f}s  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
