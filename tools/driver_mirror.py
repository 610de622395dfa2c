#!/usr/bin/env python3
"""Driver-environment mirror: run every registered query under a PLAIN
default-config SparkSession (Spark 4 defaults — ANSI on, 200 shuffle
partitions, default driver memory, local TZ; none of session.get_spark's
tuning) and hash-compare against the DuckDB oracles, exactly the shape
of the grading harness. Usage:

    python tools/driver_mirror.py [sf_dir]      # default /root/testdata/sf0.01

Exits 0 and prints ``FAILS: none`` when green; exits 1 with the failure
list otherwise. tests/test_driver_mirror.py runs this as a subprocess
(a plain session needs its own JVM — the pytest session's tuned context
can't be reused).
"""

from __future__ import annotations

import math
import os
import sys


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            os.environ.get("SPARK_MIRROR_MASTER", "local[8]")
        )
        .appName("driver-mirror")
        .getOrCreate()
    )

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    ddb = duckdb.connect()
    from travel_data_ingestion_spark.queries import TABLES

    for t in TABLES:
        ddb.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    def canon(v):
        if v is None:
            return "\x00"
        if isinstance(v, float):
            return "nan" if math.isnan(v) else repr(round(v, 9))
        return str(v)

    heap_log = os.environ.get("SPARK_MIRROR_HEAP_LOG") == "1"
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()

    fails = []
    for name in sorted(qs):
        if heap_log:
            spark.sparkContext._jvm.System.gc()
            print(
                f"[heap] before {name}: "
                f"{(rt.totalMemory() - rt.freeMemory()) / 1e6:.0f} MB "
                f"(max {rt.maxMemory() / 1e6:.0f})",
                flush=True,
            )
        try:
            df = qs[name](spark, sf)
            cols = df.columns
            rows = df.collect()
            if name not in oracles:
                continue  # rows-only entries: ran without error, done
            cur = ddb.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            if sorted(cols) != sorted(ocols) or len(rows) != len(orows):
                fails.append((name, "shape", len(rows), len(orows)))
                continue
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            s = sorted(tuple(canon(r[cols[i]]) for i in order) for r in rows)
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            o = sorted(tuple(canon(r[i]) for i in oorder) for r in orows)
            if s != o:
                fails.append((name, "values"))
        except Exception as ex:  # noqa: BLE001 — isolate per query
            fails.append((name, f"{type(ex).__name__}: {ex}"[:200]))
    print("FAILS:", fails if fails else "none")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
