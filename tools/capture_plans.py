#!/usr/bin/env python3
"""Capture .explain("formatted") for bench queries into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: "before" or "after" — files land at plans/<round>/<query>_<suffix>.txt
  round dir defaults to r17; override with SPARK_GRAFT_PLAN_DIR.

Captures the checksummed plan (what bench.py actually executes) AND the
bare query plan, separated by a marker line.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, checksum_plan  # noqa: E402


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from travel_data_ingestion_spark.queries import member_queries
    from travel_data_ingestion_spark.session import default_parallelism, get_spark

    spark = get_spark(
        app_name="capture_plans",
        extra_conf={
            "spark.sql.legacy.allowHashOnMapType": "true",
            "spark.sql.shuffle.partitions": str(default_parallelism()),
        },
    )
    specs = member_queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_DIR", "r17"),
    )
    os.makedirs(outdir, exist_ok=True)
    for n in names:
        df = specs[n].fn(spark, sf_dir)
        text = (
            f"== {n} ({suffix}) — bare query plan ==\n"
            + fmt(df)
            + f"\n== {n} ({suffix}) — checksummed plan (as benched) ==\n"
            + fmt(checksum_plan(df))
        )
        path = os.path.join(outdir, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
