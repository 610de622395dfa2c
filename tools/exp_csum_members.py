#!/usr/bin/env python3
"""Interleaved A/B for the r17 compact-buffer sum conversions (guide
§1/§5): times each converted member with compat.CSUM_COMPACT True
(hi/lo compact DECIMAL(18,0) buffers) vs False (the old wide
DECIMAL(28,·) forms), alternating inside one session (min-of-N), after
verifying checksum equality. VM speed-class drift makes cross-run
totals unusable on this box; interleaving is the only trustworthy
protocol (r16 precedent).

Usage: python tools/exp_csum_members.py [n_reps] [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from travel_data_ingestion_spark import compat  # noqa: E402
from travel_data_ingestion_spark.queries import member_queries  # noqa: E402
from travel_data_ingestion_spark.session import default_parallelism, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_QUERIES = [
    "c01_left_join_computed_key",
    "c02_full_outer_date_shift",
    "c04_scaffold_densify",
    "d03_minute_grain_stats",
    "d04_conditional_zone_counts",
    "d10_avg_of_hourly_avg",
    "d17_rollup",
    "d18_unpivot",
    "d19_cube",
    "e03_running_total",
    "e05_rank_lag_lead",
    "e06_range_frame_moving_avg",
    "q06_sql_api",
    "h15_json_extract_flatten",
    "h18_map_ops",
    "j01_tumbling_window",
    "tr01_full_cost_report",
    "tr02_tax_report",
    "tr03_transport_mode",
    "tr04_daily_summary_document",
    "t11_unigram_logprob",
]


def checksum(df):
    return df.agg(F.sum(F.xxhash64(F.struct(*df.columns))).alias("c")).collect()[0][0]


def main() -> None:
    args = sys.argv[1:]
    n_reps = int(args[0]) if args and args[0].isdigit() else 7
    names = [a for a in args if not a.isdigit()] or DEFAULT_QUERIES
    spark = get_spark(
        app_name="exp_csum_members",
        extra_conf={
            "spark.sql.legacy.allowHashOnMapType": "true",
            "spark.sql.shuffle.partitions": str(default_parallelism()),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = member_queries()

    # value equality first
    ok = True
    for q in names:
        compat.CSUM_COMPACT = True
        c_new = checksum(specs[q].fn(spark, SF_DIR))
        compat.CSUM_COMPACT = False
        c_old = checksum(specs[q].fn(spark, SF_DIR))
        compat.CSUM_COMPACT = True
        same = c_new == c_old
        ok &= same
        print(f"checksum {q}: compact={c_new} wide={c_old} identical={same}", flush=True)
    if not ok:
        print("VALUE MISMATCH - abort")
        spark.stop()
        sys.exit(1)

    # warmup both forms once
    for flag in (True, False):
        compat.CSUM_COMPACT = flag
        for q in names:
            checksum(specs[q].fn(spark, SF_DIR))

    best: dict[tuple[bool, str], float] = {}
    for _rep in range(n_reps):
        for flag in (True, False):
            compat.CSUM_COMPACT = flag
            for q in names:
                spark.sparkContext.setJobDescription(
                    f"exp_csum:{q}:{'compact' if flag else 'wide'}"
                )
                t0 = time.perf_counter()
                checksum(specs[q].fn(spark, SF_DIR))
                dt = time.perf_counter() - t0
                key = (flag, q)
                best[key] = min(best.get(key, float("inf")), dt)
    compat.CSUM_COMPACT = True
    tot_new = tot_old = 0.0
    for q in names:
        n, o = best[(True, q)], best[(False, q)]
        tot_new += n
        tot_old += o
        print(f"{q}: wide={o:.4f} compact={n:.4f} delta={100 * (n - o) / o:+.1f}%")
    print(f"TOTAL: wide={tot_old:.4f} compact={tot_new:.4f} "
          f"delta={100 * (tot_new - tot_old) / tot_old:+.1f}%")
    spark.stop()


if __name__ == "__main__":
    main()
