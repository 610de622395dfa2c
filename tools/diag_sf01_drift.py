#!/usr/bin/env python3
"""Diagnose the sf0.1-only plain-session oracle drift (sim07/su03/su05).

Runs the named member queries under a PLAIN default SparkSession (the
driver_mirror shape: local[8], Spark-4 defaults) at an arbitrary SF dir
and diffs each against its member DuckDB oracle, printing sample rows
present on only one side. Usage:

    python tools/diag_sf01_drift.py [sf_dir] [member ...]
"""

from __future__ import annotations

import math
import os
import sys


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [
        "sim07_ivf_pq",
        "e01_latest_batch_filter",
        "e02_dedup_row_number",
        "e03_running_total",
        "e05_rank_lag_lead",
        "e06_range_frame_moving_avg",
        "f04_top_k",
        "cu01_hash_sample",
        "cu02_stratified_quota",
        "cu03_decontaminate",
        "cu04_corpus_stats",
        "cu05_pii_redact",
        "cu11_span_contamination",
        "cu12_weighted_curriculum",
        "cu13_span_excision",
        "cu14_token_budget_mix",
        "cu15_epoch_repeat_mix",
        "cu16_span_attribution",
        "cu17_rank_weighted_sample",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            os.environ.get("SPARK_MIRROR_MASTER", "local[8]")
        )
        .appName("diag-sf01-drift")
        .getOrCreate()
    )

    from travel_data_ingestion_spark.queries import TABLES, member_queries

    specs = member_queries()
    ddb = duckdb.connect()
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

    any_fail = False
    for name in names:
        spec = specs[name]
        if spec.oracle is None:
            print(f"{name}: rows-only (no oracle), skipped")
            continue
        try:
            df = spec.fn(spark, sf)
            cols = df.columns
            rows = df.collect()
            cur = ddb.execute(spec.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:  # noqa: BLE001
            any_fail = True
            print(f"{name}: ERROR {type(ex).__name__}: {ex}"[:300])
            continue
        if sorted(cols) != sorted(ocols):
            any_fail = True
            print(f"{name}: SCHEMA spark={sorted(cols)} oracle={sorted(ocols)}")
            continue
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        s = sorted(tuple(canon(r[cols[i]]) for i in order) for r in rows)
        oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
        o = sorted(tuple(canon(r[i]) for i in oorder) for r in orows)
        if s == o:
            print(f"{name}: ok ({len(s)} rows)")
            continue
        any_fail = True
        ss, oo = set(s), set(o)
        only_s = sorted(ss - oo)[:5]
        only_o = sorted(oo - ss)[:5]
        print(
            f"{name}: VALUES differ — spark {len(s)} rows, oracle {len(o)} rows,"
            f" spark-only {len(ss - oo)}, oracle-only {len(oo - ss)}"
        )
        print(f"  cols (sorted): {[cols[i] for i in order]}")
        for r in only_s:
            print(f"  spark-only:  {r}")
        for r in only_o:
            print(f"  oracle-only: {r}")
    spark.stop()
    return 1 if any_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
