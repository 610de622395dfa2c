#!/usr/bin/env python3
"""A/B experiment (guide §1.4/§4 spirit — kill per-row allocation):
ROUND(x*100, 0) on DOUBLE codegens to java.math.BigDecimal.valueOf(
v).setScale(0, HALF_UP) per row; for the non-negative exact-cents
columns CAST(x*100 + 0.5 AS BIGINT) computes the same integer in pure
double arithmetic. Interleaved min-of-N over q01/q03/q05 with both
forms, plus checksum equality.

Usage: python tools/exp_round_vs_cast.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from travel_data_ingestion_spark.queries import member_queries  # noqa: E402
from travel_data_ingestion_spark.queries import relational as R  # noqa: E402
from travel_data_ingestion_spark.session import default_parallelism, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["q01_pricing_summary", "q03_top_revenue_orders", "q05_region_nation_revenue"]

ROUND_FORMS = {
    "_PRICE_C": "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)",
    "_DISC_C": "CAST(ROUND(l_discount * 100, 0) AS BIGINT)",
    "_TAX_C": "CAST(ROUND(l_tax * 100, 0) AS BIGINT)",
    "_QTY_C": "CAST(ROUND(l_quantity * 100, 0) AS BIGINT)",
}
CAST_FORMS = {
    "_PRICE_C": "CAST(l_extendedprice * 100 + 0.5 AS BIGINT)",
    "_DISC_C": "CAST(l_discount * 100 + 0.5 AS BIGINT)",
    "_TAX_C": "CAST(l_tax * 100 + 0.5 AS BIGINT)",
    "_QTY_C": "CAST(l_quantity * 100 + 0.5 AS BIGINT)",
}


def apply_forms(forms: dict[str, str]) -> None:
    for k, v in forms.items():
        setattr(R, k, v)
    R._DISC_PRICE_C4 = f"{R._PRICE_C} * (100 - {R._DISC_C})"
    R._CHARGE_C6 = f"({R._DISC_PRICE_C4}) * (100 + {R._TAX_C})"


def checksum(df):
    return df.agg(F.sum(F.xxhash64(F.struct(*df.columns))).alias("c")).collect()[0][0]


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark(
        app_name="exp_round_vs_cast",
        extra_conf={"spark.sql.shuffle.partitions": str(default_parallelism())},
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = member_queries()

    # value equality first: checksums and (for q01) full rows must match
    sums = {}
    for label, forms in (("round", ROUND_FORMS), ("cast", CAST_FORMS)):
        apply_forms(forms)
        sums[label] = [checksum(specs[q].fn(spark, SF_DIR)) for q in QUERIES]
        if label == "round":
            rows_round = specs[QUERIES[0]].fn(spark, SF_DIR).collect()
        else:
            rows_cast = specs[QUERIES[0]].fn(spark, SF_DIR).collect()
    same = sums["round"] == sums["cast"] and sorted(map(tuple, rows_round)) == sorted(
        map(tuple, rows_cast)
    )
    print(f"checksums round={sums['round']} cast={sums['cast']} identical={same}")
    if not same:
        print("VALUE MISMATCH - abort")
        spark.stop()
        sys.exit(1)

    best: dict[tuple[str, str], float] = {}
    for rep in range(n_reps):
        for label, forms in (("round", ROUND_FORMS), ("cast", CAST_FORMS)):
            apply_forms(forms)
            for q in QUERIES:
                t0 = time.perf_counter()
                checksum(specs[q].fn(spark, SF_DIR))
                dt = time.perf_counter() - t0
                key = (label, q)
                best[key] = min(best.get(key, float("inf")), dt)
    for q in QUERIES:
        r, c = best[("round", q)], best[("cast", q)]
        print(f"{q}: round={r:.4f} cast={c:.4f} delta={100 * (c - r) / r:+.1f}%")
    apply_forms(ROUND_FORMS)  # restore module state
    spark.stop()


if __name__ == "__main__":
    main()
