#!/usr/bin/env python3
"""Interleaved A/B for t09's top-bigram count (guide §1.2-2 per-row
work): old = array_max over (distinct x filter-count) — O(distinct x n)
per doc; new = longest equal run of the sorted bigram array —
O(n log n), same integer by definition. Checksum equality asserted
before timing.

Usage: python tools/exp_t09_topcount.py [n_reps]
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


def old_t09(spark, sf_dir):
    from travel_data_ingestion_spark.queries import load_table
    from travel_data_ingestion_spark.queries.llm_text import _tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    eligible = docs.filter(F.size(toks) >= 3).select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    bg = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at("toks", i), F.element_at("toks", i + 1)),
    )
    tg = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(
            " ", F.element_at("toks", i), F.element_at("toks", i + 1), F.element_at("toks", i + 2)
        ),
    )
    g = eligible.select("doc_id", n.alias("n_tokens"), bg.alias("bg"), tg.alias("tg"))
    top_count = F.array_max(
        F.transform(F.array_distinct("bg"), lambda x: F.size(F.filter("bg", lambda y: y == x)))
    )
    top_frac = top_count.cast("double") / F.size("bg")
    dup_frac = F.lit(1.0) - F.size(F.array_distinct("tg")).cast("double") / F.size("tg")
    return g.select(
        "doc_id",
        "n_tokens",
        F.round(top_frac, 6).alias("top_bigram_frac"),
        F.round(dup_frac, 6).alias("dup_trigram_frac"),
        ((top_frac >= 0.08) | (dup_frac >= 0.2)).alias("is_repetitive"),
    )


def checksum(df):
    return df.agg(F.sum(F.xxhash64(F.struct(*df.columns))).alias("c")).collect()[0][0]


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark(
        app_name="exp_t09_topcount",
        extra_conf={"spark.sql.shuffle.partitions": str(default_parallelism())},
    )
    spark.sparkContext.setLogLevel("ERROR")
    new_fn = member_queries()["t09_repetition_stats"].fn

    co = checksum(old_t09(spark, SF_DIR))
    cn = checksum(new_fn(spark, SF_DIR))
    print(f"checksums: old={co} new={cn} identical={co == cn}")
    if co != cn:
        print("VALUE MISMATCH - abort")
        spark.stop()
        sys.exit(1)

    best = {"old": 9e9, "new": 9e9}
    for f in (lambda: old_t09(spark, SF_DIR), lambda: new_fn(spark, SF_DIR)):
        checksum(f())
    for _rep in range(n_reps):
        for label, f in (
            ("old", lambda: old_t09(spark, SF_DIR)),
            ("new", lambda: new_fn(spark, SF_DIR)),
        ):
            t0 = time.perf_counter()
            checksum(f())
            best[label] = min(best[label], time.perf_counter() - t0)
    print(
        f"t09: old={best['old']:.3f} new={best['new']:.3f} "
        f"delta={100 * (best['new'] - best['old']) / best['old']:+.1f}%"
    )
    spark.stop()


if __name__ == "__main__":
    main()
