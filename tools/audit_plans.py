#!/usr/bin/env python3
"""Registry-wide physical-plan audit (guide §1.2/§7.2): for EVERY member
query, capture explain("formatted") and summarize red flags —
BatchEvalPython (row-at-a-time Python), CartesianProduct, exchange count,
join strategies, SinglePartition exchanges. One JSON line per query.

Usage: python tools/audit_plans.py [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01 — plan shapes only,
     no execution, so the small SF is fine and fast).
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(text: str) -> dict:
    # r17 red flag: a partial_sum whose input cast has decimal precision
    # >= 9 gets a p+10 > 18 buffer — every per-row update is then a
    # java.math.BigDecimal add instead of a compact long add (guide §5;
    # see compat.csum). Window sums and O(small)-input aggregates are
    # legitimate exemptions — triage hits, don't blanket-fix.
    wide = []
    for line in text.splitlines():
        if "partial_sum" not in line:
            continue
        for m in re.finditer(r"as decimal\((\d+),(\d+)\)", line):
            if int(m.group(1)) >= 9:
                wide.append(f"decimal({m.group(1)},{m.group(2)})")
    return {
        "wide_decimal_partial_sums": len(wide),
        "wide_decimal_forms": sorted(set(wide)),
        "exchanges": len(re.findall(r"\bExchange\b", text)),
        "single_partition": len(re.findall(r"Exchange SinglePartition", text)),
        "joins": sorted(
            set(
                re.findall(
                    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                    r"BroadcastNestedLoopJoin|CartesianProduct)\b",
                    text,
                )
            )
        ),
        "batch_eval_python": len(re.findall(r"BatchEvalPython", text)),
        "arrow_eval_python": len(re.findall(r"ArrowEvalPython", text)),
        "map_in_arrow_pandas": len(
            re.findall(r"MapInArrow|MapInPandas|FlatMapGroupsInPandas", text)
        ),
        "windows": len(re.findall(r"\bWindow\b", text)),
        "sorts": len(re.findall(r"^\(\d+\) Sort\b", text, re.M)),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from travel_data_ingestion_spark.queries import member_queries
    from travel_data_ingestion_spark.session import default_parallelism, get_spark

    spark = get_spark(
        app_name="audit_plans",
        extra_conf={
            "spark.sql.shuffle.partitions": str(default_parallelism()),
        },
    )
    specs = member_queries()
    names = sys.argv[1:] or sorted(specs)
    for n in names:
        try:
            df = specs[n].fn(spark, sf_dir)
            out = {"query": n, **summarize(fmt(df))}
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            out = {"query": n, "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
