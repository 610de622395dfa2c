"""Cross-engine pins for the suite fold's float render and cu13's
full-excision NULL semantics — the two sf0.1-only oracle drifts
root-caused in round 16.

1. The fold renders floats as ``round(x, 6)`` quantized to
   DECIMAL(38,6) in EACH engine. DuckDB's native double->DECIMAL cast
   quantizes the exact binary expansion while Spark goes through the
   shortest decimal repr (Java Double.toString); DuckDB's double round()
   errs at half boundaries for |x| >~ 6e7; DuckDB's DECIMAL->DOUBLE is
   not correctly rounded beyond 2^53 scaled units. queries/suites.py
   _sql_render mirrors Spark's pipeline branch by branch; this test
   pins agreement on the distilled adversarial values plus a seeded
   random sweep (the full 176k-value fuzz lives in the round-16 notes).
   Verified-identical domain: |x| < 2^58 plus NaN/inf/±0/overflow — five
   orders of magnitude above the largest float any suite member emits
   (e03's running total, ~8.8e9 at sf0.1).

2. A fully-excised document (every token inside a contaminated span)
   must render clean_md5 = NULL in BOTH engines: DuckDB's
   array_to_string([]) is NULL, so cu13 guards its concat_ws the same
   way (md5('') = d41d8cd9... diverged at sf0.1 before the guard).
"""

from __future__ import annotations

import random

import duckdb
import pyarrow
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from travel_data_ingestion_spark.queries.suites import _spark_render, _sql_render

ADVERSARIAL = [
    # the sf0.1 e03 drift values: ulp(x) > 1e-6, exact expansion and
    # shortest repr disagree at the 6th decimal
    8742524141.61,
    4307715235.68,
    4488937940.18,
    # DuckDB double-round half-boundary error class (|x| >~ 6e7)
    -99297560.13075949,
    60077448.579344496,
    # DECIMAL->DOUBLE exactness loss class (2^53 scaled units)
    9795810443.249123,
    -9651151330.16525,
    # 2^53 boundary: exact-integer regime above, shortest-repr below
    9007199254740991.0,
    9007199254740992.0,
    -9007199254740994.0,
    8.929811922258374e16,
    # small / signed-zero / sub-scale
    0.0,
    -0.0,
    1e-7,
    5e-7,
    -5e-7,
    1e-6,
    -6.983016521509962e-10,  # DuckDB sci-notation parse bug bait
    0.9999995,
    1.0,
    -1.0,
    # NULL-sentinel classes: non-finite and DECIMAL(38,6) overflow
    float("nan"),
    float("inf"),
    -float("inf"),
    1e33,
    -1e33,
]


def test_float_render_cross_engine(spark):
    vals = list(ADVERSARIAL)
    rng = random.Random(16)
    for mag in range(-9, 17):
        for _ in range(80):
            vals.append(rng.uniform(-1, 1) * (10**mag))
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    srend = [r[0] for r in df.select(_spark_render("x", "double").alias("r")).collect()]
    con = duckdb.connect()
    con.register("t", pyarrow.table({"x": vals}))
    drend = [r[0] for r in con.execute(f'SELECT {_sql_render("x", "float")} FROM t').fetchall()]
    bad = [(v, s, d) for v, s, d in zip(vals, srend, drend) if s != d]
    assert not bad, bad[:10]


@pytest.mark.parametrize("kind,val,dtype", [("int", 7, "bigint"), ("bool", True, "boolean"), ("str", "x", "string")])
def test_nonfloat_render_null_sentinel_agrees(spark, kind, val, dtype):
    df = spark.createDataFrame([(val,), (None,)], f"x {dtype}")
    srend = [r[0] for r in df.select(_spark_render("x", dtype).alias("r")).collect()]
    con = duckdb.connect()
    con.register("t", pyarrow.table({"x": [val, None]}))
    drend = [r[0] for r in con.execute(f'SELECT {_sql_render("x", kind)} FROM t').fetchall()]
    assert sorted(srend, key=str) == sorted(drend, key=str)


def test_cu13_full_excision_is_null_in_both_engines(spark, tmp_path):
    """Plant a corpus where one training doc is FULLY covered by
    benchmark shingles (identical text to a doc_id%50==0 benchmark doc)
    and one is partially covered; cu13 and its registered DuckDB oracle
    must agree row-for-row, with the fully-excised doc's clean_md5 NULL
    on both sides."""
    from travel_data_ingestion_spark.queries import member_queries

    bench_text = "alpha beta gamma delta epsilon"
    partial_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    docs = pyarrow.table(
        {
            "doc_id": [50, 1, 2],
            "text": [bench_text, bench_text, partial_text],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [len(bench_text), len(bench_text), len(partial_text)],
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    spec = member_queries()["cu13_span_excision"]
    srows = {
        r.doc_id: (r.n_spans, r.n_tokens_before, r.n_tokens_removed, r.clean_md5)
        for r in spec.fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    orows = {r[0]: tuple(r[1:]) for r in con.execute(spec.oracle).fetchall()}
    assert srows == orows
    # doc 1 is fully excised: every token covered -> clean_md5 NULL
    assert srows[1][2] == srows[1][1] > 0
    assert srows[1][3] is None
    # doc 2 keeps tokens -> a real md5
    assert srows[2][2] < srows[2][1] and srows[2][3] is not None
