"""Error bounds for the approximate aggregates (d16) against exact
values — the check an engine-specific sketch can't get from a SQL
oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from travel_data_ingestion_spark.queries import all_queries, load_table


def test_approx_within_bounds(spark):
    """Independent recomputation of the sketch-vs-exact error bounds the
    registered d16 now pins in-plan (witness booleans) — this guards the
    witness logic itself against a sign/threshold slip."""
    ev = load_table(spark, SF_DIR, "events")
    approx = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        )
        .collect()
    }
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert abs(a.approx_users - e.users) / e.users < 0.05, et
        # exact median spread is ~0..100; t-digest should land close
        assert abs(a.approx_p50 - e.p50) < 5.0, et


def test_d16_witness_row(spark):
    """The registered d16 emits exact analytics + TRUE witnesses, and
    its exact values match an independent computation."""
    rows = all_queries()["d16_approx_aggs"].fn(spark, SF_DIR).collect()
    assert rows and all(r.users_within_bounds and r.p50_within_bounds for r in rows)
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r.event_type: (r.users, r.n)
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert {r.event_type: (r.exact_users, r.n) for r in rows} == exact
