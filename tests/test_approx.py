"""Error bounds for the approximate aggregates (d16) against exact
values — the check an engine-specific sketch can't get from a SQL
oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from travel_data_ingestion_spark.queries import all_queries, load_table


def test_approx_within_bounds(spark):
    approx = {
        r.event_type: r
        for r in all_queries()["d16_approx_aggs"].fn(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
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
