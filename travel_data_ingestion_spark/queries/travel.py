"""Gold-report-shaped queries: the reference's three analytical reports
re-expressed over the synthetic star schema.

The *actual* travel pipeline (bronze ingestion -> silver transforms ->
gold tables over the reference's own file formats) lives in
``travel_data_ingestion_spark.{ingest,silver,gold}`` and is exercised by
``tests/test_pipeline_e2e.py`` against a DuckDB oracle on generated
fixtures. These registry entries prove the same *query shapes* on the
driver's correctness tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from travel_data_ingestion_spark.compat import (
    cavg,
    csum,
    csum_dec,
    listagg,
    running_decimal_prefix,
)
from travel_data_ingestion_spark.queries import load_table, register
from travel_data_ingestion_spark.queries.relational import _davg, _dsum


@register(
    "tr01_full_cost_report",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS order_date,
             {_dsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END", 2)} AS urgent_total,
             {_dsum("CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice ELSE 0 END", 2)} AS high_total,
             {_dsum("CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN o_totalprice ELSE 0 END", 2)} AS other_total,
             {_dsum('o_totalprice', 2)} AS day_total,
             string_agg(DISTINCT o_orderstatus, '; ' ORDER BY o_orderstatus) AS statuses
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
      GROUP BY 1
    )
    SELECT order_date, urgent_total, high_total, other_total, day_total, statuses,
           CAST(SUM(CAST(day_total AS DECIMAL(28,2))) OVER (ORDER BY order_date
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           CASE WHEN ROW_NUMBER() OVER (ORDER BY order_date) > 0
                THEN CAST(SUM(CAST(day_total AS DECIMAL(28,2))) OVER (ORDER BY order_date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                     / ROW_NUMBER() OVER (ORDER BY order_date)
                ELSE 0 END AS daily_avg
    FROM daily
    """,
    survey_ops=("K-03", "D-06", "D-07", "E-03", "E-04", "F-01"),
    doc="FULL_TRAVEL_COST shape (reference sp_full_travel_costs.sql): "
    "category pivot via SUM(CASE) ELSE 0, ordered LISTAGG, cumulative "
    "running total and guarded daily average over the daily grain. The "
    "global window runs post-aggregation on O(days) rows only.",
)
def tr01_full_cost_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )

    # compact-buffer sums (compat.csum/csum_dec): o_totalprice is
    # canary-pinned exact-cents <= 1e6; the CASE selects cents-or-0 and
    # the day total recombines to the same DECIMAL(38,2) the wide SUM
    # produced, so the running window's decimal input is bit-identical
    def cat(cond_sql: str) -> F.Column:
        return csum(f"CASE WHEN {cond_sql} THEN o_totalprice ELSE 0 END", 2)

    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("order_date")).agg(
        cat("o_orderpriority = '1-URGENT'").alias("urgent_total"),
        cat("o_orderpriority = '2-HIGH'").alias("high_total"),
        cat("o_orderpriority NOT IN ('1-URGENT', '2-HIGH')").alias("other_total"),
        csum_dec("o_totalprice", 2).alias("day_total_dec"),
        listagg("o_orderstatus", "; ", distinct=True).alias("statuses"),
    )
    # two-pass partial prefix sum (compat.running_decimal_prefix) —
    # same treatment and exactness argument as e03
    pref = running_decimal_prefix(daily, "order_date", "day_total_dec")
    running = F.col("__running").cast("double")
    day_no = F.col("__rn")
    return pref.select(
        "order_date",
        "urgent_total",
        "high_total",
        "other_total",
        F.col("day_total_dec").cast("double").alias("day_total"),
        "statuses",
        running.alias("running_total"),
        F.when(day_no > 0, running / day_no).otherwise(F.lit(0.0)).alias("daily_avg"),
    )


@register(
    "tr02_tax_report",
    f"""
    WITH daily_purchase AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_purchases,
             string_agg(DISTINCT CAST(user_id % 10 AS VARCHAR), ', '
                        ORDER BY CAST(user_id % 10 AS VARCHAR)) AS cohorts,
             {_dsum('value', 4)} AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    daily_err AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_errors
      FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    daily_signup AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_signups
      FROM events WHERE event_type = 'signup' GROUP BY 1
    )
    SELECT COALESCE(p.d, (e.d - 1)) AS report_date,
           COALESCE(p.n_purchases, 0) AS n_purchases,
           COALESCE(p.cohorts, 'No Travel') AS cohorts,
           COALESCE(p.purchase_value, 0.0) AS purchase_value,
           COALESCE(e.n_errors, 0) AS next_day_errors,
           COALESCE(s.n_signups, 0) AS next_day_signups,
           CASE WHEN p.n_purchases > 70 THEN TRUE ELSE FALSE END AS is_travel_day,
           CASE WHEN COALESCE(p.purchase_value, 0.0) > 2000
                     AND COALESCE(e.n_errors, 0) > 60 THEN 'High Strain'
                WHEN COALESCE(e.n_errors, 0) < 55 THEN 'Well Recovered'
                ELSE 'Normal' END AS recovery_status
    FROM daily_purchase p
    FULL OUTER JOIN daily_err e ON p.d = (e.d - 1)
    LEFT JOIN daily_signup s ON COALESCE(p.d, (e.d - 1)) = (s.d - 1)
    """,
    survey_ops=("K-03", "C-02", "C-03", "D-08", "D-09", "H-10", "H-12", "H-13"),
    doc="TRAVEL_TAX_REPORT shape (reference sp_travel_tax_report.sql): "
    "per-day grains FULL OUTER joined on a day-shifted key (flight day "
    "-> next morning), chained LEFT join on the coalesced key, LISTAGG "
    "DISTINCT destinations, IS_TRAVEL_DAY flag, ordered 3-branch "
    "recovery CASE. Branch order preserved exactly.",
)
def tr02_tax_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            listagg((F.col("user_id") % 10).cast("string"), ", ", distinct=True).alias("cohorts"),
            csum("value", 4).alias("purchase_value"),
        )
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_signups"))
    )
    p, e, s = purchases.alias("p"), errors.alias("e"), signups.alias("s")
    joined = p.join(e, F.col("p.d") == F.date_sub(F.col("e.d"), 1), "full_outer")
    anchor = F.coalesce(F.col("p.d"), F.date_sub(F.col("e.d"), 1))
    pv = F.coalesce(F.col("p.purchase_value"), F.lit(0.0))
    ne = F.coalesce(F.col("e.n_errors"), F.lit(0))
    return (
        joined.join(s, anchor == F.date_sub(F.col("s.d"), 1), "left")
        .select(
            anchor.alias("report_date"),
            F.coalesce(F.col("p.n_purchases"), F.lit(0)).alias("n_purchases"),
            F.coalesce(F.col("p.cohorts"), F.lit("No Travel")).alias("cohorts"),
            pv.alias("purchase_value"),
            ne.alias("next_day_errors"),
            F.coalesce(F.col("s.n_signups"), F.lit(0)).alias("next_day_signups"),
            F.when(F.col("p.n_purchases") > 70, F.lit(True))
            .otherwise(F.lit(False))
            .alias("is_travel_day"),
            F.when((pv > 2000) & (ne > 60), "High Strain")
            .when(ne < 55, "Well Recovered")
            .otherwise("Normal")
            .alias("recovery_status"),
        )
    )


@register(
    "tr03_transport_mode",
    f"""
    SELECT event_type AS mode,
           ROUND({_dsum('value', 4)} / 1000, 4) AS total_km,
           COUNT(*) AS n_segments,
           {_davg('value', 4)} AS avg_distance
    FROM events
    WHERE event_type <> 'error'
    GROUP BY event_type
    """,
    survey_ops=("K-03", "D-11", "B-05"),
    doc="TRANSPORT_MODE_ANALYSIS (reference: procedure body absent from "
    "the repo; semantics reconstructed per SURVEY §7.4-7 from "
    "travel_and_movement_map.py:220-224 distance-by-mode / 1000): "
    "per-mode distance, segment count, mean.",
)
def tr03_transport_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") != "error")
    return ev.groupBy(F.col("event_type").alias("mode")).agg(
        F.round(csum("value", 4) / 1000, 4).alias("total_km"),
        F.count(F.lit(1)).alias("n_segments"),
        cavg("value", 4).alias("avg_distance"),
    )


_TR04_DAY = "2024-01-15"

# Fixed-point rendering of a double as text — identical in both engines
# for identical doubles (same recipe as queries/suites.py).
_MONEY_SQL = (
    "CAST(TRY_CAST(round(CAST({x} AS DOUBLE), 6) + 0.0 AS DECIMAL(38,6)) AS VARCHAR)"
)


def _money_col(c: F.Column) -> F.Column:
    return (F.round(c.cast("double"), 6) + F.lit(0.0)).cast("decimal(38,6)").cast("string")


def _tr04_oracle() -> str:
    total = _MONEY_SQL.format(
        x=f"COALESCE({_dsum('value', 4)}, 0.0)"
    )
    item_total = _MONEY_SQL.format(x="COALESCE(total_value, 0.0)")
    return f"""
    WITH ev AS (
      SELECT * FROM events WHERE CAST(ts AS DATE) = DATE '{_TR04_DAY}'
    ),
    by_type AS (
      SELECT event_type, COUNT(*) AS n, {_dsum('value', 4)} AS total_value
      FROM ev GROUP BY event_type
    ),
    items AS (
      SELECT event_type,
             '{{"event_type":"' || event_type || '","n":' || CAST(n AS VARCHAR)
             || ',"total_value":"' || {item_total} || '"}}' AS frag
      FROM by_type
    ),
    arr AS (
      SELECT '[' || string_agg(frag, ',' ORDER BY event_type) || ']' AS by_type_json
      FROM items
    ),
    tot AS (
      SELECT COUNT(*) AS total_events, {total} AS total_value_str,
             COUNT(DISTINCT user_id) AS n_users
      FROM ev
    )
    SELECT '{_TR04_DAY}' AS summary_date,
           '{{"date":"{_TR04_DAY}","total_events":' || CAST(total_events AS VARCHAR)
           || ',"total_value":"' || total_value_str
           || '","n_users":' || CAST(n_users AS VARCHAR)
           || ',"by_type":' || COALESCE(by_type_json, '[]') || '}}' AS document
    FROM tot CROSS JOIN arr
    """


@register(
    "tr04_daily_summary_document",
    _tr04_oracle(),
    survey_ops=("D-14", "K-03"),
    doc="SP_GET_DAILY_TRAVEL_SUMMARY document query (reference: "
    "daily_travel_summary.py:23-27 consumer contract; procedure body "
    "absent — reconstructed per SURVEY §7.4-7): one JSON document for a "
    "given day with scalar totals + row-arrays, assembled with "
    "to_json(struct(..., collect_list(struct(...)))). Canonical-JSON "
    "contract so the document is byte-comparable across engines: fixed "
    "key order, row-arrays sorted by event_type, money values rendered "
    "as fixed-point DECIMAL(38,6) strings (doubles print "
    "engine-specifically; fixed-point text does not). The DuckDB oracle "
    "assembles the identical text.",
)
def tr04_daily_summary_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = _TR04_DAY
    ev = load_table(spark, sf_dir, "events").filter(F.to_date("ts") == F.lit(day))
    details = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _money_col(F.coalesce(csum("value", 4), F.lit(0.0))).alias("total_value"),
        )
        .select(F.struct("event_type", "n", "total_value").alias("item"))
    )
    doc = (
        ev.agg(
            F.count(F.lit(1)).alias("total_events"),
            _money_col(F.coalesce(csum("value", 4), F.lit(0.0))).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .crossJoin(
            details.agg(F.array_sort(F.collect_list("item")).alias("by_type"))
        )
        .select(
            F.lit(day).alias("summary_date"),
            F.to_json(
                F.struct(
                    F.lit(day).alias("date"),
                    F.col("total_events"),
                    F.col("total_value"),
                    F.col("n_users"),
                    F.col("by_type"),
                )
            ).alias("document"),
        )
    )
    return doc
