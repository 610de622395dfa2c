"""Per-dataset silver transforms (SURVEY §2 B/C/D/H/I semantics).

Every function takes the bronze batch (already filtered to the pending
load_ids, all-string business columns + lineage) and returns
``{silver_table_name: DataFrame}``. All logic is native Catalyst
expressions — the pandas row loops of the reference become declarative
column ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from travel_data_ingestion_spark.compat import try_to_date, try_to_timestamp


def _norm_cols(df: DataFrame) -> DataFrame:
    """Lower/strip column names (reference transactions.py:41, B-07)."""
    return df.toDF(*[c.strip().lower() for c in df.columns])


def transactions(bronze: DataFrame) -> dict[str, DataFrame]:
    """reference scripts/transformations/transactions.py:41-56.

    - default 'type' column when absent (B-08)
    - amount: strip [$,] -> double (H-03/H-14)
    - daily_spend: groupBy(date, type, load_id).sum(amount) (D-01)
    """
    df = _norm_cols(bronze)
    if "type" not in df.columns:
        df = df.withColumn("type", F.lit("uncategorized"))
    df = df.withColumn(
        "amount", F.regexp_replace(F.col("amount"), r"[$,]", "").cast("double")
    )
    daily_spend = df.groupBy("date", "type", "load_id").agg(
        F.sum("amount").alias("amount")
    )
    return {"all_spending": df, "daily_spend": daily_spend}


def manual_logs(bronze: DataFrame) -> dict[str, DataFrame]:
    """reference manual_logs.py:43-46: normalize + passthrough. The
    single `country` column serves both COUNTY/COUNTRY consumer spellings
    (SURVEY §7.4-6)."""
    return {"manual_logs": _norm_cols(bronze)}


def flight_logs(bronze: DataFrame) -> dict[str, DataFrame]:
    """reference flight_logs.py:43-47: normalize + strict date parse to a
    date column; numeric id codes cast (reset_schemas.sql:199-206)."""
    df = _norm_cols(bronze).withColumn("date", try_to_date("date"))
    for c in ("seat_type", "flight_class", "flight_reason", "dep_id", "arr_id",
              "airline_id", "aircraft_id"):
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast("long"))
    return {"flight_logs": df}


def fitbit_steps(bronze: DataFrame) -> dict[str, DataFrame]:
    """reference fitbit_steps.py:44-62: hourly sum + 24h scaffold fill
    (C-04) + load_id backfill from the per-date max (C-08)."""
    df = (
        _norm_cols(bronze)
        .withColumn("ts", try_to_timestamp("timestamp"))
        .withColumn("date", F.to_date("ts"))
        .withColumn("hour", F.hour("ts").cast("long"))
        .withColumn("steps", F.col("steps").cast("long"))
    )
    # rows whose timestamp failed to parse have date NULL: they must not
    # spawn a 24-hour NULL-date scaffold block (NULL join keys never
    # match, so it would surface as 24 zero-step rows under a NULL
    # load_id — invisible to the idempotent sink's partition overwrite
    # AND to latest-batch dedup). Drop them from BOTH aggregates.
    df = df.filter(F.col("date").isNotNull())
    hourly = df.groupBy("date", "hour").agg(
        F.sum("steps").alias("steps"), F.max("load_id").alias("load_id")
    )
    dates = df.select("date").distinct()
    hours = dates.sparkSession.range(24).select(F.col("id").alias("hour"))
    scaffold = dates.crossJoin(F.broadcast(hours))
    date_load = df.groupBy("date").agg(F.max("load_id").alias("date_load_id"))
    full = (
        scaffold.join(hourly, ["date", "hour"], "left")
        .join(F.broadcast(date_load), "date", "left")
        .select(
            "date",
            "hour",
            F.coalesce("steps", F.lit(0)).cast("long").alias("steps"),
            F.coalesce("load_id", F.col("date_load_id")).cast("long").alias("load_id"),
        )
    )
    return {"hourly_step_count": full}


def fitbit_sleep(bronze: DataFrame) -> dict[str, DataFrame]:
    """reference fitbit_sleep.py:43-52: normalize, typed casts,
    passthrough to sleep_log."""
    df = _norm_cols(bronze)
    casts = {
        "sleep_log_entry_id": "long",
        "overall_score": "long",
        "composition_score": "double",
        "revitalization_score": "long",
        "duration_score": "double",
        "deep_sleep_in_minutes": "long",
        "resting_heart_rate": "long",
        "restlessness": "double",
    }
    for c, t in casts.items():
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast(t))
    if "timestamp" in df.columns:
        df = df.withColumn("timestamp", try_to_timestamp("timestamp"))
    return {"sleep_log": df}


def _hr_zone(bpm: F.Column) -> F.Column:
    """reference fitbit_heart_rate.py:4-9 — exact strict-< boundaries."""
    return (
        F.when(bpm.isNull(), "Unknown")
        .when(bpm < 60, "Resting")
        .when(bpm < 100, "Normal")
        .when(bpm < 130, "Elevated")
        .otherwise("High")
    )


def fitbit_heart_rate(bronze: DataFrame) -> dict[str, DataFrame]:
    """reference fitbit_heart_rate.py:58-89: minute-grain stats (D-03),
    zone on the minute mean (I-01), hourly re-agg with zone-minute
    conditional counts (D-04). AVG-of-minute-AVG preserved exactly
    (SURVEY §7.4-5)."""
    df = (
        _norm_cols(bronze)
        .withColumn("ts", try_to_timestamp("timestamp"))
        .withColumn("bpm", F.col("beats_per_minute").cast("double"))
    )
    minute = (
        df.groupBy(F.date_trunc("minute", "ts").alias("log_ts"), "load_id")
        .agg(
            F.avg("bpm").alias("heart_rate_mean"),
            F.min("bpm").alias("heart_rate_min"),
            F.max("bpm").alias("heart_rate_max"),
            F.count("bpm").alias("readings_count"),
        )
        .withColumn("hr_zone", _hr_zone(F.col("heart_rate_mean")))
    )
    hourly = minute.groupBy(
        F.to_date("log_ts").alias("date"),
        F.hour("log_ts").cast("long").alias("hour"),
        "load_id",
    ).agg(
        F.avg("heart_rate_mean").alias("hourly_avg_hr"),
        F.min("heart_rate_min").alias("hourly_min_hr"),
        F.max("heart_rate_max").alias("hourly_max_hr"),
        F.sum(F.when(F.col("hr_zone") == "Resting", 1).otherwise(0)).alias("minutes_in_resting"),
        F.sum(F.when(F.col("hr_zone") == "Elevated", 1).otherwise(0)).alias("minutes_in_elevated"),
        F.sum(F.when(F.col("hr_zone") == "High", 1).otherwise(0)).alias("minutes_in_high"),
    )
    # minute log stringifies its timestamp (fitbit_heart_rate.py:85)
    minute_log = minute.select(
        F.date_format("log_ts", "yyyy-MM-dd HH:mm:ss").alias("log_timestamp"),
        "load_id",
        "heart_rate_mean",
        "heart_rate_min",
        "heart_rate_max",
        "readings_count",
        "hr_zone",
    )
    return {"heart_rate_minute_log": minute_log, "heart_rate_hourly_summary": hourly}


def _parse_latlng(col: F.Column, idx: int) -> F.Column:
    """'35.65°, 139.74°' -> double, null on garbage (reference
    reset_schemas.sql:309-318 parse_lat_long_string; H-17/I-02)."""
    parts = F.split(F.regexp_replace(col, "°", ""), ",")
    piece = F.trim(F.try_element_at(parts, F.lit(idx)))
    return F.when(F.size(parts) == 2, piece.cast("double"))


def google_timeline(bronze: DataFrame) -> dict[str, DataFrame]:
    """VARIANT -> relational rows, fully declarative (I-05).

    The reference needs a 160-LoC Snowpark procedure with pandas row
    loops (reset_schemas.sql:298-455); here it is parse_json (Spark 4
    VariantType — the direct VARIANT analog) + explode + branch
    projection, running entirely on executors. try_variant_get's
    schema-on-read paths reproduce the reference's flexible access:
    placeLocation may be a {"latLng": ...} object OR a bare string
    (reset_schemas.sql:415-420), and activity start/startLocation are
    alternate spellings (:424). Segments that are neither visit nor
    activity are dropped, exactly like the reference's two append
    branches (:398-430). Garbage documents parse to NULL (try_parse_json),
    mirroring ON_ERROR tolerance.
    """
    seg = bronze.select(
        "load_id",
        "_source_file",
        F.explode(
            F.try_variant_get(
                F.try_parse_json(F.col("raw_data")), "$.semanticSegments", "array<variant>"
            )
        ).alias("s"),
    )

    def vget(path: str, typ: str) -> F.Column:
        return F.try_variant_get(F.col("s"), path, typ)

    visit = vget("$.visit", "variant")
    act = vget("$.activity", "variant")
    # dict-or-string placeLocation: prefer the object's latLng; accept a
    # bare string but never the stringified object form.
    loc_str = vget("$.visit.topCandidate.placeLocation", "string")
    visit_loc = F.coalesce(
        vget("$.visit.topCandidate.placeLocation.latLng", "string"),
        F.when(~loc_str.rlike(r"^\s*\{"), loc_str),
    )
    start_node = F.coalesce(
        vget("$.activity.start.latLng", "string"),
        vget("$.activity.startLocation.latLng", "string"),
    )
    end_node = F.coalesce(
        vget("$.activity.end.latLng", "string"),
        vget("$.activity.endLocation.latLng", "string"),
    )
    out = (
        seg.filter(visit.isNotNull() | act.isNotNull())
        .select(
            "load_id",
            "_source_file",
            try_to_timestamp(vget("$.startTime", "string")).alias("start_time"),
            try_to_timestamp(vget("$.endTime", "string")).alias("end_time"),
            F.when(visit.isNotNull(), "VISIT").otherwise("ACTIVITY").alias("segment_type"),
            F.when(visit.isNotNull(), vget("$.visit.topCandidate.placeId", "string")).alias("place_id"),
            F.when(visit.isNotNull(), _parse_latlng(visit_loc, 1)).alias("visit_latitude"),
            F.when(visit.isNotNull(), _parse_latlng(visit_loc, 2)).alias("visit_longitude"),
            F.when(visit.isNull(), vget("$.activity.topCandidate.type", "string")).alias("activity_type"),
            F.when(visit.isNull(), _parse_latlng(start_node, 1)).alias("activity_start_latitude"),
            F.when(visit.isNull(), _parse_latlng(start_node, 2)).alias("activity_start_longitude"),
            F.when(visit.isNull(), _parse_latlng(end_node, 1)).alias("activity_end_latitude"),
            F.when(visit.isNull(), _parse_latlng(end_node, 2)).alias("activity_end_longitude"),
            F.when(visit.isNull(), vget("$.activity.distanceMeters", "double")).alias("distance_meters"),
            F.when(visit.isNotNull(), vget("$.visit.probability", "double"))
            .otherwise(
                F.coalesce(
                    vget("$.activity.probability", "double"),
                    vget("$.activity.topCandidate.probability", "double"),
                )
            )
            .alias("confidence"),
        )
    )
    return {"google_timeline": out}
