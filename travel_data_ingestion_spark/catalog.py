"""Schema registry + path-based warehouse catalog (medallion layout).

The reference keeps four Snowflake schemas — ADMIN / BRONZE / SILVER /
GOLD — with fixed DDL as the source of truth, introspected at runtime
(reference sql/reset_schemas.sql:14-292; ingestion_logic.py:39-45
DESC TABLE). Here the registry is a dict of explicit StructTypes and the
warehouse is a directory tree of parquet tables:

    <root>/<schema>/<table>/           (load_id=N/ partitions for facts)

Path-based tables (instead of a Hive metastore) keep the engine
dependency-free and make the DELETE+INSERT idempotent sink a dynamic
partition overwrite — the scalable equivalent of the reference's
``DELETE FROM t WHERE load_id IN (...)`` + append (utils.py:12-46).

Bronze business columns are all strings (schema-on-read, matching
reset_schemas.sql:65-161 where even AMOUNT is VARCHAR); four lineage
columns are appended at load time (reset_schemas.sql:68-71).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _strings(*names: str) -> list[T.StructField]:
    return [T.StructField(n, T.StringType()) for n in names]


LINEAGE_FIELDS = [
    T.StructField("_ingestion_time", T.TimestampType()),
    T.StructField("_source_file", T.StringType()),
    T.StructField("load_id", T.LongType()),
    T.StructField("row_id", T.LongType()),
]

# Bronze: business columns exactly as the reference lands them (strings).
# reference sql/reset_schemas.sql:65-161.
BRONZE_SCHEMAS: dict[str, T.StructType] = {
    "fitbit_heart_rate": T.StructType(
        _strings("timestamp", "beats_per_minute", "data_source") + LINEAGE_FIELDS
    ),
    "fitbit_sleep_score": T.StructType(
        _strings(
            "sleep_log_entry_id",
            "timestamp",
            "overall_score",
            "composition_score",
            "revitalization_score",
            "duration_score",
            "deep_sleep_in_minutes",
            "resting_heart_rate",
            "restlessness",
        )
        + LINEAGE_FIELDS
    ),
    "fitbit_steps": T.StructType(
        _strings("timestamp", "steps", "data_source") + LINEAGE_FIELDS
    ),
    "flight_logs": T.StructType(
        _strings(
            "date",
            "flight_number",
            "from",
            "to",
            "dep_time",
            "arr_time",
            "duration",
            "airline",
            "aircraft",
            "registration",
            "seat_number",
            "seat_type",
            "flight_class",
            "flight_reason",
            "note",
            "dep_id",
            "arr_id",
            "airline_id",
            "aircraft_id",
        )
        + LINEAGE_FIELDS
    ),
    # single `country` column; gold aliases it `county` for the consumer
    # surface (SURVEY §7.4-6 COUNTY/COUNTRY resolution).
    "manual_logs": T.StructType(
        _strings(
            "day",
            "date",
            "flag",
            "country",
            "city",
            "description",
            "comments",
            "food",
            "travel",
            "hotel",
        )
        + LINEAGE_FIELDS
    ),
    "transactions": T.StructType(
        _strings("country", "date", "name", "type", "amount", "comments") + LINEAGE_FIELDS
    ),
    # whole-document JSON lands as one raw string per file (VARIANT
    # analog — reset_schemas.sql:127-133).
    "google_timeline": T.StructType(
        [T.StructField("raw_data", T.StringType())] + LINEAGE_FIELDS
    ),
}

# Admin ledgers (reference sql/admin_*.sql). Append-only; latest row per
# key wins on read (no in-place UPDATE needed — SURVEY §2 A-08).
ADMIN_SCHEMAS: dict[str, T.StructType] = {
    "file_details": T.StructType(
        [
            T.StructField("file_id", T.LongType()),
            T.StructField("container", T.StringType()),
            T.StructField("stage_name", T.StringType()),
            T.StructField("source_path", T.StringType()),
            T.StructField("file_pattern", T.StringType()),
            T.StructField("target_schema", T.StringType()),
            T.StructField("target_table", T.StringType()),
            T.StructField("file_format", T.StringType()),
        ]
    ),
    "ingestion_logs": T.StructType(
        [
            T.StructField("load_id", T.LongType()),
            T.StructField("file_id", T.LongType()),
            T.StructField("file_name", T.StringType()),
            T.StructField("target_table", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("rows_loaded", T.LongType()),
            T.StructField("error_message", T.StringType()),
            T.StructField("event_time", T.TimestampType()),
        ]
    ),
    "transformation_logs": T.StructType(
        [
            T.StructField("transformation_id", T.LongType()),
            T.StructField("transformation_name", T.StringType()),
            T.StructField("load_id", T.LongType()),
            T.StructField("status", T.StringType()),
            T.StructField("rows_written", T.LongType()),
            T.StructField("error_message", T.StringType()),
            T.StructField("event_time", T.TimestampType()),
        ]
    ),
}

SCHEMAS = ("admin", "bronze", "silver", "gold")


# parked zero-row bootstrap part files (dot-prefixed = ignored by Spark
# readers and partition discovery) — see write_idempotent
_BOOTSTRAP_PREFIX = ".bootstrap__"


@dataclass
class Warehouse:
    """Path-based medallion warehouse rooted at ``root``."""

    root: str

    def path(self, schema: str, table: str) -> str:
        return os.path.join(self.root, schema, table)

    def exists(self, schema: str, table: str) -> bool:
        p = self.path(schema, table)
        if not os.path.isdir(p):
            return False
        for _, _, files in os.walk(p):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def registered_schema(self, schema: str, table: str) -> T.StructType | None:
        if schema == "bronze":
            return BRONZE_SCHEMAS.get(table)
        if schema == "admin":
            return ADMIN_SCHEMAS.get(table)
        return None

    def _heal_parked_bootstrap(self, p: str) -> None:
        """Recover the zero-row bootstrap crash window: write_idempotent
        parks the bootstrap part file under a dot-prefixed name before
        its first partitioned overwrite, so a crash between the park and
        the commit leaves the dir with ONLY hidden files — unreadable.
        Restoring the parked file (atomic rename) puts a readable footer
        back; conversely, a parked file next to committed visible data
        (crash after commit, before cleanup) is stale and removed.
        Single-driver contract: reads never race a live writer here,
        same as the warehouse's ledgers."""
        if not os.path.isdir(p):
            return
        parked = [
            f
            for f in os.listdir(p)
            if f.startswith(_BOOTSTRAP_PREFIX) and f.endswith(".parquet")
        ]
        if not parked:
            return
        # visible == COMMITTED data only: prune descent into hidden and
        # staging trees ('.spark-staging-*', '_temporary') — a crash
        # DURING the partitioned overwrite leaves staged part files
        # there, and counting them would delete the parked bootstrap
        # (the recovery footer) instead of restoring it
        visible = False
        for sub, dirs, files in os.walk(p):
            dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
            if any(
                f.endswith(".parquet") and not f.startswith((".", "_"))
                for f in files
            ):
                visible = True
                break
        for f in parked:
            if visible:
                os.remove(os.path.join(p, f))  # stale post-commit leftover
            else:
                os.replace(
                    os.path.join(p, f), os.path.join(p, f[len(_BOOTSTRAP_PREFIX):])
                )

    def read(self, spark: SparkSession, schema: str, table: str) -> DataFrame:
        """DESC TABLE + scan analog: empty typed frame when absent."""
        if self.exists(schema, table):
            self._heal_parked_bootstrap(self.path(schema, table))
            return spark.read.parquet(self.path(schema, table))
        st = self.registered_schema(schema, table)
        if st is None:
            raise FileNotFoundError(f"table {schema}.{table} does not exist")
        return spark.createDataFrame([], st)

    def append(
        self,
        spark: SparkSession,
        df: DataFrame,
        schema: str,
        table: str,
        partition_by: tuple[str, ...] = (),
    ) -> None:
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(schema, table))

    def overwrite(self, spark: SparkSession, df: DataFrame, schema: str, table: str) -> None:
        """CTAS / truncate-insert sink (reference sp_full_travel_costs.sql:8
        CREATE OR REPLACE TABLE; sp_travel_tax_report.sql:8-25)."""
        df.write.mode("overwrite").parquet(self.path(schema, table))

    def write_idempotent(
        self,
        spark: SparkSession,
        df: DataFrame,
        schema: str,
        table: str,
    ) -> None:
        """DELETE-by-load_id + INSERT as dynamic partition overwrite.

        The reference deletes the batch's rows then appends
        (utils.py:12-46 save_idempotent). With the table partitioned by
        load_id, overwriting exactly the incoming partitions is the same
        contract with no row-level delete — and at 100 TB it touches only
        the affected partitions' files.
        """
        if "load_id" not in df.columns:
            raise ValueError("idempotent write requires a load_id column")
        # An all-filtered batch overwrites no partitions. If the table
        # already exists that is a pure no-op; if this is the table's
        # FIRST-EVER batch, bootstrap it as a schema-carrying zero-row
        # parquet write (coalesce(1), unpartitioned: exactly one footer
        # file) so downstream readers see an empty typed table instead
        # of FileNotFoundError. A dir with only _SUCCESS would break
        # schema inference — the single empty part file is what makes
        # the bootstrap readable.
        if df.isEmpty():
            if not self.exists(schema, table):
                df.coalesce(1).write.mode("overwrite").parquet(
                    self.path(schema, table)
                )
            return
        # clear a zero-row schema bootstrap before the first real write:
        # root-level part files mixed with load_id= dirs trip
        # "conflicting directory structures" in partition discovery.
        # The bootstrap is PARKED under a dot-prefixed (reader-ignored)
        # name rather than deleted, and removed only after the
        # partitioned overwrite commits — a crash in between leaves a
        # recoverable footer file (_heal_parked_bootstrap restores it on
        # the next read) instead of a dir with only _SUCCESS.
        # Guard: only the empty bootstrap is parked — root files
        # holding ROWS mean the table was written unpartitioned (e.g.
        # via overwrite()); silently hiding those would be data loss,
        # so that mix is a loud error instead.
        p = self.path(schema, table)
        parked: list[str] = []
        if os.path.isdir(p):
            self._heal_parked_bootstrap(p)  # resume from a prior crash
            root_parts = [
                f
                for f in os.listdir(p)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            ]
            if root_parts:
                if not spark.read.parquet(*[os.path.join(p, f) for f in root_parts]).isEmpty():
                    raise ValueError(
                        f"{schema}.{table} holds unpartitioned data rows; "
                        "write_idempotent requires the load_id-partitioned "
                        "layout — rewrite the table (overwrite) before "
                        "switching sinks"
                    )
                for f in root_parts:
                    dst = os.path.join(p, _BOOTSTRAP_PREFIX + f)
                    os.replace(os.path.join(p, f), dst)
                    parked.append(dst)
        # writer-level option only — mutating the SESSION conf here would
        # silently flip every later partitioned overwrite in the session
        # to dynamic semantics (stale-partition hazard export.py has to
        # pin 'static' against)
        (
            df.write.mode("overwrite")
            .partitionBy("load_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.path(schema, table))
        )
        for dst in parked:
            os.remove(dst)

    def init(self) -> None:
        """Reset/DDL bootstrap analog (reference reset_database_dag.py:13-41)."""
        for s in SCHEMAS:
            os.makedirs(os.path.join(self.root, s), exist_ok=True)
