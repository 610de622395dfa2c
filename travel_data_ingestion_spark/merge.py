"""MERGE / CDC / SCD2 emulation on plain parquet (no Delta/Iceberg).

The reference's mutation vocabulary is DELETE+INSERT by load_id (A-10)
and in-place log UPDATEs (A-08) — both re-expressed elsewhere as
partition overwrite and append+latest-wins. This module provides the
general forms a warehouse user eventually needs:

- ``merge_upsert``: MERGE INTO target USING updates ON key — matched
  rows replaced, unmatched inserted. One anti-join + union; rewrite cost
  is bounded by partitioning the target on a stable key prefix.
- ``scd2_apply``: slowly-changing-dimension type 2 — closes the current
  version of changed keys (valid_to stamped) and appends new versions.

Both are pure DataFrame transforms returning the new table state, so
they compose with any sink; at scale you'd pair them with partition
overwrite to rewrite only affected partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HIGH_DATE = "9999-12-31"


def merge_upsert(target: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """MERGE: updates win on key collision, everything else survives."""
    keys = list(keys)
    surviving = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return surviving.unionByName(updates.select(*target.columns))


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    effective_date_col: str = "effective_date",
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """SCD2: version rows carry (valid_from, valid_to, is_current).

    ``changes`` rows carry the business columns + ``effective_date``.
    Unchanged keys pass through; changed/new keys close the current
    version at the change's effective date and open a new current one.
    No-op changes (all compared columns equal) are dropped — re-running
    the same change set leaves the dimension byte-identical (idempotent).

    A batch may carry several change rows for one key; only the LATEST
    (highest effective_date, business columns as deterministic tiebreak)
    is applied — without this pre-dedup, two change rows for one key
    would open two concurrent ``is_current=True`` versions, corrupting
    the dimension. Intermediate same-batch versions are intentionally
    not historized (batch-granularity SCD2, same as MERGE semantics).
    """
    keys = list(keys)
    business = [
        c for c in changes.columns if c not in (*keys, effective_date_col)
    ]
    compare = list(compare_cols) if compare_cols is not None else business

    from travel_data_ingestion_spark.compat import qualify_dedup_latest

    changes = qualify_dedup_latest(
        changes,
        keys,
        [F.col(effective_date_col).desc()] + [F.col(c).desc() for c in business],
    )

    current = dim.filter(F.col("is_current"))
    # drop no-op changes: same values as the key's current version
    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"cur.{c}").eqNullSafe(F.col(f"chg.{c}"))
    noop_keys = (
        current.alias("cur")
        .join(changes.alias("chg"), keys)
        .filter(same)
        .select(*keys)
        .distinct()
    )
    effective_changes = changes.join(noop_keys, keys, "left_anti")
    change_keys = effective_changes.select(*keys).distinct()

    closed = (
        current.alias("cur")
        .join(
            effective_changes.select(
                *keys, F.col(effective_date_col).alias("__eff")
            ).alias("chg"),
            keys,
        )
        .select(
            *[F.col(f"cur.{c}") for c in dim.columns if c not in ("valid_to", "is_current")],
            F.col("__eff").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    untouched_current = current.join(change_keys, keys, "left_anti")
    history = dim.filter(~F.col("is_current"))
    opened = effective_changes.select(
        *keys,
        *business,
        F.col(effective_date_col).alias("valid_from"),
        F.lit(HIGH_DATE).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    cols = dim.columns
    return (
        history.select(*cols)
        .unionByName(untouched_current.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(opened.select(*cols))
    )
