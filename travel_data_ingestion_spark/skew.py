"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the explicit
fallback for pathological keys (one key >> everything): the big side
scatters each hot row into one of ``n_salt`` sub-keys, the small side
replicates across all sub-keys, and the join runs on (key, salt) —
turning one giant partition into n_salt even ones.

Salt derives deterministically from a per-row column (default: a stable
hash of all big-side columns), so repeated runs produce identical
partitioning — no rand(), keeping jobs replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on column ``on`` with salting.

    ``small`` is exploded n_salt-fold (keep it genuinely small); the
    result equals ``big.join(small, on, how)`` exactly — for the
    big-side-preserving join types only. Right/full/right_semi joins are
    REJECTED: each of the n_salt small-side replicas misses
    independently, so unmatched small rows would be emitted n_salt
    times. For those, swap the sides (the preserved side must be the
    salted one) or fall back to AQE skew-join splitting.
    """
    safe = {"inner", "cross", "left", "leftouter", "left_outer",
            "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower().replace("_", "").replace("outer", "") not in {
        h.replace("_", "").replace("outer", "") for h in safe
    }:
        raise ValueError(
            f"salted_join: how={how!r} is not big-side-preserving; the "
            "exploded small side would duplicate its unmatched rows. Use "
            "inner/left/left_semi/left_anti, or swap the join sides."
        )
    src = salt_source if salt_source is not None else F.xxhash64(*big.columns)
    salted_big = big.withColumn("__salt", F.pmod(src, F.lit(n_salt)).cast("int"))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    return salted_big.join(salted_small, [on, "__salt"], how).drop("__salt")
