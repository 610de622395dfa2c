"""MERGE upsert + SCD2 tests, including idempotent re-application."""

from __future__ import annotations

import datetime

from travel_data_ingestion_spark.merge import merge_upsert, scd2_apply


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "name", "val"]
    )
    updates = spark.createDataFrame(
        [(2, "b2", 25.0), (3, "c", 30.0)], ["id", "name", "val"]
    )
    out = {r.id: (r.name, r.val) for r in merge_upsert(target, updates, ["id"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0)}


def _dim(spark):
    d = datetime.date
    return spark.createDataFrame(
        [
            (1, "Tokyo", d(2026, 1, 1), d(9999, 12, 31), True),
            (2, "Osaka", d(2026, 1, 1), d(9999, 12, 31), True),
        ],
        ["id", "city", "valid_from", "valid_to", "is_current"],
    )


def _changes(spark):
    d = datetime.date
    return spark.createDataFrame(
        [
            (1, "Kyoto", d(2026, 2, 1)),   # changed value -> new version
            (2, "Osaka", d(2026, 2, 1)),   # no-op -> dropped
            (3, "Nara", d(2026, 2, 1)),    # new key -> inserted current
        ],
        ["id", "city", "effective_date"],
    )


def test_scd2_versions(spark):
    out = scd2_apply(_dim(spark), _changes(spark), ["id"])
    rows = sorted(out.collect(), key=lambda r: (r.id, str(r.valid_from)))
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    # id 1: closed old version + new current
    assert [(r.city, r.is_current) for r in by_id[1]] == [("Tokyo", False), ("Kyoto", True)]
    assert str(by_id[1][0].valid_to) == "2026-02-01"
    # id 2: untouched (no-op change dropped)
    assert [(r.city, r.is_current) for r in by_id[2]] == [("Osaka", True)]
    assert str(by_id[2][0].valid_to) == "9999-12-31"
    # id 3: brand-new current version
    assert [(r.city, r.is_current, str(r.valid_from)) for r in by_id[3]] == [
        ("Nara", True, "2026-02-01")
    ]


def test_scd2_idempotent_reapply(spark):
    once = scd2_apply(_dim(spark), _changes(spark), ["id"])
    twice = scd2_apply(once, _changes(spark), ["id"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_scd2_duplicate_key_changes_keep_single_current(spark):
    """Two change rows for one key in a batch must NOT open two
    concurrent current versions — only the latest effective_date wins."""
    d = datetime.date
    changes = spark.createDataFrame(
        [
            (1, "Kyoto", d(2026, 2, 1)),
            (1, "Sapporo", d(2026, 3, 1)),  # later change, same key
        ],
        ["id", "city", "effective_date"],
    )
    out = scd2_apply(_dim(spark), changes, ["id"]).collect()
    current_1 = [r for r in out if r.id == 1 and r.is_current]
    assert len(current_1) == 1
    assert current_1[0].city == "Sapporo"
    assert str(current_1[0].valid_from) == "2026-03-01"
    closed_1 = [r for r in out if r.id == 1 and not r.is_current]
    assert len(closed_1) == 1  # Tokyo closed once, at the applied change
    assert str(closed_1[0].valid_to) == "2026-03-01"
