"""Grade-window insurance: the driver grades only sorted(names)[:50], so
the registry must NEVER exceed 50 queries — a future addition that
silently pushes a flagship query past the window fails here instead.
"""

from __future__ import annotations

from travel_data_ingestion_spark.queries import all_queries, member_queries
from travel_data_ingestion_spark.queries.suites import SUITES

DRIVER_GRADED_CAP = 50

# Queries whose semantics are not ANSI-SQL-expressible get the driver's
# weaker rows-only check; every other query MUST carry a DuckDB oracle.
# Since round 9 the set is EMPTY: the former members (d16 sketches,
# sim05/sim07 learned-model ANN) are oracle-graded via bounded witnesses
# — exact SQL-expressible analytics plus in-plan error/recall-contract
# booleans the oracle asserts as literal TRUE.
EXPECTED_NO_ORACLE: set[str] = set()


def test_registry_fits_driver_grading_window():
    names = sorted(all_queries())
    assert len(names) <= DRIVER_GRADED_CAP, (
        f"{len(names)} registered queries exceed the driver's "
        f"{DRIVER_GRADED_CAP}-query grading cap; fold the surplus into a "
        f"suite (queries/suites.py). Past the cap: {names[DRIVER_GRADED_CAP:]}"
    )


def test_every_query_has_oracle_unless_documented():
    specs = all_queries()
    missing = {n for n, s in specs.items() if s.oracle is None}
    assert missing == EXPECTED_NO_ORACLE, (
        f"oracle coverage drifted: unexpected no-oracle {sorted(missing - EXPECTED_NO_ORACLE)}, "
        f"stale exemptions {sorted(EXPECTED_NO_ORACLE - missing)}"
    )


def test_suite_members_exist_and_fold_cleanly():
    members = member_queries()
    folded = all_queries()
    for suite, (member_names, _doc) in SUITES.items():
        assert suite in folded
        for m in member_names:
            assert m in members, f"{suite} references unknown member {m}"
            assert m not in folded, f"{m} registered both standalone and in {suite}"
        # survey-op coverage carries over to the graded suite
        member_ops = {op for m in member_names for op in members[m].survey_ops}
        assert member_ops <= set(folded[suite].survey_ops)
