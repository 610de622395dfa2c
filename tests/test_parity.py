"""Local mirror of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle at sf0.001 and compare row count,
column names, and order-insensitive values (sorted columns, sorted rows).
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_DIR
from travel_data_ingestion_spark.queries import all_queries

SPECS = all_queries()


def _canon(val):
    if val is None:
        return ("\x00null",)
    if isinstance(val, float):
        if math.isnan(val):
            return ("nan",)
        # round-trip shortest repr: mirrors a value-hash over text
        return (repr(round(val, 9)),)
    return (str(val),)


def _frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    )
    return [cols[i] for i in order], canon_rows


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, ddb):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    assert len(scols) == len(set(scols)), f"duplicate column names in {name}"

    if spec.oracle is None:
        # rows-only check, like the driver's weaker gate
        assert srows is not None
        return

    orc = ddb.execute(spec.oracle)
    ocols = [d[0] for d in orc.description]
    orows = orc.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"

    s_cols, s_canon = _frame_key(scols, [[r[c] for c in scols] for r in srows])
    o_cols, o_canon = _frame_key(ocols, orows)
    mismatches = [
        (a, b) for a, b in zip(s_canon, o_canon) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatch {mismatches[:3]}"
