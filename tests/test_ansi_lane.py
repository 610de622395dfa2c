"""ANSI-on verification lane (slow): every registered query must produce
the SAME parity-green answer under ``spark.sql.ansi.enabled=true``.

Spark 4 defaults ANSI on, and the engine's contract is Snowflake-style
null-on-garbage parsing — ``load_table`` force-sets ANSI off per
session. NOTES rule #6 additionally requires every query to SURVIVE a
strict-ANSI session (all parsing helpers are ``try_*``-based), but
nothing exercised that until this lane: it runs the whole registry in a
``newSession()`` clone with ANSI genuinely ON (``SPARK_GRAFT_KEEP_ANSI``
disables load_table's guard) and compares against the same DuckDB
oracles as tests/test_parity.py. A query that relies on non-ANSI cast/
parse/overflow semantics anywhere outside the try_* helpers fails here
before it fails in a driver environment we don't control.

The clone owns its SQLConf; the graph/dd08 memo caches key on a
per-wrapper session token (session.session_token — not ``id()``, which
CPython recycles) so no plan cached under the ANSI-off session is
reused.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.test_parity import _frame_key
from travel_data_ingestion_spark.queries import all_queries

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ansi_spark(spark):
    s = spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    yield s


@pytest.fixture(autouse=True)
def _keep_ansi(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_KEEP_ANSI", "1")


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_green_under_ansi(name, ansi_spark, ddb):
    spec = all_queries()[name]
    sdf = spec.fn(ansi_spark, SF_DIR)
    # the guard must have stayed off: this IS a strict-ANSI execution
    assert ansi_spark.conf.get("spark.sql.ansi.enabled") == "true"
    srows = sdf.collect()
    if spec.oracle is None:
        assert srows is not None
        return
    orc = ddb.execute(spec.oracle)
    ocols = [d[0] for d in orc.description]
    orows = orc.fetchall()
    scols = sdf.columns
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"
    _, s_canon = _frame_key(scols, [[r[c] for c in scols] for r in srows])
    _, o_canon = _frame_key(ocols, orows)
    assert s_canon == o_canon, f"{name}: values differ under ANSI"
