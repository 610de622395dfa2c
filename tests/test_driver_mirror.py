"""Plain-session driver mirror (slow lane): every registered query must
hash-match its oracle in a SparkSession built with NOTHING but the
defaults — Spark 4's ANSI-on, 200 shuffle partitions, default driver
memory, machine-local time zone. This is the grading harness' shape;
tests/test_parity.py runs the same comparison under the engine's tuned
session, and the gap between the two is exactly the class of
environment drift (r4's events.ts re-encode, ANSI defaults) that has
bitten before. Runs as a subprocess: a plain session needs its own JVM.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from tests.conftest import SF_DIR

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_queries_green_under_default_session():
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "driver_mirror.py"), SF_DIR],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=_REPO,
    )
    assert proc.returncode == 0, (
        f"driver mirror failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    )
    assert "FAILS: none" in proc.stdout
