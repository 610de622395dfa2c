"""Regenerate QUERIES.md (registry manifest) from the live registry.

Run after adding/renaming a registry query or suite member:
    python tools/gen_queries_md.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from travel_data_ingestion_spark.queries import all_queries, member_queries
from travel_data_ingestion_spark.queries.suites import SUITES


def _trunc(doc: str, n: int = 140) -> str:
    one = " ".join((doc or "").split())
    return one if len(one) <= n else one[: n - 3] + "..."


def main() -> None:
    reg = all_queries()
    members = member_queries()
    member_to_suite = {
        m: suite for suite, (ms, _doc) in SUITES.items() for m in ms
    }
    lines = [
        "# QUERIES — registry manifest (auto-generated)",
        "",
        f"Every entry in `__spark_entry__.queries()` — {len(reg)} registered queries, all",
        "inside the driver's 50-query grading window (insurance:",
        "`tests/test_registry.py`). *oracle* = hash-compared against DuckDB SQL",
        "by the driver at sf0.01; *rows-only* = non-SQL-expressible (ML models /",
        "sketches), checked for execution + row count, with semantics pinned by",
        "a pytest instead.",
        "",
        "Fine-grained operator queries are folded into composite `su*` suites",
        "(`queries/suites.py`): a suite runs its members unchanged and unions",
        "their results under a canonical string rendering; its oracle is the",
        "identical rendering over the members' oracles, so the per-member value",
        "evidence is unchanged. The member table below maps each to its suite.",
        "",
        "## Graded registry",
        "",
        "| Query | SURVEY ops | Check | What it demonstrates |",
        "|---|---|---|---|",
    ]
    for name, spec in sorted(reg.items()):
        check = "oracle" if spec.oracle else "rows-only"
        ops = ", ".join(spec.survey_ops) or "—"
        lines.append(f"| `{name}` | {ops} | {check} | {_trunc(spec.doc)} |")
    lines += [
        "",
        "## Suite members (graded via their suite's row)",
        "",
        "| Member | Suite | SURVEY ops | What it demonstrates |",
        "|---|---|---|---|",
    ]
    for name, spec in sorted(members.items()):
        if name in reg:
            continue
        suite = member_to_suite.get(name, "?")
        ops = ", ".join(spec.survey_ops) or "—"
        lines.append(f"| `{name}` | `{suite}` | {ops} | {_trunc(spec.doc)} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(reg)} graded, {len(members) - len([m for m in members if m in reg])} members")


if __name__ == "__main__":
    main()
