#!/usr/bin/env python
"""Regenerate COVERAGE.md from the query registry (run after adding
queries so the inventory map never drifts from the code)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


#: why each rows-only query CANNOT have a cross-engine hash oracle, and
#: where its correctness is gated instead.  EMPTY since round 6: the last
#: five rows-only ids were converted to hash-checked forms (envelope
#: oracles for the three sketch aggs; deterministic sign-projection LSH;
#: deterministic one-step-Lloyd IVF quantizer).
ROWS_ONLY_RATIONALE: dict[str, str] = {}


def main() -> None:
    from cassandra_syncer_spark.registry import REGISTRY, all_queries

    all_queries()
    lines = [
        "# COVERAGE — SURVEY.md §2 operator inventory → implementation map",
        "",
        "Generated from the query registry (`scripts/gen_coverage.py`).  Check",
        "column: `oracle` = driver t2 hash-compares against the DuckDB SQL;",
        "`rows-only` = non-SQL-expressible (per __spark_entry__ contract),",
        "covered by unit tests instead.",
        "",
        "| query id | module | check |",
        "|---|---|---|",
    ]
    n_oracle = 0
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        mod = spec.fn.__module__.removeprefix("cassandra_syncer_spark.")
        check = "oracle" if spec.oracle else "rows-only"
        n_oracle += bool(spec.oracle)
        lines.append(f"| `{name}` | {mod} | {check} |")
    lines += ["", f"Total: {len(REGISTRY)} queries ({n_oracle} oracle-checked)."]
    rows_only = [n for n in sorted(REGISTRY) if not REGISTRY[n].oracle]
    if rows_only:
        lines += [
            "",
            "## Rows-only queries — why no oracle can exist, and what gates them",
            "",
        ]
        for name in rows_only:
            why = ROWS_ONLY_RATIONALE.get(name, "TODO: document rationale")
            lines.append(f"- **`{name}`** — {why}")
    else:
        lines += [
            "",
            "Every registered query is oracle-checked — no rows-only ids "
            "remain (the last five converted in round 6).",
        ]
    with open("COVERAGE.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"COVERAGE.md: {len(REGISTRY)} queries, {n_oracle} oracle-checked")


if __name__ == "__main__":
    main()
