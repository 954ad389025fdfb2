#!/usr/bin/env python
"""Regenerate COVERAGE.md from the query registry (run after adding
queries so the inventory map never drifts from the code)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


#: why each rows-only query CANNOT have a cross-engine hash oracle, and
#: where its correctness is gated instead
ROWS_ONLY_RATIONALE = {
    "agg_approx_distinct": (
        "HLL++ estimates are engine-specific (DuckDB's HLL yields different "
        "values), so no cross-engine hash can exist.  Accuracy vs exact is "
        "gated by tests/test_operators.py::test_approx_distinct_tracks_exact; "
        "the estimator's envelope is ALSO hash-checked by the companion "
        "`agg_approx_distinct_bounds` oracle row."
    ),
    "agg_percentile_approx": (
        "Greenwald-Khanna sketch values differ from DuckDB's t-digest — no "
        "cross-engine hash.  Gated by tests/test_operators.py::"
        "test_approx_percentile_tracks_exact; rank-error envelope hash-checked "
        "by `agg_percentile_approx_bounds`."
    ),
    "agg_hll_union": (
        "Unioned HLL sketch estimates are engine-specific — no cross-engine "
        "hash.  Gated by tests/test_operators.py::test_hll_union_accuracy "
        "(≤5% vs exact); union envelope hash-checked by `agg_hll_union_bounds`."
    ),
    "sim_ivf_kmeans": (
        "k-means training is iterative and seed-dependent — not expressible "
        "in ANSI SQL.  Recall ≥0.8 vs brute-force cosine is gated by "
        "tests/test_operators.py::test_ivf_recall_both_quantizers."
    ),
    "sim_lsh_ann": (
        "MLlib BucketedRandomProjectionLSH hash tables are seed-dependent "
        "model state — not expressible in ANSI SQL.  Recall ≥0.5 vs "
        "brute-force is gated by tests/test_operators.py::"
        "test_lsh_ann_recall_vs_bruteforce."
    ),
}


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
    lines += [
        "",
        "## Rows-only queries — why no oracle can exist, and what gates them",
        "",
    ]
    for name in rows_only:
        why = ROWS_ONLY_RATIONALE.get(name, "TODO: document rationale")
        lines.append(f"- **`{name}`** — {why}")
    with open("COVERAGE.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"COVERAGE.md: {len(REGISTRY)} queries, {n_oracle} oracle-checked")


if __name__ == "__main__":
    main()
