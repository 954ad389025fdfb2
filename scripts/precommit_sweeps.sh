#!/usr/bin/env bash
# Pre-commit gate for query batches (SURVEY.md §5.6): the two full-registry
# robustness sweeps that caught both round-7 batch-22 defects, plus any
# extra test paths passed as arguments (the new batch's parity/plan tests).
#
#   scripts/precommit_sweeps.sh [extra pytest args...]
#
# ~6 min on local[32].  No batch commit without a green run of this script.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest \
  tests/test_r5_properties.py::test_all_queries_survive_empty_tables \
  tests/test_r7_fixes.py::test_all_queries_survive_degenerate_docs \
  "$@" -q
