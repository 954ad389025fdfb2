#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for named registry queries to files.

Usage: python scripts/dump_plans.py <out_dir> <suffix> <query_id> [...]

Writes ``<out_dir>/<query_id>_<suffix>.txt`` per id — the round-11
optimization evidence files (plans/r11/<q>_before.txt / _after.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix, *ids = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    from cassandra_syncer_spark.registry import REGISTRY, all_queries
    from cassandra_syncer_spark.session import get_spark

    all_queries()
    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for qid in ids:
        df = REGISTRY[qid].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{qid}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
