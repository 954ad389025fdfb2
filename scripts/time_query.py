#!/usr/bin/env python
"""Time named registry queries with the bench's methodology (noop write,
warm once, best-of-2) in a fresh session — the per-query iteration loop for
optimization work, without paying the full bench's vanilla staging.

Usage: python scripts/time_query.py <query_id> [...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ids = sys.argv[1:]
    from cassandra_syncer_spark.registry import REGISTRY, all_queries
    from cassandra_syncer_spark.session import get_spark

    all_queries()
    spark = get_spark(app_name="time-query")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def noop_time(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for qid in ids:
        spark.sparkContext.setJobDescription(qid)
        df = REGISTRY[qid].fn(spark, sf_dir)
        noop_time(df)  # warm
        best = min(noop_time(df), noop_time(df))
        print(f"{qid}: {best:.4f}s")
    spark.stop()


if __name__ == "__main__":
    main()
