#!/usr/bin/env python
"""Re-measure the BASELINE.md vanilla-PySpark queries under BOTH forcing
methods, like-for-like with bench.py.

Why: BASELINE.md (survey session) forced queries with ``count()``, under
which Catalyst prunes every output column a count doesn't need — for the
window row that deletes the window computation itself, so the published
0.07 s measures a shell of the query.  bench.py forces a noop write of
every output column (the honest cost of producing the result).  Comparing
those two methods against each other produced the round-1 "weak" rows.
This script produces the apples-to-apples table: each baseline query,
vanilla PySpark (no engine code), original config (local[8],
shuffle.partitions=16), forced both ways, best of 3 warm runs.

Run:  python scripts/measure_baseline.py   (writes BASELINE_REMEASURE.json)
"""

from __future__ import annotations

import json
import time

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("baseline-remeasure")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vanilla_queries import build_vanilla_queries

    dfs = build_vanilla_queries(spark, SF_DIR)

    def best_of_3(force) -> float:
        force()  # warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            force()
            times.append(time.perf_counter() - t0)
        return round(min(times), 4)

    out: dict[str, dict[str, float]] = {}
    for name, df in dfs.items():
        out[name] = {
            "count_forced": best_of_3(lambda: df.count()),
            "noop_write_forced": best_of_3(
                lambda: df.write.format("noop").mode("overwrite").save()
            ),
        }
        print(name, out[name])

    with open("BASELINE_REMEASURE.json", "w") as fh:
        json.dump({"sf_dir": SF_DIR, "config": "local[8], shuffle=16", "queries": out}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
