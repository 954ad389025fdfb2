#!/usr/bin/env python
"""Measure the round-5 queries at sf0.1 vs the 10× replica (SCALING.md).

Protocol matches SCALING.md r5 rows: noop-write forced (full plan,
every output column), one warm run then best-of-2, both scale factors
timed in the SAME session, plan build included.

Run:  PYTHONPATH=. python scripts/measure_r5_scaling.py [names...]
      (default: the round-5 additions)
"""

from __future__ import annotations

import json
import sys
import time

R5_DEFAULT = [
    "corpus_bigram_lm_score",
    "text_diversity_gini",
    "dedup_chunk_exact",
    "join_asof_nearest",
    "agg_countmin_freq",
    "text_contamination_prefiltered",
    "dedup_verify_jaccard",
    "dedup_minhash_salted",
    "scan_orc_roundtrip",
]


def main() -> None:
    names = sys.argv[1:] or R5_DEFAULT
    from cassandra_syncer_spark.registry import REGISTRY, all_queries
    from cassandra_syncer_spark.session import get_spark

    all_queries()
    spark = get_spark(app_name="r5-scaling", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def noop_time(name: str, sf_dir: str) -> float:
        t0 = time.monotonic()
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    out = {}
    for name in names:
        row = {}
        for tag, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("10x", "/tmp/sf1_replica")):
            noop_time(name, sf_dir)  # warm
            row[tag] = round(min(noop_time(name, sf_dir), noop_time(name, sf_dir)), 4)
        row["ratio"] = round(row["10x"] / row["sf0.1"], 2)
        out[name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
