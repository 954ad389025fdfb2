#!/usr/bin/env python
"""Build an N× replica of sf0.1 for scale-up measurements (SCALING.md).

Each fact table is the union of N key-shifted copies (keys offset by
i*STEP so joins and windows see N× the key space, not N× duplicates of
one key); dimension tables (region/nation/supplier/part) are shared, as
they would be at any scale.  documents/embeddings replicate with shifted
ids but identical content — deliberately: near-dup operators then face a
corpus whose true duplicate count grows with the replica factor, the
adversarial case for banding.

Run:  python scripts/make_replica.py [N] [OUT_DIR]
      (defaults: 10 /tmp/sf1_replica)
Then: SPARK_GRAFT_SF_DIR=/tmp/sf1_replica python bench.py
"""

from __future__ import annotations

import sys

SRC = "/root/testdata/sf0.1"
STEP = 100_000_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_replica"

    from pyspark.sql import functions as F

    from cassandra_syncer_spark.session import get_spark

    spark = get_spark(app_name="make-replica")
    spark.sparkContext.setLogLevel("ERROR")

    shifted_keys = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    passthrough = ["region", "nation", "supplier", "part"]

    for name in passthrough:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
    for name, keys in shifted_keys.items():
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(n):
            df = base
            for k in keys:
                df = df.withColumn(k, (F.col(k) + F.lit(i * STEP)).cast(dict(base.dtypes)[k]))
            parts.append(df)
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.unionByName(p)
        acc.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(name, "rows:", spark.read.parquet(f"{out}/{name}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
