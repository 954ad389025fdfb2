"""Skew stress for the class-balance samplers: one class owns ~95% of a
20M-row table (5 classes total).  The rank form sorts that class on ONE
task; the histogram-threshold form's per-task work is bounded by
corpus/4096.  Evidence for SCALING.md round-7 batch 2.

Reproduce: PYTHONPATH=. python scripts/skew_stress_balance.py
"""

import os
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.analytics_r7b import (
    sample_balanced_classes,
    sample_balanced_threshold,
)
from cassandra_syncer_spark.session import get_spark

spark = get_spark(app_name="skew-stress-balance")
spark.sparkContext.setLogLevel("ERROR")

OUT = "/tmp/skew_balance_sf"
os.makedirs(OUT, exist_ok=True)

# 20M events; class 'hot' owns 95%, four cold classes share the rest
spark.range(20_000_000).select(
    F.col("id").alias("event_id"),
    F.timestamp_seconds(F.lit(1704067200) + F.col("id") % 86400).alias("ts"),
    (F.col("id") % 1000).alias("user_id"),
    F.when(F.col("id") % 20 != 0, F.lit("hot"))
    .otherwise(
        F.concat(F.lit("cold"), (F.col("id") % 4).cast("string"))
    )
    .alias("event_type"),
    (F.col("id") % 97).cast("double").alias("value"),
).write.mode("overwrite").parquet(f"{OUT}/events.parquet")


def noop_time(fn):
    t0 = time.perf_counter()
    fn(spark, OUT).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


for name, fn in (
    ("rank form (sample_balanced_classes)", sample_balanced_classes),
    ("threshold form (sample_balanced_threshold)", sample_balanced_threshold),
):
    noop_time(fn)  # warm
    best = min(noop_time(fn), noop_time(fn))
    print(f"{name}: {best:.2f} s")

# selections must still be identical under the skew
a = sorted(tuple(r) for r in sample_balanced_classes(spark, OUT).collect())
b = sorted(tuple(r) for r in sample_balanced_threshold(spark, OUT).collect())
assert a == b, "selection drift under skew"
print("identical selections:", a[:2], "...")
spark.stop()
