"""Skew stress: measure salted_join vs plain shuffle join on a corpus
where one key owns 50% of the big side (the shape AQE's skew-join split
cannot fix when broadcast is unavailable and the plan is a shuffled hash
join feeding an agg).  Evidence for SCALING.md."""
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from cassandra_syncer_spark.operators.skew import salted_join
from cassandra_syncer_spark.session import get_spark

spark = get_spark(app_name="skew-stress")
spark.sparkContext.setLogLevel("ERROR")

# hot key 0 owns 50% of 4M rows; the rest spread over 100k keys
big = spark.range(16_000_000).select(
    F.when(F.col("id") % 2 == 0, F.lit(0))
    .otherwise(F.pmod(F.xxhash64("id"), F.lit(100_000)))
    .alias("k"),
    (F.col("id") % 97).alias("payload"),
)
small = spark.range(100_000).select(
    F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
)
big.write.mode("overwrite").parquet("/tmp/skew_big")
small.write.mode("overwrite").parquet("/tmp/skew_small")
bigp = spark.read.parquet("/tmp/skew_big")
smallp = spark.read.parquet("/tmp/skew_small")

# force the skewed shuffle shape: no broadcast escape, no AQE skew split
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")


def noop_time(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def plain():
    return (
        bigp.join(smallp, "k")
        .groupBy("grp")
        .agg(F.sum("payload").alias("s"), F.count(F.lit(1)).alias("n"))
    )


def salted():
    return (
        salted_join(bigp, smallp, on="k", salt=8)
        .groupBy("grp")
        .agg(F.sum("payload").alias("s"), F.count(F.lit(1)).alias("n"))
    )


# correctness first: identical results
a = {tuple(r) for r in plain().collect()}
b = {tuple(r) for r in salted().collect()}
assert a == b, "salted join changed the result!"

for name, fn in [("plain", plain), ("salted", salted)]:
    fn_df = fn()
    noop_time(fn_df)  # warm
    t = min(noop_time(fn()), noop_time(fn()))
    print(f"{name}: {t:.2f} s")

spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
spark.stop()
