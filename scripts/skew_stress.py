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

# ---------------------------------------------------------------------------
# LSH hot-band pair expansion: plain bucket-local self-join vs
# salted_self_pairs under ONE planted hot band bucket (8k ids → 32M pairs
# on a single join task for the plain shape).  Evidence for the cap rule
# documented in operators/skew.py / _minhash_pairs.
# ---------------------------------------------------------------------------
from cassandra_syncer_spark.operators.skew import salted_self_pairs  # noqa: E402

HOT, COLD_BUCKETS, COLD_SZ = 40_000, 20_000, 4
bands = (
    spark.range(HOT + COLD_BUCKETS * COLD_SZ)
    .select(
        F.when(F.col("id") < HOT, F.lit(-1))
        .otherwise((F.col("id") - HOT) % COLD_BUCKETS)
        .alias("band_key"),
        F.col("id").alias("doc_id"),
    )
)
bands.write.mode("overwrite").parquet("/tmp/skew_bands")
bandsp = spark.read.parquet("/tmp/skew_bands")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")


def plain_pairs():
    a, b = bandsp.alias("a"), bandsp.alias("b")
    return a.join(
        b,
        (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.band_key").alias("band_key"))


def salted_pairs():
    return salted_self_pairs(bandsp, key_cols=["band_key"], id_col="doc_id", cap=2_000)


expect = HOT * (HOT - 1) // 2 + COLD_BUCKETS * (COLD_SZ * (COLD_SZ - 1) // 2)
for name, fn in [("plain_pairs", plain_pairs), ("salted_pairs", salted_pairs)]:
    n = fn().count()  # warm + correctness
    assert n == expect, f"{name}: {n} != {expect}"
    t = min(
        (lambda: (lambda t0: (fn().count(), time.perf_counter() - t0))(time.perf_counter()))()[1]
        for _ in range(2)
    )
    print(f"{name}: {t:.2f} s  ({n} pairs, hot bucket {HOT})")

spark.stop()
