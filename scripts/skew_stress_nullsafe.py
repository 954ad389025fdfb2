"""Null-key skew stress: measure the naive null-safe (`<=>`) join against
the SPLIT-NULL-PARTITION rewrite join_null_safe_keys's docstring prescribes
for null-heavy keys at 100 TB.

The hazard: EqualNullSafe hashes every NULL key into ONE bucket, so a
null-heavy side turns the shuffled hash join into a single straggler task
(AQE's skew split cannot help: it is one key, and splitting the build side
duplicates the whole null partition).  The rewrite joins only the non-null
remainder (well-distributed keys) and handles the null partition as its own
bounded stage — here the count form (null × null is a metadata multiply);
the row-returning form is a partition-local cross of two small spools.

Run:  PYTHONPATH=. python scripts/skew_stress_nullsafe.py
Evidence recorded in SCALING.md.
"""

import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from cassandra_syncer_spark.session import get_spark

spark = get_spark(app_name="nullskew-stress")
spark.sparkContext.setLogLevel("ERROR")

# 40% of the 8M-row big side carries a NULL key; the rest spread evenly
big = spark.range(8_000_000).select(
    F.when(F.col("id") % 5 < 2, F.lit(None).cast("long"))
    .otherwise(F.pmod(F.xxhash64("id"), F.lit(200_000)))
    .alias("k")
)
small = spark.range(200_000).select(
    F.when(F.col("id") % 50 == 0, F.lit(None).cast("long"))
    .otherwise(F.col("id"))
    .alias("rk")
)
big.write.mode("overwrite").parquet("/tmp/nullskew_big")
small.write.mode("overwrite").parquet("/tmp/nullskew_small")
bigp = spark.read.parquet("/tmp/nullskew_big")
smallp = spark.read.parquet("/tmp/nullskew_small")

# force the skewed shuffle shape: no broadcast escape, no AQE skew split
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def naive():
    # every NULL on both sides meets in one hash bucket = one task
    return (
        bigp.join(smallp, F.col("k").eqNullSafe(F.col("rk")))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()[0]
        .n
    )


def split():
    # non-null remainder: a well-distributed equi join; null partition:
    # a metadata multiply (count form of the partition-local cross)
    nn = (
        bigp.filter(F.col("k").isNotNull())
        .join(smallp.filter(F.col("rk").isNotNull()), F.col("k") == F.col("rk"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    nl = bigp.filter(F.col("k").isNull()).agg(F.count(F.lit(1)).alias("a"))
    nr = smallp.filter(F.col("rk").isNull()).agg(F.count(F.lit(1)).alias("b"))
    row = (
        nn.crossJoin(F.broadcast(nl))
        .crossJoin(F.broadcast(nr))
        .select((F.col("n") + F.col("a") * F.col("b")).alias("n"))
        .collect()[0]
    )
    return row.n


# --- row-returning forms -----------------------------------------------
# The ROW experiment sizes its null block separately: at the count-form's
# 40% × 2% null rates the `<=>` join's OUTPUT is 12.8B rows (3.2M left
# nulls × 4k right nulls) — materializing that repeatedly measures row
# production volume, not plan shape.  Here 5% × 0.05% nulls give a 40M-row
# null block (400k × 100): big enough that the naive plan's single null
# bucket is the dominant task, small enough to materialize best-of-2.
big_r = spark.range(8_000_000).select(
    F.when(F.col("id") % 20 == 0, F.lit(None).cast("long"))
    .otherwise(F.pmod(F.xxhash64("id"), F.lit(200_000)))
    .alias("k")
)
small_r = spark.range(200_000).select(
    F.when(F.col("id") % 2000 == 0, F.lit(None).cast("long"))
    .otherwise(F.col("id"))
    .alias("rk")
)
big_r.write.mode("overwrite").parquet("/tmp/nullskew_big_r")
small_r.write.mode("overwrite").parquet("/tmp/nullskew_small_r")
bigrp = spark.read.parquet("/tmp/nullskew_big_r")
smallrp = spark.read.parquet("/tmp/nullskew_small_r")


def naive_rows():
    # the ROW-returning naive form: the full `<=>` join materialized
    # (noop write — no driver collect), every null pair produced by the
    # single-bucket task
    df = bigrp.join(smallrp, F.col("k").eqNullSafe(F.col("rk"))).select(
        F.coalesce(F.col("k"), F.lit(-1)).alias("join_key")
    )
    df.write.format("noop").mode("overwrite").save()
    return None


def split_rows():
    # the registered join_null_safe_rows shape: non-null equi join UNION
    # the null-left rows crossing the BROADCAST null-right spool
    # partition-locally — null keys never shuffle, null-row production
    # parallelizes across the left partitions
    equi = (
        bigrp.filter(F.col("k").isNotNull())
        .join(smallrp.filter(F.col("rk").isNotNull()), F.col("k") == F.col("rk"))
        .select(F.col("k").alias("join_key"))
    )
    nulls = (
        bigrp.filter(F.col("k").isNull())
        .select(F.lit(-1).cast("long").alias("join_key"))
        .crossJoin(
            F.broadcast(
                smallrp.filter(F.col("rk").isNull()).select(
                    F.lit(1).alias("one")
                )
            )
        )
        .select("join_key")
    )
    equi.unionByName(nulls).write.format("noop").mode("overwrite").save()
    return None


# warm both paths once, then best-of-2
naive(), split()
n1, t_naive = timed(naive)
n1b, t_naive2 = timed(naive)
n2, t_split = timed(split)
n2b, t_split2 = timed(split)
assert n1 == n2 == n1b == n2b, (n1, n2)
# one-time output-equality check between the two row-form recipes (the
# count forms assert n1 == n2 above; without this a drift in either row
# recipe would silently make rows_speedup compare different work)
_nrows_cnt = (
    bigrp.join(smallrp, F.col("k").eqNullSafe(F.col("rk"))).count()
)
_srows_cnt = (
    bigrp.filter(F.col("k").isNotNull())
    .join(smallrp.filter(F.col("rk").isNotNull()), F.col("k") == F.col("rk"))
    .count()
    + bigrp.filter(F.col("k").isNull()).count()
    * smallrp.filter(F.col("rk").isNull()).count()
)
assert _nrows_cnt == _srows_cnt, (_nrows_cnt, _srows_cnt)

naive_rows(), split_rows()
_, t_nrows = timed(naive_rows)
_, t_nrows2 = timed(naive_rows)
_, t_srows = timed(split_rows)
_, t_srows2 = timed(split_rows)
print(
    {
        "rows_match": n1,
        "naive_null_safe_s": min(t_naive, t_naive2),
        "split_null_partition_s": min(t_split, t_split2),
        "speedup": round(min(t_naive, t_naive2) / min(t_split, t_split2), 1),
        "naive_rows_s": min(t_nrows, t_nrows2),
        "split_rows_s": min(t_srows, t_srows2),
        "rows_speedup": round(
            min(t_nrows, t_nrows2) / min(t_srows, t_srows2), 1
        ),
    }
)

# --- both-spools-past-cap: the block-chunked NULL×NULL escape -----------
# join_null_safe_rows broadcasts the smaller null spool whole while it
# fits the cap; when BOTH spools outgrow it the cross must block-chunk
# (analytics_r10._chunked_null_cross): the smaller spool splits into
# key-modulus chunks of <= cap rows, each broadcast against the bigger
# spool partition-locally.  2M × 200 null rows with the cap forced to 50
# → 4 broadcast chunks, 400M output rows; measured against the
# whole-spool broadcast of the SAME spools (the legal plan at this size),
# so the delta IS the chunking overhead.  The naive `<=>` contrast for
# the null block is the row-form pair above (single bucket).
from cassandra_syncer_spark.queries.analytics_r10 import _chunked_null_cross

big_null = spark.range(2_000_000).select(F.col("id").alias("o_orderkey"))
small_null = spark.range(200).select(F.col("id").alias("c_custkey"))
big_null.write.mode("overwrite").parquet("/tmp/nullskew_bigspool")
small_null.write.mode("overwrite").parquet("/tmp/nullskew_smallspool")
bspool = spark.read.parquet("/tmp/nullskew_bigspool")
sspool = spark.read.parquet("/tmp/nullskew_smallspool")
CAP = 50
N_SMALL = sspool.count()
N_CHUNKS = -(-N_SMALL // CAP)

chunked_df = _chunked_null_cross(bspool, sspool, "c_custkey", N_SMALL, CAP)
# output identity + plan laws before timing: the chunked cross produces
# exactly |big| x |small| rows, through N_CHUNKS broadcast crosses, with
# no CartesianProduct and NO hash shuffle anywhere (the single-bucket
# null straggler is structurally impossible at any spool size)
assert chunked_df.count() == bspool.count() * N_SMALL
_plan = chunked_df._jdf.queryExecution().executedPlan().toString()
assert "CartesianProduct" not in _plan, _plan
assert "hashpartitioning" not in _plan, _plan
assert (
    sum(
        1
        for ln in _plan.splitlines()
        if "BroadcastNestedLoopJoin" in ln and "Cross" in ln
    )
    == N_CHUNKS
), _plan


def whole_broadcast_spool():
    bspool.crossJoin(F.broadcast(sspool)).write.format("noop").mode(
        "overwrite"
    ).save()


def chunked_spool():
    _chunked_null_cross(bspool, sspool, "c_custkey", N_SMALL, CAP).write.format(
        "noop"
    ).mode("overwrite").save()


whole_broadcast_spool(), chunked_spool()
_, t_whole = timed(whole_broadcast_spool)
_, t_whole2 = timed(whole_broadcast_spool)
_, t_chunk = timed(chunked_spool)
_, t_chunk2 = timed(chunked_spool)
print(
    {
        "chunked_cross_rows": 2_000_000 * N_SMALL,
        "n_chunks": N_CHUNKS,
        "whole_broadcast_s": min(t_whole, t_whole2),
        "chunked_s": min(t_chunk, t_chunk2),
        "chunk_overhead_x": round(
            min(t_chunk, t_chunk2) / min(t_whole, t_whole2), 2
        ),
    }
)
spark.stop()
