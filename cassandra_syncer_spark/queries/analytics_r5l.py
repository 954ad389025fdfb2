"""Round-5 batch 12: running distinct counts and concentration metrics.

`win_running_distinct` shows the standard rewrite for a window Spark
cannot express directly (COUNT(DISTINCT) over a running frame is
unsupported): mark each key's FIRST occurrence with a rank-1 flag, then
running-sum the flags — two windows over the same sorted shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register


@register(
    "win_running_distinct",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, event_type,
             epoch_ns(ts) // 1000000000 AS sec
      FROM events
    ),
    f AS (
      SELECT user_id, event_id, sec,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY sec, event_id) = 1
             THEN 1 ELSE 0 END AS first_seen
      FROM s
    )
    SELECT user_id, event_id,
           CAST(sum(first_seen) OVER (
             PARTITION BY user_id ORDER BY sec, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_so_far
    FROM f
    WHERE user_id % 29 = 0
    ORDER BY user_id, sec, event_id
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) — how many distinct event types each user
    has touched up to each event (the engagement-breadth curve) — a
    frame no SQL engine supports directly.  The standard rewrite: flag
    each (user, type)'s first occurrence (rank-1 window), then
    running-sum the flags; both windows sort by the same (user, time)
    key, so the plan pays ONE sorted shuffle.  Output restricted to a
    deterministic user sample (id % 29) to keep the driver compare
    row-bounded; the dataflow itself is full-corpus.

    Scale shape: two windows over one user_id-sorted exchange — the
    flag window partitions by (user, type) but sorts within the same
    user runs; row volume is the event count, never expanded.
    """
    s = T(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts_ns div 1000000000").alias("sec")
    )
    w_first = Window.partitionBy("user_id", "event_type").orderBy("sec", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        s.withColumn(
            "first_seen", (F.row_number().over(w_first) == 1).cast("int")
        )
        .withColumn("n_types_so_far", F.sum("first_seen").over(w_run).cast("long"))
        .filter(F.col("user_id") % 29 == 0)
        .select("user_id", "event_id", "n_types_so_far")
        .orderBy("user_id", "event_id")
    )


@register(
    "events_gini_concentration",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY user_id
    ),
    r AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, user_id) AS rk,
             count(*) OVER () AS n,
             CAST(sum(cents) OVER () AS BIGINT) AS total
      FROM u
    )
    SELECT CAST(max(n) AS BIGINT) AS n_users,
           CAST(max(total) AS BIGINT) AS total_cents,
           round((2.0 * CAST(sum(rk * cents) AS DOUBLE))
                 / (CAST(max(n) AS DOUBLE) * CAST(max(total) AS DOUBLE))
                 - (CAST(max(n) AS DOUBLE) + 1) / CAST(max(n) AS DOUBLE), 6)
             AS gini
    FROM r
    """,
)
def events_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user spend — the concentration scalar
    behind "whale" analysis (0 = perfectly even, →1 = one user is the
    whole revenue), computed by the sorted-rank formula
    G = 2·Σ(rank·xᵢ)/(n·Σx) − (n+1)/n.

    Exactness: ranks and integer cents make Σ(rank·xᵢ) an exact bigint
    (order-free), and the final formula is a handful of double ops on
    identical integers — bitwise equal cross-engine, rounded for the
    hash.  Deterministic rank ties broken by user_id.

    Scale shape: one user agg collapse, one global sort-rank window over
    the USER dimension (not events; at extreme user counts the sorted
    rank swaps for a quantile-sketch Lorenz approximation), and a 1-row
    reduce.
    """
    u = (
        T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100.0).cast("long")).cast("long").alias("cents"))
    )
    w = Window.orderBy("cents", "user_id")
    r = u.select(
        "cents",
        F.row_number().over(w).alias("rk"),
    )
    return (
        r.agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.sum(F.col("rk") * F.col("cents")).alias("rx"),
        )
        .select(
            "n_users",
            "total_cents",
            F.round(
                (2.0 * F.col("rx").cast("double"))
                / (F.col("n_users").cast("double") * F.col("total_cents").cast("double"))
                - (F.col("n_users").cast("double") + 1) / F.col("n_users").cast("double"),
                6,
            ).alias("gini"),
        )
    )
