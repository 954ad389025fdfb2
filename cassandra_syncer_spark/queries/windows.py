"""Window functions — SURVEY.md §2.5, plus batch analogs of §2.9 streaming
windows (tumbling / sliding / session).

Determinism discipline: every ORDER BY inside a window carries a unique
tiebreaker (event_id / custkey), and event timestamps are compared as
second-truncated epoch integers (exact in both engines; the raw ns values
lose precision crossing Spark's µs representation — FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register


def events_with_sec(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "events").withColumn("ts_sec", F.expr("ts_ns div 1000000000"))


@register(
    "win_rownum_latest",
    oracle="""
    SELECT user_id, event_id, event_type, ts_sec
    FROM (
      SELECT user_id, event_id, event_type,
             epoch_ns(ts) // 1000000000 AS ts_sec,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY epoch_ns(ts) // 1000000000 DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def win_rownum_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key via ranking window (the latest-manifest pick).

    Reference: sort + take-last (bin/cassandra-syncer-restore:82-89).
    row_number over (ts DESC, id DESC) — one shuffle on the key; at scale
    prefer max_by (see max_by_key) unless the whole winning row is needed.
    """
    ev = events_with_sec(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts_sec"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts_sec")
    )


@register(
    "win_rank_dense",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_rank,
           dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_dense,
           ntile(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile per market segment.

    ntile's ORDER BY carries the custkey tiebreaker: tile assignment is
    positional, so ties without a tiebreaker are nondeterministic.
    """
    cust = T(spark, sf_dir, "customer")
    w_val = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    w_pos = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w_val).cast("long").alias("bal_rank"),
        F.dense_rank().over(w_val).cast("long").alias("bal_dense"),
        F.ntile(4).over(w_pos).cast("long").alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts_sec,
           ts_sec - lag(ts_sec)  OVER w AS gap_sec,
           lead(event_id) OVER w AS next_event_id,
           round(value - lag(value) OVER w, 4) AS value_delta
    FROM (SELECT event_id, user_id, value,
                 epoch_ns(ts) // 1000000000 AS ts_sec FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: inter-event gaps and next-event lookahead."""
    ev = events_with_sec(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts_sec",
        (F.col("ts_sec") - F.lag("ts_sec").over(w)).alias("gap_sec"),
        F.lead("event_id").over(w).alias("next_event_id"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("value_delta"),
    )


@register(
    "win_running_frame",
    oracle="""
    SELECT event_id, user_id, ts_sec,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS moving_avg3
    FROM (SELECT event_id, user_id, value,
                 epoch_ns(ts) // 1000000000 AS ts_sec FROM events)
    """,
)
def win_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame specs: running total + 3-row moving average (BASELINE.md row 4)."""
    ev = events_with_sec(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2
        ).alias("running_total"),
        F.round(F.avg("value").over(w.rowsBetween(-2, Window.currentRow)), 4).alias("moving_avg3"),
    )


# ---------------------------------------------------------------------------
# §2.9 streaming-window batch analogs (the streaming forms live in
# cassandra_syncer_spark/streaming/; these are the SQL-checkable shapes)
# ---------------------------------------------------------------------------


@register(
    "win_tumbling",
    oracle="""
    SELECT event_type,
           (epoch_ns(ts) // 1000000000) // 3600 * 3600 AS window_start_sec,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch analog of
    groupBy(window(ts, '1 hour')); the streaming twin is
    streaming/windows.py::tumbling_counts)."""
    ev = events_with_sec(spark, sf_dir)
    return (
        ev.withColumn("window_start_sec", (F.col("ts_sec") / 3600).cast("long") * 3600)
        .groupBy("event_type", "window_start_sec")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "win_sliding",
    oracle="""
    SELECT event_type,
           (epoch_ns(ts) // 1000000000) // 900 * 900 - k.k * 900 AS window_start_sec,
           count(*) AS n
    FROM events, (SELECT unnest(range(4)) AS k) k
    GROUP BY 1, 2
    """,
)
def win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour width, 15-minute slide (each event lands in 4
    windows).  Spark's window() generates the same window set; the oracle
    reproduces it with an explicit 0..3 slot cross join."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            F.unix_timestamp(F.col("w.start")).alias("window_start_sec"),
            "n",
        )
    )


@register(
    "win_session",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, value, epoch_ns(ts) // 1000000000 AS ts_sec
      FROM events
    ), gaps AS (
      SELECT *, CASE WHEN ts_sec - lag(ts_sec) OVER w > 1800 OR
                          lag(ts_sec) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
    ), sessions AS (
      SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id,
           min(ts_sec) AS session_start_sec,
           max(ts_sec) AS session_end_sec,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) via the lag-gap → cumulative-sum
    formulation — identical SQL shape in both engines, exact on integer
    seconds.  The native streaming form (session_window) lives in
    streaming/windows.py; this batch formulation is also the scalable one:
    two window passes over one shuffle by user_id.
    """
    ev = events_with_sec(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts_sec", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = ev.withColumn(
        "is_new",
        F.when(
            (F.col("ts_sec") - F.lag("ts_sec").over(w) > 1800)
            | F.lag("ts_sec").over(w).isNull(),
            1,
        ).otherwise(0),
    ).withColumn("session_id", F.sum("is_new").over(run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts_sec").alias("session_start_sec"),
        F.max("ts_sec").alias("session_end_sec"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "win_first_last",
    oracle="""
    SELECT event_id, user_id,
           first_value(event_id) OVER w AS first_event,
           last_value(event_id)  OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING) AS last_event,
           nth_value(event_id, 2) OVER w AS second_event
    FROM (SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_sec FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value — frame-edge navigation.

    last_value needs the full-partition frame (the default frame ends at
    CURRENT ROW, a classic silent-wrong-answer); nth_value runs on the
    growing frame like first_value.
    """
    ev = events_with_sec(spark, sf_dir)
    w_grow = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_id").over(w_grow).alias("first_event"),
        F.last("event_id").over(w_full).alias("last_event"),
        F.nth_value("event_id", 2).over(w_grow).alias("second_event"),
    )
