"""Round-7 batch 9 — the stream-stream interval join driven end to end
as a checked query (closing the last prose-only §2.9 row).

Reference parity note: the reference's watch loop (bin/cassandra-syncer:
195-206) is a single-stream pipeline; stream-stream correlation is an
analytics extension, checked here against batch SQL.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register


@register(
    "stream_stream_interval_join",
    oracle="""
    WITH c AS (
      SELECT event_id AS c_id, user_id, epoch_us(ts) AS c_us
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT c.user_id, c.c_id, p.p_id
      FROM c JOIN p ON c.user_id = p.user_id
       AND p.p_us >= c.c_us
       AND p.p_us <= c.c_us + CAST(3600 AS BIGINT) * 1000000
    )
    SELECT user_id % 10 AS user_bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT c_id) AS BIGINT) AS n_clicks_converted,
           CAST(sum(c_id + p_id) AS BIGINT) AS id_sum
    FROM j GROUP BY 1 ORDER BY 1
    """,
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM INTERVAL JOIN driven end to end — the §2.9
    correlation row as a checked query, not prose: clicks and purchases
    arrive as two independent file streams, and a purchase matches a
    click from the same user within the following hour.  Both sides
    carry watermarks and the join condition carries the time range —
    the two facts Structured Streaming needs to evict buffered rows
    once they can never match again (unbounded join state is the first
    OOM at 100 TB of stream history; the eviction contract is what
    distinguishes this from a batch join).  Inner-join rows emit as
    soon as both sides arrive; the drained append output aggregates to
    per-user-bucket conversion counts, value-checked against the batch
    interval-join oracle.

    The id_sum column certifies the matched PAIR SET, not just its
    cardinality; n_clicks_converted checks the distinct-click
    projection (a click can convert more than once in the hour).
    """
    from cassandra_syncer_spark.streaming.watch import stream_interval_join

    stage = os.path.join(tempfile.gettempdir(), f"css_ssj_stage_{os.getpid()}")
    ckpt = os.path.join(tempfile.gettempdir(), f"css_ssj_ckpt_{os.getpid()}")
    for d in (stage, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    ev = T(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("us"), "event_type"
    )
    (
        ev.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "us")
        .repartition(2)
        .write.mode("overwrite")
        .json(os.path.join(stage, "clicks"))
    )
    (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "us")
        .repartition(2)
        .write.mode("overwrite")
        .json(os.path.join(stage, "purchases"))
    )

    def src(sub: str, prefix: str) -> DataFrame:
        raw = (
            spark.readStream.format("json")
            .schema("event_id long, user_id long, us long")
            .load(os.path.join(stage, sub))
        )
        return raw.select(
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("user_id").alias(f"{prefix}_user"),
            F.timestamp_micros(F.col("us")).alias(f"{prefix}_ts"),
        )

    joined = stream_interval_join(
        src("clicks", "c"),
        src("purchases", "p"),
        left_key="c_user",
        right_key="p_user",
        left_ts="c_ts",
        right_ts="p_ts",
        within="1 hour",
        watermark="30 minutes",
    )
    q = (
        joined.select("c_user", "c_id", "p_id")
        .writeStream.format("memory")
        .queryName("css_stream_stream_join")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table("css_stream_stream_join")
        .groupBy((F.col("c_user") % 10).alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("c_id").cast("long").alias("n_clicks_converted"),
            F.sum(F.col("c_id") + F.col("p_id")).cast("long").alias("id_sum"),
        )
        .orderBy("user_bucket")
    )
