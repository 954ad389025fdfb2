"""Streaming ingest exercised end-to-end as a checkable query —
SURVEY.md §2.9 ``stream_file_source``.

The query stages a deterministic slice of ``events`` as JSON files (the
"SSTables appearing in a watched directory"), drains them through a real
Structured Streaming file source (availableNow trigger → memory sink), and
returns the aggregated result — so the driver's oracle can check actual
streaming output against plain SQL over the same rows.
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
    "stream_file_source",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events
    WHERE event_type = 'click'
    GROUP BY user_id % 10
    """,
)
def stream_file_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-file streaming ingest (inotify IN_MOVED_TO analog,
    bin/cassandra-syncer:195-206): stage → readStream → windowless agg →
    memory sink, drained with availableNow.

    The checkpoint's seen-files log gives exactly-once ingest of each
    staged file — the reference's only-new-files invariant
    (bin/cassandra-syncer:268-277) for free.
    """
    # pid-scoped so concurrent driver processes never share state
    stage = os.path.join(tempfile.gettempdir(), f"css_stream_stage_{os.getpid()}")
    ckpt = os.path.join(tempfile.gettempdir(), f"css_stream_ckpt_{os.getpid()}")
    for d in (stage, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    clicks = (
        T(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "props")
    )
    clicks.coalesce(4).write.mode("overwrite").json(stage)

    stream = (
        spark.readStream.format("json")
        .schema("event_id long, user_id long, props string")
        .option("maxFilesPerTrigger", 2)
        .load(stage)
    )
    agg = (
        stream.withColumn("k", F.from_json("props", "struct<k:int>").getField("k"))
        .groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").cast("long").alias("sum_k"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("css_stream_file_source")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("css_stream_file_source")
