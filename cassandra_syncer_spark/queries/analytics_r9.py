"""Round-9 batch 1 — the split-null-partition join (the measured 23.9×
skew rewrite, promoted from scripts/skew_stress_nullsafe.py into a
registered, hash-checked query) and the STRICT watermark contract (late
input actually dropped), pinning both admission semantics by oracle.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.analytics_r7w import _NULL_L, _NULL_R
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.queries.staging import cleanup, stage_dir, unique_token
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# join_null_safe_split — the production rewrite of the null-safe join
# ---------------------------------------------------------------------------


def _null_safe_oracle() -> str:
    # same statistic as join_null_safe_keys — reuse its oracle VERBATIM
    # (single source of truth; analytics_r7w registers before this module)
    from cassandra_syncer_spark.registry import REGISTRY

    return REGISTRY["join_null_safe_keys"].oracle


@register("join_null_safe_split", oracle=_null_safe_oracle())
def join_null_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-NULL-PARTITION null-safe join — the 100 TB rewrite
    `join_null_safe_keys` documents, now REGISTERED and hash-checked
    against the same oracle: `<=>` hashes every NULL key into ONE
    bucket, the canonical skew key AQE cannot split (it is a single
    key; replicating the build side duplicates the whole null
    partition).  The rewrite joins only the NON-NULL remainder (well-
    distributed keys, plain equi join) and handles the null partition
    as its own bounded stage — for the count form a metadata multiply
    (n_left_null × n_right_null); a row-returning form is a partition-
    local cross of two small spools.  Measured 23.9× over the naive
    `<=>` plan on the 8M-row 40%-null stress
    (scripts/skew_stress_nullsafe.py, SCALING.md "null-key skew").

    Identical output contract to `join_null_safe_keys` (same oracle
    text): n_null_safe is DERIVED as n_equi + n_left_null·n_right_null
    rather than joined — the algebraic identity the keys query proves.

    Scale shape: two null-count aggs fold into the scans; ONE shuffled
    equi join on pre-filtered non-null keys (isnotnull reaches the
    parquet scan — plan-asserted, along with the absence of any
    EqualNullSafe operator); the scalar assembly is broadcast 1-row
    crosses.  No single-bucket null shuffle anywhere.
    """
    l = T(spark, sf_dir, "orders").select(
        F.expr(
            f"CASE WHEN o_orderkey % {_NULL_L} = 0 THEN NULL ELSE o_custkey END"
        ).alias("k")
    )
    r = T(spark, sf_dir, "customer").select(
        F.expr(
            f"CASE WHEN c_custkey % {_NULL_R} = 0 THEN NULL ELSE c_custkey END"
        ).alias("rk")
    )
    n_l = l.agg(
        (F.count(F.lit(1)) - F.count("k")).cast("long").alias("n_left_null")
    )
    n_r = r.agg(
        (F.count(F.lit(1)) - F.count("rk")).cast("long").alias("n_right_null")
    )
    n_equi = (
        l.filter(F.col("k").isNotNull())
        .join(r.filter(F.col("rk").isNotNull()), F.col("k") == F.col("rk"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_equi"))
    )
    return (
        n_equi.crossJoin(F.broadcast(n_l))
        .crossJoin(F.broadcast(n_r))
        .select(
            "n_left_null",
            "n_right_null",
            "n_equi",
            (F.col("n_equi") + F.col("n_left_null") * F.col("n_right_null"))
            .cast("long")
            .alias("n_null_safe"),
            (F.col("n_left_null") * F.col("n_right_null"))
            .cast("long")
            .alias("n_null_matches"),
        )
    )


# ---------------------------------------------------------------------------
# stream_watermark_strict — the drop-late-input watermark contract
# ---------------------------------------------------------------------------

_WM_HORIZON_US = 7 * 86400 * 1_000_000  # 7-day lateness horizon, micros


@register(
    "stream_watermark_strict",
    oracle="""
    WITH ontime AS (
      SELECT epoch_us(ts) AS us FROM events WHERE event_id % 7 != 0
    ),
    wm AS (
      SELECT max(us) - CAST(7 AS BIGINT) * 86400 * 1000000 AS w FROM ontime
    ),
    b AS (
      SELECT (us // (CAST(7 AS BIGINT) * 86400 * 1000000))
               * CAST(7 AS BIGINT) * 86400 * 1000000 AS ws,
             count(*) AS n
      FROM ontime GROUP BY 1
    )
    SELECT CAST(ws // 1000000 AS BIGINT) AS window_start_sec,
           CAST(n AS BIGINT) AS n
    FROM b, wm
    WHERE ws + CAST(7 AS BIGINT) * 86400 * 1000000 <= wm.w
    ORDER BY window_start_sec
    """,
)
def stream_watermark_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STRICT watermark contract — `stream_watermark_finalize`'s
    measured-semantics note made an operator: this build's engine
    ADMITS below-watermark input (late rows re-create evicted windows
    and re-emit corrections), so pipelines needing HARD drops must
    filter explicitly.  Here the drop is real and checked: stage 1 is
    the documented foreachBatch admission gate — it maintains the
    watermark by the engine's own rule (batch N filters with the
    watermark from the END of batch N−1; max event time − horizon) and
    drops below-watermark rows before they reach state; stage 2 is the
    SAME real windowed streaming aggregation as the finalize query,
    over only the admitted rows.  Same two mtime-ordered micro-batches
    (on-time slice, then a slice shifted 60 days late — entirely below
    the post-batch-1 watermark, so strictness drops ALL of it).

    The two oracles now LOCK both semantics: finalize's includes the
    late slice in closed-window counts (admit-and-correct), this one
    excludes it (strict drop) — divergence in either direction
    hash-mismatches.

    Scale shape: the admission gate is a stateless per-batch filter
    (one metadata-sized max per micro-batch maintains the watermark
    driver-side, exactly what the engine's WatermarkTracker does); the
    aggregation state stays one count per open window.  Nothing is
    O(history).
    """
    token = unique_token()
    stage = stage_dir("wms_stage", token)
    admitted = stage_dir("wms_admit", token)
    ckpt1 = stage_dir("wms_ckpt1", token)
    ckpt2 = stage_dir("wms_ckpt2", token)

    ev = T(spark, sf_dir, "events").select(
        "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    ontime = ev.filter(F.col("event_id") % 7 != 0)
    late = ev.filter(F.col("event_id") % 7 == 0).select(
        "event_id", (F.col("us") - 60 * 86400 * 1_000_000).alias("us")
    )
    a_dir, b_dir = os.path.join(stage, "a"), os.path.join(stage, "b")
    ontime.repartition(2).write.mode("overwrite").json(a_dir)
    late.repartition(2).write.mode("overwrite").json(b_dir)
    # file-source batches order by modification time: on-time strictly first
    # (same staging discipline as stream_watermark_finalize)
    for d, mt in ((a_dir, 1_000_000_000), (b_dir, 2_000_000_000)):
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (mt, mt))

    # stage 1 — explicit below-watermark drop (the strict admission gate)
    wm_state: dict[str, int | None] = {"wm": None}

    def _admit(batch_df: DataFrame, epoch_id: int) -> None:
        wm = wm_state["wm"]
        out = batch_df if wm is None else batch_df.filter(F.col("us") >= F.lit(wm))
        out.write.mode("append").parquet(admitted)
        mx = batch_df.agg(F.max("us").alias("m")).collect()[0]["m"]  # 1 row
        if mx is not None:
            cand = mx - _WM_HORIZON_US
            wm_state["wm"] = cand if wm is None else max(wm, cand)

    q1 = (
        spark.readStream.format("json")
        .schema("event_id long, us long")
        .option("maxFilesPerTrigger", 2)
        .load(os.path.join(stage, "*"))
        .writeStream.foreachBatch(_admit)
        .option("checkpointLocation", ckpt1)
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()

    # stage 2 — the same real windowed aggregation, over admitted rows only
    agg = (
        spark.readStream.schema("event_id long, us long")
        .parquet(admitted)
        .select(F.timestamp_micros(F.col("us")).alias("ts"))
        .withWatermark("ts", "7 days")
        .groupBy(F.window("ts", "7 days").alias("win"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    name = f"css_wm_strict_{token}"
    q2 = (
        agg.select(
            F.unix_timestamp(F.col("win.start")).cast("long").alias(
                "window_start_sec"
            ),
            "n",
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    # both streams drained; the memory sink is materialized driver-side
    cleanup(stage, admitted, ckpt1, ckpt2)
    return spark.table(name).orderBy("window_start_sec")
