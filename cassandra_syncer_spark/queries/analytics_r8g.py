"""Round-8 batch 7 — streaming sliding-window top type, text-line log
parsing, and the delta-method ratio-metric confidence interval.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.queries.staging import cleanup, stage_dir, unique_token
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# stream_sliding_topk — sliding-window top event type through a real stream
# ---------------------------------------------------------------------------

_SLIDE_WIN_S = 3600
_SLIDE_STEP_S = 1800


@register(
    "stream_sliding_topk",
    oracle=f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) // 1000000 AS ts_sec FROM events
    ),
    fan AS (
      -- each event lands in exactly win/step = 2 sliding windows
      SELECT event_type,
             (ts_sec // {_SLIDE_STEP_S} - k) * {_SLIDE_STEP_S} AS w_start
      FROM e, unnest(range(0, {_SLIDE_WIN_S // _SLIDE_STEP_S})) AS t(k)
      WHERE (ts_sec // {_SLIDE_STEP_S} - k) * {_SLIDE_STEP_S} + {_SLIDE_WIN_S}
            > ts_sec
        AND ts_sec >= (ts_sec // {_SLIDE_STEP_S} - k) * {_SLIDE_STEP_S}
    ),
    counts AS (
      SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n
      FROM fan GROUP BY 1, 2
    ),
    ranked AS (
      SELECT w_start, event_type, n,
             row_number() OVER (PARTITION BY w_start
                                ORDER BY n DESC, event_type) AS rn
      FROM counts
    )
    SELECT CAST(w_start AS BIGINT) AS window_start_sec,
           event_type AS top_type,
           CAST(n AS BIGINT) AS n_events
    FROM ranked WHERE rn = 1 ORDER BY window_start_sec
    """,
)
def stream_sliding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-WINDOW TOP EVENT TYPE driven through a REAL streaming
    query: the event file re-staged as a stream source, a 1-hour window
    sliding every 30 minutes aggregated per (window, type) INSIDE the
    stream (complete mode — the sliding-agg state Spark maintains
    incrementally per micro-batch), drained with availableNow, then the
    per-window arg-max read off the final state.  The "what's trending
    right now" dashboard query, exercised through the actual streaming
    operator rather than its batch spelling (`win_sliding` /
    `events_trending_growth`).

    The oracle is the batch fan-out arithmetic — each event lands in
    exactly win/step = 2 sliding windows — so equality certifies the
    streaming window assignment, state maintenance, and drain dropped
    or duplicated nothing.

    Scale shape: per micro-batch cost = partial agg of the batch into
    (window, type) state — state size is |windows|·|types|, bounded by
    the time span, never event volume; at 100 TB-of-history a watermark
    bounds the window set (the `stream_watermark_finalize` pattern) and
    the state stays O(active windows).
    """
    token = unique_token()
    stage = stage_dir("slide_stage", token)
    ckpt = stage_dir("slide_ckpt", token)
    (
        T(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts)").alias("ts_us"),
        )
        .repartition(2)
        .write.mode("overwrite")
        .json(stage)
    )
    stream = (
        spark.readStream.format("json")
        .schema("event_type string, ts_us long")
        .load(stage)
        .select(
            "event_type",
            F.expr("timestamp_micros(ts_us)").alias("ts"),
        )
    )
    counts = stream.groupBy(
        F.window("ts", f"{_SLIDE_WIN_S} seconds", f"{_SLIDE_STEP_S} seconds"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    name = f"css_stream_slide_{token}"
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the memory sink holds the final state driver-side — the staging files
    # and checkpoint are fully drained, so remove them now (ADVICE r8)
    cleanup(stage, ckpt)
    state = spark.table(name).select(
        F.expr("unix_seconds(window.start)").alias("w_start"),
        "event_type",
        "n",
    )
    rnk = Window.partitionBy("w_start").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        state.withColumn("rn", F.row_number().over(rnk))
        .filter(F.col("rn") == 1)
        .select(
            F.col("w_start").cast("long").alias("window_start_sec"),
            F.col("event_type").alias("top_type"),
            F.col("n").cast("long").alias("n_events"),
        )
        .orderBy("window_start_sec")
    )


# ---------------------------------------------------------------------------
# scan_text_lines — raw text-line log source, regex-parsed
# ---------------------------------------------------------------------------


@register(
    "scan_text_lines",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(100 * value) AS BIGINT)) AS BIGINT) AS sum_centi
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAW TEXT-LINE LOG ingestion — the format family's last member
    (parquet / orc / csv / jsonl / binaryFile / glob are covered; this
    is `spark.read.text`): events serialized as pipe-delimited log
    lines, read back as raw lines, regex-parsed (`regexp_extract` on a
    portable pattern, scan-fused, no UDF), and aggregated.  Equality
    against the source-table oracle certifies serialize → text-scan →
    parse loses nothing — the classic "legacy app log to table"
    on-ramp.

    Scale shape: text scan is splittable line-parallel; the regex
    parse is a scan projection (whole-stage codegen); one hash agg.
    Malformed lines are EXCLUDED by an `rlike` pre-filter on the same
    pattern (round-8 ADVICE: `regexp_extract` alone returns '' — not
    NULL — on no match, which would silently count malformed lines
    under an empty-string group); the filter fuses into the scan, so
    the permissive-parse discipline of `scan_csv_malformed` costs no
    extra pass.
    """
    stage = stage_dir("text_stage", unique_token())
    (
        T(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.concat_ws(
                "|",
                F.col("event_id").cast("string"),
                F.col("event_type"),
                F.round(F.lit(100) * F.col("value")).cast("long").cast("string"),
            ).alias("value")
        )
        .repartition(2)
        .write.mode("overwrite")
        .text(stage)
    )
    lines = spark.read.text(stage)
    parsed = lines.filter(F.col("value").rlike(r"^(\d+)\|([^|]*)\|(-?\d+)$")).select(
        F.regexp_extract("value", r"^(\d+)\|([^|]*)\|(-?\d+)$", 2).alias(
            "event_type"
        ),
        F.regexp_extract("value", r"^(\d+)\|([^|]*)\|(-?\d+)$", 3)
        .cast("long")
        .alias("vc"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("vc").cast("long").alias("sum_centi"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# events_ratio_metric_ci — delta-method CI for a ratio-of-sums metric
# ---------------------------------------------------------------------------

#: ratio R = Σy/Σx with the delta-method variance over per-user moments:
#: Var(R) ≈ (Syy − 2R·Sxy + R²·Sxx) / (n·x̄²) where S are centered sums.
#: ONE shared text per scalar over the single exact-integer summary row.
_RATIO = "(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))"
_RATIO_SE = (
    "sqrt(greatest("
    " (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
    "    / CAST(nu AS DOUBLE))"
    f" - 2.0 * {_RATIO} * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)"
    "    * CAST(sy AS DOUBLE) / CAST(nu AS DOUBLE))"
    f" + {_RATIO} * {_RATIO} * (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)"
    "    * CAST(sx AS DOUBLE) / CAST(nu AS DOUBLE)), 0.0)"
    " / (CAST(nu AS DOUBLE) - 1.0)) * sqrt(CAST(nu AS DOUBLE))"
    " / CAST(sx AS DOUBLE)"
)


@register(
    "events_ratio_metric_ci",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CASE WHEN value IS NOT NULL
                           THEN CAST(round(100 * value) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS nu,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM u
    )
    SELECT nu AS n_users,
           round({_RATIO} / 100.0, 6) AS ratio_r6,
           round({_RATIO_SE} / 100.0, 6) AS se_r6,
           round(({_RATIO} - 1.959964 * {_RATIO_SE}) / 100.0, 6) AS ci_lo_r6,
           round(({_RATIO} + 1.959964 * {_RATIO_SE}) / 100.0, 6) AS ci_hi_r6
    FROM s WHERE nu >= 2 AND sx > 0
    """,
)
def events_ratio_metric_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO-METRIC confidence interval by the DELTA METHOD — the
    correct CI for "value per event" (and every per-session / per-user
    unit-economics metric): the ratio of SUMS R = Σy/Σx is NOT a mean
    of ratios, its sampling unit is the USER (events within a user are
    correlated), so the naive per-row CI is wrong and the delta-method
    variance over user-level (x, y) moments is the standard fix
    (Deng et al., "Applying the Delta Method in Metric Analytics").
    `agg_bootstrap_ci` is the resampling answer; this is the
    closed-form one — completing the experimentation kit.

    Determinism: user-level x/y are exact integers; the five moment
    sums accumulate in DECIMAL(38)/HUGEINT; every output scalar is ONE
    shared formula text over the single summary row (`events_welch_
    ttest` rule), variance clamped at 0 for degenerate corpora.

    Scale shape: one user-keyed agg collapses the fact table (map-side
    combined) → single-row moment agg → scalar math.  No joins.
    """
    u = (
        T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum(
                F.when(
                    F.col("value").isNotNull(),
                    F.round(F.lit(100) * F.col("value")).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    s = u.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    return s.filter((F.col("nu") >= 2) & (F.col("sx") > 0)).select(
        F.col("nu").alias("n_users"),
        F.expr(f"round({_RATIO} / 100.0, 6)").alias("ratio_r6"),
        F.expr(f"round({_RATIO_SE} / 100.0, 6)").alias("se_r6"),
        F.expr(f"round(({_RATIO} - 1.959964 * {_RATIO_SE}) / 100.0, 6)").alias(
            "ci_lo_r6"
        ),
        F.expr(f"round(({_RATIO} + 1.959964 * {_RATIO_SE}) / 100.0, 6)").alias(
            "ci_hi_r6"
        ),
    )
