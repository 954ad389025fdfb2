"""Round-7 batch 7 — Pareto skyline with bucket-prune scale path,
watermark closed-window/late-drop streaming semantics driven as a
checked query, and deterministic A/B assignment with a sample-ratio-
mismatch test.

Reference parity note: analytics extensions beyond the reference's sync
surface; integer/micro-unit exact formulas on both engines per the
registry contract.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# select_pareto_skyline — dominance frontier with a coarse-prune scale path
# ---------------------------------------------------------------------------

# price buckets of $1000 (centi units) for the coarse dominance prune
_SKY_BUCKET = 100_000


@register(
    "select_pareto_skyline",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_centi,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    )
    SELECT a.o_orderkey, a.price_centi, CAST(a.d AS VARCHAR) AS order_date
    FROM o a
    WHERE NOT EXISTS (
      SELECT 1 FROM o b
      WHERE b.price_centi >= a.price_centi AND b.d >= a.d
        AND (b.price_centi > a.price_centi OR b.d > a.d)
    )
    ORDER BY a.price_centi DESC, a.o_orderkey
    """,
)
def select_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARETO SKYLINE — orders on the (price ↑, recency ↑) dominance
    frontier: no other order is at least as expensive AND at least as
    recent with one strictly better.  The classic multi-criteria
    shortlist operator (best docs by quality-vs-length, best checkpoints
    by loss-vs-cost) that SQL engines don't ship natively.

    The oracle states dominance directly (NOT EXISTS — an independent
    O(n²)-shaped formulation, fine at validation scale); the Spark
    dataflow is the scale-safe two-phase form:

    1. COARSE PRUNE — $1000 price buckets; any row whose date is ≤ the
       max date of any strictly-higher bucket is dominated by that
       bucket's witness (higher bucket ⇒ strictly higher price).  The
       bucket-maxima table is dimension-sized, so its cumulative-max
       window is free, and the prune is one broadcast join against it.
       Transitivity makes candidates-only refinement exact: a dominator
       that was itself pruned is dominated by a surviving row that also
       dominates you.
    2. BUCKET-LOCAL REFINE — within each bucket (bounded partitions,
       never a global single-task sort): survive iff your date strictly
       beats every strictly-higher-price row's date in the bucket
       (running max over price groups) and ties the max date within
       your exact price (equal (price, date) duplicates all survive,
       matching dominance's strictness requirement).
    """
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_centi"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    o = o.withColumn("bkt", F.expr(f"price_centi div {_SKY_BUCKET}"))

    # phase 1: per-bucket max date, cumulative max over strictly higher
    # buckets (dimension-sized table), broadcast back as the prune bound
    bmax = o.groupBy("bkt").agg(F.max("d").alias("bmax_d"))
    wb = Window.orderBy(F.desc("bkt")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bounds = bmax.withColumn("gt_d", F.max("bmax_d").over(wb)).select(
        "bkt", "gt_d"
    )
    cand = o.join(F.broadcast(bounds), "bkt").filter(
        F.col("gt_d").isNull() | (F.col("d") > F.col("gt_d"))
    )

    # phase 2: exact bucket-local dominance on candidates only
    wg = Window.partitionBy("bkt", "price_centi")
    wp = Window.partitionBy("bkt").orderBy(F.desc("price_centi")).rangeBetween(
        Window.unboundedPreceding, -1
    )
    refined = (
        cand.withColumn("gmax_d", F.max("d").over(wg))
        .withColumn("hp_d", F.max("d").over(wp))
        .filter(
            (F.col("d") == F.col("gmax_d"))
            & (F.col("hp_d").isNull() | (F.col("d") > F.col("hp_d")))
        )
    )
    return refined.select(
        "o_orderkey",
        "price_centi",
        F.col("d").cast("string").alias("order_date"),
    ).orderBy(F.desc("price_centi"), "o_orderkey")


# ---------------------------------------------------------------------------
# stream_watermark_late — closed-window emission + late-data drop
# ---------------------------------------------------------------------------


@register(
    "stream_watermark_finalize",
    oracle="""
    WITH allr AS (
      SELECT CASE WHEN event_id % 7 = 0
                  THEN epoch_us(ts) - CAST(60 AS BIGINT) * 86400 * 1000000
                  ELSE epoch_us(ts) END AS us
      FROM events
    ),
    wm AS (SELECT max(us) - CAST(7 AS BIGINT) * 86400 * 1000000 AS w FROM allr),
    b AS (
      SELECT (us // (CAST(7 AS BIGINT) * 86400 * 1000000))
               * CAST(7 AS BIGINT) * 86400 * 1000000 AS ws,
             count(*) AS n
      FROM allr GROUP BY 1
    )
    SELECT CAST(ws // 1000000 AS BIGINT) AS window_start_sec,
           CAST(n AS BIGINT) AS n
    FROM b, wm
    WHERE ws + CAST(7 AS BIGINT) * 86400 * 1000000 <= wm.w
    ORDER BY window_start_sec
    """,
)
def stream_watermark_finalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARK FINALIZATION driven end to end — the append-mode
    watermark contract as a value-checked query: weekly counts stream
    through a real windowed aggregation in two forced micro-batches
    (on-time slice first — file mtimes order the source — then a
    held-out slice shifted 60 days into the past), and append mode
    emits EXACTLY the windows the final watermark closed; still-open
    windows are withheld.  A stream that emitted an open window, or
    lost a row, hash-mismatches against the batch-SQL oracle.

    MEASURED SEMANTICS NOTE (this build, empirically verified with a
    minimal repro): below-watermark input rows are NOT dropped by the
    aggregation — a late row re-creates its (already-evicted) window
    group and the closed window re-emits as a correction row.  Spark's
    documented watermark contract only bounds how LONG state is kept,
    it does not promise input drops; pipelines needing hard drops
    filter explicitly (or use dropDuplicatesWithinWatermark).  The
    oracle therefore includes the late slice in its closed-window
    counts — asserting the behavior the engine actually has, rather
    than prose about one it doesn't.

    Scale shape: a real windowed streaming aggregation — state is one
    count per open (week) window, eviction at the watermark bounds it
    by the lateness horizon regardless of stream length; epoch-micro
    longs round-trip the staging exactly (JSON timestamps would lose
    precision).
    """
    stage = os.path.join(tempfile.gettempdir(), f"css_wm_stage_{os.getpid()}")
    ckpt = os.path.join(tempfile.gettempdir(), f"css_wm_ckpt_{os.getpid()}")
    for d in (stage, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    ev = T(spark, sf_dir, "events").select(
        "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    ontime = ev.filter(F.col("event_id") % 7 != 0)
    late = ev.filter(F.col("event_id") % 7 == 0).select(
        "event_id", (F.col("us") - 60 * 86400 * 1000000).alias("us")
    )
    a_dir, b_dir = os.path.join(stage, "a"), os.path.join(stage, "b")
    ontime.repartition(2).write.mode("overwrite").json(a_dir)
    late.repartition(2).write.mode("overwrite").json(b_dir)
    # file-source batches order by modification time: on-time strictly first
    # (asserted post-hoc from the checkpoint's source log in tests)
    for d, mt in ((a_dir, 1_000_000_000), (b_dir, 2_000_000_000)):
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (mt, mt))

    stream = (
        spark.readStream.format("json")
        .schema("event_id long, us long")
        .option("maxFilesPerTrigger", 2)
        .load(os.path.join(stage, "*"))
    )
    agg = (
        stream.select(F.timestamp_micros(F.col("us")).alias("ts"))
        .withWatermark("ts", "7 days")
        .groupBy(F.window("ts", "7 days").alias("win"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    q = (
        agg.select(
            F.unix_timestamp(F.col("win.start")).cast("long").alias(
                "window_start_sec"
            ),
            "n",
        )
        .writeStream.format("memory")
        .queryName("css_stream_watermark_finalize")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("css_stream_watermark_finalize").orderBy("window_start_sec")


# ---------------------------------------------------------------------------
# sample_ab_srm — deterministic assignment + sample-ratio-mismatch test
# ---------------------------------------------------------------------------

# chi-square(1 dof) critical value at p=0.05, in micro units
_SRM_CRIT_MICRO = 3_841_459


@register(
    "sample_ab_srm",
    oracle=f"""
    WITH u AS (
      SELECT DISTINCT event_type, user_id,
             CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 2 AS BIGINT) AS arm
      FROM events
    ),
    c AS (
      SELECT event_type,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM u GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           CAST((1000000 * (n_a - n_b) * (n_a - n_b)) // (n_a + n_b)
                AS BIGINT) AS srm_chi2_micro,
           (1000000 * (n_a - n_b) * (n_a - n_b)) // (n_a + n_b)
             > {_SRM_CRIT_MICRO} AS srm_flag
    FROM c ORDER BY event_type
    """,
)
def sample_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B ASSIGNMENT + SRM GUARD — the two halves of trustworthy
    experimentation: (1) arm assignment is a pure hash of the unit id
    (md5 first-8-hex mod 2) — deterministic, replayable from any
    engine, no coordination, no rand(); (2) the sample-ratio-mismatch
    test (chi-square, 1 dof: (n_a−n_b)²/n in micro units against the
    3.841 critical value) flags segments where the realized split
    deviates from 50/50 more than chance allows — the standard symptom
    of assignment bugs or differential logging loss that silently
    invalidates lift readings (``events_abtest_lift`` downstream).

    Scale shape: one distinct-(segment, user) agg (map-side combined),
    then a segment-keyed count — the chi-square is integer arithmetic
    on two counts, computed on the dimension-sized segment table.
    """
    u = (
        T(spark, sf_dir, "events")
        .select(
            "event_type",
            "user_id",
            (
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
                .cast("long")
                % 2
            ).alias("arm"),
        )
        .distinct()
    )
    c = u.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    return c.select(
        "event_type",
        "n_a",
        "n_b",
        F.expr("(1000000 * (n_a - n_b) * (n_a - n_b)) div (n_a + n_b)")
        .cast("long")
        .alias("srm_chi2_micro"),
        (
            F.expr("(1000000 * (n_a - n_b) * (n_a - n_b)) div (n_a + n_b)")
            > _SRM_CRIT_MICRO
        ).alias("srm_flag"),
    ).orderBy("event_type")
