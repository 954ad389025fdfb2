"""Round-7 batch 23 — HDR-style latency histogram, difference-in-
differences, bot gating, null-safe join semantics, and session bounce
rate.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# events_interarrival_hdr — log2-bucketed (HdrHistogram-style) gaps
# ---------------------------------------------------------------------------


@register(
    "events_interarrival_hdr",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(length(bin(gap_us)) - 1 AS BIGINT) AS bucket_log2,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(gap_us) AS BIGINT) AS min_us,
           CAST(max(gap_us) AS BIGINT) AS max_us
    FROM gaps WHERE gap_us IS NOT NULL AND gap_us > 0
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_interarrival_hdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-HISTOGRAM-style inter-arrival distribution: gaps bucketed by
    ⌊log₂(µs)⌋ — the constant-relative-error layout HdrHistogram/
    latency dashboards use, giving the full SHAPE (bimodality, heavy
    tails) that `events_interarrival_stats`'s three percentile points
    flatten.  ⌊log₂⌋ is computed as `length(bin(x)) − 1` — pure integer
    bit-length on BOTH engines, no floating log at bucket boundaries
    (log2(2⁵³±1) rounds differently across libms; bit length never
    does).

    Scale shape: one user-keyed lag window (the `events_interarrival
    _stats` shuffle, reused pattern), then a (type, bucket) hash agg —
    ≤ |types|·64 output rows regardless of corpus size; the histogram
    is mergeable across partitions by construction (map-side combine
    does exactly that).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = T(spark, sf_dir, "events").select(
        "event_type",
        (
            F.expr("unix_micros(ts)")
            - F.lag(F.expr("unix_micros(ts)")).over(w)
        ).alias("gap_us"),
    )
    return (
        gaps.filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
        .groupBy(
            "event_type",
            F.expr("CAST(length(bin(gap_us)) - 1 AS BIGINT)").alias("bucket_log2"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("gap_us").cast("long").alias("min_us"),
            F.max("gap_us").cast("long").alias("max_us"),
        )
        .orderBy("event_type", "bucket_log2")
    )


# ---------------------------------------------------------------------------
# events_did_lift — difference-in-differences readout
# ---------------------------------------------------------------------------

#: pre/post cutoff (2024-02-01, epoch MICROseconds — one literal, no
#: engine-side multiply that could run in 32-bit) + hash-parity arms
_DID_CUTOFF_US = 1706745600 * 1000000


@register(
    "events_did_lift",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(CAST(concat('0x', substr(md5(concat('arm#', CAST(user_id AS VARCHAR))), 1, 8))
                  AS UBIGINT) AS BIGINT) % 2 = 1 AS treated,
             epoch_us(ts) >= {_DID_CUTOFF_US} AS post,
             CAST(round(100 * value) AS BIGINT) AS vc
      FROM events WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT treated, post, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vc) AS BIGINT) AS sv
      FROM cells GROUP BY treated, post
    ),
    w AS (
      SELECT
        max(CASE WHEN treated AND post THEN CAST(sv AS DOUBLE) / n END) AS m_t_post,
        max(CASE WHEN treated AND NOT post THEN CAST(sv AS DOUBLE) / n END) AS m_t_pre,
        max(CASE WHEN NOT treated AND post THEN CAST(sv AS DOUBLE) / n END) AS m_c_post,
        max(CASE WHEN NOT treated AND NOT post THEN CAST(sv AS DOUBLE) / n END) AS m_c_pre,
        CAST(sum(n) AS BIGINT) AS n_total
      FROM s
    )
    SELECT n_total,
           round(m_t_pre, 4) AS m_t_pre_r4, round(m_t_post, 4) AS m_t_post_r4,
           round(m_c_pre, 4) AS m_c_pre_r4, round(m_c_post, 4) AS m_c_post_r4,
           round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 4) AS did_r4
    FROM w
    """,
)
def events_did_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES — the causal readout when treatment
    wasn't randomized per event: hash-parity arms (the same
    deterministic assignment device as `events_abtest_lift`), a
    pre/post cutoff, and the DiD estimator (ΔT − ΔC) on mean purchase
    value — the control arm's pre→post drift nets out seasonality that
    a naive pre/post comparison (or `events_abtest_lift`'s single-period
    lift) would book as treatment effect.  Parallel-trends is the
    identifying assumption, stated here, testable with
    `events_trending_growth` on the pre period.

    Scale shape: ONE purchase-filtered scan → a 4-cell hash agg (the
    2×2 design collapses the corpus to four rows before ANY division);
    the estimator is arithmetic on those cells, exact integer sums cast
    to double in one shared-text finale.
    """
    cells = T(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        F.expr(
            "cast(conv(substr(md5(concat('arm#', CAST(user_id AS STRING))), 1, 8),"
            " 16, 10) as bigint) % 2 = 1"
        ).alias("treated"),
        F.expr(f"unix_micros(ts) >= {_DID_CUTOFF_US}L").alias("post"),
        F.expr("CAST(round(100 * value) AS BIGINT)").alias("vc"),
    )
    s = cells.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("vc").cast("long").alias("sv"),
    )
    w = s.agg(
        F.max(
            F.when(F.col("treated") & F.col("post"), F.expr("CAST(sv AS DOUBLE) / n"))
        ).alias("m_t_post"),
        F.max(
            F.when(F.col("treated") & ~F.col("post"), F.expr("CAST(sv AS DOUBLE) / n"))
        ).alias("m_t_pre"),
        F.max(
            F.when(~F.col("treated") & F.col("post"), F.expr("CAST(sv AS DOUBLE) / n"))
        ).alias("m_c_post"),
        F.max(
            F.when(~F.col("treated") & ~F.col("post"), F.expr("CAST(sv AS DOUBLE) / n"))
        ).alias("m_c_pre"),
        F.sum("n").cast("long").alias("n_total"),
    )
    return w.selectExpr(
        "n_total",
        "round(m_t_pre, 4) AS m_t_pre_r4",
        "round(m_t_post, 4) AS m_t_post_r4",
        "round(m_c_pre, 4) AS m_c_pre_r4",
        "round(m_c_post, 4) AS m_c_post_r4",
        "round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 4) AS did_r4",
    )


# ---------------------------------------------------------------------------
# events_bot_gate — rate/concentration bot heuristics per user
# ---------------------------------------------------------------------------


@register(
    "events_bot_gate",
    oracle="""
    WITH staged AS (
      SELECT user_id, event_id, event_type, ts,
             epoch_us(ts) // 60000000 AS minute,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    per_min AS (
      SELECT user_id, CAST(max(c) AS BIGINT) AS max_per_min FROM (
        SELECT user_id, minute, count(*) AS c FROM staged GROUP BY 1, 2
      ) GROUP BY user_id
    ),
    per_type AS (
      SELECT user_id, CAST(max(c) AS BIGINT) AS top_type_n FROM (
        SELECT user_id, event_type, count(*) AS c FROM staged GROUP BY 1, 2
      ) GROUP BY user_id
    ),
    base AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us < 1000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_fast,
             CAST(count(gap_us) AS BIGINT) AS n_gaps
      FROM staged GROUP BY user_id
    )
    SELECT b.user_id, b.n_events, m.max_per_min,
           (1000000 * t.top_type_n) // b.n_events AS top_share_micro,
           CASE WHEN b.n_gaps > 0 THEN (1000000 * b.n_fast) // b.n_gaps
                ELSE 0 END AS fast_gap_micro,
           (m.max_per_min >= 5
            OR (1000000 * t.top_type_n) // b.n_events >= 600000
            OR (CASE WHEN b.n_gaps > 0 THEN (1000000 * b.n_fast) // b.n_gaps
                     ELSE 0 END) >= 200000) AS is_bot
    FROM base b JOIN per_min m ON b.user_id = m.user_id
    JOIN per_type t ON b.user_id = t.user_id
    ORDER BY b.user_id
    """,
)
def events_bot_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOT/AUTOMATION GATE over event streams — the `text_gopher_gate`
    of behavioral data: per user, peak per-minute rate, top-event-type
    concentration, and sub-second inter-arrival share, each an
    automation fingerprint (humans are slow, diverse, and bursty in
    seconds, scripts are fast, repetitive, and metronomic); the gate
    ORs the three thresholds and every user row carries its evidence
    columns so the verdict is auditable (and re-thresholdable
    downstream without a rescan).

    Scale shape: all three signals share ONE user partitioning — the
    lag window and the (user, minute)/(user, type) sub-aggs each
    collapse before their per-user max, the three |users|-row frames
    join on the already-partitioned key, and output is |users| rows.
    Exact integer micro-units throughout; thresholds applied to the
    integer shares on both engines.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    staged = T(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.expr("unix_micros(ts) div 60000000").alias("minute"),
        (
            F.expr("unix_micros(ts)") - F.lag(F.expr("unix_micros(ts)")).over(w)
        ).alias("gap_us"),
    )
    per_min = (
        staged.groupBy("user_id", "minute")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(F.max("c").cast("long").alias("max_per_min"))
    )
    per_type = (
        staged.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(F.max("c").cast("long").alias("top_type_n"))
    )
    base = staged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            F.when(F.col("gap_us").isNotNull() & (F.col("gap_us") < 1000000), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_fast"),
        F.count("gap_us").cast("long").alias("n_gaps"),
    )
    joined = base.join(per_min, "user_id").join(per_type, "user_id")
    return joined.selectExpr(
        "user_id",
        "n_events",
        "max_per_min",
        "(1000000 * top_type_n) div n_events AS top_share_micro",
        "CASE WHEN n_gaps > 0 THEN (1000000 * n_fast) div n_gaps ELSE 0 END"
        " AS fast_gap_micro",
        "(max_per_min >= 5"
        " OR (1000000 * top_type_n) div n_events >= 600000"
        " OR (CASE WHEN n_gaps > 0 THEN (1000000 * n_fast) div n_gaps ELSE 0 END)"
        " >= 200000) AS is_bot",
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# join_null_safe_keys — <=> join semantics with planted null keys
# ---------------------------------------------------------------------------

_NULL_L = 97  # every 97th order key nulled on the left
_NULL_R = 101  # every 101st customer key nulled on the right


@register(
    "join_null_safe_keys",
    oracle=f"""
    WITH l AS (
      SELECT CASE WHEN o_orderkey % {_NULL_L} = 0 THEN NULL
                  ELSE o_custkey END AS k
      FROM orders
    ),
    r AS (
      SELECT CASE WHEN c_custkey % {_NULL_R} = 0 THEN NULL
                  ELSE c_custkey END AS k
      FROM customer
    ),
    stats AS (
      SELECT (SELECT CAST(count(*) - count(k) AS BIGINT) FROM l) AS n_left_null,
             (SELECT CAST(count(*) - count(k) AS BIGINT) FROM r) AS n_right_null,
             (SELECT CAST(count(*) AS BIGINT)
              FROM l JOIN r ON l.k = r.k) AS n_equi,
             (SELECT CAST(count(*) AS BIGINT)
              FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k) AS n_null_safe
    )
    SELECT n_left_null, n_right_null, n_equi, n_null_safe,
           n_null_safe - n_equi AS n_null_matches
    FROM stats
    """,
)
def join_null_safe_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-SAFE JOIN semantics (`<=>` / IS NOT DISTINCT FROM) measured
    against plain equality on keys with planted nulls BOTH sides: equi
    joins silently DROP every null-keyed row (the classic silent-data-
    loss bug in CDC merges where "unknown" keys are legitimate join
    partners), while the null-safe join matches null↔null — the output
    proves `n_null_safe − n_equi = n_left_null × n_right_null` on real
    volumes.  `cond_null_safe` shows the scalar operator; this is the
    JOIN-side behavior, which plans differently.

    Scale shape: Spark plans `<=>` as a HASH join (EqualNullSafe is a
    supported hash key — asserted in the plan test), so null-safety
    costs no algorithm change; the caveat at 100 TB is that ALL null
    keys land in ONE hash bucket — the canonical skew key.  Production
    shape for null-heavy keys: split the null partition out (one
    metadata multiply, exactly the n_left_null × n_right_null term this
    query reports) and join only the non-null remainder — the split is
    the `join_salted_skew` discipline with a degenerate salt.
    """
    l = T(spark, sf_dir, "orders").select(
        F.expr(
            f"CASE WHEN o_orderkey % {_NULL_L} = 0 THEN NULL ELSE o_custkey END"
        ).alias("k")
    )
    r = T(spark, sf_dir, "customer").select(
        F.expr(
            f"CASE WHEN c_custkey % {_NULL_R} = 0 THEN NULL ELSE c_custkey END"
        ).alias("lk")
    ).withColumnRenamed("lk", "rk")
    n_l = l.agg(
        (F.count(F.lit(1)) - F.count("k")).cast("long").alias("n_left_null")
    )
    n_r = r.agg(
        (F.count(F.lit(1)) - F.count("rk")).cast("long").alias("n_right_null")
    )
    n_equi = (
        l.join(r, F.col("k") == F.col("rk"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_equi"))
    )
    n_safe = (
        l.join(r, F.col("k").eqNullSafe(F.col("rk")))
        .agg(F.count(F.lit(1)).cast("long").alias("n_null_safe"))
    )
    return (
        n_l.crossJoin(F.broadcast(n_r))
        .crossJoin(F.broadcast(n_equi))
        .crossJoin(F.broadcast(n_safe))
        .select(
            "n_left_null",
            "n_right_null",
            "n_equi",
            "n_null_safe",
            (F.col("n_null_safe") - F.col("n_equi")).alias("n_null_matches"),
        )
    )


# ---------------------------------------------------------------------------
# events_session_bounce — bounce rate by session entry type
# ---------------------------------------------------------------------------

_SESSION_GAP_S = 1800


@register(
    "events_session_bounce",
    oracle=f"""
    WITH staged AS (
      SELECT user_id, event_id, event_type,
             epoch_us(ts) // 1000000 AS ts_sec, ts
      FROM events
    ),
    marked AS (
      SELECT *,
             CASE WHEN ts_sec - lag(ts_sec) OVER w > {_SESSION_GAP_S}
                       OR lag(ts_sec) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM staged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_type, is_start,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ),
    per_sess AS (
      -- entry event = the session's unique is_start=1 row (no min_by
      -- over a composite key needed; the marker IS the arg-min)
      SELECT user_id, session_id,
             max(CASE WHEN is_start = 1 THEN event_type END) AS entry_type,
             CAST(count(*) AS BIGINT) AS n
      FROM sess GROUP BY user_id, session_id
    )
    SELECT entry_type,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounced,
           CAST((1000000 * sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)) // count(*)
                AS BIGINT) AS bounce_micro
    FROM per_sess GROUP BY entry_type ORDER BY entry_type
    """,
)
def events_session_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNCE RATE by session ENTRY type — the product-analytics metric
    sessionization exists to feed: sessions built with `win_session`'s
    exact 30-minute-gap kernel, then each session reduced to (entry
    event type, event count) and single-event sessions counted as
    bounces per entry type — "error-entered sessions bounce 3× more
    than view-entered" is the actionable output shape.

    Scale shape: sessions are CONTIGUOUS runs in the user's (ts,
    event_id) order, so no per-session reduce is needed at all — a
    session bounces iff the row immediately AFTER its entry row is
    itself a session start (next gap > 30 min) or absent (end of the
    user's stream).  One Window operator computes both `lag` (start
    marker) and `lead` (next-row gap) over the SAME user-keyed sort;
    the event stream is exchanged exactly once, and the only aggregate
    is a hash agg over |entry types| on the filtered entry rows — no
    SortAggregate, no string-buffer aggregate, no second event-volume
    shuffle.  (The oracle keeps the explicit cumsum-session formulation;
    contiguity makes the two provably identical.)  Exact integer micro
    rates.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    staged = T(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.expr("unix_micros(ts) div 1000000").alias("ts_sec"),
    )
    marked = staged.select(
        "event_type",
        "ts_sec",
        F.when(
            (F.col("ts_sec") - F.lag("ts_sec").over(w) > _SESSION_GAP_S)
            | F.lag("ts_sec").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
        F.lead("ts_sec").over(w).alias("next_ts_sec"),
    )
    entries = marked.filter(F.col("is_start") == 1)
    return (
        entries.groupBy(F.col("event_type").alias("entry_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(
                F.when(
                    F.col("next_ts_sec").isNull()
                    | (
                        F.col("next_ts_sec") - F.col("ts_sec")
                        > _SESSION_GAP_S
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_bounced"),
        )
        .withColumn(
            "bounce_micro",
            F.expr("(1000000 * n_bounced) div n_sessions"),
        )
        .orderBy("entry_type")
    )
