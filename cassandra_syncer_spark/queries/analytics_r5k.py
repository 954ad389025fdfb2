"""Round-5 batch 11: multi-window active users from one partial fold,
the composed Gopher quality ruleset, and dedup threshold calibration.

`events_dau_wau` is the generalization of `win_sliding_distinct`: ONE
per-(day, bucket) bitmap fold serves all three trailing windows (1/3/7
days) — the partial-reuse property that makes exact multi-horizon
dashboards affordable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

_DAY_NS = 86_400_000_000_000
_AU_WINDOWS = (1, 3, 7)


@register(
    "events_dau_wau",
    oracle=f"""
    WITH e AS (
      SELECT epoch_ns(ts) // {_DAY_NS} AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM e)
    SELECT d.day,
           CAST(count(DISTINCT CASE WHEN e.day = d.day THEN user_id END)
                AS BIGINT) AS au1,
           CAST(count(DISTINCT CASE WHEN e.day >= d.day - 2 THEN user_id END)
                AS BIGINT) AS au3,
           CAST(count(DISTINCT user_id) AS BIGINT) AS au7
    FROM days d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day ORDER BY d.day
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / 3-day / 7-day active users per day — the dashboard triple —
    computed EXACTLY from one shared fold: events collapse once to
    per-(day, bucket) bitmap partials, each partial fans out to the
    panes of all three window lengths, and per-(pane, length) bit_or +
    popcount reads out every horizon.  No re-scan per window length, no
    approx sketch, no count-DISTINCT Expand.

    Scale shape: shuffle ∝ days × id-space/64 × |windows| partial rows —
    independent of event volume; the same partials persist across days
    (mergeable + idempotent, `run_streaming_bitmap`), so the steady
    state folds only the new day and re-reads 7 partial rows per pane.
    """
    ev = T(spark, sf_dir, "events")
    partial = (
        ev.select(
            F.expr(f"ts_ns div {_DAY_NS}").alias("day"),
            F.expr("user_id div 64").alias("bucket"),
            F.expr("shiftleft(1L, int(user_id % 64))").alias("bit"),
        )
        .groupBy("day", "bucket")
        .agg(F.expr("bit_or(bit)").alias("bm"))
    )
    lens = ", ".join(str(w) for w in _AU_WINDOWS)
    panes = partial.select(
        F.explode(F.expr(f"array({lens})")).alias("win"), "day", "bucket", "bm"
    ).select(
        "win",
        F.explode(F.expr("sequence(day, day + win - 1)")).alias("pane"),
        "bucket",
        "bm",
    )
    days = ev.select(F.expr(f"ts_ns div {_DAY_NS}").alias("pane")).distinct()
    counts = (
        panes.join(days, "pane", "left_semi")
        .groupBy("pane", "win", "bucket")
        .agg(F.expr("bit_or(bm)").alias("bm"))
        .groupBy("pane", "win")
        .agg(F.sum(F.bit_count("bm")).cast("long").alias("n"))
    )
    return (
        counts.groupBy(F.col("pane").alias("day"))
        .pivot("win", list(_AU_WINDOWS))
        .sum("n")
        .select(
            "day",
            F.col("1").cast("long").alias("au1"),
            F.col("3").cast("long").alias("au3"),
            F.col("7").cast("long").alias("au7"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# text_gopher_gate — the composed Gopher quality ruleset
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "to", "and", "in", "that", "with")


@register(
    "text_gopher_gate",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             (1000000 * CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT))
               // len(w) AS mean_wlen_micro,
             (1000000 * len(list_filter(w, x -> regexp_matches(x, '^[a-zA-Z]+$'))))
               // len(w) AS alpha_frac_micro,
             CAST(len(list_filter(w, x -> list_contains(
                 {list(_STOPWORDS)}, x))) AS BIGINT) AS n_stop
      FROM d
    )
    SELECT doc_id, n_words, mean_wlen_micro, alpha_frac_micro, n_stop,
           (n_words BETWEEN 10 AND 100000
            AND mean_wlen_micro BETWEEN 2000000 AND 12000000
            AND alpha_frac_micro >= 800000
            AND n_stop >= 2) AS keep
    FROM m ORDER BY doc_id
    """,
)
def text_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed Gopher-style quality ruleset as ONE gate: word-count
    bounds, mean word length bounds, alphabetic-word fraction, and
    minimum stop-word presence — the canonical pre-training filter
    stack (`text_quality` and `text_repetition_filter` are its
    single-rule cousins), with every rule's metric emitted so a
    calibration pass can tune the cuts.

    Scale shape: one scan-fused pass of higher-order array folds — no
    explode, no shuffle, no UDF; metrics are integer micro-units via
    exact integer division, so the keep-cut is identical cross-engine.
    The words array is projected ONCE and shared by all four rules (the
    no-split-inside-lambda discipline, plan-asserted repo-wide).
    """
    stop_arr = ", ".join(f"'{s}'" for s in _STOPWORDS)
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    m = d.select(
        "doc_id",
        F.size("w").cast("long").alias("n_words"),
        F.expr(
            "(1000000 * aggregate(w, 0L, (acc, x) -> acc + length(x))) div size(w)"
        ).alias("mean_wlen_micro"),
        F.expr(
            "(1000000 * size(filter(w, x -> x rlike '^[a-zA-Z]+$'))) div size(w)"
        ).alias("alpha_frac_micro"),
        F.expr(
            f"cast(size(filter(w, x -> array_contains(array({stop_arr}), x))) as bigint)"
        ).alias("n_stop"),
    )
    keep = (
        F.col("n_words").between(10, 100000)
        & F.col("mean_wlen_micro").between(2_000_000, 12_000_000)
        & (F.col("alpha_frac_micro") >= 800_000)
        & (F.col("n_stop") >= 2)
    )
    return m.select(
        "doc_id", "n_words", "mean_wlen_micro", "alpha_frac_micro", "n_stop",
        keep.alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# dedup_threshold_calibration — the tau-selection table
# ---------------------------------------------------------------------------


def _calib_sql() -> str:
    from cassandra_syncer_spark.queries.llm_dedup import _band_union, _minhash_cte

    return f"""
    {_minhash_cte(True)},
    bands AS ({_band_union(True)}),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS uw FROM documents),
    j AS (
      SELECT (10 * len(list_intersect(da.uw, db.uw)))
               // len(list_distinct(list_concat(da.uw, db.uw))) AS decile
      FROM cand c
      JOIN d da ON c.doc_a = da.doc_id
      JOIN d db ON c.doc_b = db.doc_id
    ),
    h AS (SELECT least(decile, 9) AS decile, count(*) AS n FROM j GROUP BY 1)
    SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n_pairs,
           CAST(sum(n) OVER (ORDER BY decile DESC) AS BIGINT) AS n_at_or_above
    FROM h ORDER BY decile
    """


@register("dedup_threshold_calibration", oracle=_calib_sql())
def dedup_threshold_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The τ-selection table: MinHash band candidates bucketed by exact
    Jaccard decile, with the cumulative pair count at-or-above each
    decile — exactly the evidence needed to choose the near-dup cut
    (`dedup_verify_jaccard`'s ≥ 0.5) and predict how much corpus each
    candidate τ would drop.  Decile = exact integer division of set
    sizes (Jaccard 1.0 clamps into the top bucket), so the histogram
    hash-matches.

    Scale shape: candidates from the bucket-local band self-join; the
    verify join touches candidate docs only; the output is ≤10 rows and
    the cumulative window runs over those 10.
    """
    from cassandra_syncer_spark.queries.llm_dedup import _minhash_pairs
    from pyspark.sql.window import Window

    cand = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("uw")
    )
    da, db = docs.alias("da"), docs.alias("db")
    decile = F.expr(
        "least((10 * size(array_intersect(da.uw, db.uw)))"
        " div size(array_union(da.uw, db.uw)), 9)"
    )
    h = (
        cand.join(da, cand.doc_a == F.col("da.doc_id"))
        .join(db, cand.doc_b == F.col("db.doc_id"))
        .select(decile.alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    w = Window.orderBy(F.desc("decile")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        h.withColumn("n_at_or_above", F.sum("n_pairs").over(w).cast("long"))
        .select(F.col("decile").cast("long").alias("decile"), "n_pairs", "n_at_or_above")
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# agg_grouping_id_sets — GROUPING() disambiguation in rollups
# ---------------------------------------------------------------------------


@register(
    "agg_grouping_id_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, '(null)') AS status,
           coalesce(o_orderpriority, '(null)') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, status, priority
    """,
)
def agg_grouping_id_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING()/grouping_id over a rollup — the disambiguation the
    coalesce-only form (`agg_rollup`) cannot provide: a NULL that IS
    data versus a NULL that MEANS subtotal are different rows, and only
    the grouping bitmask tells them apart (any consumer pivoting a
    rollup into a report needs it).

    Scale shape: same grouping-set Expand as `agg_rollup` — rows
    multiply by the rollup depth before the partial agg combines them;
    gid is plan-time metadata, zero extra cost.
    """
    o = T(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.expr(
                "cast(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) as bigint)"
            ).alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(null)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(null)")).alias("priority"),
            "gid",
            "n",
        )
        .orderBy("gid", "status", "priority")
    )


# ---------------------------------------------------------------------------
# events_interarrival_stats — inter-arrival time distribution per type
# ---------------------------------------------------------------------------


@register(
    "events_interarrival_stats",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS sec, event_id
      FROM events
    ),
    g AS (
      SELECT event_type,
             sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
               AS gap
      FROM s
    ),
    gg AS (
      SELECT event_type, gap, count(*) AS cnt
      FROM g WHERE gap IS NOT NULL GROUP BY event_type, gap
    ),
    c AS (
      SELECT event_type, gap,
             sum(cnt) OVER (PARTITION BY event_type) AS n,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY gap
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM gg
    ),
    q AS (
      SELECT event_type,
             max(n) AS n,
             min(CASE WHEN cum >= (n + 1) // 2 THEN gap END) AS a50,
             min(CASE WHEN cum >= (n + 2) // 2 THEN gap END) AS b50,
             min(CASE WHEN cum >= (19 * n + 1) // 20 THEN gap END) AS a95,
             min(CASE WHEN cum >= (19 * n + 1) // 20 + 1 THEN gap END) AS b95,
             max(gap) AS max_gap
      FROM c GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_gaps,
           round(CAST(a50 + b50 AS DOUBLE) / 2.0, 1) AS p50_gap_sec,
           round(CAST((20 - (19 * n + 1) % 20) * a95
                      + ((19 * n + 1) % 20) * coalesce(b95, a95) AS DOUBLE)
                 / 20.0, 2) AS p95_gap_sec,
           CAST(max_gap AS BIGINT) AS max_gap_sec
    FROM q ORDER BY event_type
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution: per event type (of the later
    event), the p50/p95/max gap since the user's previous event — the
    operational heartbeat metric behind SLO alerts ("purchases stopped
    arriving") and session-gap tuning (`win_session`'s 30-minute gap
    should sit far above p50 and below the session break).

    Determinism (round-9 fix, caught by the sf0.1 parity replay): p95's
    type-7 position h = (19n+1)/20 interpolates at ANY twentieth — the
    engines' `percentile` vs `quantile_cont` accumulate the fraction in
    different IEEE orders, which flipped a round(·,1) at a .05 boundary
    at sf0.1 (115021.0 vs 115021.1).  Both quantiles now come from
    COUNTING SELECTION (`agg_median_selection` machinery): 20·p95 =
    (20−r)·v_j + r·v_{j+1} is an exact INTEGER on both engines, and the
    single shared /20 float text rounds identically.  (p50's doubled
    order statistic lands on .0/.5 exactly — unchanged values.)

    Scale shape: ONE user_id-sorted shuffle for the lag window, then the
    gap frame collapses to the (type, gap) DOMAIN — the selection
    windows run on distinct gap values, never corpus rows (100 TB
    escape hatch no longer needed; the domain is bounded by the gap
    grid).
    """
    from pyspark.sql.window import Window

    s = T(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns div 1000000000").alias("sec"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    g = s.select(
        "event_type", (F.col("sec") - F.lag("sec").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    gg = g.groupBy("event_type", "gap").agg(F.count(F.lit(1)).alias("cnt"))
    wn = Window.partitionBy("event_type")
    wc = Window.partitionBy("event_type").orderBy("gap").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = gg.select(
        "event_type",
        "gap",
        F.sum("cnt").over(wn).alias("n"),
        F.sum("cnt").over(wc).alias("cum"),
    )
    q = c.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.expr("min(CASE WHEN cum >= (n + 1) div 2 THEN gap END)").alias("a50"),
        F.expr("min(CASE WHEN cum >= (n + 2) div 2 THEN gap END)").alias("b50"),
        F.expr(
            "min(CASE WHEN cum >= (19 * n + 1) div 20 THEN gap END)"
        ).alias("a95"),
        F.expr(
            "min(CASE WHEN cum >= (19 * n + 1) div 20 + 1 THEN gap END)"
        ).alias("b95"),
        F.max("gap").alias("max_gap"),
    )
    return q.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.expr("round(CAST(a50 + b50 AS DOUBLE) / 2.0, 1)").alias("p50_gap_sec"),
        F.expr(
            "round(CAST((20 - (19 * n + 1) % 20) * a95"
            " + ((19 * n + 1) % 20) * coalesce(b95, a95) AS DOUBLE) / 20.0, 2)"
        ).alias("p95_gap_sec"),
        F.col("max_gap").cast("long").alias("max_gap_sec"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# events_changepoint_cusum — exact-integer CUSUM drift detection
# ---------------------------------------------------------------------------


@register(
    "events_changepoint_cusum",
    oracle="""
    WITH s AS (
      SELECT event_type, event_id, epoch_ns(ts) // 1000000000 AS sec,
             CAST(round(value * 100.0) AS BIGINT) AS vc
      FROM events
    ),
    g AS (
      SELECT event_type, count(*) AS n, CAST(sum(vc) AS BIGINT) AS s_total
      FROM s GROUP BY event_type
    ),
    c AS (
      SELECT s.event_type, s.sec, s.event_id,
             sum(g.n * s.vc - g.s_total) OVER (
               PARTITION BY s.event_type ORDER BY s.sec, s.event_id) AS cus
      FROM s JOIN g ON s.event_type = g.event_type
    ),
    r AS (
      SELECT event_type, sec, event_id, abs(cus) AS a,
             row_number() OVER (
               PARTITION BY event_type ORDER BY abs(cus) DESC, sec, event_id
             ) AS rk
      FROM c
    )
    SELECT event_type, CAST(a AS BIGINT) AS max_abs_cusum_scaled,
           CAST(sec AS BIGINT) AS at_sec
    FROM r WHERE rk = 1 ORDER BY event_type
    """,
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: the running sum of
    deviations from the series mean peaks (in absolute value) at the
    most likely level-shift instant — the classic drift detector behind
    "when did this metric change regime".

    Exactness trick: the per-row deviation is staged as
    ``n·x_i − Σx`` (both exact bigints — no mean division, no floats),
    which is the true deviation scaled by the constant n, so the argmax
    instant and the relative magnitudes are IDENTICAL to the float form
    while every engine computes the same integers.

    Scale shape: one tiny stats agg broadcast back, one event_type-
    sorted shuffle for the cumulative window (per-type series must be
    time-ordered — at extreme per-type volume, CUSUM partials per time
    bucket compose associatively like the other partial patterns), then
    an argmax window over the same sorted runs reuses the partitioning.
    """
    from pyspark.sql.window import Window

    s = T(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("ts_ns div 1000000000").alias("sec"),
        F.round(F.col("value") * 100.0).cast("long").alias("vc"),
    )
    g = s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vc").alias("s_total")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = (
        s.join(F.broadcast(g), "event_type")
        .withColumn("cus", F.sum(F.col("n") * F.col("vc") - F.col("s_total")).over(wcum))
    )
    wmax = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("cus"))), "sec", "event_id"
    )
    return (
        c.withColumn("rk", F.row_number().over(wmax))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.abs(F.col("cus")).cast("long").alias("max_abs_cusum_scaled"),
            F.col("sec").cast("long").alias("at_sec"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# scan_csv_malformed — PERMISSIVE ingestion with corrupt-record accounting
# ---------------------------------------------------------------------------


@register(
    "scan_csv_malformed",
    oracle="""
    WITH sample AS (SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 3 = 0)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN doc_id % 7 = 0 THEN 1 END) AS BIGINT) AS n_corrupt,
           CAST(sum(CASE WHEN doc_id % 7 <> 0 THEN n_chars ELSE 0 END) AS BIGINT)
             AS good_chars
    FROM sample
    """,
)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-CSV ingestion (§2.1 breadth): a staged file where every 7th
    record carries a non-numeric value in an integer column, read in
    PERMISSIVE mode with an explicit schema + `columnNameOfCorruptRecord`
    — the malformed rows land with the bad field nulled and the raw line
    captured, instead of killing the job (FAILFAST) or silently vanishing
    (DROPMALFORMED).  The query accounts for every input row: total,
    corrupt count, and the clean-side aggregate — the ingestion-QA report
    a 100 TB crawl loader runs on every batch.

    Scale shape: the CSV scan is embarrassingly parallel and the report
    is one global aggregate; corruption is injected deterministically
    (doc_id % 7) so the oracle recomputes the same partition from the
    parquet truth.
    """
    import os
    import tempfile

    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_sinks",
        f"csvmal-{os.path.basename(os.path.normpath(sf_dir))}"
        f"-{spark.sparkContext.applicationId}",
    )
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "docs.csv")
    if not os.path.exists(path):
        sample = (
            T(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 3 == 0)
            .select("doc_id", "lang", "n_chars")
            .collect()
        )
        with open(path, "w") as fh:
            for r in sample:  # staging: deterministic corruption, tiny sample
                bad = r.doc_id % 7 == 0
                fh.write(f"{r.doc_id},{r.lang},{'#bad#' if bad else r.n_chars}\n")
    back = (
        spark.read.schema(
            "doc_id long, lang string, n_chars long, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("_corrupt").cast("long").alias("n_corrupt"),
        F.sum(F.coalesce("n_chars", F.lit(0))).cast("long").alias("good_chars"),
    )
