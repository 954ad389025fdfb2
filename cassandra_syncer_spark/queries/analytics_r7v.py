"""Round-7 batch 22 — file-metadata layout audit, bitemporal
corrections, the hashing-trick vectorizer, Hampel robust filtering, and
conversion-latency percentiles.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.operators import fingerprint as fp
from cassandra_syncer_spark.queries.analytics_r3 import _scratch
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# scan_file_metadata_audit — the small-files auditor over _metadata
# ---------------------------------------------------------------------------

_SMALL_ROWS = 1000  # a partition file under this row count is "small"


@register(
    "scan_file_metadata_audit",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(1 AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS n_rows,
           count(*) < {_SMALL_ROWS} AS is_small
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def scan_file_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-LAYOUT AUDIT via the hidden ``_metadata`` column — the
    small-files detector every 100 TB lake needs: lineitem is laid out
    hive-partitioned by (returnflag, linestatus) with one file per
    partition (repartition on the partition keys before the write), and
    the read-back groups by the partition keys counting rows and
    DISTINCT ``_metadata.file_name`` — proving the physical layout is
    exactly one file per partition and flagging partitions small enough
    to deserve compaction (`sink_compact_small_files` is the fix; this
    is the detector).

    Scale shape: the audit reads only ``_metadata.file_name`` + the two
    partition columns (partition values come from directory names — the
    scan projects zero data columns beyond the count); the group-by is
    the partition key space, tiny by construction.  The oracle derives
    the expected layout from the SOURCE table (one file per key, group
    counts), so the check proves write-layout + metadata plumbing end
    to end.
    """
    out = _scratch(sf_dir, "filemeta")
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linestatus"
    )
    (
        li.repartition("l_returnflag", "l_linestatus")
        .write.partitionBy("l_returnflag", "l_linestatus")
        # one file per (task, partition-dir): never split on record count,
        # so the one-task-per-key repartition above IS the layout contract
        .option("maxRecordsPerFile", 0)
        .mode("overwrite")
        .parquet(out)
    )
    # explicit schema: an empty source writes zero files and schema
    # inference would crash (UNABLE_TO_INFER_SCHEMA); the write schema is
    # known, so pass it (partition columns included — discovery still maps
    # directory names onto them when files exist)
    back = spark.read.schema(
        "l_orderkey long, l_returnflag string, l_linestatus string"
    ).parquet(out).select(
        "l_returnflag",
        "l_linestatus",
        F.col("_metadata.file_name").alias("fname"),
    )
    return (
        back.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.countDistinct("fname").cast("long").alias("n_files"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .withColumn("is_small", F.col("n_rows") < _SMALL_ROWS)
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# events_bitemporal_correction — latest-transaction-wins on two time axes
# ---------------------------------------------------------------------------

#: tx-time snapshot cutoffs (epoch seconds): mid-January vs far future
_SNAP_EARLY = 1705276800  # 2024-01-15
_SNAP_LATE = 4102444800  # 2100-01-01
#: corrections arrive 2 days after the fact, doubling the value
_CORR_LAG_S = 172800


@register(
    "events_bitemporal_correction",
    oracle=f"""
    WITH facts AS (
      SELECT event_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS vday,
             epoch_ns(ts) // 1000000000 AS tx,
             CAST(round(100 * value) AS BIGINT) AS val,
             CAST(1 AS BIGINT) AS version
      FROM events
    ),
    versions AS (
      SELECT * FROM facts
      UNION ALL
      SELECT event_id, vday, tx + {_CORR_LAG_S} AS tx, val * 2 AS val,
             CAST(2 AS BIGINT) AS version
      FROM facts WHERE event_id % 50 = 0
    ),
    snaps AS (
      SELECT 'early' AS snapshot, CAST({_SNAP_EARLY} AS BIGINT) AS cutoff
      UNION ALL
      SELECT 'late', CAST({_SNAP_LATE} AS BIGINT)
    ),
    visible AS (
      SELECT s.snapshot, v.event_id, v.val, v.version,
             row_number() OVER (PARTITION BY s.snapshot, v.event_id
                                ORDER BY v.tx DESC, v.version DESC) AS rn
      FROM versions v JOIN snaps s ON v.tx <= s.cutoff
    )
    SELECT snapshot,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_corrected,
           CAST(sum(val) AS BIGINT) AS sum_centi
    FROM visible WHERE rn = 1
    GROUP BY snapshot ORDER BY snapshot
    """,
)
def events_bitemporal_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL reconstruction — "what did we believe at transaction
    time T about valid time V": the fact stream gains a deterministic
    correction feed (every 50th event re-stated 2 days later at double
    value), and two tx-time snapshots are reconstructed with
    latest-transaction-wins per event.  The early snapshot must see
    pre-correction values for late-January facts; the late snapshot
    sees every correction — the audit-trail semantics SCD2
    (`scd2_history`) gives for dimensions, here for facts on TWO time
    axes.

    Scale shape: versions = fact scan + a filtered union (no join to
    build history); snapshot visibility is a 2-row broadcast theta join
    (each version lands in the snapshots whose cutoff admits it — at N
    snapshots this is the standard snapshot-dimension fan-out, bounded
    by N× version volume); latest-wins is one (snapshot, event_id)
    window; the final agg collapses to |snapshots| rows.  Exact centi
    integers.
    """
    from pyspark.sql.window import Window

    facts = T(spark, sf_dir, "events").select(
        "event_id",
        F.expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')").alias("vday"),
        F.expr("CAST(unix_seconds(ts) AS BIGINT)").alias("tx"),
        F.expr("CAST(round(100 * value) AS BIGINT)").alias("val"),
        F.lit(1).cast("long").alias("version"),
    )
    corr = facts.filter(F.col("event_id") % 50 == 0).select(
        "event_id",
        "vday",
        (F.col("tx") + F.lit(_CORR_LAG_S)).alias("tx"),
        (F.col("val") * 2).alias("val"),
        F.lit(2).cast("long").alias("version"),
    )
    versions = facts.unionByName(corr)
    snaps = spark.createDataFrame(
        [("early", _SNAP_EARLY), ("late", _SNAP_LATE)], "snapshot string, cutoff long"
    )
    visible = versions.join(
        F.broadcast(snaps), F.col("tx") <= F.col("cutoff")
    )
    w = Window.partitionBy("snapshot", "event_id").orderBy(
        F.desc("tx"), F.desc("version")
    )
    latest = visible.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    return (
        latest.groupBy("snapshot")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(F.col("version") == 2, 1).otherwise(0))
            .cast("long")
            .alias("n_corrected"),
            F.sum("val").cast("long").alias("sum_centi"),
        )
        .orderBy("snapshot")
    )


# ---------------------------------------------------------------------------
# feat_hashing_trick — hashed bag-of-words with collision audit
# ---------------------------------------------------------------------------

_HASH_BUCKETS = 64


@register(
    "feat_hashing_trick",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY w
    ),
    hashed AS (
      SELECT {fp.hash32('w', duck=True)} AS h, c FROM wc
    )
    SELECT CAST(h % {_HASH_BUCKETS} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_distinct_words,
           CAST(sum(c) AS BIGINT) AS total_count,
           CAST(sum(CASE WHEN (h // {_HASH_BUCKETS}) % 2 = 0 THEN c
                         ELSE -c END) AS BIGINT) AS signed_mass
    FROM hashed GROUP BY 1 ORDER BY 1
    """,
)
def feat_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HASHING TRICK (feature hashing) with its collision audit:
    every word maps to one of 64 buckets by hash, with the
    next hash bit as the ± sign (the signed construction that keeps
    collision noise zero-mean — the Weinberger et al. vectorizer
    behind Vowpal Wabbit / sklearn's HashingVectorizer).  Output per
    bucket: distinct colliding words, total mass, and the signed mass a
    downstream linear model would actually see.

    Scale shape: the corpus collapses to the WORD-COUNT table first
    (vocabulary-bounded — Zipf makes this tiny relative to token
    volume; identical kernel to `text_idf_topterms`), so the hash +
    bucket agg runs on |vocab| rows; one md5 per distinct word, never
    per token.  The fixed 64-row output is the model's feature space —
    independent of corpus size by construction, which is the trick's
    entire point.
    """
    words = T(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    hashed = wc.select(
        F.expr(fp.hash32("w", duck=False)).alias("h"), F.col("c")
    )
    return (
        hashed.groupBy(
            F.expr(f"CAST(h % {_HASH_BUCKETS} AS BIGINT)").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
            F.sum("c").cast("long").alias("total_count"),
            F.sum(
                F.expr(
                    f"CASE WHEN (h div {_HASH_BUCKETS}) % 2 = 0 THEN c ELSE -c END"
                )
            )
            .cast("long")
            .alias("signed_mass"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# win_hampel_filter — rolling median/MAD outlier replacement
# ---------------------------------------------------------------------------

#: frame: 4 preceding + current (≤5 values; MAD degenerates gracefully)
_HAMPEL_PREC = 4


def _hampel_exprs(*, duck: bool) -> list[str]:
    """Shared integer Hampel kernel over the frame array `arr` (doubled
    units keep every median exact): med2 = 2·median, dev = |2x − med2|,
    mad4 = 2·median(dev) = 4·MAD; flag ⇔ 2·|2v − med2| > 3·mad4
    ⇔ |v − med| > 3·MAD."""
    if duck:
        srt = "list_sort(arr)"
        med2 = f"({srt}[(len(arr) + 1) // 2] + {srt}[(len(arr) + 2) // 2])"
        dsrt = f"list_sort(list_transform(arr, x -> abs(2 * x - {med2})))"
        mad4 = f"({dsrt}[(len(arr) + 1) // 2] + {dsrt}[(len(arr) + 2) // 2])"
    else:
        srt = "array_sort(arr)"
        med2 = (
            f"(get({srt}, (size(arr) + 1) div 2 - 1)"
            f" + get({srt}, (size(arr) + 2) div 2 - 1))"
        )
        dsrt = f"array_sort(transform(arr, x -> abs(2 * x - {med2})))"
        mad4 = (
            f"(get({dsrt}, (size(arr) + 1) div 2 - 1)"
            f" + get({dsrt}, (size(arr) + 2) div 2 - 1))"
        )
    return [
        f"CAST({med2} AS BIGINT) AS med2",
        f"CAST({mad4} AS BIGINT) AS mad4",
    ]


@register(
    "win_hampel_filter",
    oracle=f"""
    WITH staged AS (
      SELECT user_id, ts, event_id,
             CAST(round(100 * value) AS BIGINT) AS vc
      FROM events
    ),
    framed AS (
      SELECT user_id, vc,
             list(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN {_HAMPEL_PREC} PRECEDING
                                     AND CURRENT ROW) AS arr
      FROM staged
    ),
    kern AS (
      SELECT user_id, vc, {', '.join(_hampel_exprs(duck=True))} FROM framed
    ),
    flagged AS (
      SELECT user_id, vc, med2,
             2 * abs(2 * vc - med2) > 3 * mad4 AS is_outlier
      FROM kern
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(sum(CASE WHEN is_outlier THEN med2 ELSE 2 * vc END) AS BIGINT)
             AS sum_filtered_centi_x2
    FROM flagged GROUP BY user_id ORDER BY user_id
    """,
)
def win_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAMPEL FILTER — the robust despiker for event-value streams:
    each point compares against the MEDIAN of its trailing 5-point
    frame, flagged when |v − med| > 3·MAD and replaced by the frame
    median (where `events_anomaly_zscore`'s mean/σ gets dragged by the
    very spikes it hunts, median/MAD has a 50% breakdown point —
    `win_rolling_median` smooths, this DETECTS-and-replaces).  All
    medians in doubled integer units — exact on both engines, no
    floating point anywhere.

    Scale shape: one user-keyed shuffle; the frame array is ≤5 elements
    (collect over a bounded ROWS frame — never a per-key unbounded
    collect), the kernel is scan-fused array arithmetic on those 5
    values, and the per-user audit agg reuses the window's
    partitioning.  Degenerate frames (MAD = 0: ≥3 equal values) flag
    any deviation — the textbook Hampel caveat, deterministic on both
    engines and exercised by the constant-frame property test.
    """
    from pyspark.sql.window import Window

    staged = T(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.expr("CAST(round(100 * value) AS BIGINT)").alias("vc"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_HAMPEL_PREC, Window.currentRow)
    )
    framed = staged.select(
        "user_id", "vc", F.collect_list("vc").over(w).alias("arr")
    )
    kern = framed.selectExpr("user_id", "vc", *_hampel_exprs(duck=False))
    flagged = kern.select(
        "user_id",
        "vc",
        "med2",
        F.expr("2 * abs(2 * vc - med2) > 3 * mad4").alias("is_outlier"),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(F.col("is_outlier"), 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            F.sum(
                F.when(F.col("is_outlier"), F.col("med2")).otherwise(
                    2 * F.col("vc")
                )
            )
            .cast("long")
            .alias("sum_filtered_centi_x2"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# events_time_to_convert — conversion-latency percentiles
# ---------------------------------------------------------------------------


@register(
    "events_time_to_convert",
    oracle="""
    WITH firstview AS (
      SELECT user_id, min(ts) AS vt FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
      SELECT f.user_id,
             min(epoch_us(e.ts) - epoch_us(f.vt)) AS delta_us
      FROM firstview f JOIN events e
        ON e.user_id = f.user_id
       AND e.event_type = 'purchase' AND e.ts >= f.vt
      GROUP BY f.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM firstview) AS n_viewers,
           CAST(count(*) AS BIGINT) AS n_converted,
           CAST((1000000 * count(*))
                // (SELECT nullif(count(*), 0) FROM firstview) AS BIGINT)
             AS conversion_micro,
           round(quantile_cont(delta_us, 0.5) / 1000000.0, 2) AS p50_sec,
           round(quantile_cont(delta_us, 0.9) / 1000000.0, 2) AS p90_sec
    FROM conv
    """,
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT distribution — the latency view of the funnel
    (`events_funnel_windowed` counts who converts; this measures HOW
    LONG conversion takes): per user, first view → earliest subsequent
    purchase, then p50/p90 of the delay plus the conversion rate in
    exact micro-units.

    Scale shape: first-view collapses per user BEFORE the purchase
    join (the join's left side is |users|, not event volume), the
    purchase probe is user-keyed equi with the time bound riding
    inside, and the percentile runs over |converted users| deltas —
    swap for `approx_percentile` at 100 TB, the same escape hatch as
    `agg_percentile`.  Deltas are exact integer MICROseconds
    (`unix_micros`/`epoch_us` — second-granular spellings diverge:
    DuckDB's `epoch()` is a fractional double whose BIGINT cast
    rounds, Spark's `unix_seconds` truncates); identical delta sets
    make the interpolated percentiles bitwise cross-engine.
    """
    ev = T(spark, sf_dir, "events")
    firstview = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
        .localCheckpoint()
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firstview, "user_id")
        .filter(F.col("ts") >= F.col("vt"))
        .groupBy("user_id")
        .agg(
            F.min(F.expr("unix_micros(ts) - unix_micros(vt)")).alias("delta_us")
        )
    )
    n_view = firstview.agg(F.count(F.lit(1)).cast("long").alias("n_viewers"))
    return (
        conv.agg(
            F.count(F.lit(1)).cast("long").alias("n_converted"),
            F.expr("round(percentile(delta_us, 0.5) / 1000000.0, 2)").alias(
                "p50_sec"
            ),
            F.expr("round(percentile(delta_us, 0.9) / 1000000.0, 2)").alias(
                "p90_sec"
            ),
        )
        .crossJoin(F.broadcast(n_view))
        .select(
            "n_viewers",
            "n_converted",
            F.expr(
                "CAST((1000000 * n_converted) div nullif(n_viewers, 0) AS BIGINT)"
            ).alias("conversion_micro"),
            "p50_sec",
            "p90_sec",
        )
    )
