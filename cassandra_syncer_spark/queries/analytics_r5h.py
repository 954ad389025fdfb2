"""Round-5 batch 8: RFM segmentation, trending growth, exact-integer
label centroids, and per-source duplication profiling.

`embed_label_centroids` shows the exact-integer discipline applied to a
genuinely float-native computation: micro-unit quantization BEFORE any
aggregation makes sums order-independent, so the centroid table — and the
distances derived from it — hash-match across engines and across Spark's
own partial-agg orderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# events_rfm_segmentation — recency/frequency/monetary quartiles
# ---------------------------------------------------------------------------


@register(
    "events_rfm_segmentation",
    oracle="""
    WITH u AS (
      SELECT user_id,
             max(epoch_ns(ts) // 1000000000) AS last_sec,
             count(*) AS freq,
             CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ),
    q AS (
      SELECT user_id,
             ntile(4) OVER (ORDER BY last_sec, user_id) AS r_q,
             ntile(4) OVER (ORDER BY freq, user_id) AS f_q,
             ntile(4) OVER (ORDER BY cents, user_id) AS m_q
      FROM u
    )
    SELECT r_q * 100 + f_q * 10 + m_q AS segment,
           CAST(count(*) AS BIGINT) AS n_users
    FROM q GROUP BY 1 ORDER BY segment
    """,
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-analytics cube: per user,
    recency (last event), frequency (event count), monetary (value sum,
    integer cents), each cut into quartiles, users bucketed by the
    3-digit RFM code.  Deterministic ntile ties broken by user_id.

    Scale shape: one user_id agg collapses events to one row per user;
    the three ntile windows run over that user-dim frame (global sorts —
    at extreme user counts each swaps for the percentile-sketch cut-point
    assignment, the `win_ntile_bucket` escape hatch); the final agg is 64
    segment keys.  Monetary stays integer cents so the quartile cuts are
    exact cross-engine.
    """
    u = (
        T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr("max(ts_ns div 1000000000)").alias("last_sec"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.round(F.col("value") * 100.0).cast("long")).cast("long").alias("cents"),
        )
    )
    q = u.select(
        "user_id",
        F.ntile(4).over(Window.orderBy("last_sec", "user_id")).alias("r_q"),
        F.ntile(4).over(Window.orderBy("freq", "user_id")).alias("f_q"),
        F.ntile(4).over(Window.orderBy("cents", "user_id")).alias("m_q"),
    )
    return (
        q.select(
            (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
            .cast("long")
            .alias("segment")
        )
        .groupBy("segment")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# events_trending_growth — day-over-day growth per event type
# ---------------------------------------------------------------------------

_DAY_NS = 86_400_000_000_000


@register(
    "events_trending_growth",
    oracle=f"""
    WITH d AS (
      SELECT epoch_ns(ts) // {_DAY_NS} AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT day, event_type, CAST(n AS BIGINT) AS n,
           CAST(lag(n) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT)
             AS prev_n,
           CAST(CASE WHEN lag(n) OVER (PARTITION BY event_type ORDER BY day)
                          IS NOT NULL
                THEN (1000000 * (n - lag(n) OVER (PARTITION BY event_type
                                                  ORDER BY day)))
                     // lag(n) OVER (PARTITION BY event_type ORDER BY day)
                END AS BIGINT) AS growth_micro
    FROM d ORDER BY day, event_type
    """,
)
def events_trending_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending detection: day-over-day count growth per event type in
    integer micro-units — the dashboard primitive behind "what spiked
    today"; the first day of each type reports NULL growth (no prior).

    Scale shape: the corpus collapses to (day, type) counts with
    map-side combine — days × types rows regardless of event volume —
    and the lag window runs over that tiny frame.  Growth is exact
    integer division of counts, so the sign and magnitude of every spike
    hash-match.
    """
    d = (
        T(spark, sf_dir, "events")
        .groupBy(
            F.expr(f"ts_ns div {_DAY_NS}").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return (
        d.withColumn("prev_n", F.lag("n").over(w).cast("long"))
        .select(
            "day",
            "event_type",
            "n",
            "prev_n",
            F.when(
                F.col("prev_n").isNotNull(),
                F.expr("(1000000 * (n - prev_n)) div prev_n"),
            )
            .cast("long")
            .alias("growth_micro"),
        )
        .orderBy("day", "event_type")
    )


# ---------------------------------------------------------------------------
# embed_label_centroids — exact-integer clustering-quality table
# ---------------------------------------------------------------------------


@register(
    "embed_label_centroids",
    oracle="""
    WITH q AS (
      SELECT vec_id, label, d.i AS dim,
             CAST(round(CAST(embedding[d.i + 1] AS DOUBLE) * 1000000) AS BIGINT) AS xm
      FROM embeddings, (SELECT unnest(range(64)) AS i) d
    ),
    cent AS (
      SELECT label, dim,
             CAST(sum(xm) AS BIGINT) // count(*) AS cm,
             count(*) AS n
      FROM q GROUP BY label, dim
    ),
    dev AS (
      SELECT q.vec_id, q.label, (q.xm - c.cm) * (q.xm - c.cm) AS sq
      FROM q JOIN cent c ON q.label = c.label AND q.dim = c.dim
    ),
    per_vec AS (SELECT vec_id, label, sum(sq) AS ss FROM dev GROUP BY vec_id, label)
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(ss) // count(*) AS BIGINT) AS mean_sq_micro2
    FROM per_vec GROUP BY label ORDER BY label
    """,
)
def embed_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality table: per label, the mean squared distance of
    members to their label centroid — the intra-cluster tightness audit
    run after any embedding clustering / labeling job.

    The exact-integer discipline on a float-native computation:
    components quantize to micro-units BEFORE any aggregation, so every
    sum is an exact bigint — order-independent across engines AND across
    Spark's own partial-agg orderings — and the centroid (integer-div
    mean), squared deviations (bigint products, max ~64·(4·10⁶)² ≪ 2⁶³),
    and final means all hash-match with no rounding waivers.

    Scale shape: one dim-explode (64× linear, scan-fused), a (label,
    dim) agg to the tiny centroid table, a broadcast join-back, and two
    shrinking aggs — no windows, no per-key sorts; the centroid table is
    |labels|×64 rows at any corpus size.
    """
    q = (
        T(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.posexplode(
                F.expr("transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))")
            ).alias("dim", "xm"),
        )
    )
    cent = q.groupBy("label", "dim").agg(
        F.expr("sum(xm) div count(*)").alias("cm"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = q.join(F.broadcast(cent), ["label", "dim"]).select(
        "vec_id", "label", ((F.col("xm") - F.col("cm")) * (F.col("xm") - F.col("cm"))).alias("sq")
    )
    per_vec = dev.groupBy("vec_id", "label").agg(F.sum("sq").alias("ss"))
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.expr("sum(ss) div count(*)").cast("long").alias("mean_sq_micro2"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# corpus_dedup_rate_by_source — duplication profile per source
# ---------------------------------------------------------------------------


@register(
    "corpus_dedup_rate_by_source",
    oracle="""
    WITH h AS (SELECT doc_id, source, md5(text) AS hh FROM documents),
    g AS (
      SELECT hh, count(*) AS n_copies, count(DISTINCT source) AS n_sources
      FROM h GROUP BY hh
    )
    SELECT h.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(CASE WHEN g.n_copies > 1 THEN 1 END) AS BIGINT) AS n_duped,
           CAST(count(CASE WHEN g.n_sources > 1 THEN 1 END) AS BIGINT)
             AS n_cross_source,
           (1000000 * count(CASE WHEN g.n_copies > 1 THEN 1 END)) // count(*)
             AS dup_rate_micro
    FROM h JOIN g ON h.hh = g.hh
    GROUP BY h.source ORDER BY source
    """,
)
def corpus_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication profile per source: how much of each source is exact-
    duplicated, and how much of that duplication crosses source
    boundaries — the triage table that decides WHERE dedup effort goes
    (intra-source dups are usually crawler artifacts; cross-source dups
    are syndication/mirroring and need the global pass).

    Scale shape: one md5 hash-agg to per-content groups (count +
    distinct-source count — the distinct is over the tiny source space),
    then the group stats join back on the content hash and collapse to
    one row per source.  All shuffles are keyed on the content hash;
    rates are exact integer micro-units.
    """
    h = T(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5("text").alias("hh")
    )
    g = h.groupBy("hh").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.countDistinct("source").alias("n_sources"),
    )
    return (
        h.join(g, "hh")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count(F.when(F.col("n_copies") > 1, 1)).cast("long").alias("n_duped"),
            F.count(F.when(F.col("n_sources") > 1, 1)).cast("long").alias("n_cross_source"),
        )
        .select(
            "source",
            "n_docs",
            "n_duped",
            "n_cross_source",
            F.expr("(1000000 * n_duped) div n_docs").alias("dup_rate_micro"),
        )
        .orderBy("source")
    )
