"""Round-4 batch 2: time-series gap-fill resampling, statistical anomaly
flagging, RAG-style document chunking, and Matryoshka embedding
truncation — four more pipeline shapes a 100 TB curation / analytics
stack runs routinely, each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.operators.asof import asof_join
from cassandra_syncer_spark.queries.llm_similarity import _dot, _vec
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

_HOUR_NS = 3600 * 1_000_000_000


@register(
    "events_resample_gapfill",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, epoch_ns(ts) // {_HOUR_NS} AS hour,
             CAST(round(value * 100.0) AS BIGINT) AS vc
      FROM events
    ),
    span AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM ev),
    spine AS (
      SELECT t.event_type, g.h AS hour
      FROM (SELECT DISTINCT event_type FROM ev) t,
           (SELECT unnest(generate_series(h0, h1)) AS h FROM span) g
    ),
    agg AS (
      SELECT event_type, hour, count(*) AS n, sum(vc) AS vsum
      FROM ev GROUP BY event_type, hour
    )
    SELECT s.event_type AS event_type, s.hour AS hour,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
           CAST(coalesce(a.vsum, 0) AS BIGINT) AS value_centi
    FROM spine s LEFT JOIN agg a
      ON s.event_type = a.event_type AND s.hour = a.hour
    ORDER BY s.event_type, s.hour
    """,
)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with GAP FILLING: every (event_type, hour) bucket
    in the observed span gets a row, zero-filled where no events landed —
    the dense-grid shape charting and downstream window math require
    (a sparse group-by silently skips empty buckets).

    Scale shape: the dense spine is generated (types × hours — tiny
    relative to events) and LEFT-joins the aggregated facts.  The heavy
    3-column pass over events happens once (the agg); Catalyst derives
    the span and the type list as separate SINGLE-column pruned scans
    (min/max over ts, distinct over event_type — metadata-cheap) rather
    than reusing the agg subplan.  At 100 TB the spine stays
    broadcastable (cardinality = |types| × span-hours, independent of
    event count); pin the span as literals to skip the two auxiliary
    scans entirely.
    """
    # integer div, not float `/` + cast — under the legacy INT64-nanos
    # fixture shape a ts within ~128 ns of an hour boundary would round
    # up in double and land in the wrong bucket vs the oracle's exact //
    ev = T(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"ts_ns div {_HOUR_NS}").alias("hour"),
        F.round(F.col("value") * 100.0).cast("long").alias("vc"),
    )
    agg = ev.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vc").alias("vsum")
    )
    # span + types derive from the AGGREGATED frame (≈ types × hours
    # rows), never a second scan of raw events — at 100 TB the raw table
    # is read exactly once
    span = agg.agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
    types = agg.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(span))
        .select("event_type", F.explode(F.sequence("h0", "h1")).alias("hour"))
    )
    return (
        spine.join(agg, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.coalesce(F.col("vsum"), F.lit(0)).cast("long").alias("value_centi"),
        )
        .orderBy("event_type", "hour")
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH staged AS (
      SELECT event_id, event_type, CAST(round(value * 100.0) AS BIGINT) AS vc
      FROM events
    ),
    stats AS (
      SELECT event_type,
             CAST(sum(vc) AS DOUBLE) AS s,
             CAST(sum(vc * vc) AS DOUBLE) AS q,
             count(*) AS n
      FROM staged GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((CAST(e.vc AS DOUBLE) - t.s / t.n)
                 / nullif(sqrt((t.q - t.s * t.s / t.n)
                               / nullif(t.n - 1.0, 0.0)), 0.0), 4) AS z
    FROM staged e JOIN stats t ON e.event_type = t.event_type
    WHERE abs((CAST(e.vc AS DOUBLE) - t.s / t.n)
              / nullif(sqrt((t.q - t.s * t.s / t.n)
                            / nullif(t.n - 1.0, 0.0)), 0.0)) > 3.0
    ORDER BY event_id
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical anomaly flagging: events whose value is >3σ from their
    type's mean — the data-quality tripwire run before any corpus enters
    a training mix.

    Determinism discipline (same as ``feat_standardize``): moments from
    exact integer sums (Σvc, Σvc² as longs) so mean/σ/z are identical
    doubles in both engines; the 3σ cut applies to the UNROUNDED z on
    both sides.  Scale: per-type stats are a tiny broadcast join-back —
    one scan + one 5-row agg, no window over raw rows.
    """
    staged = T(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round(F.col("value") * 100.0).cast("long").alias("vc")
    )
    stats = staged.groupBy("event_type").agg(
        F.sum("vc").cast("double").alias("s"),
        F.sum(F.col("vc") * F.col("vc")).cast("double").alias("q"),
        F.count(F.lit(1)).alias("n"),
    )
    s, qq, n = F.col("s"), F.col("q"), F.col("n")
    # nullif guards: a constant segment (sigma = 0) or a single-row segment
    # (n = 1) has no z-scores — null z drops at the filter on BOTH engines
    # instead of an ANSI DIVIDE_BY_ZERO abort (degenerate-events sweep)
    sd = F.nullif(
        F.sqrt((qq - s * s / n) / F.nullif((n - 1).cast("double"), F.lit(0.0))),
        F.lit(0.0),
    )
    z = (F.col("vc").cast("double") - s / n) / sd
    return (
        staged.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3.0)
        .select("event_id", "event_type", F.round(z, 4).alias("z"))
        .orderBy("event_id")
    )


@register(
    "doc_chunk_split",
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
    c AS (
      SELECT doc_id,
             CAST(i AS BIGINT) AS chunk_id,
             substr(text, CAST(i * 400 + 1 AS BIGINT), 500) AS chunk
      FROM d, LATERAL (
        SELECT unnest(range(0, (greatest(L, 1) - 1) // 400 + 1)) AS i)
    )
    SELECT doc_id, chunk_id, md5(chunk) AS chunk_md5,
           CAST(length(chunk) AS BIGINT) AS chunk_len
    FROM c ORDER BY doc_id, chunk_id
    """,
)
def doc_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style document chunking: 500-char windows every 400 chars
    (100-char overlap so no boundary sentence is lost), emitted as
    (doc_id, chunk_id, md5, len) — md5 instead of the text itself keeps
    the verification row narrow; a real pipeline carries the substring.

    Scale shape: pure per-row explode (sequence + substring) fused into
    the scan — no shuffle at all; chunk count is ⌈len/stride⌉ per doc, so
    output bytes ≈ 1.25× input bytes regardless of corpus size.
    """
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "text", F.length("text").alias("L")
    )
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(
                F.expr("sequence(0, int((greatest(L, 1) - 1) div 400))")
            ).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.expr("substring(text, chunk_id * 400 + 1, 500)").alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.md5("chunk").alias("chunk_md5"),
            F.length("chunk").cast("long").alias("chunk_len"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@register(
    "embed_matryoshka_truncate",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT vec_id, label,
           round(list_inner_product(v[1:8], v[1:8]), 6) AS energy_8d
    FROM e ORDER BY vec_id
    """,
)
def embed_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit: the energy (squared norm)
    retained by the first 8 dimensions of each unit-norm embedding — the
    number that decides whether a cheap truncated index is good enough
    before re-embedding a 100 TB corpus.

    Higher-order array functions only (slice + zip_with/aggregate fold),
    no UDF, no shuffle — the plan is a pure scan map like
    ``embed_quantize_int8``.
    """
    emb = _vec(T(spark, sf_dir, "embeddings"))
    v8 = F.slice("v", 1, 8)
    return emb.select(
        "vec_id", "label", F.round(_dot(v8, v8), 6).alias("energy_8d")
    ).orderBy("vec_id")


@register(
    "join_asof_forward",
    oracle="""
    WITH lft AS (
      SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_sec
      FROM events WHERE event_type = 'click'
    ), rgt AS (
      SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_sec,
             max(event_id) AS r_event_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT l.event_id, l.user_id, l.ts_sec,
           min_by(r.r_event_id, r.ts_sec) AS matched_event_id,
           min(r.ts_sec) AS matched_ts_sec
    FROM lft l
    LEFT JOIN rgt r ON l.user_id = r.user_id AND r.ts_sec >= l.ts_sec
    GROUP BY l.event_id, l.user_id, l.ts_sec
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each click, the EARLIEST purchase at-or-
    after it — the time-to-conversion lookup (``join_asof`` answers the
    backward "state as of" question; this answers "what happened next").

    Implemented as the backward as-of over NEGATED timestamps — zero new
    operator code, so both directions share the one-shuffle union+window
    dataflow (operators/asof.py) and its scale posture.  The oracle keeps
    the O(n·m)-per-key join+argmin formulation, fine at sf0.01 only.
    """
    ev = T(spark, sf_dir, "events").withColumn("ts_sec", F.expr("ts_ns div 1000000000"))
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts_sec")
        .withColumn("ts_neg", -F.col("ts_sec"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts_sec", "event_id")
        .withColumn("ts_neg", -F.col("ts_sec"))
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts_neg",
        right_ts="ts_neg",
        value_cols=["event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.col("matched_event_id"),
        (-F.col("matched_ts")).alias("matched_ts_sec"),
    )


@register(
    "agg_partial_merge",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
             AS total_centi
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable partial aggregation — the incremental-rollup pattern for
    plain sums/counts: each data shard (here orders split by key parity,
    standing in for daily partitions) aggregates INDEPENDENTLY, and the
    final totals come from merging the partial rows — proven equal to the
    direct aggregation by the oracle.

    This is the 100 TB continuous-rollup story for the 99% of metrics
    that are algebraic (sum/count/min/max): persist per-partition partial
    rows (cheap, shard-local), answer totals by re-aggregating partials
    (cardinality = groups × shards, not raw rows), never rescan history —
    the plain-agg sibling of ``agg_hll_union``'s sketch partials.
    """
    orders = T(spark, sf_dir, "orders")

    def partial(shard: DataFrame) -> DataFrame:
        return shard.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100.0).cast("long")).alias("tc"),
        )

    shards = [
        partial(orders.filter(F.col("o_orderkey") % 2 == i)) for i in (0, 1)
    ]
    merged = shards[0].unionByName(shards[1])
    return (
        merged.groupBy("o_orderpriority")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.sum("tc").cast("long").alias("total_centi"),
        )
        .orderBy("o_orderpriority")
    )
