"""Round-7 additions — interval algebra, order statistics, graph metrics,
and budget allocation for training-data assembly.

Reference parity note: the reference's query surface is manifest diff /
latest-snapshot selection (core.js:403-417, bin/cassandra-syncer-restore:
60-76); everything here is part of the 100 TB analytics extension the
build mandates.  All formulas are integer/micro-unit exact so the DuckDB
oracle hashes bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# join_interval_coalesce — merge overlapping activity intervals per key
# ---------------------------------------------------------------------------

_IV_WIDTH_SEC = 300  # each event opens a 5-minute activity interval


@register(
    "join_interval_coalesce",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id,
             epoch_ns(ts) // 1000000000 AS s,
             epoch_ns(ts) // 1000000000 + {_IV_WIDTH_SEC} AS en
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, en,
             CASE WHEN max(en) OVER (PARTITION BY user_id ORDER BY s, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       >= s
                  THEN 0 ELSE 1 END AS new_island
      FROM e
    ),
    isl AS (
      SELECT user_id, s, en,
             sum(new_island) OVER (PARTITION BY user_id ORDER BY s, en
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    spans AS (
      SELECT user_id, island, min(s) AS lo, max(en) AS hi,
             CAST(count(*) AS BIGINT) AS n_events
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(hi - lo) AS BIGINT) AS covered_sec,
           CAST(max(hi - lo) AS BIGINT) AS max_span_sec,
           CAST(sum(n_events) AS BIGINT) AS n_events
    FROM spans GROUP BY user_id ORDER BY user_id
    """,
)
def join_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval COALESCE — merge overlapping/touching intervals into
    maximal spans per key: each event opens a 5-minute activity interval,
    overlapping intervals fuse, and the output is each user's span count,
    covered seconds, and longest span.  This is the interval-algebra
    primitive behind uptime/coverage reports, ad-break stitching, and
    merging near-dup match RANGES inside documents — the island trick of
    ``win_streak_islands`` lifted from points to intervals.

    Scale shape: ONE shuffle on user_id serves both windows (prefix-max
    end and running island sum share the sort spec), the span agg
    collapses map-side on (user, island), and the final per-user rollup
    rides the same partitioning.  No joins, no explode — linear in
    events at any corpus size.
    """
    ev = T(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("CAST(unix_seconds(ts) AS BIGINT)").alias("s"),
        F.expr(f"CAST(unix_seconds(ts) AS BIGINT) + {_IV_WIDTH_SEC}").alias("en"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.select(
        "user_id",
        "s",
        "en",
        F.when(F.max("en").over(w_prev) >= F.col("s"), 0).otherwise(1).alias(
            "new_island"
        ),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "en")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = flagged.select(
        "user_id", "s", "en", F.sum("new_island").over(w_run).alias("island")
    )
    spans = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("lo"),
        F.max("en").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return (
        spans.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.col("hi") - F.col("lo")).cast("long").alias("covered_sec"),
            F.max(F.col("hi") - F.col("lo")).cast("long").alias("max_span_sec"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# win_rolling_median — exact rolling median over a row frame
# ---------------------------------------------------------------------------


@register(
    "win_rolling_median",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id,
             epoch_ns(ts) // 1000000000 AS ts_sec,
             CAST(round(value * 100.0) AS BIGINT) AS v_centi
      FROM events
    )
    SELECT user_id, event_id,
           CAST(round(2.0 * median(v_centi) OVER (
                  PARTITION BY user_id ORDER BY ts_sec, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS BIGINT)
             AS med_demi_centi
    FROM e ORDER BY user_id, event_id
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling median (last-5-events frame) per user — the robust
    smoother for metric streams where a rolling mean is wrecked by one
    outlier (``win_ewma``'s mean-based complement).  The median of ≤ 5
    centi-integers is k or k+0.5 — exactly representable — so doubling
    to demi-centi units makes the output integer and the hash stable on
    both engines (Spark ``percentile`` and DuckDB ``median`` are both
    the interpolating order statistic).

    Scale shape: one shuffle on user_id; the frame is O(1) rows per
    output row, so the window is a streaming pass over each partition.
    Production-size frames (last N=1000s) stay linear — the sort is the
    partition sort, not per-frame.
    """
    ev = T(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("CAST(unix_seconds(ts) AS BIGINT)").alias("ts_sec"),
        F.expr("CAST(round(value * 100.0) AS BIGINT)").alias("v_centi"),
    )
    # round-12 (guide §4.1 prefer codegen'd built-ins): `percentile(...)
    # OVER (ROWS 4 PRECEDING)` is an IMPERATIVE aggregate under a sliding
    # frame — Spark rebuilds the percentile buffer (an OpenHashMap) and
    # replays all ≤5 frame rows for EVERY output row.  The same statistic
    # over a ≤5-row frame is 4 lags (O(1) offset frames on the same sort)
    # + a sorted-array pick, all whole-stage-codegen.  Exactly equal by
    # construction: for sorted a[0..n-1] the interpolating median doubles
    # to a[(n-1) div 2] + a[n div 2] for every n (odd: 2·middle; even:
    # the two middles' sum) — integer, so the old round() was an identity.
    # NULL v_centi rows stay in the frame but carry no value — both
    # percentile and the filtered array ignore them; all-NULL frames yield
    # NULL either way.
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    frame = [F.col("v_centi")] + [
        F.lag("v_centi", i).over(w) for i in range(1, 5)
    ]
    return (
        ev.select(
            "user_id",
            "event_id",
            F.sort_array(
                F.filter(F.array(*frame), lambda x: x.isNotNull())
            ).alias("arr"),
        )
        .select(
            "user_id",
            "event_id",
            F.expr(
                "IF(size(arr) = 0, CAST(NULL AS BIGINT),"
                " element_at(arr, CAST((size(arr) - 1) div 2 + 1 AS INT))"
                " + element_at(arr, CAST(size(arr) div 2 + 1 AS INT)))"
            ).alias("med_demi_centi"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# agg_percentile_disc — discrete (order-statistic) percentile per group
# ---------------------------------------------------------------------------


@register(
    "agg_percentile_disc",
    oracle="""
    WITH v AS (
      SELECT c_mktsegment,
             CAST(round(c_acctbal * 100.0) AS BIGINT) AS acct_centi
      FROM customer
    ),
    r AS (
      SELECT c_mktsegment, acct_centi,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY acct_centi, c_mktsegment) AS rn,
             count(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM v
    )
    SELECT c_mktsegment,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                         THEN acct_centi END) AS BIGINT) AS p50_disc_centi,
           CAST(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                         THEN acct_centi END) AS BIGINT) AS p90_disc_centi
    FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentile (percentile_disc semantics): the group element
    at rank ceil(p·n) — an actually-occurring value, where
    ``agg_percentile``'s continuous form interpolates between neighbors.
    The distinction matters for quantities that must remain realizable
    (a latency budget set to an observed latency, a doc-length cut at an
    actual length) and for categorical-coded integers where interpolated
    halves are meaningless.

    Scale shape: one shuffle on the group key, one window sort per group
    shared by rank and count, then a map-side conditional max — no
    second pass, no collect.  Parallelism of the exact form is capped at
    |groups| (the documented exact-sort ceiling, measured 2.1× at 10×);
    the registered sketch escape hatches for the same statistic are
    ``agg_percentile_hist`` (histogram quantiles per group, no row sort)
    and ``win_cume_dist_approx`` (histogram position) — same pattern as
    the exact/approx percentile pair.
    """
    v = T(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.expr("CAST(round(c_acctbal * 100.0) AS BIGINT)").alias("acct_centi"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("acct_centi", "c_mktsegment")
    wn = Window.partitionBy("c_mktsegment")
    r = v.select(
        "c_mktsegment",
        "acct_centi",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        r.groupBy("c_mktsegment")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long"),
                    F.col("acct_centi"),
                )
            )
            .cast("long")
            .alias("p50_disc_centi"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(0.9 * F.col("n")).cast("long"),
                    F.col("acct_centi"),
                )
            )
            .cast("long")
            .alias("p90_disc_centi"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# events_seasonality_profile — hour-of-day profile + peak + concentration
# ---------------------------------------------------------------------------


@register(
    "events_seasonality_profile",
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, hr, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, hr) AS rk,
             CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
      FROM h
    )
    SELECT event_type,
           CAST(max(total) AS BIGINT) AS n_events,
           CAST(max(CASE WHEN rk = 1 THEN hr END) AS BIGINT) AS peak_hour,
           CAST(max(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS peak_count,
           CAST(sum(n * n) * 1000000 // (max(total) * max(total)) AS BIGINT)
             AS hhi_micro
    FROM ranked GROUP BY event_type ORDER BY event_type
    """,
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality per event type: the peak hour
    (deterministic tie-break: earliest hour), its count, and the
    Herfindahl concentration of the 24-bin profile in exact micro-units
    — flat profiles (hhi → 1/24) are background noise, spiky ones
    (hhi → 1) are batch jobs / scheduled abuse.  The crawl-scheduling
    twin: per-source fetch seasonality decides when to re-crawl.

    Scale shape: the (type, hour) pre-agg collapses map-side to at most
    |types|·24 rows — everything after is window math on a dimension-
    sized table.  One corpus-wide shuffle, keyed on a 2-tuple with
    bounded cardinality (salting-free: the pre-agg removes the skew).
    """
    h = (
        T(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").cast("long").alias("hr"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wr = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("hr"))
    wt = Window.partitionBy("event_type")
    ranked = h.select(
        "event_type",
        "hr",
        "n",
        F.row_number().over(wr).alias("rk"),
        F.sum("n").over(wt).cast("long").alias("total"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("total").cast("long").alias("n_events"),
            F.max(F.when(F.col("rk") == 1, F.col("hr"))).cast("long").alias("peak_hour"),
            F.max(F.when(F.col("rk") == 1, F.col("n"))).cast("long").alias("peak_count"),
            F.expr(
                "CAST(sum(n * n) * 1000000 div (max(total) * max(total)) AS BIGINT)"
            ).alias("hhi_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# mix_budget_waterfill — capped proportional token-budget allocation
# ---------------------------------------------------------------------------

_WF_BUDGET_PCT = 50  # allocate half the corpus' total tokens


@register(
    "mix_budget_waterfill",
    oracle=f"""
    WITH s AS (
      SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(avail) AS BIGINT) AS t,
                   CAST(count(*) AS BIGINT) AS k FROM s),
    p1 AS (
      SELECT s.source, s.avail,
             (tot.t * {_WF_BUDGET_PCT} // 100) // tot.k AS fair,
             least(s.avail, (tot.t * {_WF_BUDGET_PCT} // 100) // tot.k) AS a1
      FROM s, tot
    ),
    agg1 AS (
      SELECT CAST((SELECT tot.t * {_WF_BUDGET_PCT} // 100 FROM tot) - sum(a1)
                  AS BIGINT) AS leftover,
             CAST(count(CASE WHEN avail > a1 THEN 1 END) AS BIGINT) AS n_open
      FROM p1
    )
    SELECT p1.source, p1.avail,
           CAST(CASE WHEN p1.avail > p1.a1 AND agg1.n_open > 0
                     THEN least(p1.avail, p1.a1 + agg1.leftover // agg1.n_open)
                     ELSE p1.a1 END AS BIGINT) AS alloc_tokens,
           CAST(p1.avail <= p1.fair AS BOOLEAN) AS capped
    FROM p1, agg1 ORDER BY p1.source
    """,
)
def mix_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget WATER-FILLING across sources — the allocation stage
    of mix design: a global budget (50% of corpus tokens) is split
    equally, sources with fewer tokens than their fair share are capped
    at what they have, and the freed budget is re-spread over the open
    sources in a second pass.  Two passes are registered (deterministic,
    closed-form); production iterates the same step to the fixpoint —
    each pass is one broadcast-scalar join, so depth-k waterfilling is
    k dimension-table passes, never a corpus re-scan.

    Scale shape: token counting is the only corpus-wide work (scan-fused
    size(split), map-side combined per source); everything downstream
    operates on the |sources|-row dimension with 1-row broadcast scalars
    for the totals.  All arithmetic is integer division — hash-exact.
    """
    docs = T(spark, sf_dir, "documents")
    # materialize the |sources|-row availability table ONCE: it feeds the
    # total scalar, pass-1, the leftover scalar, and the final projection —
    # without the checkpoint each consumer re-runs the corpus scan + agg
    # (the agg_hll_intersection lesson, measured 5.3x there)
    s = (
        docs.groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).cast("long").alias("avail"))
        .localCheckpoint()
    )
    tot = s.agg(
        F.sum("avail").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    p1 = s.crossJoin(F.broadcast(tot)).select(
        "source",
        "avail",
        F.expr(f"(t * {_WF_BUDGET_PCT} div 100) div k").alias("fair"),
        F.expr(f"least(avail, (t * {_WF_BUDGET_PCT} div 100) div k)").alias("a1"),
        F.expr(f"t * {_WF_BUDGET_PCT} div 100").alias("budget"),
    )
    agg1 = p1.agg(
        (F.max("budget") - F.sum("a1")).cast("long").alias("leftover"),
        F.count(F.when(F.col("avail") > F.col("a1"), 1)).cast("long").alias("n_open"),
    )
    return (
        p1.crossJoin(F.broadcast(agg1))
        .select(
            "source",
            "avail",
            F.expr(
                "CAST(CASE WHEN avail > a1 AND n_open > 0"
                " THEN least(avail, a1 + leftover div n_open)"
                " ELSE a1 END AS BIGINT)"
            ).alias("alloc_tokens"),
            (F.col("avail") <= F.col("fair")).alias("capped"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# graph_triangle_count — oriented triangle counting on the near-dup graph
# ---------------------------------------------------------------------------


def _triangle_sql() -> str:
    from cassandra_syncer_spark.queries.llm_dedup import _band_union, _minhash_cte

    return f"""
    {_minhash_cte(True)},
    bands AS ({_band_union(True)}),
    e AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    deg AS (
      SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS id FROM e UNION ALL SELECT v FROM e
      ) GROUP BY id
    ),
    o AS (
      -- orient each edge toward the (degree, id)-larger endpoint
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS a,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS b
      FROM e JOIN deg du ON e.u = du.id JOIN deg dv ON e.v = dv.id
    ),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM o o1 JOIN o o2 ON o1.b = o2.a JOIN o o3
        ON o3.a = o1.a AND o3.b = o2.b
    ),
    wedges AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           tri.n_triangles,
           wedges.n_wedges,
           CAST(CASE WHEN wedges.n_wedges > 0
                THEN 3000000 * tri.n_triangles // wedges.n_wedges
                ELSE 0 END AS BIGINT) AS clustering_micro
    FROM tri, wedges
    """


@register("graph_triangle_count", oracle=_triangle_sql())
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the MinHash
    near-dup graph — the structural audit of a dedup run: a high
    clustering coefficient means candidates form dense template families
    (boilerplate farms) where cluster-level canonicalization beats
    pairwise verification; near-zero means isolated accidental pairs.

    Scale shape: the textbook degree-ORIENTED join — each edge points at
    its (degree, id)-larger endpoint, so every triangle is generated
    exactly once from its lowest-degree apex, and the o1⋈o2 wedge join's
    fan-out is bounded by max OUT-degree ≤ O(√m) (total work O(m^1.5),
    the provable optimum for join-based counting; an unoriented
    neighbor join explodes on hub nodes).  Wedge totals come from the
    degree table — no second corpus pass.  Output is one audit row.
    """
    from cassandra_syncer_spark.queries.llm_dedup import _minhash_pairs

    e = _minhash_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    return triangle_stats(e)


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Oriented triangle counting over an arbitrary (u, v) edge list
    (u < v, distinct) — the kernel behind ``graph_triangle_count``,
    factored out so property tests can drive it on random graphs."""
    e = edges.localCheckpoint()
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    o = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.expr(
                "CASE WHEN struct(du, u) < struct(dv, v) THEN u ELSE v END"
            ).alias("a"),
            F.expr(
                "CASE WHEN struct(du, u) < struct(dv, v) THEN v ELSE u END"
            ).alias("b"),
        )
        .localCheckpoint()
    )
    o1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    o2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    o3 = o.select(F.col("a").alias("x"), F.col("b").alias("z"), F.lit(1).alias("ok"))
    tri = (
        o1.join(o2, "y")
        .join(o3, ["x", "z"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges")
    )
    n_edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return (
        n_edges.crossJoin(F.broadcast(n_nodes))
        .crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(wedges))
        .select(
            "n_edges",
            "n_nodes",
            "n_triangles",
            "n_wedges",
            F.expr(
                "CAST(CASE WHEN n_wedges > 0"
                " THEN 3000000 * n_triangles div n_wedges"
                " ELSE 0 END AS BIGINT)"
            ).alias("clustering_micro"),
        )
    )


# ---------------------------------------------------------------------------
# sim_recall_audit — measured recall of the sign-prefix ANN vs exact top-k
# ---------------------------------------------------------------------------

_RA_K = 5  # audit depth: top-5


def _recall_sql() -> str:
    from cassandra_syncer_spark.queries.llm_similarity import _KNN_CODE_DUCK

    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (
      SELECT CAST(length(bin(greatest((count(*) + 249) // 250, 8) - 1))
             AS BIGINT) AS b
      FROM e
    ),
    cells AS (
      SELECT vec_id, v, ({_KNN_CODE_DUCK}) >> (63 - n.b) AS cell
      FROM e, n
    ),
    q AS (SELECT vec_id AS q_id, v AS qv, cell AS qcell
          FROM cells WHERE vec_id < {_RA_K}),
    exact AS (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, e.vec_id,
               row_number() OVER (
                 PARTITION BY q.q_id
                 ORDER BY round(list_inner_product(q.qv, e.v), 6) DESC,
                          e.vec_id) AS rn
        FROM q CROSS JOIN e WHERE q.q_id <> e.vec_id
      ) WHERE rn <= {_RA_K}
    ),
    ann AS (
      SELECT q_id, vec_id, n_cand FROM (
        SELECT q.q_id, c.vec_id,
               row_number() OVER (
                 PARTITION BY q.q_id
                 ORDER BY round(list_inner_product(q.qv, c.v), 6) DESC,
                          c.vec_id) AS rn,
               CAST(count(*) OVER (PARTITION BY q.q_id) AS BIGINT) AS n_cand
        FROM q JOIN cells c ON q.qcell = c.cell AND q.q_id <> c.vec_id
      ) WHERE rn <= {_RA_K}
    )
    SELECT a.q_id,
           CAST(max(a.n_cand) AS BIGINT) AS n_candidates,
           CAST(count(x.vec_id) AS BIGINT) AS n_hit,
           CAST(1000000 * count(x.vec_id) // {_RA_K} AS BIGINT) AS recall_micro
    FROM ann a LEFT JOIN exact x
      ON a.q_id = x.q_id AND a.vec_id = x.vec_id
    GROUP BY a.q_id ORDER BY a.q_id
    """


@register("sim_recall_audit", oracle=_recall_sql())
def sim_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED ANN recall — the certification row every approximate
    index needs before it replaces the exact path: for a probe sample,
    run the sign-code-prefix-cell ANN (the ``sim_knn_graph_ivf``
    blocking key) AND the exact brute-force top-5, and report per probe
    how many exact neighbors the ANN recovered plus the candidate count
    it paid for.  This closes the loop the estimator-certification
    family (``dedup_minhash_estimate`` etc.) opened for sketches:
    sketch accuracy AND index recall are both driver-checked artifacts,
    not prose claims.

    Scale shape: the exact side is probe-broadcast × corpus — linear in
    the corpus and proportional to the PROBE SAMPLE, which is the knob
    (a 1000-probe audit over 100 TB is 1000 broadcast scans fused into
    one); the ANN side touches only the probes' cells.  Ranking is
    round(·,6)+id tie-broken, identical on both engines, so the audit
    hashes exactly.
    """
    from cassandra_syncer_spark.queries.llm_similarity import (
        _KNN_CODE_SPARK,
        _dot,
        _vec,
    )

    emb = _vec(T(spark, sf_dir, "embeddings")).select("vec_id", "v")
    bbits = emb.agg(
        F.expr(
            "cast(length(bin(greatest((count(*) + 249) div 250, 8) - 1)) as bigint)"
        ).alias("b")
    )
    cells = (
        emb.crossJoin(F.broadcast(bbits))
        .select(
            "vec_id",
            "v",
            F.expr(f"shiftright({_KNN_CODE_SPARK}, cast(63 - b as int))").alias(
                "cell"
            ),
        )
        .localCheckpoint()
    )
    q = cells.filter(F.col("vec_id") < _RA_K).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("cell").alias("qcell")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    exact = (
        cells.join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", F.round(_dot(F.col("qv"), F.col("v")), 6).alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RA_K)
        .select("q_id", "vec_id")
    )
    ann_scored = (
        cells.join(
            F.broadcast(q),
            (F.col("qcell") == F.col("cell")) & (F.col("q_id") != F.col("vec_id")),
        )
        .select("q_id", "vec_id", F.round(_dot(F.col("qv"), F.col("v")), 6).alias("cos"))
    )
    wc = Window.partitionBy("q_id")
    ann = (
        ann_scored.withColumn("rn", F.row_number().over(w))
        .withColumn("n_cand", F.count(F.lit(1)).over(wc).cast("long"))
        .filter(F.col("rn") <= _RA_K)
        .select("q_id", "vec_id", "n_cand")
    )
    hit = exact.select("q_id", "vec_id", F.lit(1).alias("is_hit"))
    return (
        ann.join(hit, ["q_id", "vec_id"], "left")
        .groupBy("q_id")
        .agg(
            F.max("n_cand").cast("long").alias("n_candidates"),
            F.count("is_hit").cast("long").alias("n_hit"),
            F.expr(f"CAST(1000000 * count(is_hit) div {_RA_K} AS BIGINT)").alias(
                "recall_micro"
            ),
        )
        .orderBy("q_id")
    )
