"""Round-7 batch 13 — BPE pair-count training step, HHI market
concentration, rolling correlation, dynamic-partition-overwrite sink,
and the near-dup candidate degree histogram.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.analytics_r3 import _scratch
from cassandra_syncer_spark.queries.llm_dedup import (
    _band_union,
    _minhash_cte,
    _minhash_pairs,
)
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# tokenizer_bpe_pair_step — one BPE training iteration (pair counting)
# ---------------------------------------------------------------------------

_BPE_TOP = 20


@register(
    "tokenizer_bpe_pair_step",
    oracle=f"""
    WITH tok AS (
      SELECT t.w FROM documents,
        LATERAL (SELECT unnest(string_split(lower(text), ' ')) AS w) t
      WHERE len(t.w) >= 2
    ),
    wf AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY w),
    pairs AS (
      SELECT substr(w, i.i, 1) AS sym_a, substr(w, i.i + 1, 1) AS sym_b, freq
      FROM wf, LATERAL (SELECT unnest(range(1, len(w))) AS i) i
    ),
    pc AS (
      SELECT sym_a, sym_b, CAST(sum(freq) AS BIGINT) AS pair_count
      FROM pairs GROUP BY sym_a, sym_b
    )
    SELECT CAST(rank AS BIGINT) AS rank, sym_a, sym_b, pair_count
    FROM (
      SELECT sym_a, sym_b, pair_count,
             row_number() OVER (ORDER BY pair_count DESC, sym_a, sym_b) AS rank
      FROM pc
    ) WHERE rank <= {_BPE_TOP} ORDER BY rank
    """,
)
def tokenizer_bpe_pair_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One byte-pair-encoding TRAINING iteration over the corpus: count
    every adjacent symbol pair weighted by word frequency and rank the
    top merges — the inner loop of BPE/WordPiece vocabulary training
    (the rank-1 pair is the next merge rule).  Distributed exactly as
    production BPE trainers do it: pair counts come off the
    frequency-collapsed VOCABULARY, never the raw token stream, so a
    word occurring 10⁹ times costs one row.

    Scale shape: token agg (vocabulary-bounded, Zipf-capped) → scan-side
    pair expansion over the vocab table (word-length-bounded) → pair agg
    onto an alphabet²-bounded key space.  The top-k window runs on that
    ≤|alphabet|² table — single-partition but dimension-sized, the same
    contract as ``agg_chi_square``'s marginals.  Pure integer counts.
    """
    tok = (
        T(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") >= 2)
    )
    wf = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    pairs = wf.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> named_struct('sym_a', substr(w, i, 1),"
                "                   'sym_b', substr(w, i + 1, 1)))"
            )
        ).alias("p"),
        "freq",
    ).select("p.sym_a", "p.sym_b", "freq")
    pc = pairs.groupBy("sym_a", "sym_b").agg(
        F.sum("freq").cast("long").alias("pair_count")
    )
    w = Window.orderBy(F.desc("pair_count"), F.asc("sym_a"), F.asc("sym_b"))
    return (
        pc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _BPE_TOP)
        .select("rank", "sym_a", "sym_b", "pair_count")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# agg_hhi_concentration — Herfindahl–Hirschman index per event type
# ---------------------------------------------------------------------------


@register(
    "agg_hhi_concentration",
    oracle="""
    WITH u AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_u
      FROM events GROUP BY event_type, user_id
    ),
    t AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n_u) AS BIGINT) AS n_events,
             CAST(sum(n_u * n_u) AS BIGINT) AS s2
      FROM u GROUP BY event_type
    )
    SELECT event_type, n_events, n_users,
           CAST((1000000 * s2) // (n_events * n_events) AS BIGINT) AS hhi_micro,
           CAST((1000 * n_events * n_events) // s2 AS BIGINT) AS effective_n_milli
    FROM t ORDER BY event_type
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration per event type: HHI of the
    per-user activity shares (Σ shareᵢ², micro) plus the inverse-HHI
    "effective number of users" (milli) — the is-this-metric-driven-
    by-three-whales check that complements ``events_gini_concentration``
    (HHI weights the head, Gini the whole curve).

    Fully integer: HHI·1e6 = (1e6·Σn_u²)//N² is ONE integral division of
    exact BIGINTs (quantizing per-user shares first would zero out the
    tail) — no floats anywhere.

    Scale shape: (type,user) hash agg collapses the fact (map-side
    combined), then a type-keyed agg on the user-bounded table; scalars
    on |types| rows.  No joins, no windows.
    """
    u = (
        T(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_u"))
    )
    t = u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_u").cast("long").alias("n_events"),
        F.sum(F.col("n_u") * F.col("n_u")).cast("long").alias("s2"),
    )
    return t.select(
        "event_type",
        "n_events",
        "n_users",
        F.expr("(1000000 * s2) div (n_events * n_events)")
        .cast("long")
        .alias("hhi_micro"),
        F.expr("(1000 * n_events * n_events) div s2")
        .cast("long")
        .alias("effective_n_milli"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# win_rolling_corr — rolling correlation of value vs its own lag
# ---------------------------------------------------------------------------

_CORR_WIN = 10

#: ONE shared formula text (the events_ctr_wilson rule): both engines run
#: the identical IEEE op sequence over exact integer window sums, so the
#: rounded double hashes identically.
_CORR_EXPR = (
    "round((CAST(nw AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / nullif(sqrt((CAST(nw AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(nw AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0.0), 6)"
)


@register(
    "win_rolling_corr",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id,
             epoch_ns(ts) // 1000000000 AS ts_sec,
             CAST(round(100 * value) AS BIGINT) AS x
      FROM events WHERE user_id < 5 AND value IS NOT NULL
    ),
    lagged AS (
      SELECT user_id, event_id, ts_sec, x,
             lag(x) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS y
      FROM e
    ),
    sums AS (
      SELECT user_id, event_id, ts_sec,
             count(*)   OVER w AS nw,
             sum(x)     OVER w AS sx,
             sum(y)     OVER w AS sy,
             sum(x * y) OVER w AS sxy,
             sum(x * x) OVER w AS sxx,
             sum(y * y) OVER w AS syy
      FROM lagged WHERE y IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id
                   ROWS BETWEEN {_CORR_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, ts_sec, CAST(nw AS BIGINT) AS n_win,
           {_CORR_EXPR} AS corr_r6
    FROM sums ORDER BY user_id, ts_sec, event_id
    """,
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {win}-event autocorrelation of each tracked user's metric
    (value vs its own 1-lag) — the momentum/mean-reversion detector for
    per-entity time series, and the windowed big sibling of
    ``agg_stats_corr``.

    Numeric discipline: values centi-quantize per row, ALL six window
    sums are exact integers, and the one float step is the final Pearson
    formula evaluated per row from ONE shared SQL text (``_CORR_EXPR``)
    so both engines execute the identical IEEE sequence; zero variance
    inside a window → NULL on both (nullif-guarded sqrt denominator).

    Scale shape: one user-keyed exchange; the lag window and the
    rolling-frame window share the identical partitioning+ordering, so
    Spark plans ONE sort and both windows ride it.  The tracked-user
    filter pushes to the scan.
    """
    e = (
        T(spark, sf_dir, "events")
        .filter((F.col("user_id") < 5) & F.col("value").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.expr("ts_ns div 1000000000").alias("ts_sec"),
            F.round(F.lit(100) * F.col("value")).cast("long").alias("x"),
        )
    )
    order = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    lagged = e.withColumn("y", F.lag("x").over(order)).filter(
        F.col("y").isNotNull()
    )
    frame = order.rowsBetween(-(_CORR_WIN - 1), 0)
    sums = lagged.select(
        "user_id",
        "event_id",
        "ts_sec",
        F.count(F.lit(1)).over(frame).alias("nw"),
        F.sum("x").over(frame).alias("sx"),
        F.sum("y").over(frame).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(frame).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(frame).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(frame).alias("syy"),
    )
    return sums.select(
        "user_id",
        "event_id",
        "ts_sec",
        F.col("nw").cast("long").alias("n_win"),
        F.expr(_CORR_EXPR).alias("corr_r6"),
    ).orderBy("user_id", "ts_sec", "event_id")


win_rolling_corr.__doc__ = win_rolling_corr.__doc__.format(win=_CORR_WIN)


# ---------------------------------------------------------------------------
# sink_dynamic_partition_overwrite — partition-scoped overwrite semantics
# ---------------------------------------------------------------------------


@register(
    "sink_dynamic_partition_overwrite",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l_returnflag = 'R'
                         THEN 2 * CAST(round(l_quantity * 100.0) AS BIGINT)
                         ELSE CAST(round(l_quantity * 100.0) AS BIGINT) END)
                AS BIGINT) AS qty_centi
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition overwrite: a second write that carries only the
    'R' partition (with doubled quantities) replaces ONLY that
    partition's directory — the untouched partitions survive byte-for-
    byte.  This is the incremental-reprocessing cornerstone at 100 TB:
    recompute one day/source/flag partition and swap it in atomically,
    instead of `overwrite` nuking the whole table (Spark's STATIC
    default — the production outage every team hits exactly once).

    The oracle reads the original table and applies the doubling in SQL:
    equality proves the non-'R' partitions really were preserved AND the
    'R' partition really was replaced (a static overwrite would drop the
    other flags entirely; a failed overwrite would leave 'R' undoubled).

    Scale shape: both writes are one pass over their input, partitioned
    by the flag column; the read-back aggregates with partition
    discovery but no filter (all partitions, proving presence).
    """
    out = _scratch(sf_dir, "dynoverwrite")
    base = T(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        F.round(F.col("l_quantity") * 100.0).cast("long").alias("qty_centi"),
    )
    base.write.partitionBy("l_returnflag").mode("overwrite").parquet(out)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            base.filter(F.col("l_returnflag") == "R")
            .withColumn("qty_centi", F.col("qty_centi") * 2)
            .write.partitionBy("l_returnflag")
            .mode("overwrite")
            .parquet(out)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    back = spark.read.schema("l_orderkey long, qty_centi long, l_returnflag string").parquet(
        out
    )
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("qty_centi").cast("long").alias("qty_centi"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# dedup_candidate_degree_hist — near-dup candidate degree distribution
# ---------------------------------------------------------------------------


@register(
    "dedup_candidate_degree_hist",
    oracle=f"""
    {_minhash_cte(True)},
    bands AS ({_band_union(True)}),
    dp AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    deg AS (
      SELECT doc, CAST(count(*) AS BIGINT) AS degree
      FROM (SELECT doc_a AS doc FROM dp UNION ALL SELECT doc_b FROM dp)
      GROUP BY doc
    ),
    hist AS (
      SELECT degree, CAST(count(*) AS BIGINT) AS n_docs FROM deg GROUP BY degree
    )
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS degree,
             (SELECT count(*) FROM documents) - (SELECT count(*) FROM deg)
               AS n_docs
      UNION ALL
      SELECT degree, n_docs FROM hist
    ) WHERE n_docs > 0 ORDER BY degree
    """,
)
def dedup_candidate_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the MinHash candidate graph: how many
    near-dup candidate partners each document has, histogrammed (degree
    0 included) — the pre-flight check before running verification:
    a fat tail means hot boilerplate bands (salting territory, see
    ``dedup_minhash_salted``), a spike at 0 means the banding is too
    strict for the corpus.  Reuses the registered band kernel
    (``_minhash_pairs``) so the histogram audits the REAL candidate
    generator, not a reimplementation.

    Scale shape: the banded self-join is the same bucket-local pair
    expansion as ``text_minhash_dedup`` (no new hazard); the degree agg
    keys on doc_id and the histogram on the degree value — both
    combiner-friendly; the degree-0 row comes from two single-row
    counts, not an anti-join.
    """
    pairs = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    deg = (
        pairs.select(F.col("doc_a").alias("doc"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc")))
        .groupBy("doc")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    total = T(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("n_total"))
    n_deg = deg.agg(F.count(F.lit(1)).alias("n_with"))
    zero = total.crossJoin(n_deg).select(
        F.lit(0).cast("long").alias("degree"),
        (F.col("n_total") - F.col("n_with")).cast("long").alias("n_docs"),
    )
    return (
        zero.unionByName(hist)
        .filter(F.col("n_docs") > 0)
        .orderBy("degree")
    )
