"""Round-7 batch 3 — corpus health reporting, embedding-space
decontamination, rolling trend estimation, and link prediction on the
near-dup graph.

Reference parity note: analytics extensions beyond the reference's sync
surface (bin/cassandra-syncer:243-280); integer/micro-unit exact formulas
throughout so the DuckDB oracles hash bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# corpus_quality_report — the one-row corpus health dashboard
# ---------------------------------------------------------------------------


@register(
    "corpus_quality_report",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, lang, md5(text) AS th,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             CAST(count(DISTINCT th) AS BIGINT) AS n_unique,
             CAST(count(CASE WHEN n_tok < 50 THEN 1 END) AS BIGINT) AS n_short
      FROM d
    ),
    toplang AS (
      SELECT CAST(max(c) AS BIGINT) AS top_lang_docs
      FROM (SELECT lang, count(*) AS c FROM d GROUP BY lang)
    )
    SELECT b.n_docs, b.n_sources, b.total_tokens,
           CAST((1000000 * (b.n_docs - b.n_unique)) // nullif(b.n_docs, 0) AS BIGINT)
             AS exact_dup_micro,
           CAST((1000000 * b.total_tokens) // nullif(b.n_docs, 0) AS BIGINT)
             AS mean_tokens_micro,
           CAST((1000000 * b.n_short) // nullif(b.n_docs, 0) AS BIGINT) AS short_micro,
           CAST((1000000 * t.top_lang_docs) // nullif(b.n_docs, 0) AS BIGINT)
             AS top_lang_share_micro
    FROM base b, toplang t
    """,
)
def corpus_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row CORPUS HEALTH REPORT every data run opens with: doc
    and source counts, token volume, exact-duplicate rate, mean length,
    short-doc share, and dominant-language share — the numbers that
    decide whether a crawl drop is worth deduplicating at all.  Chains
    the engine's own kernels (md5 identity, scan-fused token counts)
    into a dashboard row rather than introducing new machinery.

    Scale shape: ONE pass over the corpus computing all distributive
    aggregates together (count/sum/conditional counts map-side); the
    two distinct-counts are the only shuffle-bound terms, each a
    fixed-width hash key, and both have registered sketch escape
    hatches (``agg_approx_distinct`` family) when exactness is not
    required.  Language shares come from a |langs|-row sub-agg.
    """
    d = T(spark, sf_dir, "documents").select(
        "source",
        "lang",
        F.md5("text").alias("th"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    base = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.countDistinct("th").cast("long").alias("n_unique"),
        F.count(F.when(F.col("n_tok") < 50, 1)).cast("long").alias("n_short"),
    )
    toplang = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").cast("long").alias("top_lang_docs"))
    )
    return base.crossJoin(F.broadcast(toplang)).select(
        "n_docs",
        "n_sources",
        "total_tokens",
        F.expr(
            "CAST((1000000 * (n_docs - n_unique)) div nullif(n_docs, 0) AS BIGINT)"
        ).alias("exact_dup_micro"),
        F.expr("CAST((1000000 * total_tokens) div nullif(n_docs, 0) AS BIGINT)").alias(
            "mean_tokens_micro"
        ),
        F.expr("CAST((1000000 * n_short) div nullif(n_docs, 0) AS BIGINT)").alias(
            "short_micro"
        ),
        F.expr(
            "CAST((1000000 * top_lang_docs) div nullif(n_docs, 0) AS BIGINT)"
        ).alias("top_lang_share_micro"),
    )


# ---------------------------------------------------------------------------
# decontam_embedding — embedding-space decontamination vs an eval set
# ---------------------------------------------------------------------------

_DC_COS_MIN = 0.35  # flag threshold (synthetic embeddings: top ~0.1% of pairs)


@register(
    "decontam_embedding",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
    c AS (SELECT vec_id, v FROM e WHERE vec_id % 100 <> 0),
    hits AS (
      SELECT q.q_id, c.vec_id,
             round(list_inner_product(q.qv, c.v), 6) AS cos
      FROM q CROSS JOIN c
      WHERE round(list_inner_product(q.qv, c.v), 6) >= {_DC_COS_MIN}
    )
    SELECT q_id,
           CAST(count(*) AS BIGINT) AS n_flagged,
           CAST(max(round(1000000 * cos)) AS BIGINT) AS max_cos_micro,
           CAST(min(vec_id) AS BIGINT) AS first_flagged_vec
    FROM hits GROUP BY q_id ORDER BY q_id
    """,
)
def decontam_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination — the embedding-space complement of the
    n-gram forms (``decontam_ngram_overlap`` / contamination family):
    training vectors too close to any EVAL-set probe (cosine ≥ 0.35)
    are flagged for removal, catching paraphrased contamination that
    token overlap misses.  Per probe: how many training vectors it
    contaminates and the worst similarity.

    Scale shape: the eval set is small by nature — it BROADCASTS and the
    corpus scans once, embarrassingly parallel (the ``sim_cosine_topk``
    shape with a threshold instead of top-k, so output is bounded by
    true contamination, not k·|probes|).  At very large eval sets the
    sign-prefix cell route (``sim_recall_audit``'s ANN side) prefilters
    candidates; the threshold form stays the verify stage.
    """
    from cassandra_syncer_spark.queries.llm_similarity import _dot, _vec

    emb = _vec(T(spark, sf_dir, "embeddings")).select("vec_id", "v")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    c = emb.filter(F.col("vec_id") % 100 != 0)
    hits = (
        c.join(F.broadcast(q))
        .select(
            "q_id",
            "vec_id",
            F.round(_dot(F.col("qv"), F.col("v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= _DC_COS_MIN)
    )
    return (
        hits.groupBy("q_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_flagged"),
            F.max(F.round(1000000 * F.col("cos"))).cast("long").alias(
                "max_cos_micro"
            ),
            F.min("vec_id").cast("long").alias("first_flagged_vec"),
        )
        .orderBy("q_id")
    )


# ---------------------------------------------------------------------------
# win_rolling_slope — rolling OLS trend in exact integer micro-units
# ---------------------------------------------------------------------------


@register(
    "win_rolling_slope",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id,
             epoch_ns(ts) // 1000000000 AS ts_sec,
             CAST(round(value * 100.0) AS BIGINT) AS y
      FROM events
    ),
    xr AS (
      SELECT user_id, event_id, y,
             ts_sec - min(ts_sec) OVER (PARTITION BY user_id) AS x
      FROM e
    ),
    s AS (
      SELECT user_id, event_id,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(x) OVER w AS BIGINT) AS sx,
             CAST(sum(y) OVER w AS BIGINT) AS sy,
             CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
             CAST(sum(x * x) OVER w AS BIGINT) AS sxx
      FROM xr
      WINDOW w AS (PARTITION BY user_id ORDER BY x, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           CAST((1000000 * (n * sxy - sx * sy))
                // nullif(n * sxx - sx * sx, 0) AS BIGINT) AS slope_micro
    FROM s WHERE event_id % 20 = 0
    ORDER BY user_id, event_id
    """,
)
def win_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS TREND per key — slope of the last-5-events regression
    of value on time, the windowed trend detector behind "is this metric
    drifting" alerts, in EXACT integer micro-units: slope =
    (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) over integer sums, so no float
    accumulation order can flip the hash.  x is centered on the user's
    first event (slope-invariant) to keep n·Σx² inside int64; a
    zero-variance frame (all events same second) yields NULL via
    nullif, identically on both engines.

    Scale shape: one shuffle on user_id; all five frame sums share ONE
    window operator over one sort — the frame is O(1) rows per output.
    The %20 output filter bounds the DRIVER-CHECKED rows, not the
    computation.
    """
    e = T(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("CAST(unix_seconds(ts) AS BIGINT)").alias("ts_sec"),
        F.expr("CAST(round(value * 100.0) AS BIGINT)").alias("y"),
    )
    wu = Window.partitionBy("user_id")
    xr = e.select(
        "user_id",
        "event_id",
        "y",
        (F.col("ts_sec") - F.min("ts_sec").over(wu)).alias("x"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("x", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    s = xr.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("x").over(w).cast("long").alias("sx"),
        F.sum("y").over(w).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("long").alias("sxx"),
    )
    return (
        s.filter(F.col("event_id") % 20 == 0)
        .select(
            "user_id",
            "event_id",
            F.expr(
                "CAST((1000000 * (n * sxy - sx * sy))"
                " div nullif(n * sxx - sx * sx, 0) AS BIGINT)"
            ).alias("slope_micro"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# graph_common_neighbors — link prediction on the near-dup graph
# ---------------------------------------------------------------------------

_CN_CAP = 50  # per-node neighbor cap bounding wedge work
_CN_MIN = 1  # suggestion cut (validation fixture: its dup families are
#   near-complete cliques, so non-edge wedges are rare; production raises
#   this to 2-3 to trade recall for precision)
_CN_TOP = 20


def _cn_sql() -> str:
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
    adj AS (SELECT u AS ctr, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
    capped AS (
      SELECT ctr, nbr FROM (
        SELECT ctr, nbr,
               row_number() OVER (PARTITION BY ctr
                                  ORDER BY md5(CAST(nbr AS VARCHAR)), nbr) AS rk
        FROM adj
      ) WHERE rk <= {_CN_CAP}
    ),
    wedge AS (
      SELECT a.nbr AS x, b.nbr AS z, CAST(count(*) AS BIGINT) AS common
      FROM capped a JOIN capped b ON a.ctr = b.ctr AND a.nbr < b.nbr
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT w.x, w.z, w.common FROM wedge w
      LEFT JOIN e ON w.x = e.u AND w.z = e.v
      WHERE e.u IS NULL AND w.common >= {_CN_MIN}
    )
    SELECT x AS doc_a, z AS doc_b, common,
           CAST(row_number() OVER (ORDER BY common DESC, x, z) AS BIGINT) AS rk
    FROM cand
    QUALIFY rk <= {_CN_TOP}
    ORDER BY rk
    """


@register("graph_common_neighbors", oracle=_cn_sql())
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK PREDICTION on the near-dup graph — the missed-duplicate
    suggester: non-adjacent doc pairs sharing common band-candidate
    neighbors are ranked by common-neighbor count (the classic
    common-neighbors score).  In a dedup pipeline these are exactly the
    pairs banding narrowly missed (each shares bands with the same
    third documents) — the cheap recall-repair list to feed back into
    the verify stage.

    Scale shape: wedge enumeration is inherently Σdeg², so the degree is
    CAPPED — each node keeps its 50 hash-ranked neighbors (the same
    deterministic md5 rank as every sampler here), bounding per-task
    wedge work at cap² regardless of hub size, the same cap discipline
    as the measured banding salt cap.  The cap biases scores on >cap
    hubs (documented; hubs that dense are already duplicate families).
    Anti-join removes existing edges; global top-20 via rank window over
    the candidate table only.
    """
    from cassandra_syncer_spark.queries.llm_dedup import _minhash_pairs

    e = (
        _minhash_pairs(spark, sf_dir)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .localCheckpoint()
    )
    adj = e.select(F.col("u").alias("ctr"), F.col("v").alias("nbr")).unionAll(
        e.select(F.col("v").alias("ctr"), F.col("u").alias("nbr"))
    )
    wr = Window.partitionBy("ctr").orderBy(
        F.md5(F.col("nbr").cast("string")), F.col("nbr")
    )
    capped = (
        adj.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _CN_CAP)
        .select("ctr", "nbr")
    )
    a = capped.select("ctr", F.col("nbr").alias("x"))
    b = capped.select("ctr", F.col("nbr").alias("z"))
    wedge = (
        a.join(b, "ctr")
        .filter(F.col("x") < F.col("z"))
        .groupBy("x", "z")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    cand = (
        wedge.join(
            e,
            (wedge.x == e.u) & (wedge.z == e.v),
            "left_anti",
        )
        .filter(F.col("common") >= _CN_MIN)
    )
    wtop = Window.orderBy(F.desc("common"), F.asc("x"), F.asc("z"))
    return (
        cand.withColumn("rk", F.row_number().over(wtop).cast("long"))
        .filter(F.col("rk") <= _CN_TOP)
        .select(
            F.col("x").alias("doc_a"),
            F.col("z").alias("doc_b"),
            "common",
            "rk",
        )
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# sink_compact_small_files — the small-files compaction maintenance op
# ---------------------------------------------------------------------------


@register(
    "sink_compact_small_files",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prios,
           true AS files_reduced
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMALL-FILES COMPACTION — the table-maintenance op every streaming
    or incremental sink eventually needs: a table fragmented into many
    tiny parquet files (staged here as 64 shards, the worst case a
    per-trigger file sink produces) is rewritten into size-targeted
    files, and the query proves (a) the file count actually dropped and
    (b) the rewrite lost nothing — row count, key checksum, and
    distinct-group count all match the pre-compaction data, which is
    what the oracle computes from the source table directly.

    Scale shape: compaction is one repartition-by-size write — rows
    shuffle once into ceil(bytes/target) output tasks; at 100 TB this
    runs per-partition-directory (compact only directories whose file
    count exceeds a threshold) so the unit of work is a partition, not
    the table.  File-count math reads the FILE LISTING, never data.
    """
    import glob as _glob
    import os as _os
    import tempfile as _tmp

    frag = _os.path.join(
        _tmp.gettempdir(),
        f"css_compact_{_os.path.basename(_os.path.normpath(sf_dir))}_{_os.getpid()}",
    )
    compacted = frag + "_out"
    src = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_orderpriority")
    )
    # stage the fragmented table: 64 tiny files
    src.repartition(64).write.mode("overwrite").parquet(frag)
    n_small = len(_glob.glob(_os.path.join(frag, "part-*")))
    # compact: size-targeted rewrite (fixture rows are tiny; 4 output
    # tasks stands in for ceil(bytes/128MB))
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(
        compacted
    )
    n_big = len(_glob.glob(_os.path.join(compacted, "part-*")))
    back = spark.read.parquet(compacted)
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.countDistinct("o_orderpriority").cast("long").alias("n_prios"),
        F.lit(n_big < n_small).alias("files_reduced"),
    )


# ---------------------------------------------------------------------------
# cdc_snapshot_diff — typed change feed between two table snapshots
# ---------------------------------------------------------------------------


@register(
    "cdc_snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS k,
             md5(concat(o_orderstatus, '|', CAST(CAST(round(o_totalprice * 100.0) AS BIGINT) AS VARCHAR))) AS h
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    b AS (
      SELECT o_orderkey AS k,
             md5(concat(
               CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END,
               '|', CAST(CAST(round(o_totalprice * 100.0) AS BIGINT) AS VARCHAR))) AS h
      FROM orders WHERE o_orderkey % 7 <> 0
    ),
    d AS (
      SELECT coalesce(a.k, b.k) AS k,
             CASE WHEN a.k IS NULL THEN 'insert'
                  WHEN b.k IS NULL THEN 'delete'
                  WHEN a.h <> b.h THEN 'update'
                  ELSE 'unchanged' END AS op
      FROM a FULL JOIN b ON a.k = b.k
    )
    SELECT op, CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS key_sum
    FROM d GROUP BY op ORDER BY op
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE-DATA-CAPTURE between two snapshots — the analytics form of
    the reference's core loop (manifest diff: what must upload, what was
    deleted, what is unchanged — bin/cassandra-syncer:83-110, and this
    engine's ``sync/pipeline.py::plan_upload``): key-join the old and new
    snapshots on the primary key, classify every key as
    insert/delete/update/unchanged by content hash (the etag analog,
    storage-object.js:123-124), and emit the typed change feed summary
    (counts + key checksums per op).  The snapshots here are two
    deterministic filtered/mutated views of ``orders``, standing in for
    time-travel reads of the same table.

    Scale shape: ONE full-outer shuffle join on the primary key — the
    minimum any snapshot diff pays; content comparison is hash equality
    on fixed-width md5, never column-by-column; the op classification is
    scan-fused CASE math and the summary collapses map-side to 4 rows.
    On a bucketed/partitioned lakehouse layout the join co-locates and
    even that one shuffle disappears (``join_bucketed_colocated``).
    """
    o = T(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.md5(
            F.concat("o_orderstatus", F.lit("|"), F.expr("CAST(CAST(round(o_totalprice * 100.0) AS BIGINT) AS STRING)"))
        ).alias("h"),
    )
    b = o.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.md5(
            F.concat(
                F.when(F.col("o_orderkey") % 5 == 0, F.lit("X")).otherwise(
                    F.col("o_orderstatus")
                ),
                F.lit("|"),
                F.expr("CAST(CAST(round(o_totalprice * 100.0) AS BIGINT) AS STRING)"),
            )
        ).alias("h"),
    )
    d = (
        a.alias("a")
        .join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
        .select(
            F.coalesce(F.col("a.k"), F.col("b.k")).alias("k"),
            F.when(F.col("a.k").isNull(), "insert")
            .when(F.col("b.k").isNull(), "delete")
            .when(F.col("a.h") != F.col("b.h"), "update")
            .otherwise("unchanged")
            .alias("op"),
        )
    )
    return (
        d.groupBy("op")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("key_sum"),
        )
        .orderBy("op")
    )
