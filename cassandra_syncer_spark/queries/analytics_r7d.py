"""Round-7 batch 4 — structural template mining, seasonal-naive
forecasting with backtest, and embedding-table hygiene auditing.

Reference parity note: analytics extensions beyond the reference's sync
surface; integer/micro-unit exact formulas on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# text_dedup_templates — boilerplate detection by content-stripped skeleton
# ---------------------------------------------------------------------------


@register(
    "text_dedup_templates",
    oracle="""
    WITH s AS (
      SELECT doc_id, source,
             md5(array_to_string(list_transform(string_split(text, ' '),
               w -> CASE WHEN len(w) = 0 THEN '0'
                         WHEN len(w) <= 3 THEN 'S'
                         WHEN len(w) <= 6 THEN 'M' ELSE 'L' END), '')) AS skel
      FROM documents
    ),
    fam AS (
      SELECT skel, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(min(doc_id) AS BIGINT) AS exemplar_doc
      FROM s GROUP BY skel
    )
    SELECT skel, n_docs, n_sources, exemplar_doc,
           CAST(row_number() OVER (ORDER BY n_docs DESC, skel) AS BIGINT) AS rk
    FROM fam
    QUALIFY rk <= 10 AND n_docs >= 2
    ORDER BY rk
    """,
)
def text_dedup_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPLATE MINING — boilerplate families by STRUCTURE, not content:
    each document collapses to a skeleton (its sequence of word-length
    buckets 0/S/M/L), and skeletons shared by many docs across many
    sources are generated templates (listing pages, auto-reports,
    spun articles) that word-level MinHash misses because the slot
    FILLERS differ while the frame repeats.  Top-10 families with doc
    count, source spread, and an exemplar doc for inspection.

    Scale shape: the skeleton is one scan-fused higher-order transform
    + md5 (no explode — one hash per document), the family table is a
    skeleton-keyed hash agg (map-side combined), and the rank window
    runs over the FAMILY table, which Zipf keeps far smaller than the
    corpus.  Identical kernel discipline to ``dedup_exact_text``, one
    representation to the left.
    """
    s = T(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(
            F.expr(
                "array_join(transform(split(text, ' '),"
                " w -> CASE WHEN length(w) = 0 THEN '0'"
                " WHEN length(w) <= 3 THEN 'S'"
                " WHEN length(w) <= 6 THEN 'M' ELSE 'L' END), '')"
            )
        ).alias("skel"),
    )
    fam = s.groupBy("skel").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.min("doc_id").cast("long").alias("exemplar_doc"),
    )
    w = Window.orderBy(F.desc("n_docs"), F.asc("skel"))
    return (
        fam.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter((F.col("rk") <= 10) & (F.col("n_docs") >= 2))
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# events_forecast_backtest — seasonal-naive forecast + integer MAE backtest
# ---------------------------------------------------------------------------


@register(
    "events_forecast_backtest",
    oracle="""
    WITH h AS (
      SELECT event_type,
             epoch_ns(ts) // 1000000000 // 3600 AS hr,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT max(hr) AS h1 FROM h),
    joined AS (
      SELECT a.event_type, a.hr, a.n AS actual,
             coalesce(b.n, 0) AS forecast
      FROM h a LEFT JOIN h b
        ON a.event_type = b.event_type AND b.hr = a.hr - 24
      CROSS JOIN span
      WHERE a.hr > span.h1 - 24
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(actual) AS BIGINT) AS actual_total,
           CAST(sum(forecast) AS BIGINT) AS forecast_total,
           CAST((1000000 * sum(abs(actual - forecast))) // count(*) AS BIGINT)
             AS mae_micro
    FROM joined GROUP BY event_type ORDER BY event_type
    """,
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive FORECAST BACKTEST — the baseline every time-series
    model must beat, evaluated the honest way: forecast each of the
    last 24 hours as the count 24 hours earlier, and report per-type
    MAE against the actuals in exact integer micro-units.  A pipeline
    uses this to pick alert thresholds and to gate fancier models (if
    your model's backtest MAE isn't under the seasonal-naive row,
    ship the naive).

    Scale shape: the (type, hour) pre-agg collapses the corpus map-side
    to a dimension table; the forecast join is a self-join of that
    dimension on (type, hour−24); the backtest window is the last 24
    rows per type.  Nothing downstream of the first agg touches corpus-
    sized data.
    """
    h = (
        T(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("CAST(unix_seconds(ts) AS BIGINT) div 3600").alias("hr"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    span = h.agg(F.max("hr").alias("h1"))
    b = h.select(
        "event_type", (F.col("hr") + 24).alias("hr"), F.col("n").alias("fc")
    )
    joined = (
        h.join(b, ["event_type", "hr"], "left")
        .crossJoin(F.broadcast(span))
        .filter(F.col("hr") > F.col("h1") - 24)
        .select(
            "event_type",
            F.col("n").alias("actual"),
            F.coalesce("fc", F.lit(0)).alias("forecast"),
        )
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.sum("actual").cast("long").alias("actual_total"),
            F.sum("forecast").cast("long").alias("forecast_total"),
            F.expr(
                "CAST((1000000 * sum(abs(actual - forecast))) div count(*) AS BIGINT)"
            ).alias("mae_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# embed_norm_audit — vector-table hygiene audit
# ---------------------------------------------------------------------------

_NORM_EPS_MICRO = 1000  # |norm² − 1| ≤ 0.001 counts as unit-norm


@register(
    "embed_norm_audit",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    m AS (
      SELECT vec_id, len(v) AS dim,
             CAST(round(1000000 * list_sum(list_transform(v, x -> x * x)))
                  AS BIGINT) AS sq_micro,
             len(list_filter(v, x -> x IS NULL)) AS n_null,
             len(list_filter(v, x -> isnan(x))) AS n_nan
      FROM e
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(count(CASE WHEN dim <> 64 THEN 1 END) AS BIGINT) AS n_bad_dim,
           CAST(count(CASE WHEN n_null > 0 OR n_nan > 0 THEN 1 END) AS BIGINT)
             AS n_bad_values,
           CAST(count(CASE WHEN abs(sq_micro - 1000000) <= {_NORM_EPS_MICRO}
                           THEN 1 END) AS BIGINT) AS n_unit_norm,
           CAST(count(CASE WHEN sq_micro = 0 THEN 1 END) AS BIGINT) AS n_zero
    FROM m
    """,
)
def embed_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING-TABLE HYGIENE AUDIT — the preflight every vector
    pipeline needs before cosine math means anything: dimension
    mismatches, NULL/NaN components, zero vectors, and the unit-norm
    count (cosine = dot only holds on unit vectors; a model change that
    ships unnormalized vectors silently breaks every similarity
    threshold downstream).  One audit row; alert when n_unit_norm <
    n_vecs − n_bad.

    Scale shape: pure scan-fused higher-order array math (fold for the
    squared norm, filters for bad values) into one map-side global agg
    — the whole audit is one pass at scan speed, no shuffle beyond the
    single-row reduce.  Norm² is rounded to micro before the envelope
    compare (left-associated fold order is identical on both engines,
    and micro-rounding absorbs the last-ulp difference).
    """
    m = T(spark, sf_dir, "embeddings").select(
        F.size("embedding").alias("dim"),
        F.expr(
            "CAST(round(1000000 * aggregate(embedding, 0D,"
            " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
            " AS BIGINT)"
        ).alias("sq_micro"),
        F.size(F.filter("embedding", lambda x: x.isNull())).alias("n_null"),
        F.size(F.filter("embedding", lambda x: F.isnan(x))).alias("n_nan"),
    )
    return m.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.count(F.when(F.col("dim") != 64, 1)).cast("long").alias("n_bad_dim"),
        F.count(F.when((F.col("n_null") > 0) | (F.col("n_nan") > 0), 1))
        .cast("long")
        .alias("n_bad_values"),
        F.count(
            F.when(
                F.abs(F.col("sq_micro") - 1000000) <= _NORM_EPS_MICRO, 1
            )
        )
        .cast("long")
        .alias("n_unit_norm"),
        F.count(F.when(F.col("sq_micro") == 0, 1)).cast("long").alias("n_zero"),
    )


# ---------------------------------------------------------------------------
# stream_stateful_ledger — applyInPandasWithState driven as a checkable query
# ---------------------------------------------------------------------------


@register(
    "stream_stateful_ledger",
    oracle="""
    SELECT o_orderpriority AS container,
           CAST(count(*) AS BIGINT) AS files_seen,
           CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT) % 100000)
                AS BIGINT) AS bytes_total
    FROM orders WHERE o_orderkey % 4 = 0
    GROUP BY o_orderpriority ORDER BY container
    """,
)
def stream_stateful_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL OPERATOR (``applyInPandasWithState``) driven end
    to end as a driver-checked query: the per-container upload ledger
    (``streaming/stateful.py`` — the stateful form of the reference's
    only-new-files invariant, bin/cassandra-syncer:268-277) consumes a
    file stream staged TWICE (duplicate deliveries), maintains
    arbitrary per-key state (seen-name hash set + byte total) across
    micro-batches, and must converge to exactly the single-copy truth:
    the oracle is plain per-container COUNT/SUM over the original rows.
    The ledger emits an updated row per key per batch; the final state
    is recovered batching-independently as the max over emissions
    (files_seen and bytes_total are monotone under the ledger's
    skip-already-seen rule) — so the hash check is stable no matter how
    the files split into triggers.

    Scale shape: state is keyed on container and bounded (8-byte name
    hashes, idle-key eviction in the long-running form); each
    micro-batch costs O(batch), never O(history).
    """
    import os
    import shutil
    import tempfile

    from cassandra_syncer_spark.streaming.stateful import upload_ledger

    stage = os.path.join(tempfile.gettempdir(), f"css_ledger_stage_{os.getpid()}")
    ckpt = os.path.join(tempfile.gettempdir(), f"css_ledger_ckpt_{os.getpid()}")
    for d in (stage, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    files = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 4 == 0)
        .select(
            F.col("o_orderpriority").alias("container"),
            F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("name"),
            F.expr(
                "CAST(round(o_totalprice * 100.0) AS BIGINT) % 100000"
            ).alias("bytes"),
        )
    )
    # duplicate deliveries: the same file set staged twice
    files.coalesce(2).write.mode("overwrite").json(os.path.join(stage, "c1"))
    files.coalesce(3).write.mode("append").json(os.path.join(stage, "c2"))

    stream = (
        spark.readStream.format("json")
        .schema("container string, name string, bytes long")
        .option("maxFilesPerTrigger", 2)
        .load(os.path.join(stage, "*"))
    )
    ledger = upload_ledger(stream, idle_evict_ms=None)  # availableNow drain
    q = (
        ledger.writeStream.format("memory")
        .queryName("css_stream_stateful_ledger")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table("css_stream_stateful_ledger")
        .groupBy("container")
        .agg(
            F.max("files_seen").cast("long").alias("files_seen"),
            F.max("bytes_total").cast("long").alias("bytes_total"),
        )
        .orderBy("container")
    )


# ---------------------------------------------------------------------------
# dedup_banding_recall — measured MinHash-banding recall vs exact Jaccard
# ---------------------------------------------------------------------------

_BR_JACC_MICRO = 200000  # true-neighbor cut: exact shingle Jaccard >= 0.2
#   (deliberately BELOW the 0.5 verify cut: the audit must measure the
#   candidate-generation curve in the region where banding probability
#   1-(1-j^2)^4 is not yet saturated — at j=0.2 theory gives ~15%, at
#   j=0.5 ~66%)
_BR_PROBE_TARGET = 100  # constant probe-sample SIZE at any corpus scale:
#   modulus = greatest(1, n_docs div target), the embed_cosine_histogram
#   derived-modulus idiom.  A fixed 1-in-5 RATE made the brute-force truth
#   side probe×corpus QUADRATIC in the corpus — invisible at the sf0.01
#   gate (500 docs ⇒ modulus 5, bit-identical output) and caught by the
#   round-9 sf1 parity sweep, where 10k probes × 50k docs of shingle-set
#   intersections stalled both engines.  At a fixed BUDGET the audit is
#   linear in the corpus on both sides, which is what the docstring's
#   "probe sample is the knob" contract actually requires.


def _banding_recall_sql() -> str:
    from cassandra_syncer_spark.operators import fingerprint as fp
    from cassandra_syncer_spark.queries.llm_dedup import _band_union, _minhash_cte

    _SH_DUCK = fp.shingles_expr("words", duck=True)

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
    d AS (SELECT doc_id,
                 list_distinct({_SH_DUCK}) AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
    m AS (SELECT greatest(1, count(*) // {_BR_PROBE_TARGET}) AS md FROM documents),
    p AS (SELECT doc_id AS probe, sh AS psh FROM d, m WHERE doc_id % m.md = 0),
    truth AS (
      SELECT p.probe, d.doc_id AS other
      FROM p JOIN d ON p.probe <> d.doc_id
      WHERE (1000000 * len(list_intersect(p.psh, d.sh)))
            // len(list_distinct(list_concat(p.psh, d.sh))) >= {_BR_JACC_MICRO}
    ),
    caught AS (
      SELECT t.probe, t.other,
             CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM truth t LEFT JOIN cand c
        ON least(t.probe, t.other) = c.doc_a
       AND greatest(t.probe, t.other) = c.doc_b
    )
    SELECT probe,
           CAST(count(*) AS BIGINT) AS n_true_neighbors,
           CAST(sum(hit) AS BIGINT) AS n_caught,
           CAST((1000000 * sum(hit)) // count(*) AS BIGINT) AS recall_micro
    FROM caught GROUP BY probe ORDER BY probe
    """


@register("dedup_banding_recall", oracle=_banding_recall_sql())
def dedup_banding_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED BANDING RECALL — the text-side twin of
    ``sim_recall_audit``: for a probe sample of documents, compute the
    exact SHINGLE-set-Jaccard ≥ 0.2 true neighbors by brute force
    (the quantity the MinHash signature actually estimates) and report how
    many of them the MinHash band candidates actually caught.  With
    ``dedup_threshold_calibration`` (candidate PRECISION profile) this
    closes the banding-quality loop: calibration says what the
    candidates are worth, this says what the bands MISS — the number a
    production dedup run must watch when it tunes bands/rows (the
    1−(1−j^r)^b curve is theory; this row is the measurement).

    Scale shape: the brute-force truth side is probe-broadcast × corpus
    — linear in the corpus at a constant probe-sample SIZE (modulus
    derived from the table count, the ``embed_cosine_histogram`` idiom;
    a fixed 1-in-5 rate was probe×corpus quadratic — caught by the r9
    sf1 parity sweep); the candidate side is the ordinary banded
    self-join restricted to probe pairs.  Integer-micro Jaccard on both
    engines.
    """
    from cassandra_syncer_spark.queries.llm_dedup import _minhash_pairs

    from cassandra_syncer_spark.operators import fingerprint as fp

    sh = fp.shingles_expr("words", duck=False)
    d = (
        T(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("words"))
        .select("doc_id", F.array_distinct(F.expr(sh)).alias("sh"))
    )
    md = T(spark, sf_dir, "documents").agg(
        F.greatest(F.lit(1), F.expr(f"count(*) div {_BR_PROBE_TARGET}")).alias("md")
    )
    p = (
        d.crossJoin(F.broadcast(md))
        .filter(F.col("doc_id") % F.col("md") == 0)
        .select(F.col("doc_id").alias("probe"), F.col("sh").alias("psh"))
    )
    jmicro = F.expr(
        "(1000000 * size(array_intersect(psh, sh)))"
        " div size(array_union(psh, sh))"
    )
    truth = (
        d.join(F.broadcast(p), F.col("probe") != F.col("doc_id"))
        .filter(jmicro >= _BR_JACC_MICRO)
        .select("probe", F.col("doc_id").alias("other"))
    )
    cand = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    hit = (
        truth.join(
            cand,
            (F.least("probe", "other") == cand.doc_a)
            & (F.greatest("probe", "other") == cand.doc_b),
            "left",
        )
        .select(
            "probe",
            F.when(F.col("doc_a").isNotNull(), 1).otherwise(0).alias("hit"),
        )
    )
    return (
        hit.groupBy("probe")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_true_neighbors"),
            F.sum("hit").cast("long").alias("n_caught"),
            F.expr(
                "CAST((1000000 * sum(hit)) div count(*) AS BIGINT)"
            ).alias("recall_micro"),
        )
        .orderBy("probe")
    )
