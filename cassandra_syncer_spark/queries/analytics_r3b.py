"""Round-3 second batch — time-range window frames, cohort retention,
winsorization, PII scrubbing, mergeable-sketch distinct counts, and
window-function breadth (cume_dist / nth_value).

Same contract as every query module: each query is registered with a
DuckDB oracle (value-hash parity locally via tests/test_oracle_parity.py)
unless the operator is approximate by construction (``agg_hll_union`` —
sketch estimates cannot hash-match an exact oracle; accuracy is gated by
tests/test_operators.py instead).  Cross-engine float discipline follows
the integerize-per-row rule used throughout (exact integer sums →
identical doubles on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.queries.windows import events_with_sec
from cassandra_syncer_spark.registry import register


@register(
    "win_range_interval",
    oracle="""
    SELECT user_id, event_id,
           epoch_ns(ts) // 1000000000 AS ts_sec,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           CAST(sum(CAST(round(value * 100.0) AS BIGINT)) OVER w AS BIGINT)
             AS val_centi_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000000000
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing time-RANGE window frame: per event, activity count and
    value sum over the PRECEDING HOUR of the same user — the value-based
    frame (`rangeBetween`) that `win_running_frame`'s row-based frame
    cannot express (a row frame counts N rows back regardless of how much
    wall-clock they span).

    Scale shape: one shuffle on user_id, then a per-partition sort; the
    range frame is evaluated with a sliding two-pointer over the sorted
    run (no per-row rescan, no self-join — the naive `e1 ⋈ e2 ON e2.ts
    BETWEEN e1.ts-1h AND e1.ts` formulation is O(n·k) with a join; this
    is O(n log n) in the sort).  Equal-timestamp peers are included by
    value in both engines (RANGE frame semantics).
    """
    ev = events_with_sec(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    centi = F.round(F.col("value") * 100.0).cast("long")
    return ev.select(
        "user_id",
        "event_id",
        "ts_sec",
        F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
        F.sum(centi).over(w).cast("long").alias("val_centi_1h"),
    )


@register(
    "events_retention",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_ns(ts) // 1000000000 // 86400 AS day FROM events
    ),
    c AS (
      SELECT user_id, day,
             min(day) OVER (PARTITION BY user_id) AS cohort_day
      FROM e
    )
    SELECT cohort_day, day - cohort_day AS day_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM c GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity day
    (the cohort), counted on each subsequent day-offset they return — the
    product-analytics staple behind every retention curve.

    The cohort day comes from a min() window over user_id (one shuffle);
    the (cohort, offset) roll-up is a second aggregation.  No join of the
    user dimension back to the fact — the window keeps it a two-stage
    dataflow, and at 100 TB both stages partition cleanly (user_id, then
    the small (cohort, offset) grid).  Days are integer epoch-day indices
    (ns-timestamp trap, FIXTURES.md).
    """
    ev = events_with_sec(spark, sf_dir).withColumn("day", F.expr("ts_sec div 86400"))
    w = Window.partitionBy("user_id")
    c = ev.select(
        "user_id", "day", F.min("day").over(w).alias("cohort_day")
    )
    return (
        c.groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "feat_winsorize",
    oracle="""
    WITH ranked AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    ),
    cuts AS (
      SELECT lang,
             min(CASE WHEN rn = greatest(CAST(ceil(0.05 * n) AS BIGINT), 1)
                      THEN n_chars END) AS lo,
             min(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                      THEN n_chars END) AS hi
      FROM ranked GROUP BY lang
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE d.n_chars < c.lo) AS BIGINT) AS n_clip_lo,
           CAST(count(*) FILTER (WHERE d.n_chars > c.hi) AS BIGINT) AS n_clip_hi,
           round(CAST(sum(greatest(c.lo, least(c.hi, d.n_chars))) AS DOUBLE)
                 / count(*), 4) AS mean_winsorized
    FROM documents d JOIN cuts c USING (lang)
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def feat_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clamping) of a measure at the per-group
    5th/95th percentile — the robust-statistics step a feature pipeline
    runs before normalization, using NEAREST-RANK percentiles (pure
    integer selection: the k=⌈p·n⌉-th smallest value) so both engines pick
    the identical cut row; interpolating percentile_cont's float
    arithmetic is not bit-portable across engines.

    Scale shape: the cut computation is a window + tiny per-group
    aggregate (one row per group); the clamp pass broadcasts the cuts
    table back onto the corpus — percentiles of a 100 TB fact cost one
    shuffle plus a broadcast join, never a second global sort.  (The
    sketch path for when even the per-group sort is too hot is
    ``agg_percentile_approx``.)
    """
    docs = T(spark, sf_dir, "documents")
    w_rn = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    w_n = Window.partitionBy("lang")
    ranked = docs.select(
        "lang",
        "n_chars",
        F.row_number().over(w_rn).cast("long").alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    k_lo = F.greatest(F.ceil(0.05 * F.col("n")).cast("long"), F.lit(1).cast("long"))
    k_hi = F.ceil(0.95 * F.col("n")).cast("long")
    cuts = ranked.groupBy("lang").agg(
        F.min(F.when(F.col("rn") == k_lo, F.col("n_chars"))).alias("lo"),
        F.min(F.when(F.col("rn") == k_hi, F.col("n_chars"))).alias("hi"),
    )
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("n_chars")))
    return (
        docs.join(F.broadcast(cuts), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count(F.when(F.col("n_chars") < F.col("lo"), 1))
            .cast("long")
            .alias("n_clip_lo"),
            F.count(F.when(F.col("n_chars") > F.col("hi"), 1))
            .cast("long")
            .alias("n_clip_hi"),
            F.round(
                F.sum(clamped).cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_winsorized"),
        )
        .orderBy("lang")
    )


#: PII-ish patterns, deliberately simple enough to mean the same thing in
#: Java regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
_NUM_RE = "[0-9]{4,}"


@register(
    "text_pii_scrub",
    oracle=f"""
    SELECT doc_id, lang,
           CAST(len(regexp_extract_all(text, '{_NUM_RE}')) AS BIGINT) AS n_num_runs,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_NUM_RE}', '<NUM>', 'g')) AS scrub_md5
    FROM documents
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing as a dataflow: redact email-shaped tokens and long
    digit runs (IDs, phone-ish numbers) from every document, reporting
    per-doc redaction counts and the content hash of the scrubbed text —
    the pre-training compliance pass every corpus pipeline runs.

    The md5 of the scrubbed text crossing the oracle boundary proves the
    REPLACEMENT itself (not just the counts) is byte-identical across
    engines.  All JVM-side `regexp_replace`/`regexp_count` — scan-fused,
    embarrassingly parallel, no shuffle at any scale.
    """
    docs = T(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"), _NUM_RE, "<NUM>"
    )
    return docs.select(
        "doc_id",
        "lang",
        F.regexp_count(F.col("text"), F.lit(_NUM_RE)).cast("long").alias("n_num_runs"),
        F.regexp_count(F.col("text"), F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.md5(scrubbed).alias("scrub_md5"),
    )


def agg_hll_union_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch count-distinct — THE 100 TB distinct-count shape:
    each (lang, source) partition builds an HLL sketch of its word set
    (`hll_sketch_agg`, one pass, fixed memory), and per-language totals
    come from UNIONING the partial sketches (`hll_union_agg`) — never
    re-scanning raw data.  This is how a 1000-executor job counts
    distincts per shard and folds them: sketches are partials, so daily /
    per-shard sketches can be persisted and merged incrementally without
    touching history.

    UNREGISTERED since round 6 (an estimate cannot hash-match an exact
    oracle): the driver-checked registration of ``agg_hll_union``
    (queries/approx_bounds.py) is the envelope form over this same
    union-of-partials dataflow; accuracy is also unit-gated by
    tests/test_operators.py::test_hll_union_accuracy (≤5% error vs exact
    at sf0.01 — HLL++'s documented envelope at this cardinality).
    """
    docs = T(spark, sf_dir, "documents")
    words = docs.select(
        "lang", "source", F.explode(F.split("text", " ")).alias("word")
    )
    partials = words.groupBy("lang", "source").agg(
        F.hll_sketch_agg("word").alias("sk")
    )
    return (
        partials.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_partials"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_words"),
        )
        .orderBy("lang")
    )


@register(
    "decontam_ngram_overlap",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, w,
             unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS i
      FROM w
    ),
    grams AS (
      SELECT doc_id, md5(array_to_string(w[i:i+7], ' ')) AS g FROM idx
    ),
    ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0),
    tr AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 20 <> 0)
    SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
    FROM tr JOIN ev USING (g)
    GROUP BY tr.doc_id ORDER BY tr.doc_id
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination — the standard pre-training hygiene
    stage: flag training documents sharing any 8-word n-gram with the
    held-out eval set (here the deterministic doc_id%20 slice), reporting
    how many distinct grams leak.  8 is the n used by the published
    decontamination recipes (GPT-3 appendix C; Dolma) — long enough that
    chance collisions vanish, short enough to catch quote-level leakage.

    Scale shape: grams live as md5 hashes (fixed width, not text); the
    train side dedups (doc_id, gram) before the join; the eval gram set —
    benchmark-suite-sized, vastly smaller than the corpus — broadcasts,
    so the corpus-side gram stream never shuffles: explode → local
    semi-probe → per-doc count.  A full-corpus×corpus variant instead
    shuffles on the gram hash (same plan as text_minhash_dedup's bands).
    """
    docs = T(spark, sf_dir, "documents")
    # words projected before the lambda: no CSE inside higher-order
    # functions — an inline split(text) would re-split per element
    grams = docs.select("doc_id", F.split("text", " ").alias("w")).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(w) - 7, 1)), "
                "i -> md5(concat_ws(' ', slice(w, i, 8))))"
            )
        ).alias("g"),
    )
    ev = grams.filter(F.col("doc_id") % 20 == 0).select("g").distinct()
    tr = grams.filter(F.col("doc_id") % 20 != 0).distinct()
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
        .orderBy("doc_id")
    )


@register(
    "mix_sample_weighted",
    oracle="""
    WITH d AS (
      SELECT source,
             coalesce(TRY_CAST(regexp_extract(source, '[0-9]+') AS BIGINT), 0)
               % 4 AS m,
             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS UBIGINT) AS BIGINT) % 10000 AS bucket,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    r AS (
      SELECT *, CASE m WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
                       WHEN 2 THEN 0.25 ELSE 0.1 END AS rate
      FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE bucket < rate * 10000) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(n_tokens) FILTER (WHERE bucket < rate * 10000), 0)
                AS BIGINT) AS tokens_kept
    FROM r GROUP BY source ORDER BY source
    """,
)
def mix_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing — the domain-reweighting stage of training-
    data assembly: each source is downsampled to its mix rate (here a
    deterministic rate per source family: 1.0 / 0.5 / 0.25 / 0.1) via
    content-independent key-hash bucketing, reporting kept docs and the
    token budget each source contributes.

    The keep decision is pure per-row math on a portable md5-derived
    bucket (operators/fingerprint.py::hash32 — no rand(), identical
    across engines and re-runs, stable under repartitioning), so the mix
    is reproducible and joins consistently with any other hash-sampled
    artifact of the same keys.  One scan + one aggregation; no shuffle
    before the per-source roll-up at any corpus size.
    """
    from cassandra_syncer_spark.operators import fingerprint as fp

    docs = T(spark, sf_dir, "documents")
    # try_cast + coalesce: a source name with no digits extracts '' and an
    # ANSI cast of '' to bigint throws (both engines) — digit-less sources
    # deterministically land in mix family 0
    m = F.expr(
        "coalesce(try_cast(regexp_extract(source, '[0-9]+', 0) AS BIGINT), 0) % 4"
    )
    rate = (
        F.when(m == 0, F.lit(1.0))
        .when(m == 1, F.lit(0.5))
        .when(m == 2, F.lit(0.25))
        .otherwise(F.lit(0.1))
    )
    bucket = F.expr(fp.hash32("CAST(doc_id AS STRING)", duck=False)) % 10000
    keep = bucket < rate * 10000
    return (
        docs.select(
            "source",
            keep.alias("keep"),
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.count(F.when(F.col("keep"), 1)).cast("long").alias("n_kept"),
            F.coalesce(
                F.sum(F.when(F.col("keep"), F.col("n_tokens"))), F.lit(0)
            )
            .cast("long")
            .alias("tokens_kept"),
        )
        .orderBy("source")
    )


@register(
    "text_repetition_filter",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, lang, w,
             unnest(range(1, greatest(len(w) - 1, 1) + 1)) AS i
      FROM w
    ),
    bi AS (
      SELECT doc_id, lang, array_to_string(w[i:i+1], ' ') AS g FROM idx
    ),
    cnt AS (
      SELECT doc_id, lang, g, count(*) AS c FROM bi GROUP BY doc_id, lang, g
    ),
    per_doc AS (
      SELECT doc_id, lang, max(c) AS top_c, sum(c) AS total
      FROM cnt GROUP BY doc_id, lang
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE top_c * 5 > total) AS BIGINT) AS n_repetitive,
           round(CAST(sum(top_c) AS DOUBLE) / sum(total), 6) AS mean_top_share
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality gate (the Gopher/Dolma rule family): per
    document, the share of all word 2-grams taken by the single most
    frequent 2-gram; documents where that share exceeds 20% (top·5 >
    total — exact integer comparison, no float threshold) are flagged
    repetitive, rolled up per language.

    Scale shape: explode to 2-grams → count per (doc, gram) → per-doc
    max/total → per-lang roll-up; every stage is a hash aggregation
    keyed by doc_id (+gram), partial-aggregated map-side.  No windows,
    no joins; the gram stream never crosses executors un-aggregated.
    The mean share divides two exact integer sums, so the double is
    identical cross-engine.
    """
    docs = T(spark, sf_dir, "documents")
    # words projected before the lambda (no CSE inside transform)
    bi = docs.select("doc_id", "lang", F.split("text", " ").alias("w")).select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(w) - 1, 1)), "
                "i -> concat_ws(' ', slice(w, i, 2)))"
            )
        ).alias("g"),
    )
    cnt = bi.groupBy("doc_id", "lang", "g").agg(F.count(F.lit(1)).alias("c"))
    per_doc = cnt.groupBy("doc_id", "lang").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("total")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count(F.when(F.col("top_c") * 5 > F.col("total"), 1))
            .cast("long")
            .alias("n_repetitive"),
            F.round(
                F.sum("top_c").cast("double") / F.sum("total"), 6
            ).alias("mean_top_share"),
        )
        .orderBy("lang")
    )


@register(
    "embed_quantize_int8",
    oracle="""
    WITH m AS (
      SELECT vec_id, label, embedding,
             greatest(list_max(list_transform(embedding,
                               x -> abs(CAST(x AS DOUBLE)))), 1e-30) AS max_abs
      FROM embeddings
    )
    SELECT vec_id, CAST(label AS INTEGER) AS label, max_abs,
           array_to_string(list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / max_abs) AS INTEGER)), ',')
             AS q8_csv,
           CAST(list_sum(list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / max_abs) AS INTEGER)))
             AS BIGINT) AS q_sum
    FROM m
    """,
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric quantization of embeddings (per-vector absmax
    scaling) — the 4× compression step a vector store applies before
    indexing billions of embeddings; the returned ``max_abs`` is the
    dequantization scale (·max_abs/127).

    All math stays JVM-side in higher-order array functions (one
    `transform` per vector, no UDF, no shuffle).  Cross-engine parity of
    the full quantized vector: floats upcast to double BEFORE arithmetic
    (float32 ops differ across engines; double ops on float-derived
    values do not), both engines round halves away from zero, and the
    vector crosses the oracle boundary serialized as a CSV string (the
    driver's value-hash handles scalars, not arrays — repo convention).
    The 1e-30 floor makes the zero-vector a defined no-op instead of a
    division by zero — same guard both sides.
    """
    emb = T(spark, sf_dir, "embeddings")
    m = emb.select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        "embedding",
        F.greatest(
            F.array_max(
                F.transform("embedding", lambda x: F.abs(x.cast("double")))
            ),
            F.lit(1e-30),
        ).alias("max_abs"),
    )
    q8 = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * 127.0 / F.col("max_abs")).cast("int"),
    )
    return m.select(
        "vec_id",
        "label",
        "max_abs",
        F.array_join(F.transform(q8, lambda x: x.cast("string")), ",").alias("q8_csv"),
        F.aggregate(
            q8, F.lit(0).cast("long"), lambda acc, v: acc + v.cast("long")
        ).alias("q_sum"),
    )


@register(
    "win_cume_dist",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(round(c_acctbal * 100.0) AS BIGINT) AS acct_centi,
           round(cume_dist() OVER w, 6) AS cd,
           nth_value(CAST(round(c_acctbal * 100.0) AS BIGINT), 2) OVER w
             AS second_lowest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY CAST(round(c_acctbal * 100.0) AS BIGINT), c_custkey)
    """,
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position windows: cume_dist (fraction of the segment at
    or below each customer's balance) and nth_value (the segment's
    second-lowest balance, null until two rows are in frame) — the
    remaining ranking-family coverage beyond rank/dense_rank/percent_rank/
    ntile.  Balance is centi-integerized so the ordering key (and thus
    cume_dist's tie groups) is identical across engines; the ordering is
    made total with the customer key so nth_value's default growing frame
    sees the same row sequence in both.

    Scale note: parallelism is capped by the partition count (5 market
    segments here), so each segment is a single-task sort — measured 2.5×
    at the 10× replica (SCALING.md).  This exact form is the
    validation-scale reference; the REGISTERED 100 TB path is
    ``win_cume_dist_approx`` (queries/analytics_r6.py, round 6): position
    fractions from a per-segment 1024-bin histogram, no row-level sort
    anywhere, plan-asserted.
    """
    cust = T(spark, sf_dir, "customer")
    centi = F.round(F.col("c_acctbal") * 100.0).cast("long")
    staged = cust.select(
        "c_custkey", "c_mktsegment", centi.alias("acct_centi")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("acct_centi", "c_custkey")
    return staged.select(
        "c_custkey",
        "c_mktsegment",
        "acct_centi",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("acct_centi", 2).over(w).alias("second_lowest"),
    )


@register(
    "events_attribution",
    oracle="""
    WITH tagged AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS attributed
      FROM events
    )
    SELECT coalesce(attributed, 'none') AS attributed,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) / 100.0
             AS revenue
    FROM tagged
    WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent preceding touch event (click or view); attributed revenue
    rolls up per touch channel ('none' = purchase with no prior touch).

    Scale shape: one shuffle on user_id, then a running last-non-null
    over each user's time-sorted run — the same single-window pattern as
    win_rownum_latest, no self-join against the touch set (the naive
    formulation is a per-purchase theta join, quadratic per user).
    Revenue integerizes per-row before summing (cross-engine exact).
    """
    ev = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type").isin("click", "view"), F.col("event_type"))
    return (
        ev.withColumn("attributed", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("attributed", F.lit("none")).alias("attributed"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            (
                F.sum(F.round(F.col("value") * 100.0).cast("long")).cast("long")
                / 100.0
            ).alias("revenue"),
        )
        .orderBy("attributed")
    )
