"""Round-6 additions: the chained near-dup verify pipeline and the
sketch-path segment-position query — the two registered forms the round-5
audit called for (VERDICT.md items 4 and 5).

Reference parity note: the reference's dedup layer is exact etag equality
(core.js:403-417, manifest diff); the staged verify pipeline and the
histogram position sketch are part of the 100 TB extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# dedup_verify_pipeline — banded candidates → Jaccard screen → edit verify
# ---------------------------------------------------------------------------

_EDIT_PREFIX = 400
_EDIT_MAX = 100
_JACC_MIN = 0.5


def _pipeline_sql() -> str:
    from cassandra_syncer_spark.queries.llm_dedup import _band_union, _minhash_cte

    jacc = (
        "round(CAST(len(list_intersect(da.uw, db.uw)) AS DOUBLE)"
        " / len(list_distinct(list_concat(da.uw, db.uw))), 4)"
    )
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
    jac AS (
      SELECT c.doc_a, c.doc_b, {jacc} AS jaccard
      FROM cand c
      JOIN d da ON c.doc_a = da.doc_id
      JOIN d db ON c.doc_b = db.doc_id
      WHERE {jacc} >= {_JACC_MIN}
    ),
    p AS (SELECT doc_id, substr(text, 1, {_EDIT_PREFIX}) AS pre FROM documents)
    SELECT j.doc_a, j.doc_b, j.jaccard,
           CAST(levenshtein(pa.pre, pb.pre) AS BIGINT) AS edit_dist,
           -- mx=0 (two empty texts) guard: identical-empty pairs are a
           -- perfect match; DuckDB // raises on /0, Spark div yields null
           CASE WHEN greatest(len(pa.pre), len(pb.pre)) = 0 THEN 1000000
                ELSE (1000000 * (greatest(len(pa.pre), len(pb.pre))
                                 - levenshtein(pa.pre, pb.pre)))
                     // greatest(len(pa.pre), len(pb.pre)) END AS edit_sim_micro
    FROM jac j
    JOIN p pa ON j.doc_a = pa.doc_id
    JOIN p pb ON j.doc_b = pb.doc_id
    WHERE levenshtein(pa.pre, pb.pre) <= {_EDIT_MAX}
    ORDER BY doc_a, doc_b
    """


@register("dedup_verify_pipeline", oracle=_pipeline_sql())
def dedup_verify_pipeline(
    spark: SparkSession, sf_dir: str, jacc_min: float = _JACC_MIN
) -> DataFrame:
    """The PRODUCTION near-dup verify chain, registered end to end:
    MinHash band candidates → exact word-set Jaccard screen (≥ 0.5) →
    edit-distance verify on the JACCARD SURVIVORS ONLY.  Round 5 asserted
    in prose that edit-verify must run last so its O(n·k) DP cost is
    bounded by the survivor count, not the candidate count
    (``dedup_verify_edit`` alone measured 17.9× at the 10× dup-heavy
    replica because every band candidate hit the DP); this query makes
    that ordering a driver-checked artifact.

    Scale shape: candidates are bucket-local (banding math bounds the
    volume, never corpus²); the Jaccard screen is two doc_id hash joins
    + an array intersect per candidate (cheap set algebra, no DP); only
    pairs passing the 0.5 cut reach the edit stage, which keeps the
    double screen from ``dedup_verify_edit`` (exact-equality
    short-circuit, then banded ``levenshtein(a, b, k)``).

    Survivor-boundedness is MEASURED, not asserted (SCALING.md round-6
    threshold sweep on the controlled 10× replica, 20,116 candidates
    fixed): total time 1.8 s when the screen passes nothing → 12.4 s
    when it passes 17,786 — the DP term tracks the survivor count
    linearly while the candidate front end stays constant.  Corollary,
    stated honestly: on a corpus whose band candidates are almost all
    GENUINE near-dups (the controlled replica passes 88% — by
    construction), no screen ordering can dodge the inherent per-pair DP;
    the chain's win is on real crawls where banding false positives and
    sub-threshold pairs dominate, and those die in set algebra before
    touching the DP.
    """
    from cassandra_syncer_spark.queries.llm_dedup import _minhash_pairs

    cand = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    # round-11: ONE doc-side projection carries BOTH verify inputs (word set
    # for the Jaccard screen + edit prefix), so the chain attaches doc
    # payloads with TWO joins instead of four and scans documents once —
    # guide §2.4 (remove redundant exchanges/joins); results are identical
    # because the screen filter and edit filter apply in the same order.
    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(F.split("text", " ")).alias("uw"),
        F.substring("text", 1, _EDIT_PREFIX).alias("pre"),
    )
    da, db = docs.alias("da"), docs.alias("db")
    inter = F.size(F.array_intersect(F.col("da.uw"), F.col("db.uw")))
    union = F.size(F.array_union(F.col("da.uw"), F.col("db.uw")))
    survivors = (
        cand.join(da, cand.doc_a == F.col("da.doc_id"))
        .join(db, cand.doc_b == F.col("db.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(inter.cast("double") / union, 4).alias("jaccard"),
            F.col("da.pre").alias("pre_a"),
            F.col("db.pre").alias("pre_b"),
        )
        .filter(F.col("jaccard") >= jacc_min)
    )
    return (
        survivors.select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.expr(
                f"IF(pre_a = pre_b, 0L,"
                f" CAST(levenshtein(pre_a, pre_b, {_EDIT_MAX}) AS BIGINT))"
            ).alias("edit_dist"),
            F.greatest(F.length("pre_a"), F.length("pre_b")).alias("mx"),
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= _EDIT_MAX))
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            "edit_dist",
            # mx=0 guard mirrors the oracle CASE: two empty prefixes that
            # band-collide are a perfect match, not a null / div-by-zero
            F.expr(
                "IF(mx = 0, 1000000L,"
                " (1000000 * (mx - edit_dist)) div mx)"
            ).alias("edit_sim_micro"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# win_cume_dist_approx — histogram-sketch segment position (no segment sort)
# ---------------------------------------------------------------------------

_CD_BINS = 1024


@register(
    "win_cume_dist_approx",
    oracle=f"""
    WITH v AS (
      SELECT c_custkey, c_mktsegment,
             CAST(round(c_acctbal * 100.0) AS BIGINT) AS acct_centi
      FROM customer
    ),
    s AS (
      SELECT c_mktsegment, min(acct_centi) AS lo, max(acct_centi) AS hi,
             CAST(count(*) AS BIGINT) AS n
      FROM v GROUP BY c_mktsegment
    ),
    b AS (
      SELECT v.c_custkey, v.c_mktsegment, v.acct_centi,
             ((v.acct_centi - s.lo) * {_CD_BINS}) // (s.hi - s.lo + 1) AS bkt
      FROM v JOIN s ON v.c_mktsegment = s.c_mktsegment
    ),
    h AS (SELECT c_mktsegment, bkt, CAST(count(*) AS BIGINT) AS c
          FROM b GROUP BY 1, 2),
    cum AS (
      SELECT c_mktsegment, bkt,
             sum(c) OVER (PARTITION BY c_mktsegment ORDER BY bkt) AS cum
      FROM h
    )
    SELECT b.c_custkey, b.c_mktsegment, b.acct_centi,
           CAST((1000000 * cum.cum) // s.n AS BIGINT) AS cd_est_micro
    FROM b
    JOIN cum ON b.c_mktsegment = cum.c_mktsegment AND b.bkt = cum.bkt
    JOIN s ON b.c_mktsegment = s.c_mktsegment
    ORDER BY c_custkey
    """,
)
def win_cume_dist_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ``win_cume_dist``: each customer's position
    fraction within its market segment from a 1024-bin equal-width
    HISTOGRAM of centi-integerized balances instead of an exact
    per-segment sort.  ``win_cume_dist``'s exact window serializes every
    segment onto one task (parallelism capped at |segments|, measured
    2.5× at the 10× replica); here no row-level sort exists anywhere —
    the only window runs over the ≤1024-counter histogram frame.

    cd_est = (rows in bins ≤ own bin) / n, in exact integer micro-units —
    a pure function of the data (same device as ``agg_percentile_hist``),
    so both engines produce the identical estimate and the sketch
    hash-checks.  Error ≤ one bin's occupancy; the exact form remains
    registered for validation scale.

    Scale shape: pass 1 per-segment (lo, hi, n); pass 2 folds rows into
    ≤1024 counters per segment (map-side combine); the cumulative window
    runs over counters, never rows; rows join their bin's cumulative
    count back via broadcast.  Plan-asserted: the Window's input is the
    aggregated histogram, not the row stream
    (tests/test_plans.py::test_cume_dist_approx_windows_bins_not_rows).
    """
    cust = T(spark, sf_dir, "customer")
    v = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100.0).cast("long").alias("acct_centi"),
    )
    s = v.groupBy("c_mktsegment").agg(
        F.min("acct_centi").alias("lo"),
        F.max("acct_centi").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    b = v.join(F.broadcast(s), "c_mktsegment").select(
        "c_custkey",
        "c_mktsegment",
        "acct_centi",
        F.expr(f"((acct_centi - lo) * {_CD_BINS}) div (hi - lo + 1)").alias("bkt"),
    )
    h = b.groupBy("c_mktsegment", "bkt").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cum = h.withColumn(
        "cum",
        F.sum("c").over(
            Window.partitionBy("c_mktsegment")
            .orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).select("c_mktsegment", "bkt", "cum")
    return (
        b.join(F.broadcast(cum), ["c_mktsegment", "bkt"])
        .join(F.broadcast(s.select("c_mktsegment", "n")), "c_mktsegment")
        .select(
            "c_custkey",
            "c_mktsegment",
            "acct_centi",
            F.expr("(1000000 * cum) div n").cast("long").alias("cd_est_micro"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# tokenizer_vocab_coverage — coverage curve of the top-N vocabulary
# ---------------------------------------------------------------------------

_VOCAB_CUTS = (5, 10, 20)


@register(
    "tokenizer_vocab_coverage",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    freq AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY word),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, word) AS rk FROM freq
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_tokens,
                   CAST(count(*) AS BIGINT) AS vocab_size
            FROM freq)
    SELECT c.cut AS top_n,
           CAST(sum(CASE WHEN ranked.rk <= c.cut THEN ranked.n ELSE 0 END)
                AS BIGINT) AS covered_tokens,
           CAST((1000000 * sum(CASE WHEN ranked.rk <= c.cut THEN ranked.n ELSE 0 END))
             // any_value(tot.total_tokens) AS BIGINT) AS coverage_micro,
           any_value(tot.total_tokens) AS total_tokens,
           any_value(tot.vocab_size) AS vocab_size
    FROM ranked, tot, (SELECT unnest([{', '.join(str(c) for c in _VOCAB_CUTS)}]) AS cut) c
    GROUP BY c.cut ORDER BY top_n
    """,
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-design diagnostic: what
    fraction of all token OCCURRENCES the top-N word types cover (the
    empirical Zipf mass that decides vocab size and the unk rate a fixed
    vocabulary buys).  Cut points are 5/10/20 because the synthetic
    fixture's vocabulary is 31 types — production uses 2^15..2^17 cuts;
    the dataflow is cut-count-independent (one grouped conditional sum).

    Scale shape: the only corpus-sized stage is the word explode → freq
    hash agg (map-side combined, keyed on the word); everything after
    operates on the VOCABULARY (freq table), which is sub-linear in the
    corpus (Heaps' law).  The rank window sorts the vocab, not the
    corpus, and the three cut points fold into one grouped conditional
    sum — output is 3 rows.  At trillion-token scale the freq table
    itself is large: the documented sketch path is count-min frequencies
    (``agg_countmin_freq``) for the head and an exact tail cut.
    """
    w = T(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("word")
    )
    freq = w.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = freq.select(
        "n", F.row_number().over(Window.orderBy(F.desc("n"), "word")).alias("rk")
    )
    tot = freq.agg(
        F.sum("n").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
    )
    cuts = F.explode(F.array(*[F.lit(c) for c in _VOCAB_CUTS])).alias("top_n")
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select("n", "rk", "total_tokens", "vocab_size", cuts)
        .groupBy("top_n")
        .agg(
            F.sum(F.when(F.col("rk") <= F.col("top_n"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("covered_tokens"),
            F.any_value("total_tokens").alias("total_tokens"),
            F.any_value("vocab_size").alias("vocab_size"),
        )
        .select(
            "top_n",
            "covered_tokens",
            F.expr("(1000000 * covered_tokens) div total_tokens").alias(
                "coverage_micro"
            ),
            "total_tokens",
            "vocab_size",
        )
        .orderBy("top_n")
    )


# ---------------------------------------------------------------------------
# corpus_vocab_growth — Heaps-law curve: distinct vocab vs cumulative tokens
# ---------------------------------------------------------------------------

_GROWTH_BUCKETS = 10


@register(
    "corpus_vocab_growth",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             (doc_id * {_GROWTH_BUCKETS})
               // (SELECT max(doc_id) + 1 FROM documents) AS bucket
      FROM documents
    ),
    g AS (
      SELECT bucket,
             md5(array_to_string(words[k : k + 7], ' ')) AS gh
      FROM (
        SELECT bucket, words, unnest(range(1, len(words) - 6)) AS k FROM d
      )
    ),
    tok AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS grams FROM g GROUP BY bucket
    ),
    first_seen AS (SELECT min(bucket) AS bucket FROM g GROUP BY gh),
    nv AS (SELECT bucket, CAST(count(*) AS BIGINT) AS new_types
           FROM first_seen GROUP BY bucket)
    SELECT tok.bucket AS bucket,
           CAST(sum(tok.grams) OVER w AS BIGINT) AS cum_grams,
           CAST(sum(coalesce(nv.new_types, 0)) OVER w AS BIGINT) AS cum_types,
           CAST((1000000 * sum(coalesce(nv.new_types, 0)) OVER w)
                // sum(tok.grams) OVER w AS BIGINT) AS type_token_micro
    FROM tok LEFT JOIN nv ON tok.bucket = nv.bucket
    WINDOW w AS (ORDER BY tok.bucket)
    ORDER BY tok.bucket
    """,
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law growth curve: cumulative distinct 8-GRAM types vs
    cumulative gram occurrences at 10 corpus checkpoints (ingest order =
    doc_id) — the diminishing-returns signal that says when additional
    crawl of a source stops contributing new content, the corpus-level
    complement of ``text_ngram_novelty``'s per-document novelty.  Types
    are 8-grams, not unigrams: the synthetic fixture's 31-word
    vocabulary saturates in the first bucket (production picks the type
    granularity — unigrams for tokenizer sizing, n-grams for content
    novelty; the dataflow is identical).

    Scale shape: the gram explode is the same scan-fused kernel as
    ``decontam_ngram_overlap``; the only corpus-sized shuffle is the
    first-bucket-per-type hash agg keyed on the gram hash (min bucket,
    map-side combined).  The cumulative windows run over 10 bucket rows.
    Output: 10 (bucket, cum_grams, cum_types, type/token ratio) points.
    """
    docs = T(spark, sf_dir, "documents")
    mx = docs.agg((F.max("doc_id") + 1).alias("mxd"))
    d = docs.crossJoin(F.broadcast(mx)).select(
        F.split("text", " ").alias("words"),
        F.expr(f"(doc_id * {_GROWTH_BUCKETS}) div mxd").alias("bucket"),
    )
    g = d.select(
        "bucket",
        F.explode(
            # Guard short docs: sequence(1, 0) is DESCENDING ([1, 0]) in
            # Spark, and slice(words, 0, 8) throws INVALID_PARAMETER_VALUE —
            # docs with < 8 words must emit no grams (the oracle's
            # range(1, len-6) already emits nothing for them).
            F.expr(
                "IF(size(words) >= 8,"
                " transform(sequence(1, size(words) - 7),"
                " k -> md5(array_join(slice(words, k, 8), ' '))),"
                " array())"
            )
        ).alias("gh"),
    )
    tok = g.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("grams"))
    first_seen = g.groupBy("gh").agg(F.min("bucket").alias("bucket"))
    nv = first_seen.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("new_types")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        tok.join(nv, "bucket", "left")
        .select(
            "bucket",
            F.sum("grams").over(w).cast("long").alias("cum_grams"),
            F.sum(F.coalesce("new_types", F.lit(0)))
            .over(w)
            .cast("long")
            .alias("cum_types"),
        )
        .select(
            "bucket",
            "cum_grams",
            "cum_types",
            F.expr("(1000000 * cum_types) div cum_grams").alias("type_token_micro"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# events_sessionize_gap — gap-rule session assignment + session stats
# ---------------------------------------------------------------------------

_SESSION_GAP_SEC = 1800  # 30-minute inactivity gap starts a new session


@register(
    "events_sessionize_gap",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS ts_sec
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts_sec,
             CASE WHEN ts_sec - lag(ts_sec) OVER w > {_SESSION_GAP_SEC}
                  OR lag(ts_sec) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
    ),
    sess AS (
      SELECT user_id, ts_sec,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_sec
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_id,
             CAST(count(*) AS BIGINT) AS n_events,
             max(ts_sec) - min(ts_sec) AS dur_sec
      FROM sess GROUP BY user_id, session_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST((1000000 * sum(n_events)) // count(*) AS BIGINT)
             AS events_per_session_micro,
           CAST((1000000 * sum(dur_sec)) // count(*) AS BIGINT)
             AS mean_dur_sec_micro,
           CAST(max(dur_sec) AS BIGINT) AS max_dur_sec,
           CAST(count(CASE WHEN n_events = 1 THEN 1 END) AS BIGINT) AS n_bounces
    FROM per_session
    """,
)
def events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-rule sessionization — the batch form of ``win_session``'s
    streaming session window: a 30-minute inactivity gap starts a new
    session, session ids are per-user running counts of gap flags, and
    the output is the session-quality dashboard row (sessions, bounce
    count, mean events/duration in exact integer micro-units).

    Scale shape: ONE shuffle on user_id serves both windows (lag flag +
    running sum share the same sort spec — one Window operator pair over
    one exchange); the per-session agg collapses to (user, session) keys
    map-side, and the final global agg is a single row.  This is the
    standard sessionize kernel every events pipeline runs daily at any
    scale.
    """
    ev = T(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts_ns div 1000000000").alias("ts_sec")
    )
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    flagged = ev.select(
        "user_id",
        "ts_sec",
        F.when(
            F.coalesce(
                (F.col("ts_sec") - F.lag("ts_sec").over(w)) > _SESSION_GAP_SEC,
                F.lit(True),
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    ws = Window.partitionBy("user_id").orderBy("ts_sec").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = flagged.select(
        "user_id", "ts_sec", F.sum("new_s").over(ws).alias("session_id")
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("ts_sec") - F.min("ts_sec")).alias("dur_sec"),
    )
    return per_session.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.expr("(1000000 * sum(n_events)) div count(*)").alias(
            "events_per_session_micro"
        ),
        F.expr("(1000000 * sum(dur_sec)) div count(*)").alias("mean_dur_sec_micro"),
        F.max("dur_sec").cast("long").alias("max_dur_sec"),
        F.count(F.when(F.col("n_events") == 1, 1)).cast("long").alias("n_bounces"),
    )


# ---------------------------------------------------------------------------
# agg_hll_intersection — sketch set-intersection via inclusion-exclusion
# ---------------------------------------------------------------------------


@register(
    "agg_hll_intersection",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority AS p, o_custkey AS c FROM orders GROUP BY 1, 2
    ),
    counts AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY p),
    pairs AS (
      SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS inter_exact
      FROM s a JOIN s b ON a.c = b.c AND a.p < b.p
      GROUP BY 1, 2
    )
    SELECT p.pa AS pa, p.pb AS pb, p.inter_exact,
           ca.n + cb.n - p.inter_exact AS union_exact,
           true AS est_within_10pct_of_union
    FROM pairs p
    JOIN counts ca ON p.pa = ca.p
    JOIN counts cb ON p.pb = cb.p
    ORDER BY p.pa, p.pb
    """,
)
def agg_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET-INTERSECTION estimation — the audience-overlap /
    cross-source-contamination primitive: |A∩B| estimated by
    inclusion-exclusion over mergeable HLL sketches
    (est(A) + est(B) − est(A∪B), the union sketch from ``hll_union``
    of the two per-set sketches — never a re-scan), certified against
    the exact intersection with the same envelope-oracle device as the
    ``agg_approx_distinct`` family.  Inclusion-exclusion error compounds
    three ±2% estimates, so the certified bound is 10% of the UNION
    cardinality — the honest bound for this estimator (relative-to-
    intersection error is unbounded as the overlap shrinks; production
    uses theta sketches when small intersections must be tight).

    Scale shape: one pass builds a sketch per set (fixed memory); every
    pairwise overlap after that is sketch algebra on the tiny sketch
    table — no revisit of the raw data, the property that makes overlap
    matrices over hundreds of sources feasible at 100 TB.
    """
    # one distinct pass materialized once: the (set, member) table feeds
    # the sketch build, both exact-intersection sides, and the count table
    # — without the checkpoint each consumer re-ran the scan + distinct
    # shuffle (measured 5.3x at the 10x replica; 1.2x with it)
    s = (
        T(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("p"), F.col("o_custkey").alias("c"))
        .distinct()
        .localCheckpoint()
    )
    sk = s.groupBy("p").agg(
        F.hll_sketch_agg("c").alias("sk"),
        F.countDistinct("c").alias("n_exact"),
    )
    a = sk.select(
        F.col("p").alias("pa"), F.col("sk").alias("ska"), F.col("n_exact").alias("na")
    )
    b = sk.select(
        F.col("p").alias("pb"), F.col("sk").alias("skb"), F.col("n_exact").alias("nb")
    )
    est = (
        a.join(b, F.col("pa") < F.col("pb"))
        .select(
            "pa",
            "pb",
            F.hll_sketch_estimate("ska").alias("ea"),
            F.hll_sketch_estimate("skb").alias("eb"),
            F.hll_sketch_estimate(
                F.expr("hll_union(ska, skb)")
            ).alias("eu"),
        )
        .select("pa", "pb", (F.col("ea") + F.col("eb") - F.col("eu")).alias("est"), "eu")
    )
    sa, sb = s.alias("sa"), s.alias("sb")
    exact = (
        sa.join(
            sb,
            (F.col("sa.c") == F.col("sb.c")) & (F.col("sa.p") < F.col("sb.p")),
        )
        .groupBy(F.col("sa.p").alias("pa"), F.col("sb.p").alias("pb"))
        .agg(F.count(F.lit(1)).cast("long").alias("inter_exact"))
    )
    counts = sk.select("p", F.col("n_exact").cast("long").alias("n"))
    ca = counts.select(F.col("p").alias("pa"), F.col("n").alias("na_ex"))
    cb = counts.select(F.col("p").alias("pb"), F.col("n").alias("nb_ex"))
    return (
        exact.join(F.broadcast(ca), "pa")
        .join(F.broadcast(cb), "pb")
        .select(
            "pa",
            "pb",
            "inter_exact",
            (F.col("na_ex") + F.col("nb_ex") - F.col("inter_exact")).alias(
                "union_exact"
            ),
        )
        .join(est, ["pa", "pb"])
        .select(
            "pa",
            "pb",
            "inter_exact",
            "union_exact",
            (
                F.abs(F.col("est") - F.col("inter_exact"))
                <= 0.10 * F.col("union_exact")
            ).alias("est_within_10pct_of_union"),
        )
        .orderBy("pa", "pb")
    )


# ---------------------------------------------------------------------------
# dedup_embed_clusters — chained semantic dedup: simhash bands → CC
# ---------------------------------------------------------------------------


def _embed_clusters_sql() -> str:
    from cassandra_syncer_spark.operators import adaptive_bands as ab
    from cassandra_syncer_spark.queries.analytics_r5e import (
        _CODE_DUCK,
        _EMB_HAMMING_MAX,
    )

    g_case = ab.geometry_case(ab.EMB_NARROW, ab.EMB_WIDE, ab.EMB_THRESHOLD, duck=True)
    return f"""
    WITH RECURSIVE e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    c AS (SELECT vec_id, {_CODE_DUCK} AS code FROM e),
    g AS (SELECT {g_case} AS masks FROM embeddings),
    bands0 AS (SELECT vec_id, code, unnest(g.masks) AS band_id FROM c, g),
    bands AS (SELECT vec_id, code, band_id, code & band_id AS band_val FROM bands0),
    cand AS (
      SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
       AND a.vec_id < b.vec_id
      WHERE bit_count(xor(a.code, b.code)) <= {_EMB_HAMMING_MAX}
    ),
    edges AS (SELECT va AS a, vb AS b FROM cand
              UNION SELECT vb, va FROM cand),
    reach(id, r) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a
    )
    SELECT CAST(id AS BIGINT) AS vec_id, CAST(min(r) AS BIGINT) AS cluster
    FROM reach GROUP BY id ORDER BY vec_id
    """


@register("dedup_embed_clusters", oracle=_embed_clusters_sql())
def dedup_embed_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup end to end: the ``dedup_embed_simhash`` candidate
    stage (63-bit sign codes, corpus-derived band geometry —
    operators/adaptive_bands.py — Hamming ≤ 16 verify)
    chained into connected components over the surviving pairs — the
    embedding-space parallel of the text chain
    ``text_minhash_dedup → dedup_cluster_components``, and the missing
    registered link between pairwise embedding near-dup and the cluster
    labels a pipeline actually deduplicates with (keep min vec_id per
    cluster, drop the rest).

    Scale shape: candidate generation is the banded 8-byte-code
    self-join (never corpus², vectors join in only for survivors — the
    Hamming verify here needs no vectors at all); components run
    min-label propagation with rounds bounded by cluster diameter
    (operators/components.py), and near-dup clusters are short-diameter
    by construction.  Oracle: identical band formulas + recursive
    transitive-closure CTE.
    """
    from cassandra_syncer_spark.operators import adaptive_bands as ab
    from cassandra_syncer_spark.operators.components import connected_components
    from cassandra_syncer_spark.queries.analytics_r5e import (
        _CODE_SPARK,
        _EMB_HAMMING_MAX,
    )

    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    geom = T(spark, sf_dir, "embeddings").agg(
        F.expr(
            ab.geometry_case(ab.EMB_NARROW, ab.EMB_WIDE, ab.EMB_THRESHOLD, duck=False)
        ).alias("masks")
    )
    bands = (
        e.select("vec_id", F.expr(_CODE_SPARK).alias("code"))
        .crossJoin(F.broadcast(geom))
        .select("vec_id", "code", F.explode("masks").alias("band_id"))
        .withColumn("band_val", F.expr("code & band_id"))
    )
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(F.expr("a.code ^ b.code"))
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(hamming <= _EMB_HAMMING_MAX)
        .select(
            F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb")
        )
        .distinct()
    )
    return (
        connected_components(cand, src="va", dst="vb")
        .select(
            F.col("id").cast("long").alias("vec_id"),
            F.col("component").cast("long").alias("cluster"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# join_dynamic_partition_prune — runtime (dynamic) partition pruning
# ---------------------------------------------------------------------------


@register(
    "join_dynamic_partition_prune",
    oracle="""
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
             AS revenue_centi
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_regionkey = 0
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def join_dynamic_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning — the runtime companion to
    ``sink_partitioned_prune``'s static pruning, and the layout feature
    that makes star-schema joins feasible at 100 TB: the fact table is
    partitioned by nation key, the dimension filter (nations of region
    0) is only known at RUN time through the join, and Catalyst injects
    the dim side's key set into the fact scan as a
    ``dynamicpruningexpression`` — the fact reader LISTS only the ~1/5
    of partition directories that can match, reusing the join's own
    broadcast as the filter (plan-asserted in tests/test_plans.py::
    test_dynamic_partition_pruning_fires).

    Staging: orders×customer pre-joined once per process and written
    ``partitionBy(c_nationkey)`` (25 dirs) — the pattern of a fact table
    laid out by its most-joined dimension key.  The oracle computes the
    same aggregate from the raw unpartitioned tables, so the hash also
    proves the staged layout loses nothing.
    """
    from cassandra_syncer_spark.queries.analytics_r3 import _scratch

    out = _scratch(sf_dir, "dpp_fact")
    fact = (
        T(spark, sf_dir, "orders")
        .join(
            T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100.0).cast("long").alias("price_centi"),
            "c_nationkey",
        )
    )
    fact.write.partitionBy("c_nationkey").mode("overwrite").parquet(out)
    back = spark.read.schema("o_orderkey long, price_centi long, c_nationkey long").parquet(out)
    dim = T(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    return (
        back.join(F.broadcast(dim), back.c_nationkey == dim.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_centi").cast("long").alias("revenue_centi"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# agg_bitmap_intersect — EXACT set intersections via bitmap AND
# ---------------------------------------------------------------------------


@register(
    "agg_bitmap_intersect",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority AS p, o_custkey AS c FROM orders GROUP BY 1, 2
    )
    SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS inter_exact
    FROM s a JOIN s b ON a.c = b.c AND a.p < b.p
    GROUP BY 1, 2 ORDER BY pa, pb
    """,
)
def agg_bitmap_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT pairwise set intersections via bitmap AND — the exact
    counterpart of ``agg_hll_intersection``, and the better scale shape
    than a member-level self-join: each set folds once into per-bucket
    bitmap partials (bucket = member div 64, the ``agg_distinct_bitmap``
    kernel), and every pairwise overlap is then popcount(bm_a & bm_b)
    summed over co-bucketed partials — set-pair work touches 8-byte
    words, never member rows.

    Scale shape: the raw data is read ONCE (the bitmap fold, map-side
    bit_or combine); the pair stage joins the partial tables on bucket —
    ≤ |sets|² × |id-space|/64 word operations, independent of the
    original row count.  Partials are the same mergeable cells the
    streaming bitmap loop persists (streaming/sketches.py), so overlap
    matrices refresh incrementally.  The member-level self-join the
    oracle uses is the validation-scale formulation only.  Non-negative
    integer id contract as ``agg_distinct_bitmap``.
    """
    s = (
        T(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("p"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    cells = (
        s.select(
            "p",
            F.expr("c div 64").alias("bucket"),
            F.expr("shiftleft(1L, int(c % 64))").alias("bit"),
        )
        .groupBy("p", "bucket")
        .agg(F.expr("bit_or(bit)").alias("bm"))
    )
    a = cells.select(
        F.col("p").alias("pa"), "bucket", F.col("bm").alias("bma")
    )
    b = cells.select(
        F.col("p").alias("pb"), "bucket", F.col("bm").alias("bmb")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(
            F.sum(F.bit_count(F.expr("bma & bmb"))).cast("long").alias("inter_exact")
        )
        .orderBy("pa", "pb")
    )


# ---------------------------------------------------------------------------
# events_top_paths — most common 3-step behavioral paths
# ---------------------------------------------------------------------------


@register(
    "events_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events WINDOW w AS (PARTITION BY user_id
                               ORDER BY epoch_ns(ts), event_id)
    ),
    paths AS (
      SELECT concat(event_type, '>', e2, '>', e3) AS path,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE e3 IS NOT NULL GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM paths)
    SELECT p.path, p.n,
           CAST((1000000 * p.n) // t.total AS BIGINT) AS share_micro,
           CAST(row_number() OVER (ORDER BY p.n DESC, p.path) AS BIGINT) AS rk
    FROM paths p, tot t
    QUALIFY rk <= 10 ORDER BY rk
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step behavioral paths (the journey/Sankey source
    table): sliding 3-grams of each user's event-type sequence, counted
    and ranked — the order-sensitive extension of
    ``events_markov_transitions``'s 2-gram matrix.

    Scale shape: ONE user_id shuffle (two stacked leads over the same
    window sort); paths collapse to ≤ |types|³ keys with map-side
    combine, the share normalizer is a 1-row broadcast, and the final
    rank window orders ≤ |types|³ rows — the corpus is touched once.
    """
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = paths.agg(F.sum("n").cast("long").alias("total"))
    rk = Window.orderBy(F.desc("n"), "path")
    return (
        paths.crossJoin(F.broadcast(tot))
        .select(
            "path",
            "n",
            F.expr("(1000000 * n) div total").alias("share_micro"),
            F.row_number().over(rk).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= 10)
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# embed_outlier_knn — embedding-space outlier scoring from neighbor similarity
# ---------------------------------------------------------------------------

_OUT_OFF = 100_000  # floor-div offset: truncating div == floor for positives


def _outlier_sql() -> str:
    from cassandra_syncer_spark.queries.llm_similarity import (
        _KNN_CODE_DUCK,
    )

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
    scored AS (
      SELECT a.vec_id, round(list_inner_product(a.v, b.v), 4) AS cosine,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY round(list_inner_product(a.v, b.v), 4) DESC, b.vec_id) AS rk
      FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id <> b.vec_id
    ),
    iso AS (
      SELECT vec_id, CAST(count(*) AS BIGINT) AS n_nbrs,
             CAST(sum(CAST(round(cosine * 10000) AS BIGINT)) AS BIGINT)
               AS sum_cos_e4
      FROM scored WHERE rk <= 3 GROUP BY vec_id
    ),
    ranked AS (
      SELECT vec_id, n_nbrs,
             CAST((sum_cos_e4 + n_nbrs * {_OUT_OFF}) // n_nbrs - {_OUT_OFF}
                  AS BIGINT) AS mean_cos_e4,
             row_number() OVER (
               ORDER BY (sum_cos_e4 + n_nbrs * {_OUT_OFF}) // n_nbrs, vec_id
             ) AS rk
      FROM iso
    )
    SELECT vec_id, n_nbrs, mean_cos_e4, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 20 ORDER BY rk
    """


@register("embed_outlier_knn", oracle=_outlier_sql())
def embed_outlier_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space OUTLIER scoring — the data-quality screen that
    surfaces mislabeled / garbage / off-distribution vectors before they
    enter training: each vector's isolation is the mean cosine to its 3
    nearest cell-local neighbors (low mean similarity = far from
    everything near it); the 20 most isolated vectors are flagged.
    Reuses ``sim_knn_graph_ivf``'s sign-code-prefix cells, so the
    neighbor search stays O(N)-assigned and cell-local.

    Determinism: per-vector sums of round(cosine·1e4) are exact bigints;
    the mean uses the +n·OFF floor-div trick (sums can be negative, and
    Spark's truncating ``div`` and DuckDB's ``//`` disagree on
    negatives), so the isolation ranking is identical cross-engine.

    Scale shape: identical to the k-NN graph (one scan for codes, one
    cell shuffle, bucket-local pairs, per-vector rank window) plus a
    vector-keyed agg and a final top-20 over per-vector rows.
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
            F.expr(f"shiftright({_KNN_CODE_SPARK}, cast(63 - b as int))").alias("cell"),
        )
        .localCheckpoint()
    )
    a, b = cells.alias("a"), cells.alias("b")
    scored = a.join(
        b,
        (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.round(_dot(F.col("a.v"), F.col("b.v")), 4).alias("cosine"),
        F.row_number()
        .over(
            Window.partitionBy("a.vec_id").orderBy(
                F.desc(F.round(_dot(F.col("a.v"), F.col("b.v")), 4)), "b.vec_id"
            )
        )
        .alias("rk"),
    )
    iso = (
        scored.filter(F.col("rk") <= 3)
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nbrs"),
            F.sum(F.expr("cast(round(cosine * 10000) as bigint)"))
            .cast("long")
            .alias("sum_cos_e4"),
        )
        .select(
            "vec_id",
            "n_nbrs",
            F.expr(
                f"(sum_cos_e4 + n_nbrs * {_OUT_OFF}) div n_nbrs - {_OUT_OFF}"
            ).cast("long").alias("mean_cos_e4"),
        )
    )
    # global bottom-20 via orderBy+limit → TakeOrderedAndProject (each
    # partition ships only its own top candidates); the rank window then
    # orders 20 rows, never the full per-vector table — a bare global
    # row_number window here would serialize every vector through one task
    top = iso.orderBy("mean_cos_e4", "vec_id").limit(20)
    rkw = Window.orderBy("mean_cos_e4", "vec_id")
    return top.withColumn("rk", F.row_number().over(rkw).cast("long")).orderBy("rk")


# ---------------------------------------------------------------------------
# mix_dedup_aware_weights — mixing quotas corrected by per-source dup rate
# ---------------------------------------------------------------------------

_MIX_TOTAL = 100_000  # target sample size the quotas distribute


@register(
    "mix_dedup_aware_weights",
    oracle=f"""
    WITH h AS (SELECT doc_id, source, md5(text) AS hh FROM documents),
    canon AS (
      SELECT hh, min(doc_id) AS keeper FROM h GROUP BY hh
    ),
    per_source AS (
      SELECT h.source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(CASE WHEN c.keeper = h.doc_id THEN 1 END) AS BIGINT)
               AS n_unique
      FROM h JOIN canon c ON h.hh = c.hh
      GROUP BY h.source
    ),
    tot AS (SELECT CAST(sum(n_unique) AS BIGINT) AS total_unique FROM per_source)
    SELECT p.source, p.n_docs, p.n_unique,
           CAST((1000000 * p.n_unique) // p.n_docs AS BIGINT) AS unique_micro,
           CAST(({_MIX_TOTAL} * p.n_unique) // t.total_unique AS BIGINT)
             AS quota
    FROM per_source p, tot t
    ORDER BY p.source
    """,
)
def mix_dedup_aware_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware mixing weights — the correction every multi-source
    training mix needs: naive proportional quotas over-sample sources
    whose volume is inflated by duplicates, so quotas here distribute
    the sampling budget by each source's UNIQUE-document count
    (canonical = min doc_id per content hash, the
    ``dedup_exact_canonical`` rule).  Chains the exact-dedup and
    mix-quota kernels into one registered artifact: raw volume, unique
    volume, uniqueness rate, and the integer-exact budget share.

    Scale shape: one md5 hash-agg finds canonical keepers (the
    ``dedup_exact`` shuffle), one source-keyed agg collapses to
    |sources| rows, and the budget math is a 1-row broadcast — the
    corpus is read once.
    """
    h = T(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5("text").alias("hh")
    )
    canon = h.groupBy("hh").agg(F.min("doc_id").alias("keeper"))
    per_source = (
        h.join(canon, "hh")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count(F.when(F.col("keeper") == F.col("doc_id"), 1))
            .cast("long")
            .alias("n_unique"),
        )
    )
    tot = per_source.agg(F.sum("n_unique").cast("long").alias("total_unique"))
    return (
        per_source.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_unique",
            F.expr("(1000000 * n_unique) div n_docs").alias("unique_micro"),
            F.expr(f"({_MIX_TOTAL} * n_unique) div total_unique").alias("quota"),
        )
        .orderBy("source")
    )
