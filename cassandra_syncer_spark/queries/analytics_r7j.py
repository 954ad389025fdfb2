"""Round-7 batch 9: substring-span dedup, cross-source duplication
matrix, sampled cosine-similarity histogram.

Reference parity: the reference exposes generic scan/filter/agg plumbing
(`/root/reference/lib/consumer.js`, `lib/providers/*`); these corpus-health
operators extend it with the training-data-pipeline analyses the brief
lists as first-class.  All three are pure DataFrame compositions — no
Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# dedup_substring_spans — duplicated token-span coverage per document
# ---------------------------------------------------------------------------

_SPAN_K = 6  # tokens per window (Lee et al. use 50 BPE tokens; same dataflow)


@register(
    "dedup_substring_spans",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (
      SELECT doc_id, array_to_string(ws[k : k + {_SPAN_K - 1}], ' ') AS g
      FROM (
        SELECT doc_id, ws, unnest(range(1, len(ws) - {_SPAN_K - 2})) AS k
        FROM w
      )
    ),
    f AS (
      SELECT doc_id,
             CASE WHEN count(*) OVER (PARTITION BY g) > 1 THEN 1 ELSE 0 END
               AS dup
      FROM g
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(dup) AS BIGINT) AS n_dup_windows,
           CAST((1000000 * sum(dup)) // count(*) AS BIGINT) AS dup_micro
    FROM f GROUP BY doc_id ORDER BY doc_id
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT SUBSTRING DEDUP coverage (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): for every sliding
    K-token window in every document, is that exact span repeated
    anywhere else in the corpus?  Reports per-document duplicated-span
    coverage — the signal the suffix-array ExactSubstr dedup thresholds
    on.  Differs from ``dedup_ngram_jaccard`` (pairwise whole-doc
    similarity) and ``decontam_ngram_overlap`` (train-vs-test): this is
    positional span coverage within one corpus, the quantity you CUT
    spans by in substring dedup.

    Scale shape: scan → gram expansion fused into the scan projection
    (transform over sequence, short-doc guarded) → explode → one
    count-over-gram-partition window (the only corpus-sized shuffle,
    keyed on the span text) → per-doc agg.  A 100 TB run would key the
    shuffle on ``xxhash64(span)`` instead of the raw span string to cut
    shuffle bytes ~10×; the fixture keys on the string so the DuckDB
    oracle (no xxhash64) groups identically — the dataflow is the same.
    Suffix arrays find *maximal* repeated substrings in O(n); the
    windowed-hash formulation is the shuffle-friendly distributed
    equivalent (fixed K, same threshold decisions).
    """
    k = _SPAN_K
    wins = (
        T(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("ws"))
        .select(
            "doc_id",
            F.explode(
                # sequence(1, 0) is DESCENDING in Spark and slice() throws on
                # start 0 — docs with < K words must emit no windows, exactly
                # as the oracle's range(1, len-K+2) emits nothing for them.
                F.expr(
                    f"IF(size(ws) >= {k},"
                    f" transform(sequence(1, size(ws) - {k} + 1),"
                    f" i -> array_join(slice(ws, i, {k}), ' ')),"
                    " array())"
                )
            ).alias("g"),
        )
    )
    dup = (
        F.count(F.lit(1)).over(Window.partitionBy("g")) > 1
    ).cast("int").alias("dup")
    return (
        wins.select("doc_id", dup)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum("dup").cast("long").alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.expr("(1000000 * n_dup_windows) div n_windows").alias("dup_micro"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# dedup_cross_source_matrix — which source pairs share identical content
# ---------------------------------------------------------------------------


@register(
    "dedup_cross_source_matrix",
    oracle=f"""
    WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
    d AS (
      SELECT DISTINCT source,
             array_to_string(ws[k : k + {_SPAN_K - 1}], ' ') AS g
      FROM (
        SELECT source, ws, unnest(range(1, len(ws) - {_SPAN_K - 2})) AS k
        FROM w
      )
    ),
    p AS (
      SELECT a.g, a.source AS source_a, b.source AS source_b
      FROM d a JOIN d b ON a.g = b.g AND a.source < b.source
    )
    SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_shared
    FROM p GROUP BY 1, 2 ORDER BY n_shared DESC, source_a, source_b
    """,
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SOURCE DUPLICATION MATRIX: for every unordered pair of
    sources, how many distinct K-token spans appear in BOTH — the
    provenance diagnostic behind mirror detection (two crawl sources
    serving the same site) and double-weighting audits before a mixing
    run (``mix_dedup_aware_weights`` consumes exactly this signal).
    ``corpus_dedup_rate_by_source`` reports each source's own dup rate;
    this reports which PAIRS of sources share content.  Span-level, not
    whole-doc: mirrors rewrap boilerplate around identical bodies, so
    exact-text keys under-count (this fixture has zero exact-text dups
    but 1000+ shared spans).

    Scale shape: distinct(span, source) FIRST — the self-join then runs
    on one row per (span, source), so a span repeated 1M times inside
    one source costs one row.  The join is span-keyed and bucket-local
    (rows per span = #sources holding it, bounded by the source count,
    not the corpus); output is at most |sources|² rows.  No skew: a
    boilerplate span in 20 sources expands to C(20,2) = 190 pairs,
    constant.  At 100 TB, key on xxhash64(span) to cut shuffle bytes
    (string keys here so the DuckDB oracle groups identically).
    """
    k = _SPAN_K
    d = (
        T(spark, sf_dir, "documents")
        .select("source", F.split("text", " ").alias("ws"))
        .select(
            "source",
            F.explode(
                F.expr(
                    f"IF(size(ws) >= {k},"
                    f" transform(sequence(1, size(ws) - {k} + 1),"
                    f" i -> array_join(slice(ws, i, {k}), ' ')),"
                    " array())"
                )
            ).alias("g"),
        )
        .distinct()
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .orderBy(F.desc("n_shared"), "source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# embed_cosine_histogram — corpus-health distribution of pairwise cosine
# ---------------------------------------------------------------------------

_COS_SAMPLE_TARGET = 100  # constant sample SIZE at any corpus scale


@register(
    "embed_cosine_histogram",
    oracle=f"""
    WITH m AS (
      SELECT greatest(1, count(*) // {_COS_SAMPLE_TARGET}) AS md
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings, m WHERE vec_id % m.md = 0
    ),
    p AS (
      SELECT CAST(least(greatest(
               floor(round(list_inner_product(a.v, b.v), 4) * 10), -10), 9)
             AS BIGINT) AS bucket
      FROM s a JOIN s b ON a.vec_id < b.vec_id
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY bucket ORDER BY bucket
    """,
)
def embed_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIRWISE-COSINE HISTOGRAM on a deterministic vec_id sample — the
    embedding-space health check run before dedup thresholding: a
    healthy corpus puts its mass near 0 (random directions), a spike in
    the 0.9–1.0 bucket means duplicated embeddings (upstream dedup
    failed), a shifted mode means a collapsed embedding model.
    ``dedup_threshold_calibration`` picks a cut from candidate pairs;
    this profiles the UNCONDITIONED pair distribution, which is what
    tells you whether a threshold exists at all.

    Scale shape: the sample makes the quadratic explicit and bounded at
    a constant SIZE, not a constant rate — the modulus derives from the
    table count (1-in-(N/target)), so the pair count stays ~target²/2 at
    ANY corpus scale (a fixed 1-in-M rate looked fine at 1× and went
    quadratic at 10×: 0.6 s → 8.8 s, measured; the derived modulus holds
    ~0.6 s at both).  The count and the sampled side both broadcast, so
    the pair expansion is shuffle-free map-side work.  Fixture
    embeddings are unit-normalized (cosine = dot, one zip_with/aggregate
    fold, JVM-side); bucket = floor(round(dot,4)·10) clamped to [-10, 9]
    — both engines bucket the same rounded value, so the histogram is
    integer-exact.
    """
    emb = T(spark, sf_dir, "embeddings")
    md = emb.agg(
        F.greatest(
            F.lit(1), F.expr(f"count(*) div {_COS_SAMPLE_TARGET}")
        ).alias("md")
    )
    s = (
        emb.crossJoin(F.broadcast(md))
        .filter(F.col("vec_id") % F.col("md") == 0)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )
    a, b = s.alias("a"), F.broadcast(s.alias("b"))
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    bucket = (
        F.least(
            F.greatest(F.floor(F.round(dot, 4) * 10), F.lit(-10)), F.lit(9)
        )
        .cast("long")
        .alias("bucket")
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# dedup_substring_cut — merge duplicated spans into cut intervals per doc
# ---------------------------------------------------------------------------


@register(
    "dedup_substring_cut",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (
      SELECT doc_id, len(ws) AS n_tokens, k AS s, k + {_SPAN_K - 1} AS e,
             array_to_string(ws[k : k + {_SPAN_K - 1}], ' ') AS g
      FROM (
        SELECT doc_id, ws, unnest(range(1, len(ws) - {_SPAN_K - 2})) AS k
        FROM w
      )
    ),
    d AS (
      SELECT doc_id, n_tokens, s, e FROM (
        SELECT *, count(*) OVER (PARTITION BY g) AS c FROM g
      ) WHERE c > 1
    ),
    m AS (
      SELECT doc_id, n_tokens, s, e,
             CASE WHEN s > coalesce(max(e) OVER (
                    PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
                  THEN 1 ELSE 0 END AS ni
      FROM d
    ),
    i AS (
      SELECT doc_id, n_tokens, s, e,
             sum(ni) OVER (PARTITION BY doc_id ORDER BY s) AS island
      FROM m
    ),
    sp AS (
      SELECT doc_id, any_value(n_tokens) AS n_tokens,
             min(s) AS ss, max(e) AS ee
      FROM i GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_cut_spans,
           CAST(sum(ee - ss + 1) AS BIGINT) AS tokens_removed,
           CAST(any_value(n_tokens) AS BIGINT) AS n_tokens,
           CAST((1000000 * sum(ee - ss + 1)) // any_value(n_tokens) AS BIGINT)
             AS removed_micro
    FROM sp GROUP BY doc_id ORDER BY doc_id
    """,
)
def dedup_substring_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr APPLY stage: ``dedup_substring_spans`` detects
    duplicated K-token windows; this op turns them into the actual CUT
    LIST — overlapping/adjacent duplicated windows merged into maximal
    intervals per document (classic gaps-and-islands), reporting spans
    to remove, tokens removed, and the removed fraction.  The pair to
    ``dedup_apply_clusters`` (which applies doc-level dedup verdicts):
    substring dedup removes RANGES inside surviving docs.

    Scale shape: same single corpus-sized shuffle as the detect stage
    (count window on the span key), then everything is doc-local — the
    island merge runs inside a per-doc window over only the DUPLICATED
    windows (Zipf-small), and both windows in the merge share one
    partitioning (one exchange, plan-asserted).  Merged-interval
    semantics are pure integer logic, hash-identical across engines.
    """
    k = _SPAN_K
    wins = (
        T(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("ws"))
        .select(
            "doc_id",
            F.size("ws").alias("n_tokens"),
            F.posexplode(
                F.expr(
                    f"IF(size(ws) >= {k},"
                    f" transform(sequence(1, size(ws) - {k} + 1),"
                    f" i -> array_join(slice(ws, i, {k}), ' ')),"
                    " array())"
                )
            ).alias("pos", "g"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("pos") + 1).alias("s"),
            (F.col("pos") + k).alias("e"),
            "g",
        )
    )
    dup = wins.withColumn(
        "c", F.count(F.lit(1)).over(Window.partitionBy("g"))
    ).filter(F.col("c") > 1)
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = dup.withColumn(
        "ni",
        (
            F.col("s")
            > F.coalesce(F.max("e").over(wprev), F.lit(-1)) + 1
        ).cast("int"),
    ).withColumn("island", F.sum("ni").over(wcum))
    spans = marked.groupBy("doc_id", "island").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.min("s").alias("ss"),
        F.max("e").alias("ee"),
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cut_spans"),
            F.sum(F.col("ee") - F.col("ss") + 1).cast("long").alias("tokens_removed"),
            F.first("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "n_cut_spans",
            "tokens_removed",
            "n_tokens",
            F.expr("(1000000 * tokens_removed) div n_tokens").alias("removed_micro"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# events_ctr_wilson — ranking under uncertainty: Wilson lower bound on CTR
# ---------------------------------------------------------------------------

# z = 1.96 (95%); z² = 3.8416, z²/2 = 1.9208, z²/4 = 0.9604.  The formula
# is written as ONE shared SQL text so both engines evaluate the identical
# expression tree (IEEE ops on identical integer inputs → identical doubles).
_WILSON_SQL = (
    "round(1000000 * ("
    " (n_clicks / CAST(n_impr AS DOUBLE) + 1.9208 / n_impr"
    "  - 1.96 * sqrt((n_clicks / CAST(n_impr AS DOUBLE))"
    "                * (1 - n_clicks / CAST(n_impr AS DOUBLE)) / n_impr"
    "                + 0.9604 / (CAST(n_impr AS DOUBLE) * n_impr)))"
    " / (1 + 3.8416 / n_impr)))"
)


@register(
    "events_ctr_wilson",
    oracle=f"""
    WITH e AS (
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
             event_type
      FROM events
    ),
    c AS (
      SELECT item,
             CAST(sum(CASE WHEN event_type IN ('view', 'click') THEN 1
                      ELSE 0 END) AS BIGINT) AS n_impr,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_clicks
      FROM e GROUP BY item
      HAVING sum(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
             > 0
    )
    SELECT item, n_impr, n_clicks,
           CAST((1000000 * n_clicks) // n_impr AS BIGINT) AS ctr_micro,
           CAST({_WILSON_SQL} AS BIGINT) AS wilson_micro
    FROM c ORDER BY wilson_micro DESC, item
    """,
)
def events_ctr_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANKING UNDER UNCERTAINTY: Wilson score lower bound (95%) on
    per-item click-through rate — the estimator that stops a 1-click /
    1-view item from outranking a 900-click / 1000-view item, the
    standard fix for raw-CTR ranking (Agresti–Coull / Wilson interval).
    Items come from the event props JSON; impressions = views + clicks
    (a click implies an impression — and it bounds p to [0,1]; raw view
    counts undercount in any log where the view event can drop).  Complements ``events_abtest_lift`` (two-arm compare)
    with per-item interval ranking.

    Scale shape: one scan with the JSON extraction fused, one item-keyed
    agg with map-side partial counts (items ≪ events, Zipf-friendly);
    the Wilson formula is scalar arithmetic on two aggregated integers —
    written as ONE shared SQL text for both engines, so the IEEE double
    pipeline is identical and the micro rounding cannot diverge.  The
    final sort is item-cardinality-sized.
    """
    e = T(spark, sf_dir, "events").select(
        F.get_json_object("props", "$.k").cast("long").alias("item"),
        "event_type",
    )
    c = (
        e.groupBy("item")
        .agg(
            F.sum(
                F.when(F.col("event_type").isin("view", "click"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_impr"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("n_clicks"),
        )
        .filter(F.col("n_impr") > 0)
    )
    return c.select(
        "item",
        "n_impr",
        "n_clicks",
        F.expr("(1000000 * n_clicks) div n_impr").alias("ctr_micro"),
        F.expr(f"CAST({_WILSON_SQL} AS BIGINT)").alias("wilson_micro"),
    ).orderBy(F.desc("wilson_micro"), "item")
