"""Round-5 batch 2: corpus LM quality scoring, lexical-diversity gating,
chunk-level exact dedup, nearest-in-time as-of join, ORC format
coverage, and a count-min frequency sketch — more shapes a 100 TB
curation / analytics stack runs routinely, each oracle-checked.

Determinism discipline follows the repo rule set: no libm ``log`` in
checked outputs (ratios of exact integer counts instead — cf.
``text_idf_topterms``), per-term quantization to integer micro-units
BEFORE any cross-row summation so aggregation order can't flip a float,
and identical operation order in both engines for every double division.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.operators import cms
from cassandra_syncer_spark.operators import fingerprint as fp
from cassandra_syncer_spark.operators.asof import nearest_join
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

_CMS_D = cms.CMS_D
_CMS_W = cms.CMS_W


@register(
    "corpus_bigram_lm_score",
    oracle="""
    WITH tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      FROM tw, LATERAL (SELECT unnest(range(1, len(w))) AS i)
    ),
    cbg AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
    cpre AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cp FROM cbg GROUP BY 1),
    scored AS (
      SELECT b.doc_id,
             CAST(round(1000000.0 * c.c / p.cp) AS BIGINT) AS m
      FROM bg b JOIN cbg c USING (w1, w2) JOIN cpre p USING (w1)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(m) // count(*) AS BIGINT) AS lm_micro
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def corpus_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM document quality score (CCNet-style): train a bigram
    model ON the corpus itself, then score each document by its mean
    bigram conditional probability — low scores flag gibberish /
    boilerplate / wrong-language docs before they enter a training mix.

    Log-free determinism: per-bigram probability c(w1,w2)/c(w1·) is one
    IEEE division of exact integer counts, quantized to micro-units
    (``round(1e6·p)`` as bigint) BEFORE summation, and the per-doc mean
    uses integer division — no float accumulates across rows, so
    partial-agg order can't flip the hash (libm ``ln`` would also not be
    bit-identical across engines; the repo rule since
    ``text_idf_topterms``).

    Scale shape: the token stream explodes scan-side (no shuffle), then
    shuffles on gram keys for the two count aggs and the score join —
    all fixed-width keys, all combiner-friendly.  The count tables are
    vocabulary-bounded (≪ corpus; Zipf caps distinct bigrams), so at
    100 TB they behave as dimensions against the stream: broadcastable
    when the vocab is capped, ordinary hash joins otherwise.  The final
    agg keys on doc_id — the stream's natural partitioning.
    """
    docs = T(spark, sf_dir, "documents")
    # bigrams built scan-side via transform over an index sequence; the
    # words array is PROJECTED FIRST — higher-order lambdas get no
    # common-subexpression elimination, so an inline split(text) inside
    # the lambda would re-split per element (measured 9× slower).
    # Spark lambda indexing w[i] is 0-based (DuckDB's is 1-based; both
    # enumerate pairs (w_j, w_{j+1}))
    bg = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(w) >= 2 THEN "
                    "transform(sequence(1, size(w) - 1), "
                    "i -> struct(w[i-1] AS w1, w[i] AS w2)) "
                    "ELSE array() END"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    cbg = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    cpre = cbg.groupBy("w1").agg(F.sum("c").cast("long").alias("cp"))
    scored = (
        bg.join(cbg, ["w1", "w2"])
        .join(cpre, "w1")
        .select(
            "doc_id",
            F.round(F.lit(1000000.0) * F.col("c") / F.col("cp")).cast("long").alias("m"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.expr("sum(m) div count(*)").cast("long").alias("lm_micro"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_diversity_gini",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    cw AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
    d AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c * c) AS BIGINT) AS s2,
             CAST(count(*) AS BIGINT) AS nw
      FROM cw GROUP BY 1
    )
    SELECT doc_id, n AS n_tokens, nw AS n_distinct,
           CAST(round(1000000.0 * (n * n - s2) / (n * n)) AS BIGINT) AS gini_micro
    FROM d ORDER BY doc_id
    """,
)
def text_diversity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity gate: per-document Gini–Simpson index
    1 − Σpᵢ² over the word distribution — the log-free complement to a
    Shannon-entropy filter (same monotone "repetitive doc → low score"
    signal, but exactly computable from integer moments: Σc² and n are
    exact longs, so the single double division is bit-identical across
    engines; ``text_repetition_filter`` gates on the top 2-gram, this
    gates on the whole distribution).

    Scale shape: explode → (doc_id, word) count agg → per-doc moment
    agg.  Two shuffles, both on shrinking key spaces: the heavy first
    leg moves only distinct (doc, word) pairs thanks to map-side
    combine (Zipf makes pairs ≪ tokens — the reason this beats a
    single-shuffle repartition-by-doc variant, which would move every
    raw token uncombined), and the second moves one row per pair down
    to one per doc.  No joins, no windows.
    """
    tok = T(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    cw = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    d = cw.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
        F.count(F.lit(1)).cast("long").alias("nw"),
    )
    n, s2 = F.col("n"), F.col("s2")
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.col("nw").alias("n_distinct"),
        F.round(F.lit(1000000.0) * (n * n - s2) / (n * n)).cast("long").alias("gini_micro"),
    ).orderBy("doc_id")


@register(
    "dedup_chunk_exact",
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
    c AS (
      SELECT doc_id, substr(text, CAST(i * 400 + 1 AS BIGINT), 500) AS chunk
      FROM d, LATERAL (
        SELECT unnest(range(0, (greatest(L, 1) - 1) // 400 + 1)) AS i)
    )
    SELECT md5(chunk) AS chunk_md5,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occ,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM c GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
    ORDER BY chunk_md5
    """,
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph/chunk-level exact dedup: chunks (same 500-char/100-
    overlap grid as ``doc_chunk_split``) appearing verbatim in ≥2
    documents — the sub-document dedup pass (C4/RefinedWeb-style) that
    whole-doc dedup misses: boilerplate headers, license blocks, and
    syndicated passages shared across otherwise-distinct docs.

    Scale shape: chunking is scan-fused (sequence+substring explode,
    zero shuffle — cf. ``doc_chunk_split``), identity is the fixed-width
    md5 of the chunk, and the one shuffle aggregates on that hash with
    map-side combine.  Output is bounded by the duplicated-chunk count,
    not the corpus; the downstream removal join is a broadcast/semi on
    ``chunk_md5`` exactly like ``dedup_exact``'s etag path.
    """
    chunks = (
        T(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.expr("sequence(0, int((greatest(length(text), 1) - 1) div 400))")
            ).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            F.md5(F.expr("substring(text, i * 400 + 1, 500)")).alias("chunk_md5"),
        )
    )
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("chunk_md5")
    )


@register(
    "mix_epoch_plan",
    oracle="""
    WITH src AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_docs, tokens,
             CAST(round(sqrt(CAST(tokens AS DOUBLE)) * 1000000) AS BIGINT) AS wt
      FROM src
    )
    SELECT source, n_docs, tokens,
           CAST((1000000 * wt) // (SELECT sum(wt) FROM w) AS BIGINT)
             AS target_tokens,
           CAST((1000000 * ((1000000 * wt) // (SELECT sum(wt) FROM w))) // tokens
             AS BIGINT) AS epochs_micro
    FROM w ORDER BY source
    """,
)
def mix_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixing-plan computation: given a 1M-token training budget and
    temperature-2 target shares (∝ √tokens, the same family as
    ``mix_temperature_sampling``), derive per-source target token counts
    and the repeat factor (epochs, in micro-units) each source must run
    to hit its share — the planning step before corpus assembly decides
    which sources repeat (epochs > 1e6) and which truncate (< 1e6).

    Determinism discipline: weights integerized (``round(√tokens·10⁶)``)
    BEFORE summation, shares and epochs by integer division — the whole
    plan is a pure function of the per-source token counts, identical
    across engines and reruns.

    Scale: one scan → per-source agg (keys = |sources|, tiny); the plan
    itself is dimension-sized arithmetic.  At 100 TB this is metadata
    math on top of one aggregation pass.
    """
    docs = T(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens"),
    )
    w = src.withColumn(
        "wt",
        F.round(F.sqrt(F.col("tokens").cast("double")) * 1_000_000).cast("long"),
    )
    total = w.agg(F.sum("wt").alias("wt_sum"))
    return (
        w.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "tokens",
            F.expr("(1000000 * wt) div wt_sum").cast("long").alias("target_tokens"),
            F.expr("(1000000 * ((1000000 * wt) div wt_sum)) div tokens")
            .cast("long")
            .alias("epochs_micro"),
        )
        .orderBy("source")
    )


@register(
    "dedup_chunk_apply",
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
    c AS (
      SELECT doc_id, substr(text, CAST(i * 400 + 1 AS BIGINT), 500) AS chunk
      FROM d, LATERAL (
        SELECT unnest(range(0, (greatest(L, 1) - 1) // 400 + 1)) AS i)
    ),
    h AS (SELECT doc_id, md5(chunk) AS chunk_md5 FROM c),
    owner AS (SELECT chunk_md5, min(doc_id) AS first_doc FROM h GROUP BY 1)
    SELECT h.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(*) FILTER (WHERE o.first_doc < h.doc_id) AS BIGINT) AS n_dup,
           CAST(round(1000000.0 * count(*) FILTER (WHERE o.first_doc < h.doc_id)
                      / count(*)) AS BIGINT) AS dup_micro
    FROM h JOIN owner o USING (chunk_md5)
    GROUP BY h.doc_id HAVING count(*) FILTER (WHERE o.first_doc < h.doc_id) > 0
    ORDER BY h.doc_id
    """,
)
def dedup_chunk_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply stage of chunk-level dedup: per-document duplicated-content
    fraction, counting chunks whose verbatim copy already appears in an
    EARLIER document (min-doc_id ownership — the same deterministic
    keeper rule as ``dedup_exact_canonical``).  Real pipelines gate on
    this number (drop or trim docs beyond a dup-fraction threshold);
    emitting only docs with ≥1 duplicated chunk keeps the output
    dup-bounded, like ``dedup_chunk_exact``.

    Scale shape: chunk explode is scan-fused; ownership is one hash agg
    on ``chunk_md5``; the apply join keys on the same fixed-width hash
    (Catalyst broadcasts the ownership dim at fixture scale; at corpus
    scale it degrades gracefully to a sort-merge join co-partitioned
    with the ownership agg's own shuffle), then rolls up per doc.  The
    fraction divides two exact integers, so the micro-unit rounding is
    cross-engine stable.
    """
    chunks = (
        T(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.expr("sequence(0, int((greatest(length(text), 1) - 1) div 400))")
            ).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            F.md5(F.expr("substring(text, i * 400 + 1, 500)")).alias("chunk_md5"),
        )
    )
    owner = chunks.groupBy("chunk_md5").agg(F.min("doc_id").alias("first_doc"))
    dup = F.col("first_doc") < F.col("doc_id")
    return (
        chunks.join(owner, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(dup.cast("long")).cast("long").alias("n_dup"),
            F.round(
                F.lit(1000000.0)
                * F.sum(dup.cast("long"))
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("dup_micro"),
        )
        .filter(F.col("n_dup") > 0)
        .orderBy("doc_id")
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH lft AS (
      SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_sec
      FROM events WHERE event_type = 'click'
    ), rgt AS (
      SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_sec,
             max(event_id) AS r_event_id
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), cand AS (
      SELECT l.event_id, l.user_id, l.ts_sec, r.r_event_id,
             r.ts_sec AS r_ts, abs(r.ts_sec - l.ts_sec) AS d
      FROM lft l JOIN rgt r ON l.user_id = r.user_id
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY d, r_ts) AS rn
      FROM cand
    )
    SELECT event_id, user_id, ts_sec,
           r_event_id AS matched_event_id,
           r_ts AS matched_ts_sec,
           CAST(d AS BIGINT) AS delta_sec
    FROM ranked WHERE rn = 1 ORDER BY event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-in-time as-of join: for each click, the purchase closest
    in time in either direction (tie → the at-or-before row) — the
    sensor-alignment / sessionless-attribution variant completing the
    as-of family (backward ``join_asof``, forward ``join_asof_forward``).

    Scale: operators/asof.py::nearest_join — the backward and forward
    candidates are two window FRAMES over ONE key-sorted shuffle (last()
    over preceding, first() over following), then a per-row distance
    compare picks the side.  No second pass, no range-join blowup; the
    oracle keeps the O(n·m)-per-key join+rank formulation, fine at
    sf0.01 only.
    """
    ev = T(spark, sf_dir, "events").withColumn("ts_sec", F.expr("ts_ns div 1000000000"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_sec"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_sec", "event_id"
    )
    out = nearest_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts_sec",
        right_ts="ts_sec",
        value_cols=["event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.col("matched_event_id"),
        F.col("matched_ts").alias("matched_ts_sec"),
        F.abs(F.col("matched_ts") - F.col("ts_sec")).cast("long").alias("delta_sec"),
    ).orderBy("event_id")


#: shared expression builders live in operators/cms.py — the streaming
#: maintenance loop (streaming/sketches.py) folds microbatches with the
#: SAME cells dataflow, so batch and stream sketches merge losslessly
_cms_bucket = cms.bucket_expr


@register(
    "agg_countmin_freq",
    oracle=f"""
    WITH li AS (
      SELECT CAST(l_partkey AS VARCHAR) AS k,
             {fp.hash32("CAST(l_partkey AS VARCHAR)", duck=True)} AS h
      FROM lineitem
    ),
    cells AS (
      SELECT j, {_cms_bucket(duck=True)} AS b, CAST(count(*) AS BIGINT) AS c
      FROM li, LATERAL (SELECT unnest(range(0, {_CMS_D})) AS j)
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT k, any_value(h) AS h, CAST(count(*) AS BIGINT) AS exact_n
      FROM li GROUP BY 1
    ),
    top5 AS (
      SELECT k, h, exact_n FROM (
        SELECT k, h, exact_n,
               row_number() OVER (ORDER BY exact_n DESC, CAST(k AS BIGINT)) AS rn
        FROM exact) WHERE rn <= 5
    ),
    probe AS (
      SELECT t.k, t.exact_n, j, {_cms_bucket(duck=True)} AS b
      FROM top5 t, LATERAL (SELECT unnest(range(0, {_CMS_D})) AS j)
    )
    SELECT CAST(p.k AS BIGINT) AS partkey,
           any_value(p.exact_n) AS exact_n,
           min(c.c) AS est_n,
           min(c.c) - any_value(p.exact_n) AS overcount
    FROM probe p JOIN cells c USING (j, b)
    GROUP BY p.k ORDER BY partkey
    """,
)
def agg_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation, fully hash-checked: both
    engines build the IDENTICAL sketch — ONE portable md5-derived
    ``hash32`` per key, expanded to the d depth rows by the same
    universal-hash family MinHash uses (fingerprint.py PERM_*, exact
    64-bit integer math) — so unlike the HLL/GK estimators this sketch
    query needs no rows-only waiver: the estimates themselves cross the
    oracle boundary.

    The sketch is the mergeable fixed-size structure for streaming /
    sharded frequency queries at 100 TB: one scan folds the corpus into
    d×w = 4×8192 counters (map-side combine does the heavy lifting;
    shard sketches merge by cell-wise sum, exactly like the HLL
    partials in ``agg_hll_union``), and any key's frequency is then
    answered from 4 counters — ``min_j cells[j][h_j(key)]`` — without
    rescanning.  Probes here are the top-5 exact heavy hitters
    (deterministic key tie-break) so the output also certifies the CMS
    guarantee est ≥ exact on real data; the overcount column shows the
    collision noise (ε ≈ e/w of total mass per row, min over 4 rows).

    Plan: corpus → 32k-cell agg; probes and cells are both tiny, so the
    estimate join broadcasts — nothing downstream of the scan depends on
    corpus size.
    """
    # round-11 (guide §4.1/§2.3): the base hash is md5-derived and a pure
    # function of the KEY, so fold rows to per-key counts FIRST (one cheap
    # hash agg, no md5) and run the md5 once per DISTINCT key (20 k at
    # sf0.1) instead of once per corpus row per pass (2 × 600 k before).
    # cells derived from the count table are IDENTICAL by construction:
    # every row of a key lands in the same buckets, so each cell's row
    # count equals the sum of its keys' exact counts (cms.cells_from_counts
    # — the streaming microbatch fold keeps the row-level cms.cells).
    bucket = F.expr(_cms_bucket(duck=False))
    exact = (
        T(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").cast("string").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .withColumn("h", F.expr(fp.hash32("k", duck=False)))
    )
    cells = cms.cells_from_counts(exact.select("h", F.col("exact_n").alias("cnt")))
    from pyspark.sql.window import Window

    top5 = (
        exact.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.desc("exact_n"), F.col("k").cast("long"))
            ),
        )
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )
    probe = top5.select(
        "k", "exact_n", "h", F.explode(F.expr(f"sequence(0, {_CMS_D - 1})")).alias("j")
    ).select("k", "exact_n", "j", bucket.alias("b"))
    return (
        cells.join(F.broadcast(probe), ["j", "b"])
        .groupBy("k")
        .agg(
            F.any_value(F.col("exact_n")).alias("exact_n"),
            F.min("c").alias("est_n"),
            (F.min("c") - F.any_value(F.col("exact_n"))).alias("overcount"),
        )
        .select(
            F.col("k").cast("long").alias("partkey"),
            "exact_n",
            "est_n",
            "overcount",
        )
        .orderBy("partkey")
    )


@register(
    "join_asof_tolerance",
    oracle="""
    WITH lft AS (
      SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_sec
      FROM events WHERE event_type = 'click'
    ), rgt AS (
      SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_sec,
             max(event_id) AS r_event_id
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), matched AS (
      SELECT l.event_id, l.user_id, l.ts_sec,
             max_by(r.r_event_id, r.ts_sec) AS m_event_id,
             max(r.ts_sec) AS m_ts
      FROM lft l
      LEFT JOIN rgt r ON l.user_id = r.user_id AND r.ts_sec <= l.ts_sec
      GROUP BY 1, 2, 3
    )
    SELECT event_id, user_id, ts_sec,
           CASE WHEN ts_sec - m_ts <= 3600 THEN m_event_id END AS matched_event_id,
           CASE WHEN ts_sec - m_ts <= 3600 THEN m_ts END AS matched_ts_sec,
           (m_ts IS NOT NULL AND ts_sec - m_ts > 3600) AS stale
    FROM matched ORDER BY event_id
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS BOUND (1 hour): the feature-store /
    sensor-alignment rule — a backward match older than the tolerance is
    worse than no match (a reading from last week must not impersonate
    current state), so stale matches are nulled and flagged rather than
    silently joined.

    Same one-shuffle ``asof_join`` dataflow; the tolerance is a pure
    post-window projection, so the scale posture is unchanged — compare
    ``join_asof`` (unbounded backward) and ``join_asof_nearest`` (either
    direction).  The oracle keeps the O(n·m)-per-key formulation, fine
    at sf0.01 only.
    """
    from cassandra_syncer_spark.operators.asof import asof_join

    ev = T(spark, sf_dir, "events").withColumn("ts_sec", F.expr("ts_ns div 1000000000"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_sec"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_sec", "event_id"
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts_sec",
        right_ts="ts_sec",
        value_cols=["event_id"],
    )
    fresh = F.col("ts_sec") - F.col("matched_ts") <= 3600
    return out.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.when(fresh, F.col("matched_event_id")).alias("matched_event_id"),
        F.when(fresh, F.col("matched_ts")).alias("matched_ts_sec"),
        (F.col("matched_ts").isNotNull() & ~fresh).alias("stale"),
    ).orderBy("event_id")


@register(
    "scan_orc_roundtrip",
    oracle="""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(p_retailprice * 100.0) AS BIGINT)) AS BIGINT)
             AS retail_centi
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink coverage (§2.1 breadth, beside the Parquet/CSV/
    JSONL round-trips): part written as ORC, read back with an EXPLICIT
    schema, aggregated; oracle equality against the Parquet original
    proves the columnar round-trip is lossless.  ORC is the second
    splittable columnar format a mixed lake job must read — same
    pushdown/pruning posture as Parquet on the Spark side.

    Sink path carries the application id (cf. ``scan_jsonl_roundtrip``)
    so concurrent sessions on the same fixture can't race the
    mode('overwrite') rewrite.
    """
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_sinks",
        f"orc-{os.path.basename(os.path.normpath(sf_dir))}-{spark.sparkContext.applicationId}",
    )
    (
        T(spark, sf_dir, "part")
        .select("p_partkey", "p_brand", "p_retailprice")
        .write.mode("overwrite")
        .orc(out)
    )
    back = spark.read.schema("p_partkey long, p_brand string, p_retailprice double").orc(out)
    return (
        back.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("p_retailprice") * 100.0).cast("long"))
            .cast("long")
            .alias("retail_centi"),
        )
        .orderBy("p_brand")
    )
