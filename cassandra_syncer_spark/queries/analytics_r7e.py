"""Round-7 batch 5 — normalized-text dedup, code detection, cohort
retention matrix, integer-exact embedding variance pruning, parquet
min/max pruning, and label propagation on the near-dup graph.

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
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# dedup_normalized — normalization-then-exact dedup ("fuzzy exact")
# ---------------------------------------------------------------------------


@register(
    "dedup_normalized",
    oracle="""
    WITH n AS (
      SELECT source,
             md5(text) AS raw_h,
             md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z ]', '', 'g'),
                   ' +', ' ', 'g'))) AS norm_h
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT raw_h) AS BIGINT) AS n_raw_unique,
           CAST(count(DISTINCT norm_h) AS BIGINT) AS n_norm_unique,
           CAST(count(DISTINCT raw_h) - count(DISTINCT norm_h) AS BIGINT)
             AS n_norm_only_dupes
    FROM n GROUP BY source ORDER BY source
    """,
)
def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-EXACT dedup by canonicalization (the "fuzzy exact" pass every
    crawl pipeline runs between exact-hash and MinHash): texts collapse
    to a normal form — lowercase, punctuation/digits stripped, runs of
    whitespace squeezed — and duplicates invisible to the raw hash
    (case, stray punctuation, double spaces) surface as normalized-hash
    collisions.  Per-source report: raw-unique vs normalized-unique
    counts, the gap being exactly the docs this pass newly merges.

    Scale shape: identical to ``dedup_exact_text`` — two scan-fused
    regexes + one md5 per document, then a source-keyed hash agg with
    map-side-combined distinct counts.  No explode, no join; the 100 TB
    cost is the document scan itself.
    """
    n = T(spark, sf_dir, "documents").select(
        "source",
        F.md5("text").alias("raw_h"),
        F.md5(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", ""),
                    " +",
                    " ",
                )
            )
        ).alias("norm_h"),
    )
    return (
        n.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("raw_h").cast("long").alias("n_raw_unique"),
            F.countDistinct("norm_h").cast("long").alias("n_norm_unique"),
            (F.countDistinct("raw_h") - F.countDistinct("norm_h"))
            .cast("long")
            .alias("n_norm_only_dupes"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# text_code_detect — code-vs-prose heuristic gate
# ---------------------------------------------------------------------------

# score = 3*symbol_ratio + 2*digit_ratio + excess-avg-word-length term,
# all in integer micro units; gate at 0.15 (150_000 micro).
_CODE_GATE_MICRO = 150_000


@register(
    "text_code_detect",
    oracle=f"""
    WITH f AS (
      SELECT lang,
             len(text) AS nc,
             len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_sym,
             len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_dig,
             len(replace(text, ' ', '')) AS n_wchars,
             len(string_split(text, ' ')) AS n_words
      FROM documents WHERE len(text) > 0
    ),
    s AS (
      SELECT lang,
             (3 * (1000000 * n_sym) // nc)
             + (2 * (1000000 * n_dig) // nc)
             + greatest((1000000 * n_wchars) // greatest(n_words, 1)
                        - 8000000, 0) // 10 AS score_micro
      FROM f
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN score_micro > {_CODE_GATE_MICRO}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
           CAST(sum(score_micro) // count(*) AS BIGINT) AS mean_score_micro
    FROM s GROUP BY lang ORDER BY lang
    """,
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CODE-vs-PROSE heuristic gate (the cheap router in front of a
    quality classifier — code shards get different filtering/mixing than
    prose): symbol-character ratio, digit ratio, and excess average word
    length combine into one integer micro score; docs over the gate are
    flagged code.  Per-language report of doc counts, flagged counts,
    and mean score.

    Scale shape: three scan-fused regex counts per document (no
    tokenize-explode — word count comes from the split length), one
    lang-keyed hash agg.  All integer micro math, so the score and its
    mean are hash-exact across engines.
    """
    d = T(spark, sf_dir, "documents").filter(F.length("text") > 0)
    # counts cast to LONG before the micro math: Spark length()/size() are
    # INT, and 1000000 * INT overflows at ~2147 counted chars — i.e. on any
    # ~10 KB code file (caught by the long-doc sweep; DuckDB len() is
    # already BIGINT, so only this side needed widening)
    f = d.select(
        "lang",
        F.length("text").cast("long").alias("nc"),
        F.length(F.regexp_replace("text", "[a-z0-9 ]", "")).cast("long").alias("n_sym"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).cast("long").alias("n_dig"),
        F.length(F.regexp_replace("text", " ", "")).cast("long").alias("n_wchars"),
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
    )
    s = f.select(
        "lang",
        F.expr(
            "(3 * (1000000 * n_sym) div nc)"
            " + (2 * (1000000 * n_dig) div nc)"
            " + greatest((1000000 * n_wchars) div greatest(n_words, 1)"
            "            - 8000000, 0) div 10"
        ).alias("score_micro"),
    )
    return (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("score_micro") > _CODE_GATE_MICRO, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_code"),
            F.expr("sum(score_micro) div count(*)")
            .cast("long")
            .alias("mean_score_micro"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# events_cohort_matrix — weekly signup-cohort retention matrix
# ---------------------------------------------------------------------------


@register(
    "events_cohort_matrix",
    oracle="""
    WITH uw AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events GROUP BY 1, 2
    ),
    cohort AS (SELECT user_id, min(wk) AS cwk FROM uw GROUP BY user_id)
    SELECT CAST(c.cwk AS VARCHAR) AS cohort_week,
           CAST(date_diff('day', c.cwk, u.wk) // 7 AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM uw u JOIN cohort c ON u.user_id = c.user_id
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT RETENTION MATRIX — the classic growth-accounting triangle:
    users are cohorted by their first active ISO week, and each cell
    (cohort_week, week_offset) counts cohort members active that many
    weeks later.  Reading down a column shows retention decay; reading
    the diagonal shows acquisition.

    Scale shape: ONE fact scan — user-week activity dedups first (the
    only corpus-sized shuffle), then the cohort week is a min-window
    over the already-deduped user-week rows (a second exchange, but of
    ≤|user-weeks| rows, never the fact), so the cohort derivation never
    rescans events the way a naive self-join would (plan-asserted in
    tests/test_plans.py).  The final matrix is |cohorts|×|offsets| —
    dimension sized.
    """
    e = T(spark, sf_dir, "events")
    uw = (
        e.select(
            "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
        )
        .groupBy("user_id", "wk")
        .agg(F.lit(1))
        .select("user_id", "wk")
    )
    wu = Window.partitionBy("user_id")
    return (
        uw.withColumn("cwk", F.min("wk").over(wu))
        .select(
            F.col("cwk").cast("string").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cwk")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# embed_variance_prune — integer-exact per-dimension variance ranking
# ---------------------------------------------------------------------------

# keep a dimension iff its exact integer variance quotient clears this
# (micro² units ≈ var >= 0.01)
_VAR_KEEP_Q = 10_000_000_000


@register(
    "embed_variance_prune",
    oracle=f"""
    WITH x AS (
      SELECT i.range AS dim,
             CAST(round(CAST(embedding[i.range] AS DOUBLE) * 1000000)
                  AS BIGINT) AS xi
      FROM embeddings, range(1, 65) i
    ),
    v AS (
      SELECT dim, CAST(count(*) AS BIGINT) AS n,
             (count(*) * sum(xi * xi) - sum(xi) * sum(xi))
               // (count(*) * (count(*) - 1)) AS var_q
      FROM x GROUP BY dim
    )
    SELECT CAST(dim AS BIGINT) AS dim, n, CAST(var_q AS BIGINT) AS var_q,
           var_q >= {_VAR_KEEP_Q} AS keep,
           CAST(row_number() OVER (ORDER BY var_q DESC, dim) AS BIGINT)
             AS var_rank
    FROM v ORDER BY dim
    """,
)
def embed_variance_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIMENSION PRUNING for embedding tables — rank every dimension by
    sample variance and flag the low-information ones (near-constant
    dims carry no retrieval signal; dropping them shrinks the ANN index
    and every downstream dot product).  Values quantize to micro ints
    FIRST, so the variance numerator n·Σx² − (Σx)² is exact integer
    arithmetic — hash-identical across engines and immune to float
    sum-order, unlike a double ``var_samp``.

    Scale shape: posexplode fans each vector into (dim, value) rows —
    64× row growth but fixed width — then ONE dim-keyed hash agg with
    map-side partial sums; the result is 64 rows, so the rank window is
    free.  At 100 TB the cost is the embedding scan; nothing downstream
    exceeds |dims| rows.
    """
    x = (
        T(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("pos", "val"))
        .select(
            (F.col("pos") + 1).cast("long").alias("dim"),
            F.round(F.col("val").cast("double") * 1000000.0)
            .cast("long")
            .alias("xi"),
        )
    )
    v = x.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "(count(*) * sum(xi * xi) - sum(xi) * sum(xi))"
            " div (count(*) * (count(*) - 1))"
        ).alias("var_q"),
    )
    w = Window.orderBy(F.desc("var_q"), F.asc("dim"))
    return (
        v.select(
            "dim",
            "n",
            F.col("var_q").cast("long").alias("var_q"),
            (F.col("var_q") >= F.lit(_VAR_KEEP_Q)).alias("keep"),
        )
        .withColumn("var_rank", F.row_number().over(w).cast("long"))
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# scan_minmax_prune — row-group min/max pruning on a sorted layout
# ---------------------------------------------------------------------------

_PRUNE_LO = 1_000
_PRUNE_HI = 3_000


@register(
    "scan_minmax_prune",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_centi
    FROM orders
    WHERE o_orderkey BETWEEN {_PRUNE_LO} AND {_PRUNE_HI}
    """,
)
def scan_minmax_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX FILE PRUNING — the layout contract behind every "sorted
    by primary key" table at 100 TB: orders re-written SORTED on
    o_orderkey into many small files, then a key-range read back.  On
    the sorted layout each file's parquet footer carries disjoint
    o_orderkey min/max, so the pushed range predicate (asserted as
    ``PushedFilters: [IsNotNull, GreaterThanOrEqual, LessThanOrEqual]``
    in tests/test_plans.py) lets the scan skip every non-overlapping
    file/row-group — I/O proportional to the selected range, not the
    table.  The oracle reads the ORIGINAL table: pruning must be
    invisible to results.

    Scale shape: the one-time sort is the standard ingest cost (same
    shuffle as ``layout_zorder_cluster``); every subsequent range query
    is then near-O(selected).  ``maxRecordsPerFile`` stands in for the
    row-group size knob at fixture scale.
    """
    out = _scratch(sf_dir, "minmax")
    (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .sort("o_orderkey")
        .write.option("maxRecordsPerFile", 2000)
        .mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(
        F.col("o_orderkey").between(_PRUNE_LO, _PRUNE_HI)
    )
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("total_centi"),
    )


# ---------------------------------------------------------------------------
# graph_label_propagation — 2-round synchronous LPA on the near-dup graph
# ---------------------------------------------------------------------------


def _lpa_sql() -> str:
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
    seeds AS (
      SELECT doc_id AS node, source AS label FROM documents
      WHERE doc_id % 5 = 0
    ),
    w1 AS (
      SELECT node, label FROM (
        SELECT a.ctr AS node, s.label,
               row_number() OVER (PARTITION BY a.ctr
                                  ORDER BY count(*) DESC, s.label) AS rk
        FROM adj a
        JOIN seeds s ON a.nbr = s.node
        LEFT JOIN seeds me ON a.ctr = me.node
        WHERE me.node IS NULL
        GROUP BY a.ctr, s.label
      ) WHERE rk = 1
    ),
    l1 AS (SELECT * FROM seeds UNION ALL SELECT * FROM w1),
    w2 AS (
      SELECT node, label FROM (
        SELECT a.ctr AS node, s.label,
               row_number() OVER (PARTITION BY a.ctr
                                  ORDER BY count(*) DESC, s.label) AS rk
        FROM adj a
        JOIN l1 s ON a.nbr = s.node
        LEFT JOIN l1 me ON a.ctr = me.node
        WHERE me.node IS NULL
        GROUP BY a.ctr, s.label
      ) WHERE rk = 1
    ),
    waves AS (
      SELECT 0 AS wave, label FROM seeds
      UNION ALL SELECT 1, label FROM w1
      UNION ALL SELECT 2, label FROM w2
    )
    SELECT CAST(wave AS BIGINT) AS wave, label,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM waves GROUP BY wave, label ORDER BY wave, label
    """


def _lpa_wave(adj: DataFrame, labeled: DataFrame) -> DataFrame:
    """One synchronous LPA round: unlabeled nodes adopt the modal label
    of their labeled neighbors (count desc, label asc tie-break)."""
    votes = (
        adj.join(labeled.withColumnRenamed("node", "nbr"), "nbr")
        .join(
            labeled.select(F.col("node").alias("ctr")),
            "ctr",
            "left_anti",
        )
        .groupBy("ctr", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("ctr").orderBy(F.desc("n_votes"), F.asc("label"))
    return (
        votes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("ctr").alias("node"), "label")
    )


@register("graph_label_propagation", oracle=_lpa_sql())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL PROPAGATION over the near-dup graph — provenance inference
    for unlabeled documents: 20% of docs carry a trusted source label
    (the seed set), and two synchronous rounds spread labels along
    band-candidate edges by neighbor majority (count desc, min-label
    tie-break — fully deterministic, no oscillation inside 2 rounds).
    Output: nodes newly labeled per (wave, label) — wave 0 is the seed
    census, waves 1-2 the propagation front.

    Scale shape: each round is one node-keyed join (labels onto
    adjacency) + one (node,label)-keyed hash agg + a per-node top-1
    window — all partitioned by node like the CC iterations in
    operators/components.py; round count is a constant 2 here and
    diameter-bounded in general.  The adjacency materializes once
    (localCheckpoint) and is reused by both rounds, mirroring the
    edge-list reuse in ``graph_pagerank``.
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
    seeds = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("node"), F.col("source").alias("label"))
    )
    w1 = _lpa_wave(adj, seeds)
    l1 = seeds.unionAll(w1).localCheckpoint()
    w2 = _lpa_wave(adj, l1)
    waves = (
        seeds.select(F.lit(0).alias("wave"), "label")
        .unionAll(w1.select(F.lit(1).alias("wave"), "label"))
        .unionAll(w2.select(F.lit(2).alias("wave"), "label"))
    )
    return (
        waves.groupBy("wave", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .select(F.col("wave").cast("long").alias("wave"), "label", "n_nodes")
        .orderBy("wave", "label")
    )
