"""Round-8 batch 6 — IVF probe-recall curve, Heaps' law vocabulary-growth
fit, and decision-stump best-split search.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# sim_ivf_probe_curve — recall@k as a function of probed cells
# ---------------------------------------------------------------------------

_PROBE_COUNTS = (1, 2, 4)


def _probe_curve_sql() -> str:
    from cassandra_syncer_spark.queries.llm_similarity import N_QUERIES, TOP_K

    probes = []
    for np_ in _PROBE_COUNTS:
        probes.append(f"""
    q{np_} AS (SELECT vec_id AS q_id, v AS qv, c_id AS cell
          FROM assign WHERE vec_id < {N_QUERIES} AND rn <= {np_}),
    top{np_} AS (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, c.vec_id,
               row_number() OVER (
                 PARTITION BY q.q_id
                 ORDER BY round(list_inner_product(q.qv, c.v), 6) DESC,
                          c.vec_id) AS rn
        FROM q{np_} q JOIN cells c ON q.cell = c.cell AND q.q_id <> c.vec_id
      ) WHERE rn <= {TOP_K}
    ),
    hit{np_} AS (
      SELECT CAST({np_} AS BIGINT) AS n_probe,
             CAST(count(*) AS BIGINT) AS n_hits
      FROM top{np_} t JOIN truth USING (q_id, vec_id)
    )""")
    union = " UNION ALL ".join(
        f"SELECT n_probe, n_hits FROM hit{np_}" for np_ in _PROBE_COUNTS
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
    assign AS (
      SELECT e.vec_id, e.v, c.c_id,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY round(list_inner_product(e.v, c.cv), 6) DESC, c.c_id) AS rn
      FROM e CROSS JOIN cent c
    ),
    cells AS (SELECT vec_id, v, c_id AS cell FROM assign WHERE rn = 1),
    truth AS (
      SELECT q_id, vec_id FROM (
        SELECT q.vec_id AS q_id, c.vec_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_inner_product(q.v, c.v), 6) DESC,
                          c.vec_id) AS rn
        FROM e q JOIN e c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rn <= {TOP_K}
    ),
    exp_t AS (SELECT CAST(count(*) AS BIGINT) AS n_expected FROM truth),
    {",".join(probes)}
    SELECT u.n_probe, u.n_hits, x.n_expected,
           CAST((1000000 * u.n_hits) // nullif(x.n_expected, 0) AS BIGINT)
             AS recall_micro
    FROM ({union}) u CROSS JOIN exp_t x
    ORDER BY n_probe
    """


@register("sim_ivf_probe_curve", oracle=_probe_curve_sql())
def sim_ivf_probe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF RECALL-vs-PROBES curve — THE tuning table for an IVF index
    (`sim_recall_audit` certifies one configuration; this sweeps the
    knob): for n_probe ∈ {1, 2, 4} over the 8-cell fixed quantizer,
    measured recall@k against the exact brute-force top-k.  The curve's
    shape answers the only question an ANN operator gets asked in
    production — how many cells must I pay to scan for the recall I
    need — and the monotonicity law (more probes ⊇ fewer probes'
    candidates → recall never decreases) is property-tested.

    Scale shape: the exact truth is probe-broadcast × corpus (the
    `sim_recall_audit` audit cost, paid once for the whole sweep); each
    curve point reuses the SAME cell assignment — only the probe's cell
    list grows, so the swept cost is the probed fraction (1/8, 2/8,
    4/8), never a new index build.  Ranking round(·,6)+id tie-broken →
    hash-identical rows.

    Round-11 optimization (guide §2.4 remove redundant work): the sweep
    is ONE plan, not three — the docstring's reuse claim made literal.
    The corpus cell assignment (the dominant subtree: corpus × 8
    centroid dots + a corpus-sized rank window) used to be re-derived
    by every `ivf_topk` leg; now it is built once, each probe row fans
    out to every curve point that includes it (`n_probe ≥ rn` — the
    probe lists are nested by construction, so filtering the rank-≤-4
    assignment IS the rank-≤-n assignment), and one (n_probe, q_id)
    window ranks all three points together.  A literal left join pins
    one output row per curve point even at zero hits, which is exactly
    the old per-leg ungrouped-agg semantics.  Identical rows: oracle
    parity green at sf0.001/0.01/0.1.
    """
    from cassandra_syncer_spark.queries.llm_similarity import (
        N_QUERIES,
        TOP_K,
        _assign_cells,
        _dot,
        _vec,
        sim_cosine_topk,
    )

    truth = sim_cosine_topk(spark, sf_dir).select("q_id", "vec_id").localCheckpoint()
    exp_t = truth.agg(F.count(F.lit(1)).cast("long").alias("n_expected"))
    emb = _vec(T(spark, sf_dir, "embeddings")).select("vec_id", "v")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    )
    cells = _assign_cells(emb, centroids, n_probe=1)
    # probe assignment ONCE at the deepest probe count, keeping the rank:
    # rank ≤ n IS _assign_cells(probes, centroids, n) for every n ≤ max
    wq = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell"))
    probe_pts = F.array(*[F.lit(n) for n in _PROBE_COUNTS])
    q_all = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(centroids))
        .select(
            "vec_id", "v", "cell",
            F.round(_dot(F.col("v"), F.col("cv")), 6).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= max(_PROBE_COUNTS))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            "cell",
            F.explode(F.filter(probe_pts, lambda n: n >= F.col("rn"))).alias(
                "n_probe"
            ),
        )
    )
    scored = (
        cells.join(F.broadcast(q_all), "cell")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "n_probe",
            "q_id",
            "vec_id",
            F.round(_dot(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    wk = Window.partitionBy("n_probe", "q_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    hits = (
        scored.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= TOP_K)
        .join(truth, ["q_id", "vec_id"])
        .groupBy("n_probe")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    points = (
        spark.range(1)
        .select(F.explode(probe_pts).alias("np_i"))
        .select(F.col("np_i").cast("long").alias("n_probe"))
    )
    return (
        points.join(F.broadcast(hits), "n_probe", "left")
        .select(
            "n_probe",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("n_hits"),
        )
        .crossJoin(F.broadcast(exp_t))
        .withColumn(
            "recall_micro",
            F.expr("(1000000 * n_hits) div nullif(n_expected, 0)"),
        )
        .orderBy("n_probe")
    )


# ---------------------------------------------------------------------------
# corpus_heaps_fit — Heaps' law vocabulary-growth exponent
# ---------------------------------------------------------------------------

_HEAPS_CHECKPOINTS = 10

#: OLS slope over MILLI-rescaled integer sums (micro products would
#: overflow int64); x and y rescale together so the slope is unitless = β.
_HEAPS_BETA = (
    "((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / nullif(CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))"
)


@register(
    "corpus_heaps_fit",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t.w FROM documents,
        LATERAL (SELECT unnest(string_split(text, ' ')) AS w) t
      WHERE len(t.w) > 0
    ),
    mx AS (SELECT max(doc_id) + 1 AS m FROM tok),
    firstocc AS (SELECT w, min(doc_id) AS fd FROM tok GROUP BY w),
    doctok AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nt
               FROM tok GROUP BY doc_id),
    cp AS (SELECT unnest(range(1, {_HEAPS_CHECKPOINTS} + 1)) AS i),
    pts AS (
      SELECT cp.i,
             (SELECT sum(nt) FROM doctok, mx
               WHERE doc_id < (cp.i * m) // {_HEAPS_CHECKPOINTS}) AS n_tok,
             (SELECT count(*) FROM firstocc, mx
               WHERE fd < (cp.i * m) // {_HEAPS_CHECKPOINTS}) AS n_vocab
      FROM cp
    ),
    lp AS (
      SELECT CAST(round(1000000 * ln(CAST(n_tok AS DOUBLE))) AS BIGINT) AS x,
             CAST(round(1000000 * ln(CAST(n_vocab AS DOUBLE))) AS BIGINT) AS y
      FROM pts WHERE n_tok > 0 AND n_vocab > 0
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(x // 1000) AS BIGINT) AS sx,
             CAST(sum(y // 1000) AS BIGINT) AS sy,
             CAST(sum(x // 1000 * (y // 1000)) AS BIGINT) AS sxy,
             CAST(sum(x // 1000 * (x // 1000)) AS BIGINT) AS sxx
      FROM lp
    )
    SELECT k AS n_points,
           round({_HEAPS_BETA}, 6) AS beta_r6
    FROM s WHERE k >= 2
    """,
)
def corpus_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAPS' LAW FIT — the vocabulary-growth exponent β in V(n) ≈
    K·n^β, the one-number readout of `corpus_vocab_growth`'s curve
    (natural language sits β ≈ 0.4–0.6; β → 1 means near-disjoint
    vocabularies per document — shredded or synthetic text; β → 0 means
    a closed template vocabulary).  Prefix points at 10 doc-id
    checkpoints: vocabulary at each prefix via FIRST-OCCURRENCE doc
    (one vocab-sized table answers all 10 prefixes — never 10 distinct
    scans), token counts via one per-doc agg.

    Determinism: the `corpus_zipf_octave_fit` discipline — ln of exact
    integers micro-rounded per point, OLS over MILLI-rescaled integer
    sums (x·y at micro scale would overflow int64; the //1000 rescale
    keeps β's quotient invariant since numerator and denominator
    rescale together), ONE shared slope text.

    Scale shape: token explode → vocab agg (min doc) + per-doc counts;
    the 10 prefix sums run over those two SMALL tables; one-row fit.
    """
    tok = (
        T(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
    )
    mx = tok.agg((F.max("doc_id") + 1).alias("m"))
    firstocc = tok.groupBy("w").agg(F.min("doc_id").alias("fd"))
    doctok = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("nt"))
    cp = spark.range(1, _HEAPS_CHECKPOINTS + 1).select(
        F.col("id").cast("long").alias("i")
    )
    # each checkpoint's cutoff doc: (i * m) div 10 — both prefix measures
    # join the 10-row dimension against the SMALL derived tables
    vocab_pts = (
        firstocc.crossJoin(F.broadcast(cp.crossJoin(mx)))
        .filter(F.expr(f"fd < (i * m) div {_HEAPS_CHECKPOINTS}"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vocab"))
    )
    tok_pts = (
        doctok.crossJoin(F.broadcast(cp.crossJoin(mx)))
        .filter(F.expr(f"doc_id < (i * m) div {_HEAPS_CHECKPOINTS}"))
        .groupBy("i")
        .agg(F.sum("nt").cast("long").alias("n_tok"))
    )
    lp = (
        tok_pts.join(vocab_pts, "i")
        .filter((F.col("n_tok") > 0) & (F.col("n_vocab") > 0))
        .select(
            F.expr(
                "CAST(round(1000000 * ln(CAST(n_tok AS DOUBLE))) AS BIGINT)"
            ).alias("x"),
            F.expr(
                "CAST(round(1000000 * ln(CAST(n_vocab AS DOUBLE))) AS BIGINT)"
            ).alias("y"),
        )
    )
    s = lp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.expr("x div 1000")).cast("long").alias("sx"),
        F.sum(F.expr("y div 1000")).cast("long").alias("sy"),
        F.sum(F.expr("x div 1000 * (y div 1000)")).cast("long").alias("sxy"),
        F.sum(F.expr("x div 1000 * (x div 1000)")).cast("long").alias("sxx"),
    )
    return s.filter(F.col("k") >= 2).select(
        F.col("k").alias("n_points"),
        F.expr(f"round({_HEAPS_BETA}, 6)").alias("beta_r6"),
    )


# ---------------------------------------------------------------------------
# feat_best_split_gini — decision-stump split search via prefix sums
# ---------------------------------------------------------------------------

#: weighted Gini impurity of the split at threshold t, in micro units —
#: pure integer arithmetic (truncating div identical both engines)
_SPLIT_IMP = (
    "(2000000 * posl * (nl - posl)) // (nl * n)"
    " + (2000000 * (pos - posl) * ((n - nl) - (pos - posl))) // ((n - nl) * n)"
)


@register(
    "feat_best_split_gini",
    oracle=f"""
    WITH v AS (
      SELECT CAST(round(100 * o_totalprice) AS BIGINT) AS vc,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    g AS (
      SELECT vc, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(y) AS BIGINT) AS posc
      FROM v GROUP BY vc
    ),
    c AS (
      SELECT vc,
             sum(cnt) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) AS nl,
             sum(posc) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) AS posl,
             sum(cnt) OVER () AS n,
             sum(posc) OVER () AS pos
      FROM g
    ),
    scored AS (
      SELECT vc, nl, n, CAST({_SPLIT_IMP} AS BIGINT) AS imp
      FROM c WHERE nl > 0 AND nl < n
    ),
    best AS (
      SELECT vc, nl, n, imp,
             row_number() OVER (ORDER BY imp, vc) AS rn
      FROM scored
    )
    SELECT CAST(vc AS BIGINT) AS threshold_centi,
           CAST(imp AS BIGINT) AS impurity_micro,
           CAST((SELECT (2000000 * pos * (n - pos)) // (n * n)
                 FROM c LIMIT 1) AS BIGINT) AS baseline_micro,
           CAST(nl AS BIGINT) AS n_left,
           CAST(n - nl AS BIGINT) AS n_right
    FROM best WHERE rn = 1
    """,
)
def feat_best_split_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECISION-STUMP BEST SPLIT — the inner loop of every tree learner
    (XGBoost/LightGBM histogram split finding), run as a query: over
    the (value, class) count table, weighted Gini impurity of the
    split at EVERY candidate threshold comes from one cumulative window
    (left counts = prefix sums, right = totals − prefix), and the argmin
    is a rank over the domain.  The selection machinery once more: no
    per-threshold rescan, no corpus sort — exactly how the histogram
    tree learners made split finding scan-free.

    Determinism: impurities are pure integer micro (2·p·(1−p) cleared
    of fractions by the n·nl denominators; truncating div measured
    identical both engines); argmin ties break by threshold.  Headroom
    (round-8 ADVICE): the impurity numerators accumulate in
    DECIMAL(38,0) on the Spark side — DuckDB's window sums already
    promote to HUGEINT — so 2·10⁶·n² fits up to n ≈ 10¹⁶ rows per fit
    instead of silently wrapping int64 at n ≈ 2·10⁶; `div` on decimals
    returns BIGINT, keeping the output schema unchanged.

    Scale shape: scan → (value, class) count agg (map-side combined) →
    ONE domain-sized cumulative window → rank-1 selection.  Output is
    one row.
    """
    v = T(spark, sf_dir, "orders").select(
        F.round(F.lit(100) * F.col("o_totalprice")).cast("long").alias("vc"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    g = v.groupBy("vc").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("posc"),
    )
    wc = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # round-12 (ADVICE r11): the round-11 broadcast-totals form referenced
    # the domain-grid subtree g TWICE (totals agg + windowed select) and the
    # planner did NOT reuse the exchange — the orders scan and the (vc) hash
    # agg executed twice per run (2 scans, 0 ReusedExchange, measured).  The
    # grand totals now come from an UNBOUNDED frame over the SAME window
    # sort spec: Spark groups same-(partition, order) frames into ONE
    # WindowExec, so totals ride the cumulative pass — one scan, one agg,
    # one sort, no crossJoin.  (A bucket-parallel prefix for the cum window
    # was measured and REJECTED in round 11: its extra exchanges cost more
    # than the single-task walk saves on a domain-bounded grid.)
    wt = Window.orderBy("vc").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "vc",
        F.sum("cnt").over(wc).alias("nl"),
        F.sum("posc").over(wc).alias("posl"),
        F.sum("cnt").over(wt).alias("n"),
        F.sum("posc").over(wt).alias("pos"),
    )
    scored = c.filter((F.col("nl") > 0) & (F.col("nl") < F.col("n"))).select(
        "vc",
        "nl",
        "n",
        "pos",
        F.expr(
            # DECIMAL(38,0) numerators: exact up to ~1e38 (no int64 wrap)
            "CAST((CAST(2000000 AS DECIMAL(38,0)) * posl * (nl - posl))"
            " div (CAST(nl AS DECIMAL(38,0)) * n)"
            " + (CAST(2000000 AS DECIMAL(38,0)) * (pos - posl)"
            "    * ((n - nl) - (pos - posl)))"
            " div (CAST(n - nl AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("imp"),
    )
    # round-11: the argmin is a min_by aggregation (partial, map-side
    # combined) — not a global row_number window, which forced one more
    # single-partition sort of the whole domain grid
    best = scored.agg(
        F.expr(
            "min_by(named_struct('vc', vc, 'imp', imp, 'nl', nl,"
            " 'n', n, 'pos', pos), named_struct('imp', imp, 'vc', vc))"
        ).alias("b")
    ).select("b.vc", "b.imp", "b.nl", "b.n", "b.pos")
    return best.select(
        F.col("vc").alias("threshold_centi"),
        F.col("imp").alias("impurity_micro"),
        F.expr(
            "CAST((CAST(2000000 AS DECIMAL(38,0)) * pos * (n - pos))"
            " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("baseline_micro"),
        F.col("nl").alias("n_left"),
        (F.col("n") - F.col("nl")).alias("n_right"),
    )
