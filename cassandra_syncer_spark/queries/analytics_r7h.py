"""Round-7 batch 8 — distributed exact Kolmogorov-Smirnov test (two-phase
prefix sums), CUPED variance-reduced experiment lift, and chunk-boundary
overlap dedup.

Reference parity note: analytics extensions beyond the reference's sync
surface; integer/micro-unit exact formulas on both engines per the
registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# agg_ks_test — exact two-sample Kolmogorov-Smirnov distance, distributed
# ---------------------------------------------------------------------------


@register(
    "agg_ks_test",
    oracle="""
    WITH r AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS vc,
             event_type = 'click' AS isa
      FROM events WHERE event_type IN ('click', 'view')
    ),
    g AS (
      SELECT vc,
             sum(CASE WHEN isa THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN isa THEN 0 ELSE 1 END) AS cb
      FROM r GROUP BY vc
    ),
    c AS (
      SELECT vc,
             sum(ca) OVER (ORDER BY vc) AS cuma,
             sum(cb) OVER (ORDER BY vc) AS cumb
      FROM g
    ),
    t AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
      FROM g
    ),
    d AS (
      SELECT vc, t.na, t.nb,
             abs((1000000 * cuma) // t.na - (1000000 * cumb) // t.nb)
               AS diff_micro
      FROM c, t
      WHERE t.na > 0 AND t.nb > 0
    )
    SELECT na AS n_a, nb AS n_b,
           CAST(max(diff_micro) AS BIGINT) AS ks_micro,
           CAST(min(CASE WHEN diff_micro = (SELECT max(diff_micro) FROM d)
                         THEN vc END) AS BIGINT) AS ks_at_value_centi
    FROM d GROUP BY na, nb
    """,
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV distance, EXACT and DISTRIBUTED —
    the distribution-shift detector (did this batch's quality scores /
    latencies / token counts drift from the reference distribution?)
    computed as max |F̂_A − F̂_B| over all sample points, here between
    the 'click' and 'view' value distributions.

    The naive form sorts all values in one global window — a
    single-task sort at 100 TB.  This dataflow is the distributed
    prefix-sum shape (same discipline as ``join_interval_overlap``):

    1. per-distinct-value counts (one hash agg);
    2. values bucket by range (min/max broadcast from a 1-row agg);
       per-BUCKET partial counts cumulate in a dimension-sized window
       (≤4096 rows) → each bucket's exclusive offset;
    3. within-bucket running sums (bounded partitions) + broadcast
       offset = the exact global ECDF at every sample point; the KS
       statistic is one max-agg over |1e6·cumA/nA − 1e6·cumB/nB| micro
       ints (per-term division keeps every intermediate ≤ 10¹⁵ at 10⁹
       rows — the cross-product form cumA·nB·10⁶ would overflow int64;
       quantization error ≤ 2·10⁻⁶, identical truncation both engines).

    Integer throughout (values centi-quantized first), so the statistic
    and its argmax threshold are hash-identical across engines.  The
    oracle is the naive global-window form — an independent
    formulation of the same statistic.
    """
    r = (
        T(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            F.round(F.col("value") * 100).cast("long").alias("vc"),
            (F.col("event_type") == "click").alias("isa"),
        )
    )
    # materialize the distinct-value counts ONCE: every downstream branch
    # (bounds, bucket partials, totals, the ECDF walk) derives from this
    # value-domain-sized table — without the checkpoint Catalyst re-expands
    # each branch into its own scan of the fact table (plan-asserted)
    g = (
        r.groupBy("vc")
        .agg(
            F.sum(F.when(F.col("isa"), 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("isa"), 0).otherwise(1)).alias("cb"),
        )
        .localCheckpoint()
    )
    # range-bucket the value domain: bounds broadcast from a 1-row agg
    bounds = g.agg(
        F.min("vc").alias("lo"), F.max("vc").alias("hi")
    )
    gb = g.crossJoin(F.broadcast(bounds)).withColumn(
        "bkt",
        F.expr("((vc - lo) * 4096) div greatest(hi - lo + 1, 1)"),
    )
    bp = gb.groupBy("bkt").agg(
        F.sum("ca").alias("pa"), F.sum("cb").alias("pb")
    )
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = bp.select(
        "bkt",
        F.coalesce(F.sum("pa").over(wb), F.lit(0)).alias("offa"),
        F.coalesce(F.sum("pb").over(wb), F.lit(0)).alias("offb"),
    )
    wv = Window.partitionBy("bkt").orderBy("vc").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = (
        gb.join(F.broadcast(offs), "bkt")
        .withColumn("cuma", F.sum("ca").over(wv) + F.col("offa"))
        .withColumn("cumb", F.sum("cb").over(wv) + F.col("offb"))
    )
    tot = g.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    d = c.crossJoin(F.broadcast(tot)).filter(
        (F.col("na") > 0) & (F.col("nb") > 0)
    ).select(
        "vc",
        "na",
        "nb",
        F.expr(
            "abs((1000000 * cuma) div na - (1000000 * cumb) div nb)"
        ).alias("diff_micro"),
    )
    return d.groupBy("na", "nb").agg(
        F.max("diff_micro").cast("long").alias("ks_micro"),
        F.expr("min_by(vc, struct(-diff_micro, vc))").cast("long").alias(
            "ks_at_value_centi"
        ),
    ).select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        "ks_micro",
        "ks_at_value_centi",
    )


# ---------------------------------------------------------------------------
# events_uplift_cuped — variance-reduced experiment readout
# ---------------------------------------------------------------------------

_CUPED_SPLIT = "2024-02-01"


@register(
    "events_uplift_cuped",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 2 AS BIGINT) AS arm,
             sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x,
             sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS sxa,
             sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS sya,
             sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb,
             sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS sxb,
             sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS syb
      FROM u
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0), 6)
             AS theta_r6,
           round((CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE)
                  - CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)) / 100.0, 6)
             AS lift_raw_r6,
           round((CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE)
                  - CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)) / 100.0
                 - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
                   * ((CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE)
                       - CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)) / 100.0), 6)
             AS lift_cuped_r6
    FROM s WHERE na > 0 AND nb > 0
    """,
)
def events_uplift_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced lift — the standard experimentation
    technique: each user's post-period metric y is adjusted by their
    PRE-period covariate x (ŷ = y − θ·(x − x̄), θ = cov(x,y)/var(x)),
    removing the between-user variance x explains, so the arm
    difference needs far less traffic for the same power.  Arms come
    from the same md5 assignment as ``sample_ab_srm``; the pre/post
    split is a fixed date.  Output: raw lift vs CUPED lift plus θ.

    Numeric discipline = ``agg_stats_corr``'s: per-user values
    centi-quantize to exact ints, the cross-product sums accumulate in
    DECIMAL(38)/HUGEINT (int64 n·Σxy would overflow ~10× scale —
    measured, the reason this isn't the all-div micro form), and the
    final θ/lift scalars evaluate the textbook formulas over
    bit-identical doubles on a SINGLE row with fixed operation order —
    rounded to 6 decimals, hash-exact across engines.

    Scale shape: one user-keyed agg collapses the fact table (map-side
    combined), then a single-row global agg carries the ten sums;
    everything after is scalar arithmetic.  No joins.
    """
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    u = (
        T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("ts") < split, F.round(F.col("value") * 100).cast("long")
                ).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(
                    F.col("ts") >= split, F.round(F.col("value") * 100).cast("long")
                ).otherwise(0)
            ).alias("y"),
        )
        .withColumn(
            "arm",
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
                ).cast("long")
                % 2
            ),
        )
    )
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    s = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0)).alias("sxa"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0)).alias("sya"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0)).alias("sxb"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0)).alias("syb"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    sxa, sya = F.col("sxa").cast("double"), F.col("sya").cast("double")
    sxb, syb = F.col("sxb").cast("double"), F.col("syb").cast("double")
    theta = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    lift_raw = (syb / nb - sya / na) / 100.0
    x_gap = (sxb / nb - sxa / na) / 100.0
    # a one-armed (or empty) experiment has no lift reading: zero rows,
    # identically on both engines (degenerate-events sweep)
    return s.filter((F.col("na") > 0) & (F.col("nb") > 0)).select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(theta, 6).alias("theta_r6"),
        F.round(lift_raw, 6).alias("lift_raw_r6"),
        F.round(lift_raw - theta * x_gap, 6).alias("lift_cuped_r6"),
    )


# ---------------------------------------------------------------------------
# dedup_boundary_overlap — split-document detection by head/tail grams
# ---------------------------------------------------------------------------

_BOUNDARY_K = 3


@register(
    "dedup_boundary_overlap",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws
      FROM documents
      WHERE len(string_split(text, ' ')) >= {_BOUNDARY_K}
    ),
    h AS (
      SELECT doc_id, source,
             md5(array_to_string(ws[1:{_BOUNDARY_K}], ' ')) AS head_h,
             md5(array_to_string(ws[-{_BOUNDARY_K}:], ' ')) AS tail_h
      FROM w
    ),
    p AS (
      SELECT a.source AS source_tail, b.source AS source_head,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(count(DISTINCT a.doc_id) AS BIGINT) AS n_tail_docs
      FROM h a JOIN h b
        ON a.tail_h = b.head_h AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT * FROM p ORDER BY source_tail, source_head
    """,
)
def dedup_boundary_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-DOCUMENT detection — the chunking artifact every sharded
    crawl produces: when one logical document was cut into two records,
    the first record's TAIL words equal the second's HEAD words.  Each
    doc emits one head-gram hash and one tail-gram hash (first/last
    {k} words); a tail→head equi-join surfaces continuation candidate
    pairs, reported per (source, source) cell — the input to a
    re-stitching pass.

    Scale shape: two md5s per document (scan-fused slice + join of the
    split array — no explode), then ONE hash equi-join on the gram
    hash: candidate volume is collision-bounded exactly like band-key
    joins, never all-pairs; AQE skew handling applies to hot grams
    (boilerplate heads get the ``salted_self_pairs`` cap rule like hot
    MinHash bands).
    """
    k = _BOUNDARY_K
    w = (
        T(spark, sf_dir, "documents")
        .select("doc_id", "source", F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= k)
    )
    # hash heads/tails ONCE and reuse for both join sides — the self-join
    # is on different keys (tail vs head) so without this each side would
    # re-scan + re-hash the full text column
    h = w.select(
        "doc_id",
        "source",
        F.md5(F.expr(f"array_join(slice(ws, 1, {k}), ' ')")).alias("head_h"),
        F.md5(F.expr(f"array_join(slice(ws, -{k}, {k}), ' ')")).alias("tail_h"),
    ).localCheckpoint()
    a, b = h.alias("a"), h.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.tail_h") == F.col("b.head_h"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.source").alias("source_tail"),
            F.col("b.source").alias("source_head"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct(F.col("a.doc_id")).cast("long").alias("n_tail_docs"),
        )
    )
    return p.orderBy("source_tail", "source_head")
